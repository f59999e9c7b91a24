"""Executor-side pruning twin: identical survivor sets to the driver
evaluator (by construction — pinned here by property test), and the
scan() path switch above PRUNE_DF_THRESHOLD."""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_compaction_spark.metrics import GLOBAL as METRICS
from iceberg_compaction_spark.plans import pruning
from iceberg_compaction_spark.plans.pruning_df import prune_files_df
from iceberg_compaction_spark.sources.table import Table

_MANIFEST_DDL = (
    "path string, content string, size_bytes bigint, record_count bigint,"
    " sequence_number bigint, partition string, equality_ids array<string>,"
    " stats_json string"
)

_OPS = ["=", "<", "<=", ">", ">="]


def _mk_rows(bounds):
    rows = []
    for i, (mn, mx, nulls) in enumerate(bounds):
        lo, hi = (mn, mx) if (mn is None or mx is None or mn <= mx) else (mx, mn)
        stats = {"a": {"min": lo, "max": hi, "nulls": nulls}}
        rows.append(
            {
                "path": f"f{i:03d}",
                "content": "data",
                "size_bytes": 1,
                "record_count": 1,
                "sequence_number": 1,
                "partition": "",
                "equality_ids": [],
                "stats_json": json.dumps(stats),
            }
        )
    return rows


@settings(max_examples=12, deadline=None)
@given(
    bounds=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-50, 50)),
            st.one_of(st.none(), st.integers(-50, 50)),
            st.one_of(st.none(), st.integers(0, 3)),
        ),
        min_size=1,
        max_size=6,
    ),
    disj=st.lists(
        st.lists(
            st.tuples(st.sampled_from(_OPS + ["isnull"]), st.integers(-60, 60)),
            min_size=1,
            max_size=2,
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_twin_survivors_identical(spark, bounds, disj):
    rows = _mk_rows(bounds)
    expr = " OR ".join(
        "("
        + " AND ".join(
            "a IS NULL" if op == "isnull" else f"a {op} {lit}" for op, lit in d
        )
        + ")"
        for d in disj
    )
    ct = {"a": "num"}
    kept_driver, _ = pruning.prune_files(rows, expr, col_types=ct)
    df = spark.createDataFrame(rows, _MANIFEST_DDL)
    kept_twin = {r["path"] for r in prune_files_df(df, expr, ct).select("path").collect()}
    assert {r["path"] for r in kept_driver} == kept_twin, expr


def test_twin_ts_and_string_resolution(spark):
    """The twin applies the same type-aware str_ts resolution."""
    rows = [
        {
            "path": "tsfile",
            "content": "data",
            "size_bytes": 1,
            "record_count": 1,
            "sequence_number": 1,
            "partition": "",
            "equality_ids": [],
            "stats_json": json.dumps(
                {"ts": {"min": "2024-06-02T01:00:00", "max": "2024-06-02T12:00:00", "nulls": 0},
                 "c": {"min": "2024-06-01 05:00:00", "max": "2024-06-01 05:00:00", "nulls": 0}}
            ),
        }
    ]
    df = spark.createDataFrame(rows, _MANIFEST_DDL)
    ct = {"ts": "ts", "c": "str"}
    for expr, survives in [
        ("ts <= '2024-06-02 23:59:59'", True),
        ("ts > '2024-06-02 23:59:59'", False),
        ("c < '2024-06-01T00:00:00'", True),   # raw string: ' ' < 'T'
        ("c >= '2024-06-01T00:00:00'", False),
    ]:
        kept_driver, _ = pruning.prune_files(rows, expr, col_types=ct)
        kept_twin = prune_files_df(df, expr, ct).count()
        assert (len(kept_driver) == 1) is survives, expr
        assert kept_twin == len(kept_driver), expr


def test_scan_switches_to_df_path_above_threshold(spark, tmp_warehouse, monkeypatch):
    loc = os.path.join(tmp_warehouse, "dfprune")
    t = Table.create(
        loc, "conv_id bigint, ts timestamp, v string",
        partition={"field": "_part", "expr": "date_format(ts, 'yyyy-MM-dd')"},
    )
    df = spark.range(5000).selectExpr(
        "id as conv_id",
        "timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60) as ts",
        "concat('v', id) as v",
    )
    t.append_dataframe(df.repartition(8), max_records_per_file=400)
    pred = "ts >= TIMESTAMP '2024-06-03 00:00:00'"
    # driver path first
    expected = t.scan(spark, filter=pred).count()
    pruned_driver = t.last_scan_pruned_files
    # force the DF path and compare
    monkeypatch.setattr(Table, "PRUNE_DF_THRESHOLD", 0)
    before = METRICS.get("scan.prune_df_path")
    got = t.scan(spark, filter=pred).count()
    assert METRICS.get("scan.prune_df_path") == before + 1
    assert got == expected
    assert t.last_scan_pruned_files == pruned_driver


def test_classifier_driver_and_executor_identical(spark):
    import json as _json

    from iceberg_compaction_spark.plans.pruning_df import classify_data_rows

    rows = []
    for i, (mn, mx, nulls) in enumerate(
        [(0, 10, 0), (5, 50, 0), (60, 90, 0), (None, None, None), (20, 20, 0)]
    ):
        rows.append(
            {
                "path": f"f{i}",
                "content": "data",
                "size_bytes": 1,
                "record_count": 1,
                "sequence_number": 1,
                "partition": "",
                "equality_ids": [],
                "stats_json": _json.dumps({"a": {"min": mn, "max": mx, "nulls": nulls}}),
            }
        )
    pred = "a >= 0 AND a < 40"
    ct = {"a": "num"}
    drv = classify_data_rows(spark, rows, pred, ct, threshold=10**9)
    exe = classify_data_rows(
        spark, rows, pred, ct,
        files_df_factory=lambda: spark.createDataFrame(rows, _MANIFEST_DDL),
        threshold=0,
    )
    assert drv == exe
    assert drv == {"f0": "all", "f1": "straddle", "f2": "pruned",
                   "f3": "straddle", "f4": "all"}
