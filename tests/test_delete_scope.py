"""Per-bin / per-scan delete scoping (round-4 VERDICT #1/#6): a bin or
scan only reads delete files whose sequence + bounds CAN touch its data
files; scoped-out deletes were provable no-ops, so results are
byte-identical with scoping on."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.metrics import GLOBAL as METRICS
from iceberg_compaction_spark.plans import delete_scope
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources.table import Table


def _row(path="f", content=mf.CONTENT_DATA, seq=1, eq_ids=None, stats=None):
    return {
        "path": path,
        "content": content,
        "size_bytes": 1,
        "record_count": 1,
        "sequence_number": seq,
        "partition": "",
        "equality_ids": eq_ids or [],
        "stats_json": json.dumps(stats or {}),
    }


# ---------------------------------------------------------------------------
# unit: the three scoping rules
def test_eq_scope_by_sequence():
    data = [_row("a", seq=5, stats={"k": {"min": 0, "max": 100, "nulls": 0}})]
    older = _row("d1", mf.CONTENT_EQ_DEL, seq=5, eq_ids=["k"],
                 stats={"k": {"min": 0, "max": 100, "nulls": 0}})
    newer = _row("d2", mf.CONTENT_EQ_DEL, seq=6, eq_ids=["k"],
                 stats={"k": {"min": 0, "max": 100, "nulls": 0}})
    _, eq = delete_scope.scope_deletes(data, [], [older, newer])
    # seq 5 kills only rows with seq < 5 — no scoped file qualifies
    assert [r["path"] for r in eq] == ["d2"]


def test_eq_scope_by_key_bounds():
    data = [
        _row("a", seq=1, stats={"k": {"min": 100, "max": 200, "nulls": 0}}),
        _row("b", seq=1, stats={"k": {"min": 150, "max": 300, "nulls": 0}}),
    ]
    hit = _row("d1", mf.CONTENT_EQ_DEL, seq=9, eq_ids=["k"],
               stats={"k": {"min": 250, "max": 400, "nulls": 0}})
    miss = _row("d2", mf.CONTENT_EQ_DEL, seq=9, eq_ids=["k"],
                stats={"k": {"min": 500, "max": 600, "nulls": 0}})
    unknown = _row("d3", mf.CONTENT_EQ_DEL, seq=9, eq_ids=["k"],
                   stats={"k": {"min": None, "max": None, "nulls": None}})
    _, eq = delete_scope.scope_deletes(data, [], [hit, miss, unknown])
    assert sorted(r["path"] for r in eq) == ["d1", "d3"]  # unknown ⇒ attach
    # a data file with unknown bounds poisons the union: everything attaches
    data2 = data + [_row("c", seq=1, stats={})]
    _, eq2 = delete_scope.scope_deletes(data2, [], [hit, miss, unknown])
    assert len(eq2) == 3


def test_pos_scope_by_path_bounds():
    data = [_row("/w/data/p05.parquet", seq=1)]
    inside = _row("pd1", mf.CONTENT_POS_DEL, seq=2,
                  stats={"_file": {"min": "/w/data/p00.parquet",
                                   "max": "/w/data/p09.parquet", "nulls": 0}})
    outside = _row("pd2", mf.CONTENT_POS_DEL, seq=2,
                   stats={"_file": {"min": "/w/data/q00.parquet",
                                    "max": "/w/data/q09.parquet", "nulls": 0}})
    nostats = _row("pd3", mf.CONTENT_POS_DEL, seq=2, stats={})
    pos, _ = delete_scope.scope_deletes(data, [inside, outside, nostats], [])
    assert sorted(r["path"] for r in pos) == ["pd1", "pd3"]


def test_empty_scope_attaches_nothing():
    d = _row("d", mf.CONTENT_EQ_DEL, seq=9, eq_ids=["k"])
    assert delete_scope.scope_deletes([], [d], [d]) == ([], [])


# ---------------------------------------------------------------------------
# end-to-end: scans and bins skip inapplicable delete files, results equal
def _two_range_table(spark, loc):
    """Two data files with disjoint conv_id ranges (committed
    separately so each is its own manifest entry + bounds)."""
    t = Table.create(loc, "conv_id bigint, turn_idx bigint, text string")
    lo = spark.range(0, 1000).select(
        F.col("id").alias("conv_id"), (F.col("id") % 7).alias("turn_idx"),
        F.lit("low").alias("text"))
    hi = spark.range(100_000, 101_000).select(
        F.col("id").alias("conv_id"), (F.col("id") % 7).alias("turn_idx"),
        F.lit("high").alias("text"))
    t.append_dataframe(lo.coalesce(1))
    t.append_dataframe(hi.coalesce(1))
    return t


def test_scan_scopes_eq_deletes_to_overlapping_files(spark, tmp_warehouse):
    t = _two_range_table(spark, os.path.join(tmp_warehouse, "eqscope"))
    # delete keys live entirely in the LOW range
    t.add_equality_deletes(
        spark.range(10, 20).select(F.col("id").alias("conv_id")), ["conv_id"]
    )
    # full scan needs the delete (low file overlaps)
    total = t.scan(spark).count()
    assert total == 1990
    assert t.last_scan_eq_delete_files >= 1
    # scan restricted to the HIGH file: delete provably inapplicable
    hi_path = next(
        r["path"] for r in t.files(content=mf.CONTENT_DATA)
        if json.loads(r["stats_json"])["conv_id"]["min"] >= 100_000
    )
    n_hi = t.scan(spark, paths=[hi_path]).count()
    assert n_hi == 1000
    assert t.last_scan_eq_delete_files == 0
    # filter-pruned scan sees the same scoping (pruning shrinks the scope)
    n = t.scan(spark, filter="conv_id >= 100000").count()
    assert n == 1000
    assert t.last_scan_eq_delete_files == 0


def test_scan_scopes_out_seq_disjoint_eq_delete(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "seqscope")
    t = Table.create(loc, "conv_id bigint, v string")
    t.append_dataframe(
        spark.range(100).select(F.col("id").alias("conv_id"), F.lit("a").alias("v"))
    )
    t.add_equality_deletes(
        spark.range(5).select(F.col("id").alias("conv_id")), ["conv_id"]
    )
    # a LATER append: its rows are newer than the delete — scanning only
    # that file must not attach the delete at all
    t.append_dataframe(
        spark.range(100).select(F.col("id").alias("conv_id"), F.lit("b").alias("v"))
    )
    new_paths = [
        r["path"] for r in t.files(content=mf.CONTENT_DATA)
        if r["sequence_number"] == t.sequence_number
    ]
    assert new_paths
    n = t.scan(spark, paths=new_paths).count()
    assert n == 100  # all rows survive: delete predates them
    assert t.last_scan_eq_delete_files == 0
    # full scan still resolves the delete for the old file
    assert t.scan(spark).count() == 195
    assert t.last_scan_eq_delete_files >= 1


def test_compaction_bins_scope_deletes(spark, tmp_warehouse):
    from iceberg_compaction_spark.config import CompactionConfig
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    t = _two_range_table(spark, os.path.join(tmp_warehouse, "binscope"))
    t.add_equality_deletes(
        spark.range(10, 20).select(F.col("id").alias("conv_id")), ["conv_id"]
    )
    runner = CompactionRunner(
        spark, t, CompactionConfig(sort_order=(("conv_id", False), ("turn_idx", False)))
    )
    rows = t.files(content=mf.CONTENT_DATA)
    lo_paths = [r["path"] for r in rows
                if json.loads(r["stats_json"])["conv_id"]["min"] < 100_000]
    hi_paths = [r["path"] for r in rows
                if json.loads(r["stats_json"])["conv_id"]["min"] >= 100_000]
    sid = t.current_snapshot_id
    _, _, eq_lo = runner._delete_frames(sid, lo_paths)
    _, _, eq_hi = runner._delete_frames(sid, hi_paths)
    assert len(eq_lo) == 1  # the low bin must resolve the delete
    assert eq_hi == []      # the high bin never reads it
    # and the rewrite is still correct end-to-end
    res = runner.execute()
    assert res.snapshot_after is not None
    assert t.scan(spark).count() == 1990
    got = t.scan(spark).filter("conv_id BETWEEN 10 AND 19").count()
    assert got == 0


def test_changelog_delete_commit_scans_only_touched_partition(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.changelog import changelog_scan

    t = _two_range_table(spark, os.path.join(tmp_warehouse, "cdcscope"))
    from_sid = t.current_snapshot_id
    t.add_equality_deletes(
        spark.range(10, 20).select(F.col("id").alias("conv_id")), ["conv_id"]
    )
    before = METRICS.get("scan.files_scanned")
    df = changelog_scan(spark, t, from_sid)
    rows = df.collect()
    scanned = METRICS.get("scan.files_scanned") - before
    # the delete touches only the low-range file: the parent scan reads
    # 1 data file, never both
    assert scanned == 1
    assert len(rows) == 10
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert {r["conv_id"] for r in rows} == set(range(10, 20))
