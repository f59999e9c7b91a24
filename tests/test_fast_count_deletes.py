"""Round-4: fast_count stays metadata-only under position deletes
(exact per-file death toll from one narrow delete-file scan)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.stats_agg import fast_count
from iceberg_compaction_spark.sources.table import Table


def _mk(spark, loc):
    t = Table.create(
        loc, "conv_id bigint, ts timestamp, v string",
        partition={"field": "_part", "expr": "date_format(ts, 'yyyy-MM-dd')"},
    )
    df = spark.range(4000).selectExpr(
        "id as conv_id",
        "timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id*90) as ts",
        "concat('v', id) as v",
    )
    t.append_dataframe(df.repartition(4), max_records_per_file=500)
    return t


def test_pos_delete_count_is_metadata_only(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "fcpd"))
    hits = (
        t.scan(spark, with_hidden=True).filter("conv_id % 10 = 3").select("_file", "_pos")
    )
    t.add_position_deletes(hits)
    truth = t.scan(spark).count()
    res = fast_count(spark, t)
    assert res["count"] == truth == 3600
    assert res["scanned_files"] == 0
    assert res["metadata_files"] > 0

    # day-aligned predicate: still zero data files opened
    pred = "ts >= TIMESTAMP '2024-06-02 00:00:00' AND ts < TIMESTAMP '2024-06-03 00:00:00'"
    truth_p = t.scan(spark).filter(pred).count()
    res_p = fast_count(spark, t, pred)
    assert res_p["count"] == truth_p
    assert res_p["scanned_files"] == 0
    assert res_p["pruned_files"] > 0

    # straddling predicate: boundary files are MoR-scanned, still exact
    pred_s = "ts >= TIMESTAMP '2024-06-01 12:30:00'"
    truth_s = t.scan(spark).filter(pred_s).count()
    res_s = fast_count(spark, t, pred_s)
    assert res_s["count"] == truth_s
    assert res_s["scanned_files"] > 0


def test_duplicate_pos_refs_subtract_once(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "fcdup"))
    hits = (
        t.scan(spark, with_hidden=True).filter("conv_id % 10 = 3").select("_file", "_pos")
    )
    t.add_position_deletes(hits)
    t.add_position_deletes(hits)  # the SAME pairs again, second delete file set
    truth = t.scan(spark).count()
    res = fast_count(spark, t)
    assert res["count"] == truth == 3600  # distinct (file,pos): no double-subtract
    assert res["scanned_files"] == 0


def test_eq_deletes_still_fall_back(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "fceq"))
    t.add_equality_deletes(
        spark.range(100).select(F.col("id").alias("conv_id")), ["conv_id"]
    )
    truth = t.scan(spark).count()
    res = fast_count(spark, t)
    assert res["count"] == truth == 3900
    assert res["metadata_files"] == 0  # fallback path
