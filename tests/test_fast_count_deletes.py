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


def test_partition_counts_metadata_only(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.stats_agg import fast_partition_counts

    t = _mk(spark, os.path.join(tmp_warehouse, "pc"))
    hits = (
        t.scan(spark, with_hidden=True).filter("conv_id % 10 = 3").select("_file", "_pos")
    )
    t.add_position_deletes(hits)
    truth = {
        r["_part"]: r["count"]
        for r in t.scan(spark, columns=["_part"]).groupBy("_part").count().collect()
    }
    res = fast_partition_counts(spark, t)
    assert res["counts"] == truth
    assert res["scanned_files"] == 0 and res["metadata_files"] > 0
    # equality deletes force the grouped scan, still exact
    t.add_equality_deletes(
        spark.range(100).select(F.col("id").alias("conv_id")), ["conv_id"]
    )
    truth2 = {
        r["_part"]: r["count"]
        for r in t.scan(spark, columns=["_part"]).groupBy("_part").count().collect()
    }
    res2 = fast_partition_counts(spark, t)
    assert res2["counts"] == truth2
    assert res2["metadata_files"] == 0


def test_partition_counts_unpartitioned(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.stats_agg import fast_partition_counts
    from iceberg_compaction_spark.sources.table import Table

    t = Table.create(os.path.join(tmp_warehouse, "pcu"), "k bigint, v string")
    t.append_dataframe(spark.range(100).selectExpr("id as k", "'x' as v"))
    res = fast_partition_counts(spark, t)
    assert res["counts"] == {"": 100}


def test_concurrent_appends_all_land(spark, tmp_warehouse):
    """Commit-lock + retry under real thread contention: N threads
    appending concurrently all succeed, nothing lost or duplicated."""
    from concurrent.futures import ThreadPoolExecutor

    from iceberg_compaction_spark.sources.table import Table

    loc = os.path.join(tmp_warehouse, "conc")
    Table.create(loc, "k bigint, tag string")

    def writer(i):
        t = Table.load(loc)  # own handle per thread, like real writers
        for j in range(3):
            t.append_dataframe(
                spark.createDataFrame([(i * 10 + j, f"w{i}")], "k bigint, tag string"),
                branch=None,
            )
        return True

    with ThreadPoolExecutor(max_workers=4) as ex:
        assert all(ex.map(writer, range(4)))
    t = Table.load(loc)
    rows = t.scan(spark).collect()
    assert len(rows) == 12
    assert {r["k"] for r in rows} == {i * 10 + j for i in range(4) for j in range(3)}
    assert t.current_snapshot_id == 12  # every commit landed exactly once
