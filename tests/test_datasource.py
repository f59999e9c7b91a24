"""Spark 4 Python DataSource connector (round 5): format("icemaint")
batch MoR reads, pushFilters file pruning, and append-only streaming
with checkpoint resume."""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from iceberg_compaction_spark.operators.delete_where import delete_where
from iceberg_compaction_spark.operators.maintenance import rewrite_equality_deletes
from iceberg_compaction_spark.operators.merge_into import merge_into
from iceberg_compaction_spark.sources.datasource import _BatchReader, register
from iceberg_compaction_spark.sources.table import Table


def _mk(spark, loc, n=100, per_file=25):
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(
        spark.createDataFrame([(i, f"v{i}") for i in range(n)], "k bigint, v string"),
        max_records_per_file=per_file,
    )
    return t


def test_batch_read_resolves_all_delete_kinds(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "ds_mor")
    t = _mk(spark, loc)
    merge_into(
        t,
        spark.createDataFrame([(3, "NEW3"), (200, "NEW200")], "k bigint, v string"),
        keys=["k"],
    )
    merge_into(
        t, spark.createDataFrame([(11, "NEW11")], "k bigint, v string"), keys=["k"]
    )
    rewrite_equality_deletes(spark, t)  # consolidated per-row _seq file
    delete_where(spark, t, "k % 10 = 7", mode="mor")  # position deletes
    register(spark)
    expect = sorted(tuple(r) for r in t.scan(spark).collect())
    got = sorted(
        tuple(r) for r in spark.read.format("icemaint").load(loc).collect()
    )
    assert got == expect and len(got) > 0


def test_push_filters_prune_files(spark, tmp_warehouse):
    """The reader's pushFilters hook prunes whole files from the
    partition list via manifest bounds (and returns every filter
    unhandled, so results stay exact)."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    loc = os.path.join(tmp_warehouse, "ds_prune")
    t = _mk(spark, loc, n=100, per_file=25)  # k-sorted → 4 range-disjoint files
    schema = StructType.fromDDL("k bigint, v string")
    rd = _BatchReader({"path": loc}, schema)
    all_parts = rd.partitions()
    rd2 = _BatchReader({"path": loc}, schema)
    unhandled = list(rd2.pushFilters([GreaterThanOrEqual(("k",), 90)]))
    assert len(unhandled) == 1  # filter returned for Spark to re-apply
    pruned_parts = rd2.partitions()
    assert len(pruned_parts) < len(all_parts)
    # end-to-end correctness with the same filter
    register(spark)
    got = sorted(
        r["k"]
        for r in spark.read.format("icemaint").load(loc).filter("k >= 90").collect()
    )
    assert got == list(range(90, 100))


def test_batch_read_pads_added_columns(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "ds_evo")
    t = _mk(spark, loc, n=10, per_file=10)
    t.add_column("score", "double")
    t.append_dataframe(
        spark.createDataFrame([(100, "new", 1.5)], "k bigint, v string, score double")
    )
    register(spark)
    rows = {r["k"]: r["score"] for r in spark.read.format("icemaint").load(loc).collect()}
    assert rows[100] == 1.5
    assert all(rows[k] is None for k in range(10))  # old files pad with NULL


def test_stream_reads_appends_and_skips_rewrites(spark, tmp_warehouse):
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    loc = os.path.join(tmp_warehouse, "ds_stream")
    t = _mk(spark, loc, n=50, per_file=25)
    register(spark)
    ckpt = os.path.join(tmp_warehouse, "ck")
    sink = os.path.join(tmp_warehouse, "sink")

    def run():
        q = (
            spark.readStream.format("icemaint")
            .option("path", loc)
            .option("starting_snapshot_id", "earliest")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    assert spark.read.parquet(sink).count() == 50
    # appends stream; the compaction rewrite must NOT re-stream rows
    t.append_dataframe(
        spark.createDataFrame([(500, "x"), (501, "y")], "k bigint, v string").coalesce(1)
    )
    CompactionRunner(
        spark,
        t,
        CompactionConfig(selection=SelectionStrategy.FULL, sort_order=(("k", False),)),
    ).execute()
    t.append_dataframe(
        spark.createDataFrame([(600, "z")], "k bigint, v string").coalesce(1)
    )
    run()
    assert spark.read.parquet(sink).count() == 53
    got = sorted(r["k"] for r in spark.read.parquet(sink).filter("k >= 500").collect())
    assert got == [500, 501, 600]


def test_batch_writer_appends_atomically(spark, tmp_warehouse):
    import pytest

    loc = os.path.join(tmp_warehouse, "ds_write")
    t = _mk(spark, loc, n=10, per_file=10)
    register(spark)
    df = spark.createDataFrame(
        [(100 + i, f"w{i}") for i in range(200)], "k bigint, v string"
    ).repartition(4)
    df.write.format("icemaint").mode("append").save(loc)
    t2 = Table.load(loc)
    assert t2.scan(spark).count() == 210
    snaps = t2.snapshots()
    assert snaps[-1]["operation"] == "append"  # one atomic commit
    # connector read round-trips the write
    assert spark.read.format("icemaint").load(loc).count() == 210
    # native scan and connector agree exactly
    a = sorted(tuple(r) for r in t2.scan(spark).collect())
    b = sorted(tuple(r) for r in spark.read.format("icemaint").load(loc).collect())
    assert a == b

    # guarded paths: overwrite and schema mismatch fail loudly
    with pytest.raises(Exception):
        df.write.format("icemaint").mode("overwrite").save(loc)
    bad = spark.createDataFrame([(1, 2.0)], "k bigint, wrong double")
    with pytest.raises(Exception):
        bad.write.format("icemaint").mode("append").save(loc)


# ---------------------------------------------------------------------------
# round 6: Arrow writer (no per-row Python), partitioned fanout append,
# and failOnDataLoss stream resume under snapshot expiry


def test_writer_is_arrow_batched_no_per_row_loop():
    """VERDICT r5 task 3: the write path consumes Arrow RecordBatches
    (DataSourceArrowWriter), never per-row dict churn."""
    import inspect

    from pyspark.sql.datasource import DataSourceArrowWriter

    from iceberg_compaction_spark.sources import datasource as ds

    assert issubclass(ds._BatchWriter, DataSourceArrowWriter)
    src = inspect.getsource(ds._BatchWriter)
    assert "for row in" not in src and "from_pylist" not in src


def test_arrow_writer_partitioned_append(spark, tmp_warehouse):
    """VERDICT r5 task 5: partitioned append through the connector —
    the caller derives the partition column Spark-side; tasks fan out
    one partition-pure file per value; commit stamps fi.partition."""
    from pyspark.sql import functions as F

    loc = os.path.join(tmp_warehouse, "ds_part_write")
    expr = "cast(k % 3 as string)"
    t = Table.create(loc, "k bigint, v string", partition={"field": "_part", "expr": expr})
    t.append_dataframe(
        spark.createDataFrame([(i, f"v{i}") for i in range(30)], "k bigint, v string")
    )
    register(spark)
    df = (
        spark.createDataFrame(
            [(100 + i, f"w{i}") for i in range(90)], "k bigint, v string"
        )
        .withColumn("_part", F.expr(expr))
        .repartition(2)
    )
    df.write.format("icemaint").mode("append").save(loc)
    t2 = Table.load(loc)
    assert t2.scan(spark).count() == 120
    snaps = t2.snapshots()
    assert snaps[-1]["operation"] == "append"
    # partition purity: every file of the append carries ONE value
    new_seq = t2.sequence_number
    new_files = [r for r in t2.files(content="data") if r["sequence_number"] == new_seq]
    assert new_files and all(r["partition"] in {"0", "1", "2"} for r in new_files)
    # connector read agrees with the native scan (both resolve _part off)
    a = sorted((r["k"], r["v"]) for r in t2.scan(spark).collect())
    b = sorted(
        (r["k"], r["v"]) for r in spark.read.format("icemaint").load(loc).collect()
    )
    assert a == b
    # partition pruning still works over the connector-written files
    pruned = t2.scan(spark, filter="_part = '1'")
    assert pruned.count() == sum(1 for i in range(30) if i % 3 == 1) + sum(
        1 for i in range(90) if (100 + i) % 3 == 1
    )

    # the guard: a write WITHOUT the derived column names the fix
    import pytest

    bad = spark.createDataFrame([(1, "x")], "k bigint, v string")
    with pytest.raises(Exception, match="withColumn|partition"):
        bad.write.format("icemaint").mode("append").save(loc)


def test_stream_fail_on_data_loss_option(spark, tmp_warehouse):
    """VERDICT r5 task 8: a checkpointed start snapshot expired from
    under the stream — default fails loudly; failOnDataLoss=false
    resumes from the earliest retained snapshot (expired range
    skipped, Kafka-style)."""
    import pytest

    from iceberg_compaction_spark.operators.maintenance import expire_snapshots

    loc = os.path.join(tmp_warehouse, "ds_loss")
    t = _mk(spark, loc, n=20, per_file=20)
    register(spark)
    ckpt = os.path.join(tmp_warehouse, "ck_loss")
    sink = os.path.join(tmp_warehouse, "sink_loss")

    def run(**opts):
        reader = (
            spark.readStream.format("icemaint")
            .option("path", loc)
            .option("starting_snapshot_id", "earliest")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    assert spark.read.parquet(sink).count() == 20
    # two more appends; expire everything but the newest → the
    # checkpointed offset's snapshot is gone
    t.append_dataframe(
        spark.createDataFrame([(100, "a")], "k bigint, v string").coalesce(1)
    )
    t.append_dataframe(
        spark.createDataFrame([(101, "b")], "k bigint, v string").coalesce(1)
    )
    expire_snapshots(t, retain_last=1, delete_files=False)
    with pytest.raises(Exception, match="failOnDataLoss|retained"):
        run()
    # the failed attempt must not have advanced the sink
    assert spark.read.parquet(sink).count() == 20
    run(failOnDataLoss="false")
    # the retained suffix streams; the expired gap (the two appends
    # whose diffs need expired manifests) is skipped, not duplicated
    n = spark.read.parquet(sink).count()
    assert n >= 20
    # a further append streams normally again
    t.append_dataframe(
        spark.createDataFrame([(102, "c")], "k bigint, v string").coalesce(1)
    )
    run(failOnDataLoss="false")
    rows = {r["k"] for r in spark.read.parquet(sink).collect()}
    assert 102 in rows
