"""Round-4: streaming MERGE sink (exactly-once upserts per
micro-batch) and the one-call maintenance orchestrator."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_compaction_spark.sources.table import Table
from iceberg_compaction_spark.streaming.ingest import (
    make_idempotent_batch_writer,
    stream_upsert,
)


def test_stream_upsert_merges_batches(spark, tmp_warehouse):
    src_dir = os.path.join(tmp_warehouse, "src")
    ckpt = os.path.join(tmp_warehouse, "ckpt")
    loc = os.path.join(tmp_warehouse, "serving")
    schema = "k bigint, v string, seq bigint"
    t = Table.create(loc, schema)
    t.append_dataframe(
        spark.createDataFrame([(1, "old1", 0), (2, "old2", 0)], schema)
    )
    # two part-files at the SOURCE ROOT (the file stream source does
    # not recurse) → two micro-batches of CDC rows: update k=1,
    # insert k=9 (both k=9 versions share one file so within-batch
    # precedence dedup decides, independent of batch order)
    import glob
    import shutil

    for i, batch in enumerate(
        [[(1, "new1", 1)], [(9, "new9", 1), (9, "new9b", 2)]]
    ):
        tmp = os.path.join(tmp_warehouse, f"stage{i}")
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(tmp)
        os.makedirs(src_dir, exist_ok=True)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src_dir, f"batch{i}.parquet"))
    stream = (
        spark.readStream.schema(T.StructType.fromDDL(schema))
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_upsert(stream, t, keys=["k"], checkpoint_dir=ckpt, precedence="seq")
    q.awaitTermination(120)
    rows = {r["k"]: r["v"] for r in t.scan(spark).collect()}
    # upsert semantics: k=1 replaced, k=2 untouched, k=9 latest-wins inserted
    assert rows == {1: "new1", 2: "old2", 9: "new9b"}
    # every merge commit carries the stream guard
    merged = [
        s["summary"] for s in t.snapshots() if s["operation"] == "merge"
    ]
    assert merged and all("stream_batch_id" in m for m in merged)


def test_stream_upsert_replay_is_skipped(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "replay")
    schema = "k bigint, v string, seq bigint"
    t = Table.create(loc, schema)
    from iceberg_compaction_spark.operators.merge_into import merge_into

    # simulate the foreachBatch guard directly: a committed batch id
    # must be skipped on replay
    merge_into(
        t, spark.createDataFrame([(1, "a", 1)], schema), ["k"],
        extra_summary={"stream_key": "deadbeef0000", "stream_batch_id": 5},
    )
    # a NEW writer for the same checkpoint resumes the high-water mark
    import iceberg_compaction_spark.streaming.ingest as ing

    writer = make_idempotent_batch_writer(t, "/tmp/ckpt-x")  # append writer API check
    assert callable(writer)
    # upsert guard: rebuild state from snapshots
    sigs = [s["summary"].get("stream_batch_id") for s in t.snapshots()
            if s["summary"].get("stream_key") == "deadbeef0000"]
    assert sigs == [5]


def test_run_maintenance_orchestrates(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.maintenance import run_maintenance

    loc = os.path.join(tmp_warehouse, "maint")
    t = Table.create(loc, "k bigint, v string")
    # many small files + an equality delete → 'full' or 'major' action
    for i in range(6):
        t.append_dataframe(
            spark.range(i * 100, (i + 1) * 100).selectExpr("id as k", "'x' as v")
        )
    t.add_equality_deletes(
        spark.range(50).select(F.col("id").alias("k")), ["k"]
    )
    n_before = t.scan(spark).count()
    res = run_maintenance(spark, t, retain_last=1)
    assert res["recommendation"]["action"] != "none"
    assert res["compaction"]["bins_executed"] >= 1
    assert res["expired_snapshots"] > 0
    # content preserved, deletes folded in, orphans gone
    assert t.scan(spark).count() == n_before == 550
    assert not t.files(content="eq_del")
    # a second pass is a no-op recommendation
    res2 = run_maintenance(spark, t, retain_last=1)
    assert res2["recommendation"]["action"] == "none"
    assert "compaction" not in res2
