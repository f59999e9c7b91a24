"""Metadata-count pushdown + stream-stream interval join."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_compaction_spark.operators.stats_agg import fast_count
from iceberg_compaction_spark.sources.generator import create_transcripts_table


def test_fast_count_metadata_only_and_hybrid(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "fc"), n_turns=10_000, n_convs=50,
        n_files=8, partitioned=True, ts_step_s=60,
    )
    # unfiltered: pure metadata
    res = fast_count(spark, t)
    assert res["count"] == 10_000 and res["scanned_files"] == 0
    assert res["metadata_files"] == len(t.files(content="data"))

    # day-aligned predicate: most files decided by metadata, the
    # boundary file scanned; result must equal the real filtered count
    all_ts = [r[0] for r in t.scan(spark).select("ts").orderBy("ts").collect()]
    cutoff = all_ts[len(all_ts) // 2].strftime("%Y-%m-%d %H:%M:%S")
    pred = f"ts < TIMESTAMP '{cutoff}'"
    expected = t.scan(spark).filter(pred).count()
    res = fast_count(spark, t, pred)
    assert res["count"] == expected
    assert res["metadata_files"] > 0  # whole days decided without a scan
    assert res["pruned_files"] > 0
    assert res["scanned_files"] < len(t.files(content="data"))

    # with deletes: falls back to the MoR scan and stays exact
    dels = t.scan(spark).filter(F.col("turn_idx") % 10 == 1).select("conv_id", "turn_idx")
    t.add_equality_deletes(dels, keys=["conv_id", "turn_idx"])
    expected2 = t.scan(spark).filter(pred).count()
    res2 = fast_count(spark, t, pred)
    assert res2["count"] == expected2 and res2["metadata_files"] == 0


def test_stream_interval_join_matches_batch(spark, tmp_warehouse):
    from iceberg_compaction_spark.streaming.joins import stream_interval_join

    lschema = T.StructType([
        T.StructField("user_id", T.LongType()), T.StructField("ts", T.TimestampType()),
        T.StructField("turn", T.LongType()),
    ])
    rschema = T.StructType([
        T.StructField("user_id", T.LongType()), T.StructField("ets", T.TimestampType()),
        T.StructField("tool_result", T.StringType()),
    ])
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    turns = [(u, base + dt.timedelta(minutes=m), u * 100 + m)
             for u in (1, 2) for m in (0, 5, 30)]
    tools = [
        (1, base + dt.timedelta(minutes=2), "ok@2"),      # joins turn@0 (within 10m)
        (1, base + dt.timedelta(minutes=29), "late@29"),  # joins turn@30? no: ets < ts
        (2, base + dt.timedelta(minutes=34), "ok@34"),    # joins turn@30
        (2, base + dt.timedelta(minutes=50), "orphan"),   # joins nothing
    ]
    lsrc, rsrc = os.path.join(tmp_warehouse, "l"), os.path.join(tmp_warehouse, "r")
    spark.createDataFrame(turns, lschema).write.parquet(lsrc)
    spark.createDataFrame(tools, rschema).write.parquet(rsrc)

    collected = []
    q = (
        stream_interval_join(
            spark.readStream.schema(lschema).parquet(lsrc),
            spark.readStream.schema(rschema).parquet(rsrc),
            lower_s=0, upper_s=600,
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .option("checkpointLocation", os.path.join(tmp_warehouse, "jckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["user_id"], r["turn"], r["tool_result"]) for r in collected)
    # batch-side truth with identical join condition
    ldf, rdf = spark.createDataFrame(turns, lschema), spark.createDataFrame(tools, rschema)
    cond = (
        (ldf["user_id"] == rdf["user_id"])
        & (rdf["ets"] >= ldf["ts"]) & (rdf["ets"] <= ldf["ts"] + F.expr("INTERVAL 600 SECONDS"))
    )
    exp = sorted(
        (r["user_id"], r["turn"], r["tool_result"])
        for r in ldf.join(rdf, cond).drop(rdf["user_id"]).collect()
    )
    assert got == exp and (1, 100, "ok@2") in got and (2, 230, "ok@34") in got
    assert not any(x[2] == "orphan" for x in got)
