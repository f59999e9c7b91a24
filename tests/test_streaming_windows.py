"""Event-time streaming: watermarked windows + stateful sessionization
(applyInPandasWithState), including state continuity across restarts."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import types as T

from iceberg_compaction_spark.streaming.windows import (
    stream_sessionize,
    windowed_turn_counts,
)

SCHEMA = T.StructType(
    [T.StructField("user_id", T.LongType()), T.StructField("ts", T.TimestampType())]
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12 + minute // 60, minute % 60, second)


def _write_batch(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, src: str, ckpt: str, sink: str, build):
    # foreachBatch sink: supports checkpoint recovery (memory does not)
    collected: list = []

    def _sink(df, _bid):
        collected.extend(df.collect())

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        build(stream)
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return collected


def test_windowed_counts_with_watermark(spark, tmp_warehouse):
    src = os.path.join(tmp_warehouse, "src")
    ckpt = os.path.join(tmp_warehouse, "ckpt")
    batch1 = [(1, _ts(m)) for m in (0, 1, 2, 11, 12)] + [(2, _ts(25))]
    _write_batch(spark, src, batch1)
    rows = _run_stream(
        spark, src, ckpt, "win1",
        lambda s: windowed_turn_counts(s, window="10 minutes", watermark="5 minutes"),
    )
    got = {(r["win_start_epoch"], r["user_id"]): r["n_events"] for r in rows}
    base = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {
        (base, 1): 3,
        (base + 600, 1): 2,
        (base + 1200, 2): 1,
    }

    # batch 2: a current event plus one FAR-late event (older than
    # max_event_time − watermark persisted in the checkpoint) — the
    # late one must be dropped, not resurrect the evicted window
    _write_batch(spark, src, [(2, _ts(26)), (1, _ts(1, 30))])
    rows2 = _run_stream(
        spark, src, ckpt, "win2",
        lambda s: windowed_turn_counts(s, window="10 minutes", watermark="5 minutes"),
    )
    got2 = {(r["win_start_epoch"], r["user_id"]): r["n_events"] for r in rows2}
    assert (base + 1200, 2) in got2 and got2[(base + 1200, 2)] == 2
    assert (base, 1) not in got2  # late event dropped by the watermark


def test_stream_sessionize_stateful_across_batches(spark, tmp_warehouse):
    gap = 600  # 10 min
    src = os.path.join(tmp_warehouse, "ssrc")
    ckpt = os.path.join(tmp_warehouse, "sckpt")
    # user 1: events at 0,5 min (one session), then 40 min (> gap: new)
    # user 2: events at 0 min only
    _write_batch(spark, src, [(1, _ts(0)), (1, _ts(5)), (1, _ts(40)), (2, _ts(0))])
    rows = _run_stream(
        spark, src, ckpt, "sess1", lambda s: stream_sessionize(s, gap_s=gap)
    )
    by_key = {(r["user_id"], r["session_seq"]): r for r in rows}
    assert by_key[(1, 0)]["closed"] and by_key[(1, 0)]["n_events"] == 2
    assert not by_key[(1, 1)]["closed"] and by_key[(1, 1)]["n_events"] == 1
    assert not by_key[(2, 0)]["closed"] and by_key[(2, 0)]["n_events"] == 1

    # batch 2 continues across the restart: user 1 extends the OPEN
    # session (within gap of 40min), user 2 starts a new one (> gap)
    _write_batch(spark, src, [(1, _ts(45)), (2, _ts(120))])
    rows2 = _run_stream(
        spark, src, ckpt, "sess2", lambda s: stream_sessionize(s, gap_s=gap)
    )
    by_key2 = {(r["user_id"], r["session_seq"]): r for r in rows2}
    # same session id continues with accumulated count — state survived
    assert not by_key2[(1, 1)]["closed"] and by_key2[(1, 1)]["n_events"] == 2
    assert by_key2[(2, 0)]["closed"] and by_key2[(2, 0)]["n_events"] == 1
    assert not by_key2[(2, 1)]["closed"] and by_key2[(2, 1)]["n_events"] == 1
