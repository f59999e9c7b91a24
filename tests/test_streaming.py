"""Streaming ingest → small files → incremental compaction trigger."""

from __future__ import annotations

import os

from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, transcripts_df
from iceberg_compaction_spark.sources.table import Table
from iceberg_compaction_spark.streaming.ingest import compact_if_needed, stream_append


def test_stream_append_and_compact(spark, tmp_warehouse):
    t = Table.create(os.path.join(tmp_warehouse, "s1"), TRANSCRIPT_DDL)

    # stage rows as files, stream them in with availableNow
    src_dir = os.path.join(tmp_warehouse, "incoming")
    data = transcripts_df(spark, 2000, 10)
    data.repartition(4).write.parquet(src_dir)
    stream = spark.readStream.schema(data.schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = stream_append(stream, t, os.path.join(tmp_warehouse, "ckpt"))
    q.awaitTermination(120)

    assert t.scan(spark).count() == 2000
    assert len(t.snapshots()) >= 2  # one commit per micro-batch

    cfg = CompactionConfig(
        selection=SelectionStrategy.SMALL_FILES,
        small_file_threshold_bytes=32 << 20,
        group_target_size_bytes=64 << 20,
    )
    assert compact_if_needed(spark, t, cfg, min_small_files=2) is True
    assert t.scan(spark).count() == 2000
    assert len(t.files(content="data")) < 4 + 1
