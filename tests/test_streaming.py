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


DOC_DDL = "doc_id BIGINT, text STRING"
INDEX_DDL = "doc_id BIGINT, band INT, signature STRING"


def test_stream_dedup_append_rejects_dups_across_batches(spark, tmp_warehouse):
    """Batch 2's duplicates of batch-1 docs are dropped by the index
    probe alone — the corpus table is never rescanned — and the index
    absorbs each batch's survivors."""
    from iceberg_compaction_spark.streaming.ingest import stream_dedup_append

    t = Table.create(os.path.join(tmp_warehouse, "corpus"), DOC_DDL)
    idx = Table.create(os.path.join(tmp_warehouse, "index"), INDEX_DDL)
    src = os.path.join(tmp_warehouse, "docs_in")
    ckpt = os.path.join(tmp_warehouse, "dedup_ckpt")
    schema = "doc_id long, text string"

    batch1 = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely unrelated text about spark dataframes and shuffles"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),  # intra dup
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_dedup_append(stream, t, idx, ckpt, bands=4)
    q.awaitTermination(120)

    got1 = sorted(r["doc_id"] for r in t.scan(spark).collect())
    assert got1 == [1, 2]
    assert idx.scan(spark).count() == 2 * 4  # bands rows per survivor

    batch2 = [
        (10, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
        (11, "a brand new document nothing in the corpus resembles at all"),
    ]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_dedup_append(stream, t, idx, ckpt, bands=4)
    q.awaitTermination(120)

    got2 = sorted(r["doc_id"] for r in t.scan(spark).collect())
    assert got2 == [1, 2, 11]
    assert idx.scan(spark).count() == 3 * 4


def test_stream_dedup_append_repairs_index_after_crash(spark, tmp_warehouse):
    """Corpus-committed-but-index-missed is the designed crash window:
    a corpus snapshot carrying the stream summary exists, the index
    never recorded it. The next stream run's catch-up loop recomputes
    that snapshot's signatures from the committed rows and repairs the
    index without re-appending the data."""
    import hashlib

    from iceberg_compaction_spark.streaming.ingest import stream_dedup_append

    t = Table.create(os.path.join(tmp_warehouse, "corpus2"), DOC_DDL)
    idx = Table.create(os.path.join(tmp_warehouse, "index2"), INDEX_DDL)
    ckpt = os.path.join(tmp_warehouse, "dedup_ckpt2")
    stream_key = hashlib.md5(
        (os.path.abspath(ckpt) + "|dedup").encode()
    ).hexdigest()[:12]

    # simulate the dead run: survivors committed to the corpus with the
    # stream summary, crash before the index commit
    schema = "doc_id long, text string"
    committed = spark.createDataFrame(
        [(7, "rows a dead run committed before its index write crashed")],
        schema,
    )
    infos = t.write_data_files(committed)
    t.commit(
        "append",
        added=infos,
        extra_summary={"stream_key": stream_key, "stream_batch_id": 0},
    )
    assert idx.scan(spark).count() == 0

    # replayed batch 0 (same data): corpus write must be skipped, the
    # index must absorb snapshot 0's signatures
    src = os.path.join(tmp_warehouse, "docs_in2")
    committed.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_dedup_append(stream, t, idx, ckpt, bands=4)
    q.awaitTermination(120)

    assert t.scan(spark).count() == 1  # no double append
    rows = idx.scan(spark).collect()
    assert {r["doc_id"] for r in rows} == {7}
    assert len(rows) == 4

    # and a later duplicate of the repaired doc is now rejected
    spark.createDataFrame(
        [(9, "rows a dead run committed before its index write crashed")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_dedup_append(stream, t, idx, ckpt, bands=4)
    q.awaitTermination(120)
    assert sorted(r["doc_id"] for r in t.scan(spark).collect()) == [7]


def test_dedup_index_is_engine_maintainable(spark, tmp_warehouse):
    """The LSH index is just a table: after several streaming batches
    leave it as many small files, the engine's own compaction folds
    them — and the index keeps rejecting duplicates afterwards."""
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.streaming.ingest import stream_dedup_append

    t = Table.create(os.path.join(tmp_warehouse, "corpus3"), DOC_DDL)
    idx = Table.create(os.path.join(tmp_warehouse, "index3"), INDEX_DDL)
    src = os.path.join(tmp_warehouse, "docs_in3")
    ckpt = os.path.join(tmp_warehouse, "dedup_ckpt3")
    schema = "doc_id long, text string"

    texts = [
        "alpha document about compaction scheduling and manifests",
        "beta document covering streaming watermarks and sessions",
        "gamma document on bloom filters and point lookup pruning",
    ]
    for i, txt in enumerate(texts):
        spark.createDataFrame([(i, txt)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        stream_dedup_append(stream, t, idx, ckpt, bands=4).awaitTermination(120)

    n_files_before = len(idx.files(content="data"))
    assert n_files_before >= 3  # one commit per batch -> small files
    CompactionRunner(
        spark,
        idx,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.SINGLE,
            sort_order=(("signature", False),),
        ),
    ).execute()
    assert len(idx.files(content="data")) < n_files_before
    assert idx.scan(spark).count() == 3 * 4

    # a duplicate of a pre-compaction doc is still rejected
    spark.createDataFrame([(99, texts[0])], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_dedup_append(stream, t, idx, ckpt, bands=4).awaitTermination(120)
    assert sorted(r["doc_id"] for r in t.scan(spark).collect()) == [0, 1, 2]


def test_stream_enrich_asof_picks_version_at_event_time(spark, tmp_warehouse):
    """Point-in-time enrichment: events pick the dimension row that was
    latest AT THEIR OWN ts (not the newest row), and a dimension update
    between batches applies to the next batch only."""
    from iceberg_compaction_spark.streaming.ingest import stream_enrich_asof

    dim = Table.create(
        os.path.join(tmp_warehouse, "dim"), "key BIGINT, ts TIMESTAMP, rate DOUBLE"
    )
    tgt = Table.create(
        os.path.join(tmp_warehouse, "tgt"),
        "key BIGINT, ts TIMESTAMP, amt DOUBLE, ts_r TIMESTAMP, rate_r DOUBLE",
    )
    dim.append_dataframe(
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-10 00:00:00", 2.0)],
            "key long, ts string, rate double",
        ).selectExpr("key", "CAST(ts AS TIMESTAMP) ts", "rate").coalesce(1)
    )

    src = os.path.join(tmp_warehouse, "ev_in")
    ckpt = os.path.join(tmp_warehouse, "enrich_ckpt")
    schema = "key long, ts timestamp, amt double"
    batch1 = spark.createDataFrame(
        [(1, "2024-01-05 12:00:00", 10.0), (1, "2024-01-11 00:00:00", 20.0)],
        "key long, ts string, amt double",
    ).selectExpr("key", "CAST(ts AS TIMESTAMP) ts", "amt")
    batch1.coalesce(1).write.mode("append").parquet(src)
    q = stream_enrich_asof(
        spark.readStream.schema(schema).parquet(src), dim, tgt, by="key",
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    got = {r["amt"]: r["rate_r"] for r in tgt.scan(spark).collect()}
    assert got == {10.0: 1.0, 20.0: 2.0}  # each event at ITS time's rate

    # dimension evolves; the next batch sees the new version
    dim.append_dataframe(
        spark.createDataFrame(
            [(1, "2024-01-15 00:00:00", 3.0)], "key long, ts string, rate double"
        ).selectExpr("key", "CAST(ts AS TIMESTAMP) ts", "rate").coalesce(1)
    )
    spark.createDataFrame(
        [(1, "2024-01-20 00:00:00", 30.0)], "key long, ts string, amt double"
    ).selectExpr("key", "CAST(ts AS TIMESTAMP) ts", "amt").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = stream_enrich_asof(
        spark.readStream.schema(schema).parquet(src), dim, tgt, by="key",
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)
    got = {r["amt"]: r["rate_r"] for r in tgt.scan(spark).collect()}
    assert got == {10.0: 1.0, 20.0: 2.0, 30.0: 3.0}
