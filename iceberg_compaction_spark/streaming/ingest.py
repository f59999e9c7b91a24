"""Structured-Streaming ingestion into the table format.

The reference is batch-only — its "streaming" means streamed bounded-
memory execution (``README.md:49-50``), not event-time processing
(SURVEY.md §2.9). This module is our engine's forward extension: a
micro-batch ingest that *produces* the small-file problem compaction
solves, plus an ``availableNow`` incremental-compaction trigger reusing
the snapshot-anchor idea (``crates/planner/src/metadata.rs:16-48``).

Each micro-batch appends one commit via ``foreachBatch`` — the commit
path is the same atomic snapshot protocol as batch writes, so readers
never observe a partial batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from iceberg_compaction_spark.sources.table import Table


def _pending_sort_key(pending_tuple):
    """Order pending (batch_id, snapshot_dict) records by batch id
    ALONE: tuple comparison would fall through to dict < dict on equal
    ids (two streams sharing a checkpoint dir, a manually replayed
    commit) and raise TypeError, wedging the stream."""
    return pending_tuple[0]


def _stream_guard(table: Table, stream_key: str):
    """Exactly-once bookkeeping for a streaming sink: the atomic record
    is the (stream_key, batch_id) snapshot summary, but summaries die
    with snapshot expiry — so the last committed id is ALSO persisted
    as a table property (``stream.<key>.last-batch-id``), which
    run_maintenance/expire never touches. Restart reads the max of
    both, so the dedup guarantee survives aggressive expiry; a crash
    in the tiny window between commit and property write is still
    covered by the (not-yet-expired) summary."""
    prop_key = f"stream.{stream_key}.last-batch-id"

    def last_committed() -> int:
        last = int(table.get_property(prop_key, -1))
        for s in table.snapshots():
            sm = s.get("summary", {})
            if sm.get("stream_key") == stream_key:
                last = max(last, int(sm.get("stream_batch_id", -1)))
        return last

    def record(batch_id: int) -> None:
        # best-effort durability: the snapshot summary (already
        # committed) is the atomic record — a lock-contended property
        # write must NOT fail the streaming query after the data
        # landed; the next successful record() catches the mark up
        try:
            table.set_property(prop_key, int(batch_id))
        except Exception:
            from iceberg_compaction_spark.metrics import GLOBAL

            GLOBAL.inc("stream.batch_mark_write_failed")

    return last_committed, record


def make_idempotent_batch_writer(table: Table, checkpoint_dir: str):
    """foreachBatch callable committing each micro-batch exactly once:
    (stream_key, batch_id) rides in the snapshot summary AND a table
    property (expiry-durable); batch ids at or below the last committed
    one are replays and are skipped. The last-committed id is read once
    (restart) and tracked in memory afterwards."""
    import hashlib
    import os

    stream_key = hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]
    last_committed, record = _stream_guard(table, stream_key)
    state = {"last": last_committed()}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state["last"]:
            return  # replayed micro-batch: already a committed snapshot
        if batch_df.isEmpty():
            return
        infos = table.write_data_files(batch_df)
        table.commit(
            "append",
            added=infos,
            extra_summary={"stream_key": stream_key, "stream_batch_id": int(batch_id)},
        )
        record(batch_id)
        state["last"] = batch_id

    return write_batch


def stream_append(stream_df: DataFrame, table: Table, checkpoint_dir: str, trigger: dict | None = None):
    """Attach a streaming writer that commits every micro-batch as one
    snapshot, exactly once. Returns the StreamingQuery. ``trigger``
    defaults to availableNow (drain-and-stop; right for incremental
    ingest jobs).

    Idempotence: foreachBatch is at-least-once — a micro-batch replayed
    after a failure between the table commit and the streaming
    checkpoint would otherwise append twice. Each commit records
    (stream_key, batch_id) in its snapshot summary (the Iceberg
    streaming-sink pattern); replayed batch ids are skipped."""
    write_batch = make_idempotent_batch_writer(table, checkpoint_dir)

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def stream_upsert(
    stream_df: DataFrame,
    table: Table,
    keys,
    checkpoint_dir: str,
    precedence: str | None = None,
    trigger: dict | None = None,
):
    """Streaming MERGE sink: every micro-batch upserts into the table
    via ``merge_into`` (equality-delete + new data files, ONE atomic
    commit per batch), keyed dedup inside the batch via ``precedence``.
    Exactly-once by the same (stream_key, batch_id) guard as
    ``stream_append`` — snapshot summary plus an expiry-durable table
    property — so a replayed batch after a failure between commit and
    checkpoint is skipped and an upsert never double-applies, even
    when maintenance expired the carrying snapshot in between. This is
    the CDC-consumer shape: readStream a changelog, stream_upsert it
    into a serving table."""
    import hashlib
    import os

    from iceberg_compaction_spark.operators.merge_into import merge_into

    stream_key = hashlib.md5(
        (os.path.abspath(checkpoint_dir) + "|upsert").encode()
    ).hexdigest()[:12]
    last_committed, record = _stream_guard(table, stream_key)
    state = {"last": last_committed()}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state["last"]:
            return
        if batch_df.isEmpty():
            return
        merge_into(
            table,
            batch_df,
            list(keys),
            precedence=precedence,
            extra_summary={"stream_key": stream_key, "stream_batch_id": int(batch_id)},
        )
        record(batch_id)
        state["last"] = batch_id

    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def stream_dedup_append(
    stream_df: DataFrame,
    table: Table,
    index_table: Table,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    hash_fn: str = "md5",
    trigger: dict | None = None,
):
    """Streaming ingest with inline near-dup rejection: every
    micro-batch is deduped against the accumulated corpus via its
    persisted MinHash-LSH index (``incremental_minhash_dedup`` — the
    corpus text is never rescanned), survivors are committed to
    ``table``, and their band signatures are committed to
    ``index_table`` so later batches see them.

    Two tables, one exactly-once guarantee: each table carries its own
    (stream_key, batch_id) guard. The corpus commits FIRST; the index
    then absorbs every corpus snapshot it is behind on by re-reading
    the committed rows (``incremental_scan`` of that snapshot) and
    recomputing their signatures — so a crash between the two commits
    costs nothing: the replayed batch skips the corpus write and the
    index catch-up loop repairs the delta from durable state. (Index
    first would be WRONG: a replay would find the batch's own
    signatures in the index and drop every row — data loss.)

    ``index_table`` schema must be ``{id_col} BIGINT, band INT,
    signature STRING``."""
    import hashlib
    import os

    from iceberg_compaction_spark.operators.dedup import (
        incremental_minhash_dedup_indexed,
        minhash_index,
    )

    stream_key = hashlib.md5(
        (os.path.abspath(checkpoint_dir) + "|dedup").encode()
    ).hexdigest()[:12]
    corpus_last, corpus_record = _stream_guard(table, stream_key)
    index_last, index_record = _stream_guard(index_table, stream_key)
    state = {"corpus": corpus_last(), "index": index_last()}

    def _absorb_pending(spark) -> None:
        """Append to the index the signatures of every corpus snapshot
        of this stream the index has not recorded yet (normal path:
        exactly one; crash-recovery path: the one a dead run left)."""
        pending = sorted(
            (
                (int(s["summary"]["stream_batch_id"]), s)
                for s in table.snapshots()
                if s.get("summary", {}).get("stream_key") == stream_key
                and int(s["summary"].get("stream_batch_id", -1)) > state["index"]
            ),
            key=_pending_sort_key,
        )
        for bid, snap in pending:
            rows = table.incremental_scan(
                spark, snap["parent_id"], snap["snapshot_id"],
                columns=[id_col, text_col],
            )
            delta = minhash_index(
                rows, id_col, text_col, n, bands, rows_per_band, hash_fn
            )
            infos = index_table.write_data_files(delta)
            if infos:
                index_table.commit(
                    "append",
                    added=infos,
                    extra_summary={
                        "stream_key": stream_key,
                        "stream_batch_id": bid,
                    },
                )
            index_record(bid)
            state["index"] = bid

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id > state["corpus"]:
            if batch_df.isEmpty():
                return
            # bucket-pruned table probe when the index table carries a
            # signature bucket spec; plain full-index probe otherwise —
            # identical results either way
            survivors, _delta = incremental_minhash_dedup_indexed(
                spark,
                batch_df,
                index_table,
                id_col,
                text_col,
                n,
                bands,
                rows_per_band,
                hash_fn,
            )
            infos = table.write_data_files(survivors)
            if infos:
                table.commit(
                    "append",
                    added=infos,
                    extra_summary={
                        "stream_key": stream_key,
                        "stream_batch_id": int(batch_id),
                    },
                )
            corpus_record(batch_id)
            state["corpus"] = batch_id
        _absorb_pending(spark)

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def stream_replicate(
    spark,
    src: Table,
    target: Table,
    keys,
    checkpoint_dir: str,
    trigger: dict | None = None,
    follow_schema: bool = False,
):
    """Continuous CDC replication: an ``icemaint`` readStream on the
    SOURCE table is used purely as a change TRIGGER — each micro-batch
    invokes ``operators/replicate.apply_changelog``, which reads its
    own exact changelog window behind its crash-safe committed anchor.
    The batch's rows are never consumed, so streaming replay,
    reordering, or a missed trigger can neither double- nor
    skip-apply: every apply folds ALL outstanding source changes up to
    the source's current snapshot (including delete-only commits the
    append-only stream itself would not surface; they ride along with
    the next triggering commit or the availableNow drain).

    Returns the StreamingQuery. Default trigger is ``availableNow``
    (drain pending changes and stop); pass e.g.
    ``{"processingTime": "30 seconds"}`` for continuous tailing.
    ``follow_schema`` forwards to ``apply_changelog`` — each apply
    then replays source schema evolution on the target first."""
    from iceberg_compaction_spark.operators.replicate import apply_changelog
    from iceberg_compaction_spark.sources.datasource import register

    register(spark)
    keys = [keys] if isinstance(keys, str) else list(keys)

    def apply_batch(batch_df, batch_id: int) -> None:
        # rows ignored: apply_changelog pulls the exact window itself
        apply_changelog(
            batch_df.sparkSession, src, target, keys,
            follow_schema=follow_schema,
        )

    stream = (
        spark.readStream.format("icemaint")
        .option("path", src.location)
        .option("starting_snapshot_id", "earliest")
        .load()
    )
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply_batch)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def stream_rollup(
    spark,
    src: Table,
    rollup: Table,
    group_by,
    aggs: dict,
    checkpoint_dir: str,
    trigger: dict | None = None,
):
    """Continuous materialized-rollup maintenance — ``stream_replicate``
    for aggregates: an ``icemaint`` readStream on the SOURCE is used
    purely as a change TRIGGER; each micro-batch invokes
    ``operators/rollup.refresh_rollup``, which reads its own exact
    window (appended files, or the signed changelog for row-set
    changes) behind the crash-safe committed anchor. Batch rows are
    never consumed, so replay / reorder / missed triggers can neither
    double-fold nor skip — every refresh converges the rollup to the
    source's current snapshot.

    Returns the StreamingQuery. Default trigger is ``availableNow``
    (drain pending changes and stop); pass e.g.
    ``{"processingTime": "30 seconds"}`` for continuous tailing."""
    from iceberg_compaction_spark.operators.rollup import refresh_rollup
    from iceberg_compaction_spark.sources.datasource import register

    register(spark)
    group_by = [group_by] if isinstance(group_by, str) else list(group_by)

    def refresh_batch(batch_df, batch_id: int) -> None:
        # rows ignored: refresh_rollup pulls the exact window itself
        refresh_rollup(batch_df.sparkSession, src, rollup, group_by, aggs)

    stream = (
        spark.readStream.format("icemaint")
        .option("path", src.location)
        .option("starting_snapshot_id", "earliest")
        .load()
    )
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(refresh_batch)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def stream_ann(
    spark,
    src: Table,
    index: Table,
    checkpoint_dir: str,
    trigger: dict | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Continuous ANN-index maintenance — ``stream_rollup`` for the
    persisted IVF index: an ``icemaint`` readStream on the vector
    SOURCE table is used purely as a change TRIGGER; each micro-batch
    invokes ``operators/ann_index.ivf_index_refresh``, which reads its
    own exact window behind the index's crash-safe committed anchor
    (appends absorb as O(increment) assign+append at the frozen
    centroids; row-set changes reassign the current snapshot). Batch
    rows are never consumed, so replay / reorder / missed triggers can
    neither double-index nor skip — every refresh converges the index
    to the source's current snapshot.

    Returns the StreamingQuery. Default trigger is ``availableNow``
    (drain pending changes and stop); pass e.g.
    ``{"processingTime": "30 seconds"}`` for continuous tailing."""
    from iceberg_compaction_spark.operators.ann_index import ivf_index_refresh
    from iceberg_compaction_spark.sources.datasource import register

    register(spark)

    def refresh_batch(batch_df, batch_id: int) -> None:
        # rows ignored: ivf_index_refresh pulls the exact window itself
        ivf_index_refresh(
            batch_df.sparkSession, index, src, id_col=id_col, vec_col=vec_col
        )

    stream = (
        spark.readStream.format("icemaint")
        .option("path", src.location)
        .option("starting_snapshot_id", "earliest")
        .load()
    )
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(refresh_batch)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def stream_enrich_asof(
    stream_df: DataFrame,
    dim_table: Table,
    target: Table,
    by,
    checkpoint_dir: str,
    ts_col: str = "ts",
    trigger: dict | None = None,
):
    """Streaming point-in-time enrichment — the slowly-changing-
    dimension consumer shape: every micro-batch is as-of joined
    (``operators/asof.asof_join``, backward) against the dimension
    table's CURRENT snapshot, so each event picks up the dimension row
    that was latest at the event's own timestamp, and the enriched
    rows append to ``target`` exactly once (same (stream_key,
    batch_id) guard as ``stream_append``).

    The dimension is re-read per batch — it is snapshot-pinned per
    micro-batch, so a dimension update between batches takes effect on
    the next batch, never mid-batch. ``target``'s schema must be the
    stream schema plus the dimension payload columns suffixed ``_r``
    (the as-of join's output shape)."""
    import hashlib
    import os

    from iceberg_compaction_spark.operators.asof import asof_join

    stream_key = hashlib.md5(
        (os.path.abspath(checkpoint_dir) + "|enrich").encode()
    ).hexdigest()[:12]
    last_committed, record = _stream_guard(target, stream_key)
    state = {"last": last_committed()}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= state["last"]:
            return
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        dim = dim_table.scan(spark)
        enriched = asof_join(batch_df, dim, by=by, ts_col=ts_col)
        infos = target.write_data_files(enriched)
        if infos:
            target.commit(
                "append",
                added=infos,
                extra_summary={
                    "stream_key": stream_key,
                    "stream_batch_id": int(batch_id),
                },
            )
        record(batch_id)
        state["last"] = batch_id

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def compact_if_needed(spark, table: Table, config=None, min_small_files: int = 8) -> bool:
    """Incremental-compaction trigger: run a compaction only when the
    current snapshot holds at least ``min_small_files`` files under the
    small-file threshold. The snapshot pin in the runner plays the role
    of the reference's SnapshotAnchor — work already rewritten is not
    revisited because rewritten files leave the manifest."""
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    config = config or CompactionConfig(selection=SelectionStrategy.SMALL_FILES)
    small = [
        f
        for f in table.files(content="data")
        if f["size_bytes"] <= config.small_file_threshold_bytes
    ]
    if len(small) < min_small_files:
        return False
    CompactionRunner(spark, table, config).execute()
    return True
