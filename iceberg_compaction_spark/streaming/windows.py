"""Event-time streaming operators: watermarked window aggregation and a
custom stateful sessionizer.

The reference is batch-only (SURVEY.md §2.9); these extend the engine
along the Structured Streaming axis the way a transcripts pipeline
needs it:

  * ``windowed_turn_counts`` — tumbling/sliding event-time windows with
    a watermark bounding state for late data: the canonical
    ``readStream → withWatermark → groupBy(window(...)) → agg`` shape.
    Spark's own streaming state store handles retraction/expiry.
  * ``stream_sessionize`` — gap-based sessions as a CUSTOM stateful
    operator via ``applyInPandasWithState`` (the escape hatch for
    semantics ``window()`` can't express): per key, state carries the
    open session (start, last_ts, count, seq); a batch's events extend
    or close sessions; closed sessions emit immediately, the open one
    emits with ``closed = false`` each batch (update semantics). State
    survives across micro-batches through the checkpoint, so a session
    spanning batches keeps one id.

Batch-parity: ``stream_sessionize`` over any prefix-partitioned arrival
order produces the same *closed* sessions as the batch sessionization
query (queries.py::q_sessionization) — pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def windowed_turn_counts(
    stream_df: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str | None = "user_id",
) -> DataFrame:
    """Per-window (optionally per-key) event counts with a watermark:
    events later than ``watermark`` past the max seen event time are
    dropped and window state older than that is evicted — bounded state
    at any input volume."""
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    keys = [win] + ([F.col(key_col)] if key_col else [])
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_epoch"),
            F.unix_timestamp(F.col("window.end")).alias("win_end_epoch"),
            *([F.col(key_col)] if key_col else []),
            "n_events",
        )
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_seq bigint, n_events bigint, "
    "start_epoch bigint, end_epoch bigint, closed boolean"
)
SESSION_STATE_SCHEMA = "sess_start bigint, last_ts bigint, n bigint, seq bigint"


def stream_sessionize(
    stream_df: DataFrame,
    gap_s: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization as a stateful streaming operator.

    Emits one row per session per batch: sessions closed by a > gap_s
    silence within or across batches (``closed = true``, final), plus
    the still-open session (``closed = false``, refined next batch) —
    use output mode ``update``. Requires each key's events to arrive in
    event-time order across batches (true for ingest-time streams);
    within a batch, order is normalized by sorting.
    """

    def fn(key, pdf_iter, state):
        import pandas as pd

        (uid,) = key
        if state.exists:
            sess_start, last_ts, n, seq = state.get
        else:
            sess_start = last_ts = None
            n = 0
            seq = 0
        out = []
        # drain ALL Arrow chunks before sorting: a key whose batch spans
        # multiple chunks (>~10k rows) arrives as several pdfs in
        # unspecified relative order — sorting per chunk would mis-split
        # sessions at chunk boundaries
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            all_ts = pd.concat([c[ts_col] for c in chunks], ignore_index=True)
            ts_vals = sorted(int(v) for v in (all_ts.astype("int64") // 1_000_000_000))
            for t in ts_vals:
                if last_ts is None:
                    sess_start, last_ts, n = t, t, 1
                elif t - last_ts > gap_s:
                    out.append((uid, seq, n, sess_start, last_ts, True))
                    seq += 1
                    sess_start, last_ts, n = t, t, 1
                else:
                    last_ts = t
                    n += 1
        if last_ts is not None:
            state.update((int(sess_start), int(last_ts), int(n), int(seq)))
            out.append((uid, seq, n, sess_start, last_ts, False))
        return iter(
            [
                pd.DataFrame(
                    out,
                    columns=[
                        "user_id",
                        "session_seq",
                        "n_events",
                        "start_epoch",
                        "end_epoch",
                        "closed",
                    ],
                )
            ]
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
