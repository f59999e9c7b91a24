"""Stream-stream joins with event-time bounds.

Enriching a live turn stream with a second event stream (tool results,
moderation verdicts) is a STREAM-STREAM join: both sides buffer state
until the watermark proves no matching row can still arrive. The
operator below wraps Structured Streaming's interval-join contract —
equi-key plus an event-time range — which is what lets Spark expire
join state instead of buffering both streams forever (state size is
bounded by rate × (interval + watermark), independent of stream
length: the property that matters at 10^12 events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ets",
    lower_s: int = 0,
    upper_s: int = 600,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key`` where ``right_ts`` lands in
    [left_ts + lower_s, left_ts + upper_s]. Watermarks on BOTH sides
    bound the join state (and are required for outer modes, where a
    left row emits its null-match only once the watermark passes the
    upper bound). Column names must not collide apart from ``key``."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] + F.expr(f"INTERVAL {int(lower_s)} SECONDS"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {int(upper_s)} SECONDS"))
    )
    joined = lw.join(rw, cond, how)
    return joined.drop(rw[key])
