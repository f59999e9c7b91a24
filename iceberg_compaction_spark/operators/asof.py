"""As-of join: attach to each left row the temporally closest right
row per key — the point-in-time lookup (latest telemetry reading at
event time, latest model version at sample time) every event pipeline
needs and Spark's DataFrame API lacks (the brief's canonical
"custom operator" example; DuckDB ships it natively as ASOF JOIN,
which is exactly what the driver oracle runs).

Spark-first shape — the union-tag trick, NOT a join:
  * union left (tag 1) and right (tag 0) rows into one frame,
  * ONE shuffle on the ``by`` key,
  * a running ``last(payload, ignorenulls=True)`` window ordered by
    (ts, tag) fills each left row with the most recent right payload,
  * filter back to left rows.
Cost is a single hash partitioning + per-key sort — no pairwise
candidate explosion (a naive ``left.join(right, by).filter(r.ts <=
l.ts)`` + argmax materializes |left|×|right-per-key| rows first,
quadratic in the hot key's history). The window state is one row of
payload, so a 10⁹-row key history streams through an executor without
memory growth. Skew caveat: a single ``by`` key hotter than one
executor core's share is the same seam every per-key window has; AQE
cannot split a window partition, so pre-bucket such keys upstream
(e.g. salt by time range and as-of join per range, then repair the
first row of each range — the documented recipe for pathological
keys).

Tie semantics match DuckDB ASOF (``ON l.ts >= r.ts``): a right row at
exactly ``l.ts`` matches. Right rows must be unique per (by, ts) for
a deterministic result — dedupe upstream (the window keeps the last
one in (ts, tag) order otherwise, which is plan-dependent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str] | str,
    ts_col: str = "ts",
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row: the latest right row with ``right.ts <=
    left.ts`` (``backward``) or the earliest with ``right.ts >=
    left.ts`` (``forward``) in the same ``by`` group. Right's non-key
    columns are appended with ``suffix`` (its ``ts_col`` becomes e.g.
    ``ts_r``), NULL when no right row qualifies — i.e. an AS OF LEFT
    JOIN."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns
    payload_cols = [c for c in right.columns if c not in by]
    if not payload_cols:
        raise ValueError("right side has no payload columns beyond the keys")

    tagged_left = left.select(
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in payload_cols],
        F.lit(1).alias("_asof_tag"),
        F.col(ts_col).alias("_asof_ts"),
    )
    tagged_right = right.select(
        *[F.col(c) if c in by else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(c + suffix) for c in payload_cols],
        F.lit(0).alias("_asof_tag"),
        F.col(ts_col).alias("_asof_ts"),
    )
    both = tagged_left.unionByName(tagged_right)

    # backward: scan time ascending, right-before-left on ties so an
    # equal-ts right row is visible to the left row (DuckDB >=).
    # forward: scan time descending, same tie order.
    order = (
        [F.asc("_asof_ts"), F.asc("_asof_tag")]
        if direction == "backward"
        else [F.desc("_asof_ts"), F.asc("_asof_tag")]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        *left_cols,
        "_asof_tag",
        *[
            F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix)
            for c in payload_cols
        ],
    )
    return filled.filter(F.col("_asof_tag") == 1).drop("_asof_tag")
