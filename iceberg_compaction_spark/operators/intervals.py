"""Range join: match point rows to interval rows (ts ∈ [start, end])
per key — the second classic operator Spark's DataFrame API lacks
(the brief's custom-operator examples: as-of join, range join).
Catalyst compiles a raw inequality join to BroadcastNestedLoopJoin —
a pairwise scan that is quadratic per key and a scale killer.

Spark-first shape — binning:
  * intervals explode to the fixed-width bins they overlap
    (``sequence(floor(start/w), floor(end/w))``),
  * points map to their single bin,
  * ONE equi-join on (key, bin), then the exact containment filter.
Each point lives in exactly one bin, so every (point, interval) pair
is produced at most once — no dedup pass. Cost is the equi-join's
hash shuffle plus interval replication by ``ceil(span / bin_width)``;
pick ``bin_width`` near the typical interval span so replication is
O(1) per interval. Degenerate inputs (an interval spanning ~all bins)
replicate proportionally — cap with ``max_bins_per_interval`` which
raises rather than silently exploding the plan.

The driver oracle is a plain DuckDB inequality join (its IEJoin
executes it natively), so the binning plan is value-checked against
the textbook semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    by: Sequence[str] | str | None,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_width: float = 3600.0,
    max_bins_per_interval: int = 10_000,
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join each point row to every interval row of the same
    ``by`` group with ``start <= ts <= end`` (inclusive bounds, the
    BETWEEN rule). Interval columns are appended with ``suffix``.
    Timestamp columns are compared on their epoch value (fractional
    seconds preserved); ``bin_width`` is in those units (seconds for
    timestamps)."""
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))

    def _num(df, c):
        t = df.schema[c].dataType.simpleString()
        col = F.col(c)
        # NTZ is not castable to double directly; route through
        # timestamp (session-tz interpretation, identical on both
        # sides so bins and comparisons stay consistent)
        return col.cast("timestamp").cast("double") if t.startswith("timestamp") else col

    p_bin = F.floor(_num(points, ts_col) / F.lit(float(bin_width)))
    lo_bin = F.floor(_num(intervals, start_col) / F.lit(float(bin_width)))
    hi_bin = F.floor(_num(intervals, end_col) / F.lit(float(bin_width)))

    payload = [c for c in intervals.columns if c not in by]
    guarded_hi = F.when(
        hi_bin - lo_bin >= max_bins_per_interval,
        F.raise_error(
            F.lit(
                f"interval spans >= {max_bins_per_interval} bins; raise "
                "bin_width or max_bins_per_interval"
            )
        ).cast("long"),
    ).otherwise(hi_bin)
    binned_iv = intervals.select(
        *[F.col(c) for c in by],
        *[F.col(c).alias(c + suffix) for c in payload],
        F.explode(F.sequence(lo_bin, guarded_hi)).alias("_bin"),
    )
    binned_pt = points.withColumn("_bin", p_bin)

    def _num_sfx(c):
        t = intervals.schema[c].dataType.simpleString()
        col = F.col(c + suffix)
        return col.cast("timestamp").cast("double") if t.startswith("timestamp") else col

    # exact containment on the original values (epoch compare for ts)
    ts_v = _num(binned_pt, ts_col)
    return (
        binned_pt.join(binned_iv, [*by, "_bin"])
        .filter((_num_sfx(start_col) <= ts_v) & (ts_v <= _num_sfx(end_col)))
        .drop("_bin")
    )
