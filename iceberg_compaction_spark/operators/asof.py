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
executor core's share is the same seam every per-key window has, and
AQE cannot split a window partition — use ``asof_join_salted`` for
such keys: it buckets time, windows per (key, bucket), and repairs
bucket boundaries with a cross-bucket carry that is |keys|×|buckets|
rows small.

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
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row: the latest right row with ``right.ts <=
    left.ts`` (``backward``), the earliest with ``right.ts >= left.ts``
    (``forward``), or whichever of the two is temporally closer
    (``nearest``, ties to backward — pandas ``merge_asof`` semantics)
    in the same ``by`` group. Right's non-key columns are appended
    with ``suffix`` (its ``ts_col`` becomes e.g. ``ts_r``), NULL when
    no right row qualifies — i.e. an AS OF LEFT JOIN.

    ``allow_exact_matches=False`` makes the comparison STRICT (< / >,
    pandas ``merge_asof`` parity): an equal-ts right row no longer
    matches. Implementation-wise that is only the union-tag tie order
    — left rows sort BEFORE equal-ts right rows, so the running fill
    has not seen them yet — the plan is unchanged.

    ``nearest`` stays ONE shuffle: both directional fills run as two
    windows over the same hash partitioning (Catalyst plans one
    Exchange + two Sorts), then a row-local CASE picks the closer
    candidate."""
    if direction == "nearest":
        return _asof_join_nearest(
            left, right, by, ts_col, suffix, allow_exact_matches
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns
    payload_cols = [c for c in right.columns if c not in by]
    if not payload_cols:
        raise ValueError("right side has no payload columns beyond the keys")
    # NULL-ts semantics match SQL ASOF: a NULL never satisfies the
    # comparison — null-ts right rows can never match (drop them), and
    # null-ts left rows get a NULL payload (ordered before every right
    # row below, so the running last() has seen nothing)
    right = right.filter(F.col(ts_col).isNotNull())

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
    # forward: scan time descending, same tie order. Strict mode
    # (allow_exact_matches=False) flips the tie order — left first, so
    # the running fill has not seen the equal-ts right row yet.
    tag_order = F.asc("_asof_tag") if allow_exact_matches else F.desc("_asof_tag")
    order = (
        [F.asc_nulls_first("_asof_ts"), tag_order]
        if direction == "backward"
        else [F.desc_nulls_first("_asof_ts"), tag_order]
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


def _asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str] | str,
    ts_col: str,
    suffix: str,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """``direction="nearest"``: the union-tag frame computes BOTH
    directional running fills as two windows over one hash
    partitioning (one Exchange, two in-partition Sorts), then a
    row-local comparison keeps the temporally closer candidate —
    backward on ties and on NULL left ts (matching ``backward``'s
    NULL-row behavior)."""
    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns
    payload_cols = [c for c in right.columns if c not in by]
    if not payload_cols:
        raise ValueError("right side has no payload columns beyond the keys")
    right = right.filter(F.col(ts_col).isNotNull())

    tagged_left = left.select(
        *[F.col(c) for c in left_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
            for c in payload_cols
        ],
        F.lit(1).alias("_asof_tag"),
        F.col(ts_col).alias("_asof_ts"),
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in by else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        *[F.col(c).alias(c + suffix) for c in payload_cols],
        F.lit(0).alias("_asof_tag"),
        F.col(ts_col).alias("_asof_ts"),
    )
    both = tagged_left.unionByName(tagged_right)

    tag_order = F.asc("_asof_tag") if allow_exact_matches else F.desc("_asof_tag")
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.asc_nulls_first("_asof_ts"), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.desc_nulls_first("_asof_ts"), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        *left_cols,
        "_asof_tag",
        *[
            F.last(c + suffix, ignorenulls=True).over(wb).alias(c + "__b")
            for c in payload_cols
        ],
        *[
            F.last(c + suffix, ignorenulls=True).over(wf).alias(c + "__f")
            for c in payload_cols
        ],
    ).filter(F.col("_asof_tag") == 1)

    def _sec(col):
        return col.cast("timestamp").cast("double") if str(
            left.schema[ts_col].dataType
        ).lower().startswith("timestamp") else col.cast("double")

    lts = _sec(F.col(ts_col))
    bts = _sec(F.col(ts_col + "__b"))
    fts = _sec(F.col(ts_col + "__f"))
    use_backward = F.col(ts_col + "__f").isNull() | (
        F.col(ts_col + "__b").isNotNull() & ((lts - bts) <= (fts - lts))
    )
    return filled.select(
        *left_cols,
        *[
            F.when(use_backward, F.col(c + "__b"))
            .otherwise(F.col(c + "__f"))
            .alias(c + suffix)
            for c in payload_cols
        ],
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str] | str,
    ts_col: str = "ts",
    bucket_width: float = 3600.0,
    direction: str = "backward",
    suffix: str = "_r",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """``asof_join`` for PATHOLOGICAL keys, both directions — the
    documented recipe for a single ``by`` key whose history exceeds one
    executor core's share, where any per-key window (including
    ``asof_join``'s) serializes.

    Three stages, every window partitioned by (key, time-bucket) or
    running over bucket-COUNT-sized rows — never by key alone:
      1. as-of join within each (key, bucket): splits the hot key into
         history/bucket_width independent partitions.
      2. per (key, bucket) take the boundary right payload — the LAST
         for ``backward``, the FIRST for ``forward`` — then a
         cumulative carry across buckets (earlier buckets for
         backward; strictly LATER buckets, scanned in reverse, for
         forward) — a relation of |keys|×|buckets| rows, thousands of
         times smaller than the data, so its per-key window is
         trivially cheap.
      3. left rows still unmatched after stage 1 (no right row on the
         required side in their own bucket) fill from the carry.
    Result is row-identical to ``asof_join`` in the same direction
    (pinned by a hypothesis equivalence test); right rows must be
    unique per (by, ts) as there.

    ``nearest`` composes the two directional salted passes (the
    second treats the first's appended candidate columns as ordinary
    left payload) and keeps the closer side per row — 2× the salted
    cost, still never a per-key window over the full hot history.

    ``allow_exact_matches=False`` (strict < / >, pandas ``merge_asof``
    parity) delegates entirely to stage 1's tie-order flip: strictness
    only matters for EQUAL timestamps, equal timestamps share a
    ``floor(ts/width)`` bucket by construction, and the stage-2/3
    carry fills only from strictly earlier (backward) / later
    (forward) buckets — whose timestamps satisfy the strict comparison
    automatically. Pinned by the hypothesis equivalence grid
    (direction × width × exact, tests/test_asof.py)."""
    if direction == "nearest":
        b = asof_join_salted(
            left, right, by, ts_col, bucket_width, "backward", suffix="__b",
            allow_exact_matches=allow_exact_matches,
        )
        bf = asof_join_salted(
            b, right, by, ts_col, bucket_width, "forward", suffix="__f",
            allow_exact_matches=allow_exact_matches,
        )
        by_l = [by] if isinstance(by, str) else list(by)
        pcols = [c for c in right.columns if c not in by_l]

        def _sec(col):
            return (
                col.cast("timestamp").cast("double")
                if str(left.schema[ts_col].dataType).lower().startswith("timestamp")
                else col.cast("double")
            )

        lts, bts, fts = (
            _sec(F.col(ts_col)),
            _sec(F.col(ts_col + "__b")),
            _sec(F.col(ts_col + "__f")),
        )
        use_b = F.col(ts_col + "__f").isNull() | (
            F.col(ts_col + "__b").isNotNull() & ((lts - bts) <= (fts - lts))
        )
        return bf.select(
            *left.columns,
            *[
                F.when(use_b, F.col(c + "__b"))
                .otherwise(F.col(c + "__f"))
                .alias(c + suffix)
                for c in pcols
            ],
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = [by] if isinstance(by, str) else list(by)
    payload_cols = [c for c in right.columns if c not in by]

    def _num(df, c):
        t = df.schema[c].dataType.simpleString()
        col = F.col(c)
        return col.cast("timestamp").cast("double") if t.startswith("timestamp") else col

    lb = left.withColumn("_bkt", F.floor(_num(left, ts_col) / F.lit(float(bucket_width))))
    rb = right.withColumn("_bkt", F.floor(_num(right, ts_col) / F.lit(float(bucket_width))))

    # stage 1: within-bucket as-of (the hot key is now split); the
    # strict tie order lives entirely here — see the docstring
    stage1 = asof_join(
        lb, rb, by=[*by, "_bkt"], ts_col=ts_col, direction=direction,
        suffix=suffix, allow_exact_matches=allow_exact_matches,
    )

    # stage 2: per-bucket boundary payloads + cross-bucket carry.
    # backward: the bucket's LAST payload, carried forward from earlier
    # buckets. forward: the bucket's FIRST payload, carried backward —
    # scanning buckets in DESCENDING order makes last(ignorenulls) over
    # the preceding frame yield the NEAREST later bucket's payload.
    backward = direction == "backward"
    wlast = Window.partitionBy(*by, "_bkt").orderBy(
        F.desc("_asof_ord") if backward else F.asc("_asof_ord")
    )
    ends = (
        rb.withColumn("_asof_ord", _num(rb, ts_col))
        .withColumn("_rn", F.row_number().over(wlast))
        .filter(F.col("_rn") == 1)
        .select(*by, "_bkt", *[F.col(c).alias(c + "_end") for c in payload_cols])
    )
    wcarry = (
        Window.partitionBy(*by)
        .orderBy(F.asc("_bkt") if backward else F.desc("_bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carry rows: for every bucket PRESENT ON EITHER SIDE, the boundary
    # payload from the nearest strictly earlier (backward) / later
    # (forward) right bucket
    bkts = (
        lb.select(*by, "_bkt")
        .unionByName(rb.select(*by, "_bkt"))
        .distinct()
        .join(ends, [*by, "_bkt"], "left")
    )
    carry = bkts.select(
        *by,
        "_bkt",
        *[
            F.last(c + "_end", ignorenulls=True).over(wcarry).alias(c + "_carry")
            for c in payload_cols
        ],
    )

    # stage 3: fill unmatched rows from the carry
    out = stage1.join(carry, [*by, "_bkt"], "left").select(
        *[c for c in left.columns],
        *[
            F.coalesce(F.col(c + suffix), F.col(c + "_carry")).alias(c + suffix)
            for c in payload_cols
        ],
    )
    return out
