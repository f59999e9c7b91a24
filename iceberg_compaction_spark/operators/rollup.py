"""Incremental materialized rollups — the hypertable "continuous
aggregate" shape (the brief's custom-operator example list): a rollup
table holds per-group partial aggregate STATE (count / sum / min /
max; avg = sum÷count at read time), and ``refresh_rollup`` folds in
only the source rows appended since the last refresh.

Scale shape: the whole point is on the SOURCE side — a refresh scans
only the data files appended since the last anchor, never the 100 TB
history. The rollup side is |groups| rows; each refresh re-aggregates
delta ∪ current-rollup with the same decomposable merge (sum+sum,
min(min), …) and commits one atomic REPLACE of the rollup table —
tiny, because aggregates are tiny.

Crash safety: the refresh anchor (last processed source snapshot id)
is recorded in the SAME atomic commit as the merged state — the
``rollup_src_snapshot`` snapshot-summary key — and mirrored to a
rollup-table property for expiry durability. Restart reads the max of
both (the ``_stream_guard`` recipe, ``streaming/ingest.py``), so a
crash between commit and property write is covered by the summary and
a replayed refresh sees ``cur == last`` and no-ops — never a
double-fold.

Maintenance coexistence: the refresh window is classified by walking
the source's snapshot ancestry. Append commits contribute their added
files to the delta. Row-set-preserving rewrites (``replace`` /
``maintenance`` / ``rewrite_manifests`` — compaction, delete-file
cleanup, manifest rewrite) are folded AROUND: their outputs re-add
rows the rollup already counted, so they are skipped. Row-set-CHANGING
commits (merge / delete / update / rollback / expire_data) — and
rewrites that consumed a file appended inside the window — cannot be
folded file-wise; for them the refresh goes CHANGELOG-INCREMENTAL
(round 8) when every aggregate is INVERTIBLE (count / sum / hist —
sum-mergeable states that also subtract) and a count state exists to
detect dead groups: the row-level changelog over the window is folded
with sign (+insert / −delete), groups whose count reaches zero are
dropped, and the result is exactly the recompute's state — rollups
now stay incremental through MERGE and DELETE WHERE. Non-invertible
states (min / max / hll), an unwalkable window, or more row-set-
changing commits than ``max_changelog_commits`` (each may cost a
parent-snapshot scan in the changelog — past a few, one recompute
scan is cheaper) fall back to one full recompute, pinned to the
anchor snapshot. Either way the refresh converges without manual
ordering between ingest and maintenance.

Reference contrast: the reference engine has no aggregate maintenance
at all (crates/ stop at file-level table services); this is the §2.12
extension family.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources.table import Table

_SUPPORTED = ("count", "sum", "min", "max", "hll", "hist")

# operations whose commits rewrite live rows under new paths without
# changing the live row SET (compaction, delete-file cleanup, manifest
# rewrite): safe to skip during an incremental fold as long as no
# in-window (not-yet-counted) appended file was consumed
_ROWSET_PRESERVING = frozenset({"replace", "maintenance", "rewrite_manifests"})

_ANCHOR_PROP = "rollup.last-src-snapshot"
_ANCHOR_SUMMARY = "rollup_src_snapshot"


def rollup_ddl(group_ddl: str, aggs: dict[str, tuple]) -> str:
    """DDL for the rollup table: group columns + one state column per
    aggregate. ``aggs``: out_col -> (fn, src_col) — or (fn, src_col,
    params) for parameterized fns; fn in count/sum/min/max/hll/hist
    (count's src_col is ignored). State types: count is BIGINT, hll is
    BINARY (a mergeable HyperLogLog sketch — read the estimate with
    ``hll_estimates``), hist is ARRAY<BIGINT> (fixed-bin counts —
    read quantiles with ``hist_quantile``), the rest DOUBLE — pass the
    source DDL types through ``group_ddl``-style strings yourself if
    they differ from DOUBLE."""
    cols = [group_ddl]
    for out, spec in aggs.items():
        fn = spec[0]
        t = {"count": "BIGINT", "hll": "BINARY", "hist": "ARRAY<BIGINT>"}.get(
            fn, "DOUBLE"
        )
        cols.append(f"{out} {t}")
    return ", ".join(cols)


def hll_estimates(df, cols: list[str]):
    """Replace HLL state columns with their distinct-count estimates —
    the read-side of an approx-distinct rollup."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.hll_sketch_estimate(c))
    return out


def hist_quantile(
    df,
    group_cols: list[str],
    hist_col: str,
    q: float,
    lo: float,
    width: float,
):
    """Read side of a ``hist`` rollup state: estimate the q-quantile
    per group from the fixed-bin counts (linear interpolation inside
    the straddling bin — error bounded by one bin width). Plan:
    posexplode the |bins|-long array → one per-group running-sum
    window over |groups|×|bins| rows — rollup-sized, never
    data-sized."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    from pyspark.sql import Window

    e = df.select(
        *group_cols, F.posexplode(hist_col).alias("_bin", "_cnt")
    )
    wrun = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = (
        e.withColumn("_cum", F.sum("_cnt").over(wrun))
        .withColumn("_tot", F.sum("_cnt").over(wall))
        .withColumn("_target", F.lit(float(q)) * F.col("_tot"))
    )
    frac = (F.col("_target") - (F.col("_cum") - F.col("_cnt"))) / F.col("_cnt")
    est = F.lit(float(lo)) + (
        F.col("_bin") + F.greatest(F.lit(0.0), F.least(F.lit(1.0), frac))
    ) * F.lit(float(width))
    # round, not int(): int truncates (q=0.29 would name the column
    # q28). ONE relation end to end: the straddling bin is the
    # min-by-_bin candidate struct per group (min skips NULL structs),
    # so empty-histogram groups (all bins zero — e.g. every source
    # value NULL) aggregate to a NULL estimate instead of being
    # dropped — and the rollup-state input is evaluated exactly once
    # (a distinct+join here would recompute the whole upstream
    # pipeline per branch).
    out_col = f"q{round(q * 100)}"
    cand = F.when(
        (F.col("_cum") >= F.col("_target")) & (F.col("_cnt") > 0),
        F.struct(F.col("_bin"), est.alias("_est")),
    )
    return (
        cum.groupBy(*group_cols)
        .agg(F.min(cand).alias("_m"))
        .select(*group_cols, F.col("_m._est").alias(out_col))
    )


def time_bucket(col, width_s: float):
    """Floor a timestamp (or numeric) column to ``width_s``-second
    buckets, returned as epoch seconds — the hypertable ``time_bucket``
    scalar. Map-side arithmetic only."""
    sec = F.col(col) if isinstance(col, str) else col
    sec = sec.cast("timestamp").cast("double")
    return (F.floor(sec / F.lit(float(width_s))) * F.lit(float(width_s))).cast(
        "double"
    )


def _gapfill_frames(df, group_cols, bucket_col, start, end, step):
    """Shared by the plain and salted gapfill forms: validate the
    range, build the step-indexed per-group grid (map-side
    ``F.sequence`` + ``explode``, never a driver loop), and project
    the source onto INTEGER step indices — not double equality of the
    bucket value: for a non-integral step the grid's ``lo + i*step``
    and the caller's ``floor(sec/step)*step`` can differ by one ulp,
    which would silently flag every observed bucket as a gap. Rows
    whose bucket is not grid-aligned (beyond ulp tolerance) never
    matched under double equality either — they stay excluded.
    Returns (groups, grid, src, n_steps)."""
    if step <= 0 or end < start:
        raise ValueError(f"bad gapfill range [{start}, {end}] step {step}")
    lo = float(start) - (float(start) % float(step))
    n_steps = int((float(end) - lo) // float(step))
    if n_steps > 1_000_000:
        # the grid is |groups| × (n_steps+1) rows: a mistyped step
        # would silently explode it — same refuse-don't-explode rule
        # as the range join's max_bins_per_interval guard
        raise ValueError(
            f"gapfill grid would have {n_steps + 1} buckets per group "
            "(> 1e6); widen step or narrow the range"
        )
    groups = df.select(*group_cols).distinct()
    grid = groups.select(
        *group_cols,
        F.explode(F.sequence(F.lit(0), F.lit(n_steps))).alias("_step_i"),
    ).select(
        *group_cols,
        F.col("_step_i"),
        (F.lit(lo) + F.col("_step_i") * F.lit(float(step)))
        .cast("double")
        .alias(bucket_col),
    )
    src_i = F.round((F.col(bucket_col) - F.lit(lo)) / F.lit(float(step))).cast(
        "bigint"
    )
    src = (
        df.withColumn("_step_i", src_i)
        .filter(
            F.abs(
                F.col(bucket_col)
                - (F.lit(lo) + F.col("_step_i") * F.lit(float(step)))
            )
            <= F.lit(float(step) * 1e-9)
        )
        .drop(bucket_col)
        .withColumn("_observed", F.lit(1))
    )
    return groups, grid, src, n_steps


def gapfill_locf(
    df,
    group_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
    start: float,
    end: float,
    step: float,
):
    """Gap-filled per-group time grid with last-observation-carried-
    forward — the continuous-aggregate read-side companion
    (TimescaleDB ``time_bucket_gapfill`` + ``locf``): every group gets
    one row per bucket in ``[start, end]`` step ``step`` (epoch
    seconds); buckets with no source row carry the latest earlier
    value (NULL before the first observation). Emits ``<col>_filled``
    beside each original value column plus a ``gap_filled`` flag.

    Scale shape: the grid is |groups| × |buckets| rows built map-side
    from ``F.sequence`` + ``explode`` (never a driver loop); the fill
    is one running last-ignorenulls window per group — O(1) window
    state, same single-shuffle discipline as the as-of join. Buckets
    per group are bounded by (end-start)/step, which the CALLER fixes
    independently of data volume; a hot group is
    ``gapfill_locf_salted``'s job.

    Input contract (both forms): ``df`` is evaluated more than once
    (group universe + observations) — pass a materialized relation (a
    table scan, like the rollup read-side it companions) or persist a
    derived pipeline first, the trap ``hist_quantile`` used to have."""
    from pyspark.sql import Window

    _, grid, src, _ = _gapfill_frames(
        df, group_cols, bucket_col, start, end, step
    )
    joined = grid.join(src, [*group_cols, "_step_i"], "left")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.select(
        *group_cols,
        bucket_col,
        *value_cols,
        *[
            F.last(c, ignorenulls=True).over(w).alias(c + "_filled")
            for c in value_cols
        ],
        (F.col("_observed").isNull()).alias("gap_filled"),
    )
    return out


def gapfill_locf_salted(
    df,
    group_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
    start: float,
    end: float,
    step: float,
    chunk_buckets: int = 1024,
):
    """``gapfill_locf`` for a PATHOLOGICAL group — one whose bucket
    range exceeds what a single per-group window partition should
    serialize. The asof-salted recipe (``operators/asof.py``), grid
    edition:

      1. the grid carries a chunk id (``step_index // chunk_buckets``)
         and the LOCF window partitions by (group, chunk) — a hot
         group's fill runs as ceil(buckets/chunk_buckets) independent
         window partitions instead of one;
      2. per (group, chunk) the LAST OBSERVED value of each column
         (from source rows only) feeds a cumulative cross-chunk carry —
         a |groups| × |chunks| relation, thousands of times smaller
         than the grid, so its per-group window is trivially cheap;
      3. grid rows before their chunk's first observation fill from
         the carry.

    Row-identical to ``gapfill_locf`` (pinned by an equivalence test);
    same guards, same output schema."""
    if chunk_buckets < 1:
        raise ValueError(f"chunk_buckets must be >= 1, got {chunk_buckets}")
    from pyspark.sql import Window

    groups, grid, src, n_steps = _gapfill_frames(
        df, group_cols, bucket_col, start, end, step
    )
    n_chunks = n_steps // chunk_buckets
    chunk_of = (F.col("_step_i") / F.lit(int(chunk_buckets))).cast("bigint")
    grid = grid.withColumn("_chunk", chunk_of)
    src = src.withColumn("_chunk", chunk_of)
    # stage 2: per-(group, chunk) last observed value per column (max
    # over (step, value) structs skips NULL values like the window's
    # ignorenulls), then the cumulative carry over STRICTLY earlier
    # chunks — |groups| × |chunks| rows
    lastobs = src.groupBy(*group_cols, "_chunk").agg(
        *[
            F.max(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(F.col("_step_i").alias("_i"), F.col(c).alias("_v")),
                )
            )["_v"].alias(c + "_last")
            for c in value_cols
        ]
    )
    spine = groups.select(
        *group_cols,
        F.explode(F.sequence(F.lit(0), F.lit(int(n_chunks)))).alias("_chunk"),
    )
    wcarry = (
        Window.partitionBy(*group_cols)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.join(lastobs, [*group_cols, "_chunk"], "left").select(
        *group_cols,
        "_chunk",
        *[
            F.last(c + "_last", ignorenulls=True).over(wcarry).alias(c + "_carry")
            for c in value_cols
        ],
    )
    joined = grid.join(src.drop("_chunk"), [*group_cols, "_step_i"], "left").join(
        carry, [*group_cols, "_chunk"], "left"
    )
    w = (
        Window.partitionBy(*group_cols, "_chunk")
        .orderBy("_step_i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *group_cols,
        bucket_col,
        *value_cols,
        *[
            F.coalesce(
                F.last(c, ignorenulls=True).over(w), F.col(c + "_carry")
            ).alias(c + "_filled")
            for c in value_cols
        ],
        (F.col("_observed").isNull()).alias("gap_filled"),
    )


def _last_anchor(rollup: Table) -> int | None:
    """Crash-safe anchor recovery: max(property, snapshot summaries).
    The summary rides the atomic replace commit, so a crash between
    commit and property write cannot roll the anchor back."""
    vals = []
    prop = rollup.get_property(_ANCHOR_PROP, None)
    if prop is not None:
        vals.append(int(prop))
    for s in rollup.snapshots():
        v = (s.get("summary") or {}).get(_ANCHOR_SUMMARY)
        if v is not None:
            vals.append(int(v))
    return max(vals) if vals else None


def _window_chain(src: Table, last: int | None, cur: int) -> list[dict] | None:
    """Main-ancestry commits in (last, cur], oldest first, by walking
    parent ids from ``cur``. None when the walk cannot reach ``last``
    (diverged history, e.g. a rollback past the anchor) — the caller
    must recompute rather than guess a delta."""
    chain: list[dict] = []
    sid: int | None = cur
    while sid is not None and sid != last:
        try:
            snap = src.snapshot(sid)
        except Exception:
            return None  # expired mid-window: no exact delta exists
        chain.append(snap)
        sid = snap.get("parent_id")
    if sid != last and last is not None:
        return None
    chain.reverse()
    return chain


def refresh_rollup(
    spark: SparkSession,
    src: Table,
    rollup: Table,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    changelog_deltas: bool = True,
    max_changelog_commits: int = 8,
) -> dict:
    """Fold source rows appended since the last refresh into the
    rollup. ``aggs``: out_col -> (fn, src_col). Returns {delta_rows,
    from_snapshot, to_snapshot, mode} with mode in
    ``noop | incremental | incremental_changelog | recompute``; a
    no-op refresh commits nothing.

    ``changelog_deltas`` (default on): when the window holds row-set-
    changing commits (MERGE / DELETE WHERE / …) or a rewrite that
    consumed an in-window append, and every aggregate is INVERTIBLE
    (count / sum / hist) with at least one ``count`` state present,
    the refresh folds the row-level changelog with sign instead of
    recomputing — ``mode="incremental_changelog"``, O(changed rows +
    delete-commit scope) instead of O(table). Groups whose count
    reaches zero are dropped, matching the recompute exactly.
    ``max_changelog_commits`` caps the row-set-changing commits walked
    this way (each can cost a parent-scoped scan inside the changelog;
    past a few, one recompute scan is cheaper)."""
    for out, spec in aggs.items():
        if spec[0] not in _SUPPORTED:
            raise ValueError(
                f"{out}: {spec[0]} is not decomposable-supported {_SUPPORTED}"
            )
        if spec[0] == "hist":
            if len(spec) < 3:
                raise ValueError(f"{out}: hist needs (fn, col, (lo, width, nbins))")
            if not 0 < spec[2][2] <= 1024:
                # each bin is one aggregate expression in the plan: a
                # mistyped nbins would explode codegen, and >1024 bins
                # is no longer a cheap mergeable state anyway
                raise ValueError(f"{out}: hist nbins must be in (0, 1024]")
    last = _last_anchor(rollup)
    cur = src.current_snapshot_id
    if cur is None or cur == last:
        return {
            "delta_rows": 0, "from_snapshot": last, "to_snapshot": cur,
            "mode": "noop",
        }
    cols = list({spec[1] for spec in aggs.values() if spec[1]} | set(group_by))

    # classify the window by ancestry: appends feed the delta;
    # row-set-preserving rewrites are skipped (outputs re-add counted
    # rows). A rewrite that consumed a pending in-window append or any
    # row-set-changing commit breaks the file-level delta — those
    # windows go changelog-incremental when the aggregates allow it,
    # else recompute (an unreadable window always recomputes).
    mode = "incremental"
    pending: dict[str, dict] = {}  # path -> manifest row, appended + uncounted
    n_changeful = 0
    chain = _window_chain(src, last, cur)
    if chain is None:
        mode = "recompute"
        chain = []
    for snap in chain:
        op = snap.get("operation") or "append"
        sid, parent = snap["snapshot_id"], snap.get("parent_id")
        if op == "append":
            for r in src.added_files_between(parent, sid):
                pending[r["path"]] = r
        elif op in _ROWSET_PRESERVING:
            after = {
                r["path"]
                for r in src.manifest(sid)
                if r["content"] == mf.CONTENT_DATA
            }
            if any(p not in after for p in pending):
                # a not-yet-counted append was rewritten into mixed
                # outputs: no FILE-level delta exists any more (the
                # row-level changelog is layout-invariant and still
                # exact — physical files persist until expiry)
                mode = "fallback"
        else:  # merge / delete / update / rollback / expire_data …
            mode = "fallback"
            n_changeful += 1

    if mode == "fallback":
        # invertible-state gate: count/sum/hist states subtract exactly
        # and a count column detects groups whose last row disappeared
        invertible = all(spec[0] in ("count", "sum", "hist") for spec in aggs.values())
        has_count = any(spec[0] == "count" for spec in aggs.values())
        mode = (
            "incremental_changelog"
            if (
                changelog_deltas
                and invertible
                and has_count
                and last is not None
                and rollup.files(content="data")
                and n_changeful <= max_changelog_commits
            )
            else "recompute"
        )

    if mode == "incremental":
        live = [r for r in pending.values() if r.get("record_count", 1)]
        if not live:
            # pure-metadata window (or empty part-files only): advance
            # the anchor without a data commit; losing this property
            # write in a crash only re-runs the same no-op
            rollup.set_property(_ANCHOR_PROP, int(cur))
            return {
                "delta_rows": 0, "from_snapshot": last, "to_snapshot": cur,
                "mode": "incremental",
            }
        delta = src.read_data_rows(spark, live).select(*cols)
    elif mode == "incremental_changelog":
        from iceberg_compaction_spark.operators.changelog import (
            CHANGE_TYPE_COL,
            changelog_scan,
        )

        sign = F.when(
            F.col(CHANGE_TYPE_COL) == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        delta = changelog_scan(spark, src, last, cur, columns=cols).select(
            *cols, sign.alias("_sign")
        )
    else:
        # PINNED to ``cur``: a commit landing between the anchor capture
        # above and this scan must not be folded in — the anchor records
        # only ``cur``, so the next refresh would fold those rows again
        delta = src.scan(spark, snapshot_id=cur, columns=cols)

    def _exprs(src_is_state: bool, signed: bool = False):
        out = []
        for name, spec in aggs.items():
            fn, c = spec[0], spec[1]
            if fn == "hist":
                # fixed-bin counts: the simplest MERGEABLE quantile
                # state (unlike percentile_approx, whose sketch Spark
                # does not expose for re-aggregation). Out-of-range
                # values clamp into the edge bins; NULLs don't count.
                # Signed (changelog) folds add the row's _sign instead
                # of 1 — a delete decrements its bin exactly.
                lo, width, nbins = spec[2]
                if src_is_state:
                    out.append(
                        F.array(
                            *[
                                F.sum(F.element_at(F.col(name), i + 1))
                                for i in range(nbins)
                            ]
                        ).alias(name)
                    )
                else:
                    idx = F.least(
                        F.lit(nbins - 1),
                        F.greatest(
                            F.lit(0),
                            F.floor(
                                (F.col(c) - F.lit(float(lo))) / F.lit(float(width))
                            ).cast("int"),
                        ),
                    )
                    one = F.col("_sign") if signed else F.lit(1)
                    out.append(
                        F.array(
                            *[
                                F.sum(
                                    F.when(idx == i, one).otherwise(F.lit(0))
                                ).cast("long")
                                for i in range(nbins)
                            ]
                        ).alias(name)
                    )
            elif fn == "count":
                out.append(
                    (
                        F.sum(name)
                        if src_is_state
                        else (
                            F.sum("_sign").cast("long")
                            if signed
                            else F.count(F.lit(1))
                        )
                    ).alias(name)
                )
            elif fn == "hll":
                # mergeable sketch state: build on raw rows, union on
                # state — exactly the decomposability count/sum have,
                # for DISTINCT counts (where exact state would be the
                # whole value set)
                # sketch the string form: hll_sketch_agg accepts only
                # int/bigint/string/binary, and the cast makes distinct
                # semantics uniform across source column types
                out.append(
                    (
                        F.hll_union_agg(name)
                        if src_is_state
                        else F.hll_sketch_agg(F.col(c).cast("string"))
                    ).alias(name)
                )
            elif fn == "sum" and signed and not src_is_state:
                out.append(F.sum(F.col(c) * F.col("_sign")).alias(name))
            else:
                agg = {"sum": F.sum, "min": F.min, "max": F.max}[fn]
                out.append(agg(name if src_is_state else c).alias(name))
        return out

    # ONE pass over the delta (appended files, or the signed changelog):
    # the |groups|-sized partial is persisted, delta_rows comes from its
    # count state, and the merge write reads the cache — never a second
    # scan of the delta
    partial = (
        delta.groupBy(*group_by)
        .agg(
            *_exprs(False, signed=mode == "incremental_changelog"),
            F.count(F.lit(1)).alias("__delta_cnt"),
        )
        .persist()
    )
    try:
        delta_rows = int(
            partial.agg(F.sum("__delta_cnt")).collect()[0][0] or 0
        )
        partial = partial.drop("__delta_cnt")
        if mode == "incremental_changelog" and delta_rows == 0:
            # the window's commits netted to zero row changes (e.g. a
            # DELETE WHERE that matched nothing): advance the anchor
            # without rewriting identical state
            rollup.set_property(_ANCHOR_PROP, int(cur))
            return {
                "delta_rows": 0, "from_snapshot": last, "to_snapshot": cur,
                "mode": mode,
            }
        if mode in ("incremental", "incremental_changelog"):
            existing = (
                rollup.scan(spark)
                if rollup.files(content="data")
                else spark.createDataFrame([], schema=rollup.schema())
            )
            merged = (
                existing.select(partial.columns)
                .unionByName(partial)
                .groupBy(*group_by)
                .agg(*_exprs(True))
            )
            if mode == "incremental_changelog":
                # a group whose last row was deleted must leave the
                # rollup (exactly what a recompute would produce) —
                # the count state is the liveness witness
                cnt_col = next(
                    name for name, spec in aggs.items() if spec[0] == "count"
                )
                merged = merged.filter(F.col(cnt_col) > 0)
        else:
            merged = partial  # recompute IS the new state
        infos = rollup.write_data_files(merged)
        removed = [f["path"] for f in rollup.files(content="data")]
        rollup.commit(
            "replace",
            added=infos,
            removed_paths=removed,
            extra_summary={_ANCHOR_SUMMARY: int(cur)},
        )
    finally:
        partial.unpersist()
    # expiry-durable mirror of the committed summary anchor; a failed
    # property write is caught up by the next refresh's summary read
    try:
        rollup.set_property(_ANCHOR_PROP, int(cur))
    except Exception:
        from iceberg_compaction_spark.metrics import GLOBAL

        GLOBAL.inc("rollup.anchor_mark_write_failed")
    return {
        "delta_rows": delta_rows, "from_snapshot": last, "to_snapshot": cur,
        "mode": mode,
    }
