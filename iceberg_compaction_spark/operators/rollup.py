"""Incremental materialized rollups — the hypertable "continuous
aggregate" shape (the brief's custom-operator example list): a rollup
table holds per-group partial aggregate STATE (count / sum / min /
max; avg = sum÷count at read time), and ``refresh_rollup`` folds in
only the source rows appended since the last refresh.

Scale shape: the whole point is on the SOURCE side — a refresh scans
``incremental_scan(last_anchor, current)`` (the new data files only),
never the 100 TB history. The rollup side is |groups| rows; each
refresh re-aggregates delta ∪ current-rollup with the same decomposable
merge (sum+sum, min(min), …) and commits one atomic REPLACE of the
rollup table — tiny, because aggregates are tiny. The refresh anchor
(last processed snapshot id) is stored as a rollup-table property, so
refreshes resume exactly after a crash: the anchor is written in the
SAME commit flow as the data, and a replayed refresh of the same
anchor folds an empty delta.

Append-only caveat (same as ``incremental_scan``): compaction rewrites
re-add rows under new paths. Refresh anchors must therefore advance
over INGEST commits; run refreshes before maintenance, or point the
rollup at an ingest branch. ``refresh_rollup`` detects a replace
commit in the window and raises rather than double-counting.

Reference contrast: the reference engine has no aggregate maintenance
at all (crates/ stop at file-level table services); this is the §2.12
extension family.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from iceberg_compaction_spark.sources.table import Table

_SUPPORTED = ("count", "sum", "min", "max", "hll")


def rollup_ddl(group_ddl: str, aggs: dict[str, tuple[str, str]]) -> str:
    """DDL for the rollup table: group columns + one state column per
    aggregate. ``aggs``: out_col -> (fn, src_col); fn in count/sum/
    min/max/hll (count's src_col is ignored). State types: count is
    BIGINT, hll is BINARY (a mergeable HyperLogLog sketch — read the
    estimate with ``hll_estimates``), the rest DOUBLE — pass the
    source DDL types through ``group_ddl``-style strings yourself if
    they differ from DOUBLE."""
    cols = [group_ddl]
    for out, (fn, _src) in aggs.items():
        t = {"count": "BIGINT", "hll": "BINARY"}.get(fn, "DOUBLE")
        cols.append(f"{out} {t}")
    return ", ".join(cols)


def hll_estimates(df, cols: list[str]):
    """Replace HLL state columns with their distinct-count estimates —
    the read-side of an approx-distinct rollup."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.hll_sketch_estimate(c))
    return out


def refresh_rollup(
    spark: SparkSession,
    src: Table,
    rollup: Table,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
) -> dict:
    """Fold source rows appended since the last refresh into the
    rollup. ``aggs``: out_col -> (fn, src_col). Returns {delta_rows,
    from_snapshot, to_snapshot}; a no-op refresh returns delta_rows 0
    and commits nothing."""
    for out, (fn, _c) in aggs.items():
        if fn not in _SUPPORTED:
            raise ValueError(f"{out}: {fn} is not decomposable-supported {_SUPPORTED}")
    anchor_key = "rollup.last-src-snapshot"
    last = rollup.get_property(anchor_key, None)
    last = int(last) if last is not None else None
    cur = src.current_snapshot_id
    if cur is None or cur == last:
        return {"delta_rows": 0, "from_snapshot": last, "to_snapshot": cur}
    # refuse to fold a window containing a rewrite: replace commits
    # re-add rows under new paths and would double-count
    for s in src.snapshots():
        sid = s["snapshot_id"]
        if (last is None or sid > last) and sid <= cur and s.get("operation") == "replace":
            raise ValueError(
                "refresh window contains a replace commit; refresh rollups "
                "before maintenance (or anchor to an ingest branch)"
            )
    cols = list({c for (_fn, c) in aggs.values() if c} | set(group_by))
    delta = src.incremental_scan(spark, last, cur, columns=cols)

    def _exprs(src_is_state: bool):
        out = []
        for name, (fn, c) in aggs.items():
            if fn == "count":
                out.append(
                    (F.sum(name) if src_is_state else F.count(F.lit(1))).alias(name)
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
            else:
                agg = {"sum": F.sum, "min": F.min, "max": F.max}[fn]
                out.append(agg(name if src_is_state else c).alias(name))
        return out

    partial = delta.groupBy(*group_by).agg(*_exprs(False))
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
    delta_rows = delta.count()
    infos = rollup.write_data_files(merged)
    removed = [f["path"] for f in rollup.files(content="data")]
    rollup.commit(
        "replace",
        added=infos,
        removed_paths=removed,
        extra_summary={"rollup_src_snapshot": int(cur)},
    )
    rollup.set_property(anchor_key, int(cur))
    return {"delta_rows": delta_rows, "from_snapshot": last, "to_snapshot": cur}
