"""Executor-side twin of the driver file pruner for LARGE manifests.

``plans/pruning.prune_files`` walks manifest rows in driver Python —
the same place Iceberg planners prune, and fine at the design point
(~3·10⁵ files ≈ 30 MB). At the 10⁶-file stretch envelope the
single-threaded loop (JSON decode per file) costs seconds per scan.
This twin evaluates the SAME predicate over the manifest-as-DataFrame
(``Table.files_df``), so the decode + bounds work distributes across
executors and the driver receives only the surviving paths.

Fidelity: rather than re-implementing the bounds logic as Column
expressions (where string-vs-decimal casts would diverge from the
driver evaluator on big-int edges like 2^53), the twin ships the
EXACT SAME ``file_may_match_any`` evaluator into an Arrow-vectorized
pandas UDF — survivor sets are identical by construction (pinned by a
hypothesis test), including ts-shaped literal type resolution. Bloom
probing inside the evaluator degrades gracefully where sidecar files
aren't reachable from executors (``maybe_contains`` treats an
unreadable sidecar as "maybe present"), so the twin is never less
correct, at most less aggressive.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame

from iceberg_compaction_spark.plans import pruning


def prune_files_df(
    files_df: DataFrame, filter_expr: str, col_types: dict | None = None
) -> DataFrame:
    """Manifest rows of ``files_df`` that MAY match ``filter_expr``
    (data-file rows expected; pass a pre-filtered frame). Returns the
    input unchanged when the predicate can't prune at all — callers
    can short-circuit on identity."""
    from pyspark.sql import functions as F

    disjuncts = pruning.parse_predicate(filter_expr)
    if disjuncts is None:
        return files_df
    if any(all(c is pruning.UNPARSED for c in d) for d in disjuncts):
        return files_df

    @F.pandas_udf("boolean")
    def may_match(stats_json: pd.Series) -> pd.Series:
        def one(s):
            try:
                stats = json.loads(s or "{}")
            except ValueError:
                stats = {}
            return pruning.file_may_match_any(stats, disjuncts, col_types)

        return stats_json.map(one)

    return files_df.filter(may_match(F.col("stats_json")))


def _classify_one(stats_json: str, disjuncts, col_types) -> str:
    try:
        stats = json.loads(stats_json or "{}")
    except ValueError:
        stats = {}
    if not pruning.file_may_match_any(stats, disjuncts, col_types):
        return "pruned"
    if pruning.file_all_match(stats, disjuncts, col_types):
        return "all"
    return "straddle"


def classify_data_rows(
    spark,
    data_rows,
    predicate: str,
    col_types: dict | None = None,
    files_df_factory=None,
    threshold: int = 4096,
) -> dict:
    """{path: 'pruned' | 'all' | 'straddle'} — the three-way split the
    metadata operators (fast_count, DELETE/UPDATE WHERE) share. Below
    ``threshold`` files it is the driver loop; above, the SAME
    classifier runs Arrow-vectorized over the manifest DataFrame
    (``files_df_factory()``) and the driver receives (path, verdict)
    pairs only — no per-file JSON decode on the driver at the
    10⁶-file stretch envelope."""
    disjuncts = pruning.parse_predicate(predicate)
    if len(data_rows) > threshold and files_df_factory is not None:
        from pyspark.sql import functions as F

        @F.pandas_udf("string")
        def verdict(stats_json: pd.Series) -> pd.Series:
            return stats_json.map(lambda s: _classify_one(s, disjuncts, col_types))

        got = (
            files_df_factory()
            .select("path", verdict(F.col("stats_json")).alias("v"))
            .collect()
        )
        return {r["path"]: r["v"] for r in got}
    return {
        r["path"]: _classify_one(r.get("stats_json"), disjuncts, col_types)
        for r in data_rows
    }
