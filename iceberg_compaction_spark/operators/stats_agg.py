"""Aggregate pushdown into the manifest: answer COUNT(*) (optionally
filtered) from per-file metadata, scanning only the files the bounds
cannot decide.

Iceberg engines answer ``SELECT count(*)`` from manifest
``record_count`` sums without opening a single data file; with a
predicate, the same three-way split DELETE WHERE uses applies:

  * files whose bounds prove NO row matches  → contribute 0 (pruned);
  * files whose bounds prove EVERY row matches (strict
    ``file_all_match``) → contribute ``record_count`` from metadata;
  * straddling files → scanned with the predicate (residual count).

At 10^12 rows a partition-aligned predicate (`ts >= day`) makes the
scan term empty or tiny — the count is a metadata operation, which is
the difference between an instant dashboard and a cluster-wide scan.

Falls back to a plain MoR scan count whenever delete files exist
(record_count sums would over-count deleted rows) — correct first,
fast when the table shape allows.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.plans import pruning
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources import scan as scan_mod
from iceberg_compaction_spark.sources.table import Table


def fast_count(
    spark: SparkSession,
    table: Table,
    predicate: str | None = None,
    snapshot_id: int | None = None,
) -> dict:
    """→ {"count": n, "metadata_files": a, "scanned_files": b,
    "pruned_files": c}. Exact always; metadata-only when the table has
    no delete files and the bounds decide every file."""
    rows = table.manifest(snapshot_id)
    data_rows = [r for r in rows if r["content"] == mf.CONTENT_DATA]
    has_deletes = any(r["content"] != mf.CONTENT_DATA for r in rows)

    if has_deletes:
        # MoR resolution changes per-file cardinality: metadata sums
        # would over-count. Use the (pruned, residual-filtered) scan.
        df = table.scan(spark, snapshot_id=snapshot_id, filter=predicate)
        return {
            "count": df.count(),
            "metadata_files": 0,
            "scanned_files": len(data_rows) - table.last_scan_pruned_files,
            "pruned_files": table.last_scan_pruned_files,
        }

    if not predicate:
        return {
            "count": sum(r["record_count"] for r in data_rows),
            "metadata_files": len(data_rows),
            "scanned_files": 0,
            "pruned_files": 0,
        }

    disjuncts = pruning.parse_predicate(predicate)
    col_types = table.column_type_categories()
    meta_count = 0
    meta_files = pruned = 0
    straddlers: list[dict] = []
    for r in data_rows:
        try:
            stats = json.loads(r.get("stats_json") or "{}")
        except ValueError:
            stats = {}
        if not pruning.file_may_match_any(stats, disjuncts, col_types):
            pruned += 1
        elif pruning.file_all_match(stats, disjuncts, col_types):
            meta_count += r["record_count"]
            meta_files += 1
        else:
            straddlers.append(r)

    scanned = 0
    if straddlers:
        scanned = (
            table.read_data_rows(spark, straddlers).filter(F.expr(predicate)).count()
        )
    return {
        "count": meta_count + scanned,
        "metadata_files": meta_files,
        "scanned_files": len(straddlers),
        "pruned_files": pruned,
    }
