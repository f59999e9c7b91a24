"""Row-level DELETE WHERE, merge-on-read style.

The engine's delete primitives (position/equality delete files, the J1
anti-join) compose into the SQL-user-facing op: delete every row
matching a predicate, without rewriting data.

Two-tier plan, same idea as Iceberg's metadata delete:
  1. **whole files** whose manifest bounds prove EVERY row matches are
     dropped by metadata only (no read, no write) — for partition- or
     time-aligned predicates this is most of the work;
  2. **straddling files** (bounds overlap the predicate) are scanned
     with the predicate and their matching (file, pos) pairs land in a
     position-delete file.
One atomic commit carries both. Cost: a filtered scan of straddling
files only; predicate pushdown + file pruning keep that small.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.mor import FILE_COL, POS_COL
from iceberg_compaction_spark.plans import pruning
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources import scan as scan_mod
from iceberg_compaction_spark.sources.table import Table


def _file_fully_matches(stats: dict, conjuncts) -> bool:
    """True only when the bounds PROVE every row satisfies each
    conjunct (min and max both inside; zero nulls known). Conservative:
    anything uncertain is treated as straddling."""
    for col, op, lits in conjuncts:
        st = stats.get(col)
        if st is None or st.get("min") is None or st.get("max") is None:
            return False
        if st.get("nulls") != 0:
            return False
        lo_ok = pruning.file_may_match({col: {"min": st["min"], "max": st["min"], "nulls": 0}}, [(col, op, lits)])
        hi_ok = pruning.file_may_match({col: {"min": st["max"], "max": st["max"], "nulls": 0}}, [(col, op, lits)])
        # for range ops, min and max each satisfying the predicate ⇒
        # every value between does; for = / in that holds only when
        # min == max (single-valued file)
        if op in ("=", "in") and st["min"] != st["max"]:
            return False
        if not (lo_ok and hi_ok):
            return False
    return True


def delete_where(spark: SparkSession, table: Table, predicate: str) -> dict:
    """Delete all rows matching ``predicate`` in one atomic commit.
    Returns {"dropped_files": n, "deleted_rows": m, "snapshot_id": sid}.
    """
    conjuncts = pruning.parse_conjuncts(predicate)
    data_rows = table.files(content=mf.CONTENT_DATA)

    full_drop: list[str] = []
    candidates: list[dict] = []
    for r in data_rows:
        try:
            stats = json.loads(r.get("stats_json") or "{}")
        except ValueError:
            stats = {}
        if not pruning.file_may_match(stats, conjuncts):
            continue  # provably no matching row: untouched
        if conjuncts and _file_fully_matches(stats, conjuncts):
            full_drop.append(r["path"])
        else:
            candidates.append(r)

    added: list[mf.FileInfo] = []
    deleted_rows = 0
    if candidates:
        df = scan_mod.read_data_files(
            spark,
            [r["path"] for r in candidates],
            schema=table.physical_schema(),
            with_file=True,
            with_pos=True,
        )
        hits = df.filter(F.expr(predicate)).select(FILE_COL, POS_COL)
        added = table.write_delete_files(hits, [FILE_COL, POS_COL], mf.CONTENT_POS_DEL)
        deleted_rows = sum(fi.record_count for fi in added)
        if deleted_rows == 0:
            added = []  # nothing matched: don't commit an empty delete file
    deleted_rows += sum(r["record_count"] for r in data_rows if r["path"] in set(full_drop))

    if not full_drop and not added:
        return {
            "dropped_files": 0,
            "deleted_rows": 0,
            "snapshot_id": table.current_snapshot_id,
        }
    sid = table.commit("delete", added=added, removed_paths=full_drop)
    return {
        "dropped_files": len(full_drop),
        "deleted_rows": deleted_rows,
        "snapshot_id": sid,
    }
