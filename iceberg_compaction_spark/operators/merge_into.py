"""MERGE INTO upserts, merge-on-read style (M3).

The reference has no MERGE (it is a maintenance engine), but MoR
engines implement MERGE with exactly the machinery it *does* have:
write one **equality-delete file** for the matched keys plus new
**data files** for the source rows, in a single commit — subsequent
scans resolve the upsert via the J2 anti-join with the sequence-number
predicate (``sql_builder.rs:120-152`` semantics). Compaction later
folds the delete in.

Semantics (keyed on (conv_id, turn_idx) per the north rule):
  * whenMatched → update: old row dies via the eq delete, new row wins;
  * whenNotMatched → insert: no delete row is written for keys the
    manifest bounds prove absent from the target (an insert-heavy MERGE
    must not inflate the delete set every subsequent scan resolves);
  * source duplicates: latest-wins dedup by a window over the key
    (SURVEY.md §2.5), deterministic via an explicit precedence column.
"""

from __future__ import annotations

import json
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources.table import Table

#: above this many merged key-range intervals the scoping predicate
#: stops paying for itself — fall back to deletes-for-all-keys
_MAX_SCOPE_INTERVALS = 64


def dedup_source(source: DataFrame, keys: Sequence[str], precedence: str | None = None) -> DataFrame:
    """Latest-version-wins per key. ``precedence`` names a column whose
    highest value wins (e.g. an event timestamp); without one, source
    rows must already be unique per key (enforced)."""
    if precedence:
        w = Window.partitionBy(*keys).orderBy(F.col(precedence).desc())
        return (
            source.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return source


def _target_key_intervals(table: Table, key: str) -> list[tuple] | None:
    """Merged [min, max] intervals of ``key`` across the target's live
    data files, from manifest bounds only (no data read). ``None`` when
    any file lacks bounds (scoping impossible); ``[]`` for an empty
    target (nothing can match). Zero-record part-files hold nothing to
    match; files whose key column is ALL NULL legitimately carry no
    bounds and can never satisfy an equality join — both are skipped
    rather than poisoning the scope (round 8, shared with the CDC
    apply's absent-key tombstone skip)."""
    intervals: list[tuple] = []
    for r in table.files(content=mf.CONTENT_DATA):
        if not r.get("record_count"):
            continue
        try:
            st = json.loads(r.get("stats_json") or "{}").get(key)
        except ValueError:
            return None
        if not st or st.get("min") is None or st.get("max") is None:
            nulls = (st or {}).get("nulls")
            if nulls is not None and nulls >= r["record_count"]:
                continue
            return None
        intervals.append((st["min"], st["max"]))
    if not intervals:
        return []
    intervals.sort()
    merged = [list(intervals[0])]
    for lo, hi in intervals[1:]:
        if lo <= merged[-1][1]:
            if hi > merged[-1][1]:
                merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    return [tuple(m) for m in merged]


def _scope_condition(key: str, intervals: list[tuple]) -> Column:
    cond = None
    for lo, hi in intervals:
        c = F.col(key).between(F.lit(lo), F.lit(hi))
        cond = c if cond is None else (cond | c)
    return cond


def merge_into(
    table: Table,
    source: DataFrame,
    keys: Sequence[str],
    precedence: str | None = None,
    delete_matched_only: bool = False,
    scope_deletes: bool = True,
    extra_summary: dict | None = None,
    mode: str | None = None,
) -> int:
    """Upsert ``source`` into ``table`` keyed by ``keys``. Returns the
    new snapshot id. One commit carries both the equality-delete file
    and the new data files (atomic upsert). MERGE costs O(source), not
    O(table) — the target is never scanned, only its manifest bounds.

    ``mode`` (Iceberg's ``write.merge.mode``; ``None`` reads the table
    property, default 'mor'):
      * ``"mor"`` — equality-delete + new data files (this docstring's
        default path); cheap writes, reads pay the anti-join until
        compaction folds it;
      * ``"cow"`` — candidate files (key bounds overlapping the source
        key range) are REWRITTEN without the matched rows and replaced
        together with the new source data files in one commit; no
        delete files exist afterwards. Write amplification = candidate
        bytes; a source disjoint from every file's key range rewrites
        nothing and degrades to a pure append.

    ``scope_deletes`` (default): delete rows are written only for
    source keys whose first key column falls inside some live data
    file's [min, max] — a conservative superset of the matched keys
    from metadata alone. An insert-only MERGE (empty target or disjoint
    key ranges) therefore commits ZERO delete files. Like Iceberg's
    copy-on-write MERGE, the match set is evaluated against the current
    snapshot; concurrent writers need snapshot validation on top.

    ``delete_matched_only=True`` turns this into MERGE ... WHEN MATCHED
    THEN DELETE (no inserts) — the source rows are pure key tombstones.
    """
    if mode is None:
        mode = table.get_property("write.merge.mode", "mor")
    if mode not in ("mor", "cow"):
        raise ValueError("mode must be 'mor' or 'cow'")
    src = dedup_source(source, keys, precedence)
    if mode == "cow":
        return _merge_cow(table, src, keys, delete_matched_only, extra_summary)

    # 1. equality-delete file for source keys that may exist in the
    #    target (manifest-bounds semi-scope; unmatched survivors are
    #    harmless no-ops in the anti-join)
    del_keys = src.select(*keys)
    if scope_deletes:
        intervals = _target_key_intervals(table, keys[0])
        if intervals is not None and len(intervals) <= _MAX_SCOPE_INTERVALS:
            if not intervals:
                del_keys = None  # empty target: pure insert
            else:
                del_keys = del_keys.filter(_scope_condition(keys[0], intervals))
    infos_del = [] if del_keys is None else table_write_eq_delete(table, del_keys, keys)
    if sum(fi.record_count for fi in infos_del) == 0:
        infos_del = []  # nothing in scope: don't commit empty delete files

    # 2. new data files for the source rows (skipped for pure deletes)
    infos_data = [] if delete_matched_only else table.write_data_files(src)

    return table.commit(
        "merge",
        added=list(infos_del) + list(infos_data),
        extra_summary=extra_summary,
    )


def _merge_cow(
    table: Table,
    src: DataFrame,
    keys: Sequence[str],
    delete_matched_only: bool,
    extra_summary: dict | None,
) -> int:
    """Copy-on-write MERGE: rewrite may-match files without the matched
    rows; land the rewrites + the new source data files in ONE replace
    commit. Candidates are chosen by first-key manifest bounds against
    the source's key intervals (metadata-only, like the MoR scoping
    path); the rewrite reads candidates through the MoR-resolved scan,
    so rows an existing delete already killed never resurrect — and
    those tombstones fold into the rewrite exactly as compaction would
    fold them."""
    data_rows = table.files(content=mf.CONTENT_DATA)
    key0 = keys[0]
    # source key range (two scalars; one narrow agg), normalized to the
    # manifest's JSON representation (timestamps/dates serialize as ISO
    # strings there — same-format ISO compares chronologically, and
    # comparing a raw datetime against a stats string would TypeError)
    rng = src.agg(
        F.min(key0).alias("lo"), F.max(key0).alias("hi")
    ).collect()[0]
    src_lo, src_hi = mf._json_safe(rng["lo"]), mf._json_safe(rng["hi"])

    def _overlaps(r: dict) -> bool:
        if src_lo is None:  # empty source handled below
            return False
        try:
            st = json.loads(r.get("stats_json") or "{}").get(key0)
        except ValueError:
            return True  # unknown bounds: conservative candidate
        if not st or st.get("min") is None or st.get("max") is None:
            return True
        try:
            return not (st["max"] < src_lo or st["min"] > src_hi)
        except TypeError:
            return True  # incomparable representations: keep the file

    candidates = [r["path"] for r in data_rows if _overlaps(r)]
    added: list = []
    removed: list[str] = []
    if candidates:
        scanned = table.scan(src.sparkSession, paths=candidates).persist()
        try:
            key_df = src.select(*keys).distinct()
            cond = None
            for k in keys:
                c = F.col(f"d.{k}").eqNullSafe(F.col(f"s.{k}"))
                cond = c if cond is None else (cond & c)
            matched = (
                scanned.alias("d")
                .join(key_df.alias("s"), on=cond, how="left_semi")
                .count()
            )
            if matched > 0:
                survivors = scanned.alias("d").join(
                    key_df.alias("s"), on=cond, how="left_anti"
                )
                added += [
                    fi
                    for fi in table.write_data_files(survivors)
                    if fi.record_count > 0
                ]
                removed += candidates
        finally:
            scanned.unpersist()
    if not delete_matched_only:
        added += [fi for fi in table.write_data_files(src) if fi.record_count > 0]
    if not added and not removed:
        return table.current_snapshot_id  # empty no-op merge
    return table.commit(
        "merge",
        added=added,
        removed_paths=removed,
        extra_summary=extra_summary,
    )


def table_write_eq_delete(table: Table, keys_df: DataFrame, keys: Sequence[str]):
    # size-based fan-out (Table.DELETE_ROWS_PER_FILE): a MERGE with a
    # 10^9-row source writes ~128 eq-delete files in parallel instead of
    # funnelling the whole delete set through one task
    return table.write_delete_files(
        keys_df, list(keys), mf.CONTENT_EQ_DEL, equality_ids=list(keys)
    )
