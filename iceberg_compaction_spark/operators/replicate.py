"""Incremental table replication: apply a source table's row-level
changelog to a target table — the CDC-apply shape (Iceberg changelog
consumption, Delta "merge the CDF") that turns the engine's changelog
scan into a maintained downstream copy.

Each ``apply_changelog`` call reads ``changelog_scan(src)`` over the
window since the last applied snapshot, NETS the changes per key (the
latest change wins: an upsert pair delete+insert inside one commit
collapses to the insert), and applies the net in ONE atomic commit on
the target:

  * one equality-delete file tombstoning EVERY net key (kills the
    target's previous row versions; equality deletes only kill lower
    sequence numbers, so the same commit's inserts survive — the
    exact mechanism ``merge_into`` uses), plus
  * data files for the keys whose final state is an insert.

Crash safety is the rollup/stream recipe: the applied-through anchor
rides the commit's own snapshot summary (``replicate_src_snapshot``)
and is mirrored to a target property; recovery takes the max of both,
so a replayed apply sees cur == last and no-ops — never a double
apply (and the net itself is idempotent anyway: same tombstones, same
rows).

Maintenance coexistence is NATIVE here: ``changelog_scan`` skips
replace / rewrite_manifests / maintenance commits by construction
(compaction moves bytes, not rows), so source compaction between
refreshes costs the replication nothing. A window that cannot be
walked (source rolled back past the anchor, or expired mid-window)
falls back to one full RESYNC — the target is atomically replaced
with the source's current rows.

Scale shape: a refresh costs O(changed rows) — the changelog's
append-commit scans read only added files, the net is one window over
the change set keyed by the replication key, and the target is never
scanned (tombstones are metadata-scoped like MERGE). The 100 TB
history moves only on resync.

Reference contrast: the reference engine has no change capture at all
(SURVEY §2.12 family); this composes our changelog (round 4) with the
MERGE primitives (round 2).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.operators.changelog import (
    CHANGE_SNAPSHOT_COL,
    CHANGE_TYPE_COL,
    changelog_scan,
)
from iceberg_compaction_spark.operators.merge_into import table_write_eq_delete
from iceberg_compaction_spark.sources.table import Table

_ANCHOR_PROP = "replicate.last-src-snapshot"
_ANCHOR_SUMMARY = "replicate_src_snapshot"


def _last_applied(target: Table) -> int | None:
    """max(property, snapshot summaries) — the crash-safe anchor."""
    vals = []
    prop = target.get_property(_ANCHOR_PROP, None)
    if prop is not None:
        vals.append(int(prop))
    for s in target.snapshots():
        v = (s.get("summary") or {}).get(_ANCHOR_SUMMARY)
        if v is not None:
            vals.append(int(v))
    return max(vals) if vals else None


def apply_changelog(
    spark: SparkSession,
    src: Table,
    target: Table,
    keys: list[str],
) -> dict:
    """Fold source changes since the last apply into ``target``.
    Returns {mode: noop|incremental|resync, upserts, deletes,
    from_snapshot, to_snapshot}. ``keys`` is the replication key (the
    source must be unique per key at any snapshot, e.g. its MERGE
    key); column set replicated = the target's user columns."""
    last = _last_applied(target)
    cur = src.current_snapshot_id
    if cur is None or cur == last:
        return {
            "mode": "noop", "upserts": 0, "deletes": 0,
            "from_snapshot": last, "to_snapshot": cur,
        }
    cols = target.user_columns()
    try:
        changes = changelog_scan(spark, src, last, cur, columns=cols)
        mode = "incremental"
    except ValidationError:
        # rolled-back or expired window: no exact delta exists —
        # replace the target with the source's current rows
        changes = None
        mode = "resync"

    if mode == "resync":
        rows = src.scan(spark, columns=cols)
        infos = target.write_data_files(rows)
        target.commit(
            "merge",
            added=infos,
            removed_paths=sorted(f["path"] for f in target.files()),
            extra_summary={_ANCHOR_SUMMARY: int(cur), "replicate_resync": True},
        )
        n_up = sum(fi.record_count for fi in infos)
        n_del = 0
    else:
        # net per key: the LAST change wins; within one snapshot an
        # upsert pair (delete old + insert new) collapses to the insert
        is_ins = (F.col(CHANGE_TYPE_COL) == "insert").cast("int")
        w = Window.partitionBy(*keys).orderBy(
            F.desc(CHANGE_SNAPSHOT_COL), F.desc(is_ins)
        )
        net = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", CHANGE_SNAPSHOT_COL)
        ).persist()
        try:
            upserts = net.filter(F.col(CHANGE_TYPE_COL) == "insert").select(*cols)
            # an empty target (initial load) needs no tombstones —
            # nothing exists to kill, so the apply is a pure append
            infos_del = (
                table_write_eq_delete(
                    target, net.select(*keys).distinct(), keys
                )
                if target.files(content="data")
                else []
            )
            # empty-partition writes can emit zero-record part-files:
            # drop them so a change-free window commits nothing (same
            # rule as merge_into's append path)
            infos_del = [fi for fi in infos_del if fi.record_count > 0]
            infos_data = [
                fi for fi in target.write_data_files(upserts)
                if fi.record_count > 0
            ]
            n_up = sum(fi.record_count for fi in infos_data)
            n_del = net.filter(F.col(CHANGE_TYPE_COL) == "delete").count()
            if not infos_del and not infos_data:
                # pure-metadata window on the source: advance the
                # anchor without a commit (same rule as the rollup)
                target.set_property(_ANCHOR_PROP, int(cur))
                net.unpersist()
                return {
                    "mode": "incremental", "upserts": 0, "deletes": 0,
                    "from_snapshot": last, "to_snapshot": cur,
                }
            target.commit(
                "merge",
                added=list(infos_del) + list(infos_data),
                extra_summary={_ANCHOR_SUMMARY: int(cur)},
            )
        finally:
            net.unpersist()
    try:
        target.set_property(_ANCHOR_PROP, int(cur))
    except Exception:
        from iceberg_compaction_spark.metrics import GLOBAL

        GLOBAL.inc("replicate.anchor_mark_write_failed")
    return {
        "mode": mode, "upserts": int(n_up), "deletes": int(n_del),
        "from_snapshot": last, "to_snapshot": cur,
    }
