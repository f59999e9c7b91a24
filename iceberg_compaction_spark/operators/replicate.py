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

Target hygiene (round 8): left alone, N applies leave N eq-delete
files of mostly-dead tombstones that every MoR read chains through —
the exact delete-file debt the reference's planner exists to notice
(crates/planner/src/file_selection.rs:212-216). Two bounds:

  * tombstones for keys PROVABLY ABSENT from the target are skipped
    using manifest key bounds (the min/max stats S9 already stores —
    metadata-only, the target is still never scanned). Conservative:
    a file with unknown bounds, a non-orderable key type, or too many
    disjoint intervals ⇒ tombstone everything, as before.
  * ``delete_file_debt_limit`` (default 64 live eq-delete files) runs
    ``rewrite_equality_deletes`` on the target inside the apply loop
    once crossed, consolidating per key set and dropping dead entries
    — so steady-state applies hold the target's delete-file count
    bounded regardless of apply cadence.

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
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources.table import Table

_ANCHOR_PROP = "replicate.last-src-snapshot"
_ANCHOR_SUMMARY = "replicate_src_snapshot"

#: Spark dtypes whose manifest min/max stats order exactly like the
#: column itself (what the absent-key tombstone skip requires); dates /
#: timestamps / binaries are excluded — their stats round-trip through
#: JSON as strings whose comparison semantics we refuse to guess.
_BOUNDS_DTYPES = ("tinyint", "smallint", "int", "bigint", "float", "double", "string")


def _present_key_intervals(
    target: Table, key: str, max_intervals: int = 512
) -> list[tuple] | None:
    """Merged [min, max] intervals of ``key`` over the target's live
    data files — ``merge_into._target_key_intervals`` (the MERGE
    delete-scope machinery, reused verbatim: metadata-only, never a
    scan; zero-record and all-NULL-key files skipped) plus the
    replication-side conservatisms: mixed stat kinds and more disjoint
    intervals than we will inline into one predicate both return None,
    meaning "absence provable for NO key — tombstone everything",
    exactly the pre-round-8 behavior."""
    from iceberg_compaction_spark.operators.merge_into import (
        _target_key_intervals,
    )

    ivs = _target_key_intervals(target, key)
    if ivs is None or len(ivs) > max_intervals:
        return None
    kinds = {
        ("num" if isinstance(x, (int, float)) and not isinstance(x, bool) else type(x).__name__)
        for iv in ivs
        for x in iv
    }
    if ivs and kinds not in ({"num"}, {"str"}):
        return None
    return ivs


def _intervals_if_orderable(net, target: Table, key: str) -> list[tuple] | None:
    """``_present_key_intervals`` gated on the key column's dtype: the
    skip engages only when the Spark type and the JSON-round-tripped
    stat values share exact ordering semantics. None ⇒ no skip."""
    t = dict(net.dtypes).get(key, "")
    if t not in _BOUNDS_DTYPES:
        return None
    iv = _present_key_intervals(target, key)
    if iv is None:
        return None
    if iv and (t == "string") != isinstance(iv[0][0], str):
        return None  # stat kind does not match the column kind
    return iv


def sync_target_schema(src: Table, target: Table) -> list[str]:
    """Follow the source's schema evolution on the target before an
    apply — the Delta/Iceberg "schema auto-merge" CDC behavior, from
    the engine's own metadata-only evolution primitives:

      * source RENAMES replay first, from the source's recorded rename
        log in order (a replica created as a schema copy has the old
        name; a rename whose ``from`` exists on the target and whose
        ``to`` does not is replayed verbatim) — so renamed columns keep
        their history instead of degrading to drop+add;
      * columns the source has and the target lacks are ADDED, carrying
        the source's initial-default when one is recorded;
      * legal type WIDENINGS (Iceberg's promotion table) are applied;
        a target already widened past the source is left alone (writes
        cast up); any other type change raises ``ValidationError`` —
        replication must not guess lossy casts;
      * columns dropped on the source are KEPT on the target (changed
        rows carry NULL for them) — a replication target never loses a
        column silently.

    Everything is metadata-only; no target data moves. Returns the DDL
    actions taken, [] when the schemas already agree."""
    actions: list[str] = []
    tgt_cols = set(target.user_columns())
    for ren in sorted(src.meta.get("renames") or [], key=lambda r: r["ord"]):
        if ren["from"] in tgt_cols and ren["to"] not in tgt_cols:
            target.rename_column(ren["from"], ren["to"])
            tgt_cols.discard(ren["from"])
            tgt_cols.add(ren["to"])
            actions.append(f"rename {ren['from']} -> {ren['to']}")
    defaults = {
        d["col"]: d["value"] for d in (src.meta.get("column_defaults") or [])
    }
    tgt_types = {n: t.lower() for n, t in target.schema_fields()}
    for name, typ in src.schema_fields():
        t = typ.lower()
        if name not in tgt_types:
            target.add_column(name, typ, default=defaults.get(name))
            actions.append(f"add {name} {t}")
        elif tgt_types[name] != t:
            cur = tgt_types[name]
            if t in Table._WIDENINGS.get(cur, set()):
                target.widen_column(name, typ)
                actions.append(f"widen {name} {cur} -> {t}")
            elif cur not in Table._WIDENINGS.get(t, set()):
                raise ValidationError(
                    f"cannot follow source type change for {name}: "
                    f"{cur} -> {t} is not a lossless widening"
                )
    return actions


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
    skip_absent_tombstones: bool = True,
    delete_file_debt_limit: int | None = 64,
    follow_schema: bool = False,
) -> dict:
    """Fold source changes since the last apply into ``target``.
    Returns {mode: noop|incremental|resync, upserts, deletes,
    from_snapshot, to_snapshot, tombstones_written,
    tombstones_skipped, eq_delete_files, consolidated,
    schema_actions}. ``keys`` is the replication key (the source must
    be unique per key at any snapshot, e.g. its MERGE key); column set
    replicated = target columns ∩ source columns (a column only the
    target has — e.g. dropped upstream — is kept; changed rows carry
    NULL for it).

    ``skip_absent_tombstones`` drops tombstones for keys provably
    absent from the target (manifest key bounds on ``keys[0]`` —
    metadata-only; see ``_present_key_intervals``). NULL net keys are
    always tombstoned. ``delete_file_debt_limit``: once the target
    holds at least this many live eq-delete files after an apply,
    ``rewrite_equality_deletes`` consolidates them in the same loop
    (None disables). ``follow_schema`` replays source schema evolution
    (renames / adds with defaults / widenings) on the target before
    the apply — ``sync_target_schema``; off, new source columns simply
    aren't replicated until the caller evolves the target."""
    schema_actions: list[str] = []
    if follow_schema:
        # before the noop check: DDL-only evolution creates no source
        # snapshot, and the replica's schema should follow immediately
        schema_actions = sync_target_schema(src, target)
    last = _last_applied(target)
    cur = src.current_snapshot_id
    if cur is None or cur == last:
        return {
            "mode": "noop", "upserts": 0, "deletes": 0,
            "from_snapshot": last, "to_snapshot": cur,
            "tombstones_written": 0, "tombstones_skipped": 0,
            "eq_delete_files": len(target.files(content=mf.CONTENT_EQ_DEL)),
            "consolidated": False, "schema_actions": schema_actions,
        }
    src_cols = set(src.user_columns())
    cols = [c for c in target.user_columns() if c in src_cols]
    # writes land in the TARGET's types: after a followed widening (or
    # a target already widened past the source) the net rows arrive at
    # the source's type — the cast is a Catalyst no-op when they agree
    tgt_types = dict(target.schema_fields())

    def _to_target_types(df, names):
        return df.select(
            *[F.col(c).cast(tgt_types[c]).alias(c) for c in names]
        )
    try:
        changes = changelog_scan(spark, src, last, cur, columns=cols)
        mode = "incremental"
    except ValidationError:
        # rolled-back or expired window: no exact delta exists —
        # replace the target with the source's current rows
        changes = None
        mode = "resync"

    if mode == "resync":
        # pinned to ``cur``: the anchor records cur, so rows from a
        # commit racing in after the capture must not ride this resync
        # (they'd be applied again by the next incremental window);
        # zero-record part-files are dropped like the incremental path
        rows = _to_target_types(src.scan(spark, snapshot_id=cur, columns=cols), cols)
        infos = [
            fi for fi in target.write_data_files(rows) if fi.record_count > 0
        ]
        target.commit(
            "merge",
            added=infos,
            removed_paths=sorted(f["path"] for f in target.files()),
            extra_summary={_ANCHOR_SUMMARY: int(cur), "replicate_resync": True},
        )
        n_up = sum(fi.record_count for fi in infos)
        n_del = 0
        n_tomb = n_skip = 0
    else:
        # net per key: the LAST change wins; within one snapshot an
        # upsert pair (delete old + insert new) collapses to the insert
        is_ins = (F.col(CHANGE_TYPE_COL) == "insert").cast("int")
        # (round 9 note: an append-only window could skip this net
        # window outright — every change is a unique-key insert — but
        # measured at sf1.0 the window's exchange is what spreads the
        # downstream target write across the session's cores; skipping
        # it left the write at the source scan's split count and was
        # net SLOWER. Kept as the exact general fold.)
        w = Window.partitionBy(*keys).orderBy(
            F.desc(CHANGE_SNAPSHOT_COL), F.desc(is_ins)
        )
        net = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", CHANGE_SNAPSHOT_COL)
        ).persist()
        try:
            upserts = _to_target_types(
                net.filter(F.col(CHANGE_TYPE_COL) == "insert"), cols
            )
            # net is already unique per key (the _rn == 1 filter), so
            # the tombstone set is a plain projection — no distinct
            # (the round-7 form paid a redundant shuffle here)
            tomb = _to_target_types(net, keys)
            # an empty target (initial load) needs no tombstones —
            # nothing exists to kill, so the apply is a pure append
            infos_del = []
            tomb_attempted = bool(target.files(content="data"))
            if tomb_attempted:
                if skip_absent_tombstones:
                    iv = _intervals_if_orderable(net, target, keys[0])
                    if iv is not None:
                        k = F.col(keys[0])
                        present = k.isNull()  # NULL keys: never skipped
                        for lo, hi in iv:
                            present = present | k.between(F.lit(lo), F.lit(hi))
                        tomb = tomb.filter(present)
                infos_del = table_write_eq_delete(target, tomb, keys)
            # empty-partition writes can emit zero-record part-files:
            # drop them so a change-free window commits nothing (same
            # rule as merge_into's append path)
            infos_del = [fi for fi in infos_del if fi.record_count > 0]
            infos_data = [
                fi for fi in target.write_data_files(upserts)
                if fi.record_count > 0
            ]
            n_up = sum(fi.record_count for fi in infos_data)
            # ONE aggregation over the persisted net for the change
            # counts (the round-7 form ran a separate filter+count)
            cnt = net.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(is_ins).alias("ins"),
            ).collect()[0]
            n_keys = int(cnt["n"] or 0)
            n_del = n_keys - int(cnt["ins"] or 0)
            n_tomb = sum(fi.record_count for fi in infos_del)
            n_skip = n_keys - n_tomb if tomb_attempted else 0
            if not infos_del and not infos_data:
                # pure-metadata window on the source: advance the
                # anchor without a commit (same rule as the rollup)
                target.set_property(_ANCHOR_PROP, int(cur))
                net.unpersist()
                return {
                    "mode": "incremental", "upserts": 0, "deletes": 0,
                    "from_snapshot": last, "to_snapshot": cur,
                    "tombstones_written": 0, "tombstones_skipped": int(n_skip),
                    "eq_delete_files": len(target.files(content=mf.CONTENT_EQ_DEL)),
                    "consolidated": False, "schema_actions": schema_actions,
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
    result = {
        "mode": mode, "upserts": int(n_up), "deletes": int(n_del),
        "from_snapshot": last, "to_snapshot": cur,
        "tombstones_written": int(n_tomb), "tombstones_skipped": int(n_skip),
        "consolidated": False, "schema_actions": schema_actions,
    }
    # delete-file-debt trigger: bound the tombstone files a long apply
    # cadence accrues — the same FilesWithDeletes signal the reference
    # plans rewrites from, composed with our own eq-delete consolidator
    eq_files = target.files(content=mf.CONTENT_EQ_DEL)
    if (
        delete_file_debt_limit is not None
        and len(eq_files) >= delete_file_debt_limit
    ):
        from iceberg_compaction_spark.operators.maintenance import (
            rewrite_equality_deletes,
        )

        rewrite_equality_deletes(spark, target)
        result["consolidated"] = True
        eq_files = target.files(content=mf.CONTENT_EQ_DEL)
    result["eq_delete_files"] = len(eq_files)
    return result
