"""Changelog (CDC) scan: state(from) + changes == state(to), upserts
emit delete+insert pairs, and the stream is invariant under
compaction."""

from __future__ import annotations

import os
from collections import Counter

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.changelog import changelog_scan
from iceberg_compaction_spark.sources.generator import create_transcripts_table


def _rows(df, cols=("conv_id", "turn_idx", "text")):
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def _apply(initial: Counter, changes) -> Counter:
    out = Counter(initial)
    for r in changes.collect():
        key = (r["conv_id"], r["turn_idx"], r["text"])
        if r["_change_type"] == "delete":
            out[key] -= 1
            if out[key] == 0:
                del out[key]
        else:
            out[key] += 1
    return out


def test_changelog_replays_to_final_state(spark, tmp_warehouse):
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "cdc"), n_turns=3_000, n_convs=20,
        n_files=4, partitioned=True,
    )
    sid0 = t.current_snapshot_id
    initial = _rows(t.scan(spark))

    # MERGE: update every turn_idx%9==2 row, insert 15 brand-new rows
    upd = (
        t.scan(spark).filter(F.col("turn_idx") % 9 == 2)
        .withColumn("text", F.concat(F.col("text"), F.lit("~v2")))
    )
    new = spark.range(15).selectExpr(
        "concat('znew_', id) as conv_id", "cast(id as int) as turn_idx",
        "'user' as role", "'fresh row' as text",
        "cast(null as string) as tool", "timestamp'2024-06-01 00:00:00' as ts",
    )
    merge_into(t, upd.unionByName(new.select(*upd.columns)), keys=["conv_id", "turn_idx"])
    # DELETE WHERE: metadata drops + straddlers
    delete_where(spark, t, "turn_idx >= 120")

    changes = changelog_scan(spark, t, sid0, columns=["conv_id", "turn_idx", "text"])
    n_upd = upd.count()
    by_type = Counter(r["_change_type"] for r in changes.collect())
    assert by_type["insert"] == n_upd + 15
    assert by_type["delete"] >= n_upd  # old versions + the deleted range
    assert _apply(initial, changes) == _rows(t.scan(spark))

    # compaction must NOT change the changelog (replace commits skipped)
    before = _rows(changes, cols=("conv_id", "turn_idx", "text", "_change_type"))
    CompactionRunner(
        spark, t, CompactionConfig(selection=SelectionStrategy.FULL)
    ).execute()
    after_df = changelog_scan(spark, t, sid0, columns=["conv_id", "turn_idx", "text"])
    assert _rows(after_df, cols=("conv_id", "turn_idx", "text", "_change_type")) == before
    assert _apply(initial, after_df) == _rows(t.scan(spark))


def test_changelog_from_none_and_position_deletes(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "cdc2"), n_turns=1_000, n_convs=5,
        n_files=2, partitioned=False,
    )
    # position deletes via hidden cols
    hid = t.scan(spark, with_hidden=True).filter(F.col("turn_idx") % 11 == 3)
    t.add_position_deletes(hid.select("_file", "_pos"))
    changes = changelog_scan(spark, t, None, columns=["conv_id", "turn_idx", "text"])
    assert _apply(Counter(), changes) == _rows(t.scan(spark))
    dels = changes.filter(F.col("_change_type") == "delete")
    assert dels.count() == hid.count()
    # rollback emits the inverse stream
    sid_before = t.current_snapshot_id
    t.rollback_to(1)
    tail = changelog_scan(spark, t, sid_before, columns=["conv_id", "turn_idx", "text"])
    assert _apply(_rows(t.scan(spark, snapshot_id=sid_before)), tail) == _rows(t.scan(spark))


# ----------------------------------------------------------------------
# round 8: update pre/post images (Iceberg create_changelog_view:
# compute_updates + remove_carryovers)
def test_update_images_pairs_and_drops_carryovers(spark, tmp_warehouse):
    """A CoW MERGE rewrites whole files, so the raw changelog carries
    delete+insert pairs for every UNTOUCHED row of a touched file
    (carryovers); compute_update_images must cancel those and retag
    the genuinely-changed keys as update_before/update_after while
    plain deletes and inserts keep their types."""
    from iceberg_compaction_spark.operators.changelog import (
        UPDATE_AFTER,
        UPDATE_BEFORE,
        compute_update_images,
    )
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into

    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "cdcu"), n_turns=2_000, n_convs=10,
        n_files=3, partitioned=False,
    )
    sid0 = t.current_snapshot_id
    delete_where(spark, t, "turn_idx % 11 = 5")
    upd = (
        t.scan(spark).filter(F.col("turn_idx") % 9 == 2)
        .withColumn("text", F.concat(F.col("text"), F.lit("~v2")))
    )
    new = spark.range(7).selectExpr(
        "concat('znew_', id) as conv_id", "cast(id as int) as turn_idx",
        "'user' as role", "'fresh row' as text",
        "cast(null as string) as tool", "timestamp'2024-06-01 00:00:00' as ts",
    )
    merge_into(
        t, upd.unionByName(new.select(*upd.columns)),
        keys=["conv_id", "turn_idx"], mode="cow",
    )
    raw = changelog_scan(spark, t, sid0, columns=["conv_id", "turn_idx", "text"])
    out = compute_update_images(raw, keys=["conv_id", "turn_idx"])
    assert out.columns == raw.columns

    n_upd, n_del = upd.count(), 0
    by_type = Counter(r["_change_type"] for r in out.collect())
    # carryovers existed (CoW rewrote shared files) and were cancelled
    assert raw.count() > out.count()
    assert by_type[UPDATE_BEFORE] == n_upd
    assert by_type[UPDATE_AFTER] == n_upd
    assert by_type["insert"] == 7
    assert by_type["delete"] > n_del  # the DELETE WHERE rows survive as deletes

    # the paired images carry the right values: before = old text,
    # after = old text + "~v2", same key
    pre = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in out.filter(F.col("_change_type") == UPDATE_BEFORE).collect()}
    post = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in out.filter(F.col("_change_type") == UPDATE_AFTER).collect()}
    assert set(pre) == set(post)
    for k, v in pre.items():
        assert post[k] == v + "~v2"

    # replaying the refined stream reaches the same final state:
    # update_before acts as delete, update_after as insert
    replay = out.withColumn(
        "_change_type",
        F.when(F.col("_change_type") == UPDATE_BEFORE, "delete")
        .when(F.col("_change_type") == UPDATE_AFTER, "insert")
        .otherwise(F.col("_change_type")),
    )
    initial = _rows(t.scan(spark, snapshot_id=sid0))
    assert _apply(initial, replay) == _rows(t.scan(spark))


def test_update_images_multiplicity_and_snapshot_scoping(spark):
    """Unit semantics on a hand-built stream: duplicate row content
    cancels only min(n_ins, n_del) pairs; pairing never crosses
    snapshots; genuine duplicates survive with multiplicity."""
    from iceberg_compaction_spark.operators.changelog import (
        UPDATE_AFTER,
        UPDATE_BEFORE,
        compute_update_images,
    )

    rows = [
        # snapshot 1: carryover with multiplicity — 2 deletes + 1 insert
        # of identical content ⇒ one delete survives
        ("a", 1, "same", "delete", 1),
        ("a", 1, "same", "delete", 1),
        ("a", 1, "same", "insert", 1),
        # snapshot 1: true update on key (b, 2)
        ("b", 2, "old", "delete", 1),
        ("b", 2, "new", "insert", 1),
        # snapshot 2: delete of (c, 3); snapshot 3: insert of (c, 3) —
        # different commits ⇒ NOT an update pair
        ("c", 3, "gone", "delete", 2),
        ("c", 3, "back", "insert", 3),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, _change_type string, _change_snapshot_id long"
    )
    out = compute_update_images(df, keys=["conv_id", "turn_idx"])
    got = Counter(
        (r["conv_id"], r["turn_idx"], r["text"], r["_change_type"], r["_change_snapshot_id"])
        for r in out.collect()
    )
    assert got == Counter({
        ("a", 1, "same", "delete", 1): 1,
        ("b", 2, "old", UPDATE_BEFORE, 1): 1,
        ("b", 2, "new", UPDATE_AFTER, 1): 1,
        ("c", 3, "gone", "delete", 2): 1,
        ("c", 3, "back", "insert", 3): 1,
    })
    # without carryover removal the duplicate-content pair is retagged
    # as an update (same key, both types present in the commit)
    raw = compute_update_images(df, keys=["conv_id", "turn_idx"], remove_carryovers=False)
    a_types = Counter(
        r["_change_type"] for r in raw.filter("conv_id = 'a'").collect()
    )
    assert a_types == Counter({UPDATE_BEFORE: 2, UPDATE_AFTER: 1})
