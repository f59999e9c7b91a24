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
