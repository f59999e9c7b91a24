"""CDC apply: incremental replication of a source table into a target
via the changelog — net-per-key application, crash-safe anchor,
maintenance invariance, and resync fallback after a source rollback."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.replicate import apply_changelog
from iceberg_compaction_spark.sources.table import Table

DDL = "k BIGINT, v DOUBLE, tag STRING"
COLS = ["k", "v", "tag"]


def _rows(t, spark):
    return sorted(
        (r["k"], r["v"], r["tag"]) for r in t.scan(spark).collect()
    )


def _mk(spark, tmp_warehouse, name):
    src = Table.create(os.path.join(tmp_warehouse, f"{name}_src"), DDL)
    tgt = Table.create(os.path.join(tmp_warehouse, f"{name}_tgt"), DDL)
    return src, tgt


def test_apply_changelog_tracks_source(spark, tmp_warehouse):
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    src, tgt = _mk(spark, tmp_warehouse, "t1")
    base = [(i, float(i), "a") for i in range(40)]
    src.append_dataframe(spark.createDataFrame(base, DDL).coalesce(1))
    r1 = apply_changelog(spark, src, tgt, ["k"])
    assert r1["mode"] == "incremental" and r1["upserts"] == 40 and r1["deletes"] == 0
    assert _rows(tgt, spark) == _rows(src, spark)

    # delete + upsert + COMPACTION on the source, then one apply
    delete_where(spark, src, "v >= 30.0")
    upd = spark.createDataFrame(
        [(i, float(i) * 10, "b") for i in range(0, 40, 7)], DDL
    )
    merge_into(src, upd, ["k"])
    CompactionRunner(
        spark,
        src,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.SINGLE,
            sort_order=(("k", False),),
        ),
    ).execute()
    r2 = apply_changelog(spark, src, tgt, ["k"])
    assert r2["mode"] == "incremental"
    assert 0 < r2["upserts"] < 40  # only the merge's rows, not history
    assert r2["deletes"] > 0
    assert _rows(tgt, spark) == _rows(src, spark)

    # replay: anchor advanced, nothing to do
    r3 = apply_changelog(spark, src, tgt, ["k"])
    assert r3["mode"] == "noop"
    assert _rows(tgt, spark) == _rows(src, spark)


def test_apply_changelog_anchor_survives_property_crash(spark, tmp_warehouse):
    src, tgt = _mk(spark, tmp_warehouse, "t2")
    src.append_dataframe(
        spark.createDataFrame([(i, 1.0, "x") for i in range(10)], DDL).coalesce(1)
    )
    orig = tgt.set_property
    tgt.set_property = lambda *a: (_ for _ in ()).throw(OSError("crash"))
    try:
        apply_changelog(spark, src, tgt, ["k"])
    finally:
        tgt.set_property = orig
    assert tgt.get_property("replicate.last-src-snapshot") is None
    r = apply_changelog(spark, src, tgt, ["k"])  # replay
    assert r["mode"] == "noop"
    assert len(_rows(tgt, spark)) == 10


def test_apply_changelog_follows_source_rollback_incrementally(
    spark, tmp_warehouse
):
    """A source ROLLBACK is itself a commit that removes files, so the
    changelog nets it as deletes — the apply stays incremental and the
    target follows the rollback without a resync."""
    src, tgt = _mk(spark, tmp_warehouse, "t3")
    src.append_dataframe(
        spark.createDataFrame([(i, 1.0, "x") for i in range(10)], DDL).coalesce(1)
    )
    keep = src.current_snapshot_id
    apply_changelog(spark, src, tgt, ["k"])
    src.append_dataframe(
        spark.createDataFrame([(100, 2.0, "y")], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"])
    src.rollback_to(keep)
    src.append_dataframe(
        spark.createDataFrame([(200, 3.0, "z")], DDL).coalesce(1)
    )
    r = apply_changelog(spark, src, tgt, ["k"])
    assert r["mode"] == "incremental"
    assert _rows(tgt, spark) == _rows(src, spark)
    assert (200, 3.0, "z") in _rows(tgt, spark)
    assert (100, 2.0, "y") not in _rows(tgt, spark)


def test_apply_changelog_resyncs_after_window_expiry(spark, tmp_warehouse):
    """When snapshot expiry swallowed part of the window, no exact
    delta exists — the apply falls back to one full resync and the
    target equals the source's current rows."""
    from iceberg_compaction_spark.operators.maintenance import expire_snapshots

    src, tgt = _mk(spark, tmp_warehouse, "t3b")
    src.append_dataframe(
        spark.createDataFrame([(i, 1.0, "x") for i in range(10)], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"])
    for j in range(3):
        src.append_dataframe(
            spark.createDataFrame([(100 + j, 2.0, "y")], DDL).coalesce(1)
        )
    expire_snapshots(src, older_than_ms=2**62, retain_last=1)
    r = apply_changelog(spark, src, tgt, ["k"])
    assert r["mode"] == "resync"
    assert _rows(tgt, spark) == _rows(src, spark)
    assert len(_rows(tgt, spark)) == 13


def test_apply_changelog_composes_with_target_compaction(spark, tmp_warehouse):
    """The tombstones the applies accumulate are ordinary eq-delete
    files: compacting the TARGET between applies folds them away, and
    later applies keep working on the rewritten layout (the anchor
    lives in properties/summaries, not in file identity)."""
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    src, tgt = _mk(spark, tmp_warehouse, "t5")
    src.append_dataframe(
        spark.createDataFrame([(i, float(i), "a") for i in range(30)], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"])
    merge_into(src, spark.createDataFrame([(5, 55.0, "b")], DDL), ["k"])
    apply_changelog(spark, src, tgt, ["k"])
    assert len(tgt.files(content="eq_del")) > 0  # tombstones accumulated
    CompactionRunner(
        spark,
        tgt,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.SINGLE,
            sort_order=(("k", False),),
        ),
    ).execute()
    assert tgt.files(content="eq_del") == []  # folded by compaction
    assert _rows(tgt, spark) == _rows(src, spark)
    merge_into(src, spark.createDataFrame([(6, 66.0, "c")], DDL), ["k"])
    r = apply_changelog(spark, src, tgt, ["k"])
    assert r["mode"] == "incremental" and r["upserts"] == 1
    assert _rows(tgt, spark) == _rows(src, spark)


def test_stream_replicate_tails_source(spark, tmp_warehouse):
    """Streaming CDC: the source readStream triggers applies; restart
    with the same checkpoint continues, and source deletes (which the
    append-only stream never surfaces as rows) still reach the target
    because each apply folds the full outstanding changelog window."""
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.streaming.ingest import stream_replicate

    src, tgt = _mk(spark, tmp_warehouse, "t6")
    ckpt = os.path.join(tmp_warehouse, "t6_ckpt")
    src.append_dataframe(
        spark.createDataFrame([(i, float(i), "a") for i in range(20)], DDL).coalesce(1)
    )
    q = stream_replicate(spark, src, tgt, "k", ckpt)
    q.awaitTermination(120)
    assert _rows(tgt, spark) == _rows(src, spark)

    src.append_dataframe(
        spark.createDataFrame([(100, 1.0, "b")], DDL).coalesce(1)
    )
    delete_where(spark, src, "k < 5")
    q2 = stream_replicate(spark, src, tgt, "k", ckpt)  # same checkpoint
    q2.awaitTermination(120)
    assert _rows(tgt, spark) == _rows(src, spark)
    assert (100, 1.0, "b") in _rows(tgt, spark)
    assert all(k >= 5 for k, _v, _t in _rows(tgt, spark) if k < 100)


def test_apply_changelog_upsert_pair_nets_to_insert(spark, tmp_warehouse):
    """A MERGE emits delete(old)+insert(new) in ONE snapshot: the net
    must keep the insert, and keys deleted in a LATER snapshot than
    their upsert must end deleted."""
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into

    src, tgt = _mk(spark, tmp_warehouse, "t4")
    src.append_dataframe(
        spark.createDataFrame([(1, 1.0, "a"), (2, 2.0, "a")], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"])
    merge_into(src, spark.createDataFrame([(1, 10.0, "b")], DDL), ["k"])
    delete_where(spark, src, "k = 2")
    r = apply_changelog(spark, src, tgt, ["k"])
    assert r["upserts"] == 1 and r["deletes"] == 1
    assert _rows(tgt, spark) == [(1, 10.0, "b")]


def test_tombstones_skipped_for_provably_absent_keys(spark, tmp_warehouse):
    """Round-8 hygiene: net keys outside every live target data file's
    manifest [min, max] bounds are provably absent — their tombstones
    are skipped (metadata-only check), while present keys still get
    one. Result must be identical to a skip-disabled apply."""
    from iceberg_compaction_spark.operators.merge_into import merge_into

    src, tgt = _mk(spark, tmp_warehouse, "t7")
    src2 = Table.create(os.path.join(tmp_warehouse, "t7_src2"), DDL)
    tgt2 = Table.create(os.path.join(tmp_warehouse, "t7_tgt2"), DDL)
    base = [(i, float(i), "a") for i in range(20)]
    delta = [(5, 55.0, "b")] + [(1000 + i, 9.0, "new") for i in range(5)]
    for s, t in ((src, tgt), (src2, tgt2)):
        s.append_dataframe(spark.createDataFrame(base, DDL).coalesce(1))
        apply_changelog(spark, s, t, ["k"], skip_absent_tombstones=(t is tgt))
        merge_into(s, spark.createDataFrame(delta, DDL), ["k"])
    r_skip = apply_changelog(spark, src, tgt, ["k"], skip_absent_tombstones=True)
    r_full = apply_changelog(spark, src2, tgt2, ["k"], skip_absent_tombstones=False)
    # keys 1000..1004 are outside [0, 19] on every target file
    assert r_skip["tombstones_written"] == 1
    assert r_skip["tombstones_skipped"] == 5
    assert r_full["tombstones_written"] == 6
    assert r_full["tombstones_skipped"] == 0
    assert r_skip["upserts"] == r_full["upserts"] == 6
    assert _rows(tgt, spark) == _rows(tgt2, spark) == _rows(src, spark)


def test_tombstone_skip_conservative_on_unknown_bounds(spark, tmp_warehouse):
    """A live target file with unknown key bounds makes NO key provably
    absent: the skip must fall back to tombstoning everything."""
    import json as _json

    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.operators.replicate import (
        _present_key_intervals,
    )

    src, tgt = _mk(spark, tmp_warehouse, "t8")
    src.append_dataframe(
        spark.createDataFrame([(i, 1.0, "a") for i in range(10)], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"])
    # sanity: bounds known -> intervals exist
    assert _present_key_intervals(tgt, "k") == [(0, 9)]
    # erase the key's stats on one target file (simulates a writer that
    # kept no footer stats) and verify the skip disengages
    man = tgt.manifest()
    f = [r for r in man if r["content"] == "data"][0]
    st = _json.loads(f["stats_json"])
    st["k"] = {"min": None, "max": None, "nulls": 0}
    f["stats_json"] = _json.dumps(st)
    import iceberg_compaction_spark.sources.manifest as mf_mod

    path = os.path.join(tgt.location, "meta", "m_test_nobounds.parquet")
    mf_mod.write_manifest(man, path)
    orig = Table.manifest
    try:
        Table.manifest = lambda self, snapshot_id=None: (
            mf_mod.read_manifest(path) if self is tgt else orig(self, snapshot_id)
        )
        assert _present_key_intervals(tgt, "k") is None
        merge_into(src, spark.createDataFrame([(5000, 5.0, "z")], DDL), ["k"])
        r = apply_changelog(spark, src, tgt, ["k"])
    finally:
        Table.manifest = orig
    assert r["tombstones_written"] == 1 and r["tombstones_skipped"] == 0


def test_delete_file_debt_trigger_bounds_eq_delete_files(spark, tmp_warehouse):
    """Round-8 hygiene: N applies must leave a BOUNDED number of live
    eq-delete files on the target — the debt trigger consolidates via
    rewrite_equality_deletes inside the apply loop — with scans
    identical before/after each consolidation."""
    from iceberg_compaction_spark.operators.merge_into import merge_into

    src, tgt = _mk(spark, tmp_warehouse, "t9")
    src.append_dataframe(
        spark.createDataFrame([(i, float(i), "a") for i in range(10)], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"])
    consolidations = 0
    for step in range(8):
        merge_into(
            src,
            spark.createDataFrame([(step % 10, 100.0 + step, "u")], DDL),
            ["k"],
        )
        before = _rows(src, spark)
        r = apply_changelog(
            spark, src, tgt, ["k"], delete_file_debt_limit=3
        )
        assert r["mode"] == "incremental"
        assert r["eq_delete_files"] <= 3
        consolidations += r["consolidated"]
        assert _rows(tgt, spark) == before  # scan unchanged by hygiene
    assert consolidations >= 2, "debt trigger never fired"
    # disabled: the debt accrues unboundedly (the round-7 behavior)
    assert apply_changelog(spark, src, tgt, ["k"], delete_file_debt_limit=None)[
        "consolidated"
    ] is False


def test_apply_runs_bounded_actions_over_change_set(spark, tmp_warehouse):
    """VERDICT r7 #8: the change counts ride ONE aggregation over the
    persisted net — no separate filter().count() pass and no redundant
    .distinct() shuffle on the (already per-key-unique) tombstone set.
    Behavioral check on the counts + source gate on the passes (raw
    Spark-job counts are not a stable proxy: AQE and the write paths
    legitimately spawn many sub-jobs per action)."""
    from iceberg_compaction_spark.operators.merge_into import merge_into

    src, tgt = _mk(spark, tmp_warehouse, "t10")
    src.append_dataframe(
        spark.createDataFrame([(i, float(i), "a") for i in range(10)], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"])
    merge_into(src, spark.createDataFrame([(3, 33.0, "b")], DDL), ["k"])
    r = apply_changelog(spark, src, tgt, ["k"])
    assert r["upserts"] == 1 and r["deletes"] == 0
    assert r["tombstones_written"] == 1
    text = open(
        os.path.join(
            os.path.dirname(__file__), "..",
            "iceberg_compaction_spark", "operators", "replicate.py",
        )
    ).read()
    assert ".count()" not in text, "a per-metric count pass crept back in"
    assert ".distinct()" not in text, "the redundant tombstone distinct returned"


# ----------------------------------------------------------------------
# round 8: follow source schema evolution (sync_target_schema)
def test_follow_schema_add_column_with_default(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.merge_into import merge_into

    src, tgt = _mk(spark, tmp_warehouse, "fs1")
    src.append_dataframe(
        spark.createDataFrame([(i, float(i), "a") for i in range(20)], DDL).coalesce(1)
    )
    r1 = apply_changelog(spark, src, tgt, ["k"], follow_schema=True)
    assert r1["schema_actions"] == []

    # source grows a column with an initial default; only some new
    # rows carry real values
    src.add_column("lang", "STRING", default="en")
    merge_into(
        src,
        spark.createDataFrame(
            [(5, 50.0, "b", "fr"), (21, 21.0, "a", None)],
            "k BIGINT, v DOUBLE, tag STRING, lang STRING",
        ),
        ["k"],
    )
    r2 = apply_changelog(spark, src, tgt, ["k"], follow_schema=True)
    assert r2["schema_actions"] == ["add lang string"]
    assert tgt.user_columns() == ["k", "v", "tag", "lang"]
    got = {
        r["k"]: (r["v"], r["tag"], r["lang"]) for r in tgt.scan(spark).collect()
    }
    assert got[5] == (50.0, "b", "fr")
    assert got[21] == (21.0, "a", None)  # genuine NULL survives post-add
    # rows replicated BEFORE the evolution materialize the source's
    # initial default, exactly like the source's own pre-add rows
    assert got[7] == (7.0, "a", "en")
    src_rows = sorted(
        (r["k"], r["v"], r["tag"], r["lang"]) for r in src.scan(spark).collect()
    )
    tgt_rows = sorted(
        (r["k"], r["v"], r["tag"], r["lang"]) for r in tgt.scan(spark).collect()
    )
    assert src_rows == tgt_rows


def test_follow_schema_rename_and_widen(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.merge_into import merge_into

    ddl = "k INT, v DOUBLE, tag STRING"
    src = Table.create(os.path.join(tmp_warehouse, "fs2_src"), ddl)
    tgt = Table.create(os.path.join(tmp_warehouse, "fs2_tgt"), ddl)
    src.append_dataframe(
        spark.createDataFrame([(i, float(i), "a") for i in range(10)], ddl).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"], follow_schema=True)

    src.rename_column("tag", "label")
    src.widen_column("k", "bigint")
    merge_into(
        src,
        spark.createDataFrame([(3, 33.0, "z")], "k BIGINT, v DOUBLE, label STRING"),
        ["k"],
    )
    r = apply_changelog(spark, src, tgt, ["k"], follow_schema=True)
    assert r["schema_actions"] == ["rename tag -> label", "widen k int -> bigint"]
    assert tgt.user_columns() == ["k", "v", "label"]
    assert dict(tgt.schema_fields())["k"].lower() == "bigint"
    src_rows = sorted(
        (r["k"], r["v"], r["label"]) for r in src.scan(spark).collect()
    )
    tgt_rows = sorted(
        (r["k"], r["v"], r["label"]) for r in tgt.scan(spark).collect()
    )
    assert src_rows == tgt_rows
    # pre-rename replicated rows surface under the NEW name (epoch read)
    assert [r for r in tgt_rows if r[0] == 7][0][2] == "a"


def test_follow_schema_drop_kept_and_incompatible_raises(spark, tmp_warehouse):
    import pytest

    from iceberg_compaction_spark.errors import ValidationError
    from iceberg_compaction_spark.operators.merge_into import merge_into

    src, tgt = _mk(spark, tmp_warehouse, "fs3")
    src.append_dataframe(
        spark.createDataFrame([(i, float(i), "a") for i in range(10)], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"], follow_schema=True)

    # source drops a column: the target keeps it; a changed row's
    # value for it becomes NULL, unchanged rows keep theirs
    src.drop_column("tag")
    merge_into(
        src, spark.createDataFrame([(4, 44.0)], "k BIGINT, v DOUBLE"), ["k"]
    )
    r = apply_changelog(spark, src, tgt, ["k"], follow_schema=True)
    assert r["schema_actions"] == []
    assert tgt.user_columns() == ["k", "v", "tag"]
    got = {r["k"]: (r["v"], r["tag"]) for r in tgt.scan(spark).collect()}
    assert got[4] == (44.0, None)
    assert got[5] == (5.0, "a")

    # an incompatible type change refuses instead of guessing a cast
    src.drop_column("v")
    src.add_column("v", "STRING")
    src.append_dataframe(
        spark.createDataFrame([(99, "not-a-number")], "k BIGINT, v STRING")
    )
    with pytest.raises(ValidationError, match="lossless widening"):
        apply_changelog(spark, src, tgt, ["k"], follow_schema=True)


def test_no_follow_extra_source_column_not_replicated(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.merge_into import merge_into

    src, tgt = _mk(spark, tmp_warehouse, "fs4")
    src.append_dataframe(
        spark.createDataFrame([(i, float(i), "a") for i in range(8)], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"])
    src.add_column("extra", "STRING")
    merge_into(
        src,
        spark.createDataFrame(
            [(2, 22.0, "b", "x")], "k BIGINT, v DOUBLE, tag STRING, extra STRING"
        ),
        ["k"],
    )
    r = apply_changelog(spark, src, tgt, ["k"])  # follow_schema off
    assert r["mode"] == "incremental" and r["schema_actions"] == []
    assert tgt.user_columns() == COLS
    got = {r["k"]: (r["v"], r["tag"]) for r in tgt.scan(spark).collect()}
    assert got[2] == (22.0, "b")


def test_follow_schema_ddl_only_syncs_without_commit(spark, tmp_warehouse):
    src, tgt = _mk(spark, tmp_warehouse, "fs5")
    src.append_dataframe(
        spark.createDataFrame([(1, 1.0, "a")], DDL).coalesce(1)
    )
    apply_changelog(spark, src, tgt, ["k"], follow_schema=True)
    # DDL-only source change: no new snapshot, but the replica's schema
    # must still follow on the next (no-op) apply
    src.add_column("note", "STRING")
    r = apply_changelog(spark, src, tgt, ["k"], follow_schema=True)
    assert r["mode"] == "noop" and r["schema_actions"] == ["add note string"]
    assert tgt.user_columns() == COLS + ["note"]
