"""Snapshot rollback + write-audit-publish branches: commits to a
branch leave main untouched until a fast-forward publish; rollback
restores older content as a NEW snapshot (history preserved)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import CommitConflict, ValidationError
from iceberg_compaction_spark.sources.table import Table


def _df(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).selectExpr(
        "concat('c', id) as conv_id", "cast(id as int) as turn_idx",
        f"'{tag}' as text",
    )


def _mk(spark, loc):
    t = Table.create(loc, "conv_id string, turn_idx int, text string")
    t.append_dataframe(_df(spark, 0, 100, "base"))
    return t


def test_rollback_restores_content_with_history(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "rb"))
    sid1 = t.current_snapshot_id
    t.append_dataframe(_df(spark, 100, 150, "extra"))
    dels = t.scan(spark).filter(F.col("turn_idx") < 10).select("conv_id", "turn_idx")
    t.add_equality_deletes(dels, keys=["conv_id", "turn_idx"])
    assert t.scan(spark).count() == 140
    rb = t.rollback_to(sid1)
    assert rb == t.current_snapshot_id and rb > sid1  # new snapshot, not a pointer reset
    assert t.scan(spark).count() == 100
    key = lambda sid=None: sorted(  # noqa: E731
        (r["conv_id"], r["turn_idx"]) for r in t.scan(spark, snapshot_id=sid).collect()
    )
    assert key() == key(sid1)
    # pre-rollback history is still time-travelable
    assert t.scan(spark, snapshot_id=rb - 1).count() == 140


def test_wap_branch_publish(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "wap"))
    main_before = t.current_snapshot_id
    t.create_branch("audit")
    t.append_dataframe(_df(spark, 100, 130, "staged"), branch="audit")
    t.append_dataframe(_df(spark, 130, 140, "staged2"), branch="audit")
    head = t.ref_head("audit")
    # main unmoved; branch readable via its head
    assert t.current_snapshot_id == main_before
    assert t.scan(spark).count() == 100
    assert t.scan(spark, snapshot_id=head).count() == 140
    # the audit step passes → publish
    assert t.fast_forward_main("audit") == head
    assert t.current_snapshot_id == head
    assert t.scan(spark).count() == 140
    t.drop_branch("audit")
    assert "audit" not in t.refs()


def test_wap_conflict_when_main_moves(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "wapc"))
    t.create_branch("audit")
    t.append_dataframe(_df(spark, 100, 110, "staged"), branch="audit")
    t.append_dataframe(_df(spark, 200, 205, "hotfix"))  # main moves meanwhile
    with pytest.raises(CommitConflict):
        t.fast_forward_main("audit")
    # ids stay globally unique across both lines
    sids = [s["snapshot_id"] for s in t.snapshots()]
    assert len(sids) == len(set(sids))
    # unknown / duplicate branches are rejected
    with pytest.raises(ValidationError):
        t.ref_head("nope")
    with pytest.raises(ValidationError):
        t.create_branch("audit")
    with pytest.raises(ValidationError):
        t.commit("append", added=[], branch="nope")


def test_concurrent_branch_and_main_commits(spark, tmp_warehouse):
    """Main and two branches committing from driver threads: ids stay
    globally unique, every line's head resolves, row sets are exact."""
    from concurrent.futures import ThreadPoolExecutor

    t = _mk(spark, os.path.join(tmp_warehouse, "conc"))
    t.create_branch("b1")
    t.create_branch("b2")
    dfs = {
        None: _df(spark, 1000, 1020, "m"),
        "b1": _df(spark, 2000, 2030, "x"),
        "b2": _df(spark, 3000, 3040, "y"),
    }
    infos = {br: t.write_data_files(df) for br, df in dfs.items()}

    def commit(br):
        return t.commit("append", added=infos[br], branch=br, retries=32)

    with ThreadPoolExecutor(max_workers=3) as ex:
        sids = list(ex.map(commit, dfs.keys()))
    assert len(set(sids)) == 3
    assert t.scan(spark).count() == 120
    assert t.scan(spark, snapshot_id=t.ref_head("b1")).count() == 130
    assert t.scan(spark, snapshot_id=t.ref_head("b2")).count() == 140
    all_sids = [s["snapshot_id"] for s in t.snapshots()]
    assert len(all_sids) == len(set(all_sids))


def test_expiry_retains_branch_heads(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.maintenance import expire_snapshots

    t = _mk(spark, os.path.join(tmp_warehouse, "wexp"))
    t.create_branch("audit")
    t.append_dataframe(_df(spark, 100, 120, "staged"), branch="audit")
    head = t.ref_head("audit")
    for i in range(3):
        t.append_dataframe(_df(spark, 300 + 10 * i, 305 + 10 * i, "more"))
    res = expire_snapshots(t, retain_last=1)
    assert head in res.retained_snapshot_ids
    assert t.scan(spark, snapshot_id=head).count() == 120  # branch still readable
