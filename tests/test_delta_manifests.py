"""Delta manifests: commits write O(changed) metadata; reads resolve
the base+delta chain; expiry materializes dependents; rewrite collapses."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.operators.maintenance import (
    expire_snapshots,
    rewrite_manifests,
)
from iceberg_compaction_spark.sources.generator import create_transcripts_table, transcripts_df
from iceberg_compaction_spark.sources.table import Table


def test_commits_write_deltas_not_full_manifests(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "d1"), n_turns=4_000, n_convs=20, n_files=8
    )
    # first commit is the base
    assert t.snapshot(t.current_snapshot_id)["manifest_kind"] == "base"
    n_base = len(t.files(content="data"))
    for i in range(3):
        t.append_dataframe(transcripts_df(spark, 500, 3).coalesce(1))
    snap = t.snapshot(t.current_snapshot_id)
    assert snap["manifest_kind"] == "delta"
    assert snap["delta_depth"] == 3
    # the delta parquet holds ONLY this commit's adds, not the table
    delta_rows = pq.read_table(t._delta_path(t.current_snapshot_id)).to_pylist()
    assert len(delta_rows) < n_base
    assert all(r["op"] == "add" for r in delta_rows)
    # resolution equals the accumulated file set
    assert len(t.files(content="data")) >= n_base + 3
    assert t.scan(spark).count() == 4_000 + 3 * 500
    # files_df (distributed resolution) agrees with manifest()
    df_paths = {r["path"] for r in t.files_df(spark).select("path").collect()}
    assert df_paths == {r["path"] for r in t.manifest()}


def test_replace_commit_tombstones_resolve(spark, tmp_warehouse):
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "d2"), n_turns=6_000, n_convs=30, n_files=12
    )
    before = t.scan(spark).count()
    old_paths = {f["path"] for f in t.files(content="data")}
    res = CompactionRunner(
        spark,
        t,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            group_target_size_bytes=256 << 10,
            min_size_per_partition_bytes=1 << 20,
        ),
    ).execute()
    assert res.snapshot_after == t.current_snapshot_id
    snap = t.snapshot(t.current_snapshot_id)
    assert snap["manifest_kind"] == "delta"  # replace commit is a delta too
    live = {f["path"] for f in t.files(content="data")}
    assert not (live & old_paths)  # tombstones removed every input
    assert t.scan(spark).count() == before
    # time travel across the delta chain still works
    assert t.scan(spark, snapshot_id=res.snapshot_before).count() == before


def test_chain_caps_into_fresh_base(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "d3"), n_turns=500, n_convs=5, n_files=2
    )
    batch = transcripts_df(spark, 50, 2).coalesce(1)
    kinds = []
    for i in range(Table.DELTA_CHAIN_MAX + 2):
        t.append_dataframe(batch)
        kinds.append(t.snapshot(t.current_snapshot_id)["manifest_kind"])
    assert "base" in kinds  # the cap forced a collapse
    assert kinds[-1] != "base" or kinds[-2] == "delta"
    assert t.scan(spark).count() == 500 + 50 * (Table.DELTA_CHAIN_MAX + 2)


def test_rewrite_manifests_collapses_chain(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "d4"), n_turns=1_000, n_convs=5, n_files=4
    )
    for _ in range(4):
        t.append_dataframe(transcripts_df(spark, 100, 2).coalesce(1))
    assert t.snapshot(t.current_snapshot_id)["manifest_kind"] == "delta"
    files_before = {f["path"] for f in t.files(content="data")}
    sid = rewrite_manifests(t)
    snap = t.snapshot(sid)
    assert snap["manifest_kind"] == "base" and snap["delta_depth"] == 0
    assert {f["path"] for f in t.files(content="data")} == files_before
    assert t.scan(spark).count() == 1_400


def test_expiry_materializes_retained_deltas(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "d5"), n_turns=1_000, n_convs=5, n_files=4
    )
    counts = {t.current_snapshot_id: t.scan(spark).count()}
    for _ in range(4):
        t.append_dataframe(transcripts_df(spark, 100, 2).coalesce(1))
        counts[t.current_snapshot_id] = t.scan(spark).count()
    sids = sorted(counts)
    # expire everything but the last two snapshots; the retained deltas
    # chained through expired ancestors (including the original base)
    res = expire_snapshots(t, older_than_ms=2**62, retain_last=2)
    assert set(res.expired_snapshot_ids) == set(sids[:-2])
    for sid in sids[-2:]:
        assert t.scan(spark, snapshot_id=sid).count() == counts[sid]
    with pytest.raises(ValidationError):
        t.manifest(sids[0])
    # invariant: no retained snapshot's resolution reads an expired
    # ancestor (the oldest retained collapses to a base; newer ones may
    # stay deltas chained to retained snapshots only)
    for sid in sids[-2:]:
        assert not (t.resolution_ancestors(sid) & set(res.expired_snapshot_ids))
    assert t.snapshot(sids[-2])["manifest_kind"] == "base"


def test_incremental_scan_between_snapshots(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "inc"), n_turns=600, n_convs=3, n_files=2
    )
    sid1 = t.current_snapshot_id
    t.append_dataframe(transcripts_df(spark, 100, 2).coalesce(1))
    sid2 = t.current_snapshot_id
    t.append_dataframe(transcripts_df(spark, 50, 2).coalesce(1))
    sid3 = t.current_snapshot_id
    assert t.incremental_scan(spark, sid1, sid2).count() == 100
    assert t.incremental_scan(spark, sid1, sid3).count() == 150
    assert t.incremental_scan(spark, sid2, sid3).count() == 50
    assert t.incremental_scan(spark, sid3, sid3).count() == 0
    assert t.incremental_scan(spark, None, sid1).count() == 600
