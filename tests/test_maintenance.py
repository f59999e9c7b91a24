"""Snapshot expiry / orphan cleanup / dangling deletes / manifest
rewrite — north-rule retention semantics: expired snapshots unreadable,
retained readable, orphans removed, live data untouched."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.operators.maintenance import (
    clean_dangling_deletes,
    clean_orphan_files,
    expire_snapshots,
    rewrite_manifests,
)
from iceberg_compaction_spark.operators.mor import FILE_COL, POS_COL
from iceberg_compaction_spark.plans.compaction import CompactionRunner
from iceberg_compaction_spark.sources.generator import create_transcripts_table, transcripts_df


def _cfg():
    return CompactionConfig(
        selection=SelectionStrategy.FULL,
        group_target_size_bytes=256 << 10,
        target_file_size_bytes=4 << 20,
    )


def test_expire_snapshots_retention(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "x1"), n_turns=4000, n_convs=20, n_files=8
    )
    CompactionRunner(spark, t, _cfg()).execute()  # snapshot 2 replaces files
    assert len(t.snapshots()) == 2
    n_live = t.scan(spark).count()

    res = expire_snapshots(t, retain_last=1)
    assert res.expired_snapshot_ids == [1]
    assert res.deleted_data_files > 0  # pre-compaction small files freed
    # retained snapshot fully readable, rows intact
    assert t.scan(spark).count() == n_live == 4000
    # expired snapshot unreadable
    with pytest.raises(ValidationError):
        t.scan(spark, snapshot_id=1)
    # storage holds exactly the live files
    live = {r["path"] for r in t.manifest()}
    from iceberg_compaction_spark.sources.manifest import list_parquet_files

    on_disk = set(list_parquet_files(t.data_dir)) | set(list_parquet_files(t.deletes_dir))
    assert live <= on_disk


def test_orphan_cleanup(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "x2"), n_turns=2000, n_convs=10, n_files=4
    )
    # fabricate an orphan: written but never committed (e.g. crashed job)
    orphan_dir = os.path.join(t.data_dir, "crashed-run")
    transcripts_df(spark, 100, 5).coalesce(1).write.parquet(orphan_dir)
    orphans = clean_orphan_files(t, dry_run=True)
    assert len(orphans) >= 1 and all("crashed-run" in p for p in orphans)
    removed = clean_orphan_files(t)
    assert removed == orphans
    assert not os.path.exists(orphan_dir) or not os.listdir(orphan_dir)
    assert t.scan(spark).count() == 2000  # live data untouched


def test_clean_dangling_deletes(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "x3"), n_turns=3000, n_convs=15, n_files=6
    )
    hidden = t.scan(spark, with_hidden=True)
    pos = hidden.filter(F.col(POS_COL) % 9 == 0).select(FILE_COL, POS_COL)
    t.add_position_deletes(pos)
    n_live = t.scan(spark).count()

    # compact only SOME files (leave the delete file in place), then
    # drop dangling entries referencing the rewritten inputs
    cfg = _cfg()
    cfg.selection = SelectionStrategy.SMALL_FILES
    cfg.small_file_threshold_bytes = 40 << 10  # subset of shards
    CompactionRunner(spark, t, cfg).execute()

    sid = clean_dangling_deletes(spark, t)
    assert sid == t.current_snapshot_id
    assert t.scan(spark).count() == n_live  # semantics preserved


def test_rewrite_manifests_is_noop_semantically(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "x4"), n_turns=1000, n_convs=10, n_files=4
    )
    rows_before = t.scan(spark).orderBy("conv_id", "turn_idx").collect()
    files_before = {r["path"] for r in t.manifest()}
    sid = rewrite_manifests(t)
    assert sid == t.current_snapshot_id
    assert {r["path"] for r in t.manifest()} == files_before
    # sequence numbers preserved
    assert all(r["sequence_number"] == 1 for r in t.manifest())
    assert t.scan(spark).orderBy("conv_id", "turn_idx").collect() == rows_before
