"""Metadata layer: snapshots, manifests, commit atomicity/conflicts."""

from __future__ import annotations

import os

import pytest

from iceberg_compaction_spark.errors import CommitConflict
from iceberg_compaction_spark.sources.generator import (
    TRANSCRIPT_DDL,
    create_transcripts_table,
    transcripts_df,
)
from iceberg_compaction_spark.sources.manifest import FileInfo
from iceberg_compaction_spark.sources.table import Table


def test_create_load_roundtrip(tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "t1")
    t = Table.create(loc, TRANSCRIPT_DDL)
    t2 = Table.load(loc)
    assert t2.user_columns() == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t2.current_snapshot_id is None
    assert t2.manifest() == []


def test_append_creates_snapshot_with_stats(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "t2")
    t = Table.create(loc, TRANSCRIPT_DDL, partition={"field": "_part", "expr": "date_format(ts, 'yyyy-MM-dd')"})
    df = transcripts_df(spark, 1000, 10)
    sid = t.append_dataframe(df.repartition(4))
    assert sid == 1 and t.current_snapshot_id == 1 and t.sequence_number == 1
    files = t.files(content="data")
    assert len(files) == 4
    assert sum(f["record_count"] for f in files) == 1000
    assert all(f["sequence_number"] == 1 for f in files)
    assert all(f["size_bytes"] > 0 for f in files)
    # partition values materialized + recorded (single day at step=1s)
    assert all(f["partition"] == "2023-11-14" for f in files)
    snap = t.snapshot(sid)
    assert snap["operation"] == "append" and snap["summary"]["added_files"] == 4


def test_scan_matches_input(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "t3")
    t = create_transcripts_table(spark, loc, n_turns=2000, n_convs=20, n_files=8)
    df = t.scan(spark)
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df.count() == 2000
    expect = transcripts_df(spark, 2000, 20)
    assert df.exceptAll(expect).count() == 0
    assert expect.exceptAll(df).count() == 0


def test_snapshot_time_travel(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "t4")
    t = Table.create(loc, TRANSCRIPT_DDL)
    t.append_dataframe(transcripts_df(spark, 100, 5))
    t.append_dataframe(transcripts_df(spark, 50, 5))
    assert t.scan(spark, snapshot_id=1).count() == 100
    assert t.scan(spark, snapshot_id=2).count() == 150


def test_commit_conflict_on_vanished_inputs(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "t5")
    t = Table.create(loc, TRANSCRIPT_DDL)
    t.append_dataframe(transcripts_df(spark, 100, 5))
    path = t.files(content="data")[0]["path"]
    # first rewrite removes it…
    t.commit("replace", added=[], removed_paths=[path])
    # …second committer still referencing it must conflict (C6)
    with pytest.raises(CommitConflict):
        t.commit("replace", added=[], removed_paths=[path], retries=0)


def test_commit_expected_parent_cas(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "t6")
    t = Table.create(loc, TRANSCRIPT_DDL)
    t.append_dataframe(transcripts_df(spark, 100, 5))
    with pytest.raises(CommitConflict):
        t.commit("append", added=[FileInfo(path="/nope")], expected_snapshot_id=99, retries=0)


def test_concurrent_committers_serialize(spark, tmp_warehouse):
    """C5/C9: two threads committing appends concurrently contend on the
    table lock; retry-with-backoff must land BOTH commits, in some
    order, with no lost updates."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from iceberg_compaction_spark.sources.generator import (
        create_transcripts_table,
        transcripts_df,
    )

    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "conc"), n_turns=500, n_convs=5, n_files=2
    )
    base = t.scan(spark).count()
    batches = [transcripts_df(spark, 100 + i, 2).coalesce(1) for i in range(4)]
    infos = [t.write_data_files(b) for b in batches]  # pre-write, commit-race only

    def commit_one(inf):
        return t.commit("append", added=inf, retries=20)

    with ThreadPoolExecutor(max_workers=4) as ex:
        sids = list(ex.map(commit_one, infos))
    assert len(set(sids)) == 4  # four distinct snapshots
    assert t.scan(spark).count() == base + sum(100 + i for i in range(4))


def test_schema_evolution_add_drop(spark, tmp_warehouse):
    """Add/drop column are metadata-only: old files scan with NULLs for
    added columns, dropped columns vanish from projections, and
    compaction rewrites settle the physical layout."""
    import os

    from pyspark.sql import functions as F

    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.errors import ValidationError as VErr
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.generator import (
        create_transcripts_table,
        transcripts_df,
    )

    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "evo"), n_turns=1_000, n_convs=5, n_files=2
    )
    t.add_column("score", "double")
    assert "score" in t.user_columns()
    old = t.scan(spark)
    assert old.filter(F.col("score").isNotNull()).count() == 0  # old rows: NULL
    batch = transcripts_df(spark, 100, 2).withColumn("score", F.lit(0.5))
    t.append_dataframe(batch.coalesce(1))
    got = t.scan(spark)
    assert got.count() == 1_100
    assert got.filter(F.col("score") == 0.5).count() == 100
    # compaction carries the evolved schema through the rewrite
    CompactionRunner(
        spark, t, CompactionConfig(selection=SelectionStrategy.FULL)
    ).execute()
    got2 = t.scan(spark)
    assert got2.filter(F.col("score") == 0.5).count() == 100
    assert got2.filter(F.col("score").isNull()).count() == 1_000

    t.drop_column("tool")
    assert "tool" not in t.user_columns()
    assert "tool" not in t.scan(spark).columns
    import pytest as _pytest

    with _pytest.raises(VErr):
        t.add_column("score", "double")
    with _pytest.raises(VErr):
        t.drop_column("nope")


def test_partition_evolution(spark, tmp_warehouse):
    """Partition evolution: future writes use the new grain; old files
    keep theirs; scans, pruning, and compaction stay exact over the
    mixed layout because the partition value is a real per-file column."""
    import os

    from pyspark.sql import functions as F

    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.generator import (
        create_transcripts_table,
        transcripts_df,
    )

    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "pevo"), n_turns=4_000, n_convs=20,
        n_files=4, partitioned=True, ts_step_s=3600,  # ~5 months of days
    )
    day_parts = {f["partition"] for f in t.files(content="data")}
    assert all(len(p) == 10 for p in day_parts)  # yyyy-MM-dd
    t.set_partition_expr("date_format(ts, 'yyyy-MM')")
    t.append_dataframe(transcripts_df(spark, 500, 5, ts_step_s=3600).coalesce(1))
    new_parts = {f["partition"] for f in t.files(content="data")} - day_parts
    assert new_parts and all(len(p) == 7 for p in new_parts)  # yyyy-MM
    assert t.scan(spark).count() == 4_500
    # pruning still works across the mixed grain (ts bounds, not _part)
    ts0 = t.scan(spark).agg(F.max("ts")).collect()[0][0]
    got = t.scan(spark, filter=f"ts >= TIMESTAMP '{ts0}'")
    assert got.count() >= 1 and t.last_scan_pruned_files > 0
    # compaction over the mixed layout preserves content
    before = sorted(
        (r["conv_id"], r["turn_idx"]) for r in t.scan(spark).select("conv_id", "turn_idx").collect()
    )
    CompactionRunner(
        spark, t, CompactionConfig(selection=SelectionStrategy.FULL)
    ).execute()
    after = sorted(
        (r["conv_id"], r["turn_idx"]) for r in t.scan(spark).select("conv_id", "turn_idx").collect()
    )
    assert after == before
