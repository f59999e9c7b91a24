"""Metadata tables (partitions / snapshots / history / refs)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.meta_tables import (
    history_df,
    partitions_df,
    refs_df,
    snapshots_df,
)
from iceberg_compaction_spark.sources.generator import create_transcripts_table


def test_metadata_tables(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "mt"), n_turns=6_000, n_convs=20,
        n_files=4, partitioned=True, ts_step_s=60,
    )
    dels = t.scan(spark).filter(F.col("turn_idx") % 9 == 0).select("conv_id", "turn_idx")
    t.add_equality_deletes(dels, keys=["conv_id", "turn_idx"])
    t.tag("audit-point")
    t.create_branch("wip")

    parts = partitions_df(spark, t).collect()
    data_rows = t.files(content="data")
    by_part = {}
    for r in data_rows:
        by_part.setdefault(r["partition"], [0, 0])
        by_part[r["partition"]][0] += 1
        by_part[r["partition"]][1] += r["record_count"]
    got = {r["partition"]: (r["data_files"], r["record_count"]) for r in parts if r["data_files"] > 0}
    assert got == {p: tuple(v) for p, v in by_part.items()}
    assert sum(r["record_count"] for r in parts) == 6_000
    # the eq-delete file shows up under its (empty) partition
    assert sum(r["delete_files"] for r in parts) == len(t.files(content="eq_del"))

    snaps = snapshots_df(spark, t).collect()
    assert {r["snapshot_id"] for r in snaps} == {s["snapshot_id"] for s in t.snapshots()}
    assert all(r["operation"] in ("append", "delete") for r in snaps)

    hist = history_df(spark, t).collect()
    assert hist[0]["is_current"] and hist[0]["snapshot_id"] == t.current_snapshot_id
    assert len(hist) == len(t.snapshots())  # linear history here

    refs = {r["name"]: (r["type"], r["snapshot_id"]) for r in refs_df(spark, t).collect()}
    assert refs["main"] == ("branch", t.current_snapshot_id)
    assert refs["audit-point"][0] == "tag"
    assert refs["wip"] == ("branch", t.current_snapshot_id)
