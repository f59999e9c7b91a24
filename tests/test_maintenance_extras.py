"""expireData, snapshot tags in retention, trigger recommendation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.operators.maintenance import (
    expire_data,
    expire_snapshots,
    recommend_compaction,
)
from iceberg_compaction_spark.sources.generator import (
    TRANSCRIPT_DDL,
    create_transcripts_table,
    transcripts_df,
)
from iceberg_compaction_spark.sources.table import Table


def test_expire_data_drops_old_files(spark, tmp_warehouse):
    t = Table.create(os.path.join(tmp_warehouse, "ed"), TRANSCRIPT_DDL)
    old = transcripts_df(spark, 1000, 10, base_ts=1_600_000_000)  # 2020
    new = transcripts_df(spark, 1000, 10, base_ts=1_700_000_000)  # 2023
    t.append_dataframe(old.coalesce(1))
    t.append_dataframe(new.coalesce(1))
    sid = expire_data(t, "ts", "2022-01-01")
    assert sid == t.current_snapshot_id
    assert t.scan(spark).count() == 1000
    assert t.scan(spark).agg(F.min("ts")).first()[0].year >= 2023
    # idempotent
    assert expire_data(t, "ts", "2022-01-01") == sid


def test_tags_protect_snapshots_from_expiry(spark, tmp_warehouse):
    t = Table.create(os.path.join(tmp_warehouse, "tg"), TRANSCRIPT_DDL)
    t.append_dataframe(transcripts_df(spark, 100, 5))  # snap 1
    t.append_dataframe(transcripts_df(spark, 50, 5))   # snap 2
    t.append_dataframe(transcripts_df(spark, 25, 5))   # snap 3
    t.tag("v1", snapshot_id=1)
    res = expire_snapshots(t, retain_last=1)
    assert 1 not in res.expired_snapshot_ids  # tagged → kept
    assert 2 in res.expired_snapshot_ids
    assert t.scan(spark, snapshot_id=1).count() == 100
    with pytest.raises(ValidationError):
        t.scan(spark, snapshot_id=2)
    # untag → next expiry removes it
    t.untag("v1")
    res2 = expire_snapshots(t, retain_last=1)
    assert 1 in res2.expired_snapshot_ids


def test_recommend_compaction_triggers(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "rc"), n_turns=2000, n_convs=10, n_files=8
    )
    rec = recommend_compaction(t)
    assert rec["action"] == "full"  # everything is tiny → fragment ratio 1.0
    assert rec["fragment_ratio"] == 1.0

    # deletes present → at least major
    t.add_equality_deletes(
        transcripts_df(spark, 2000, 10).limit(5).select("conv_id", "turn_idx"),
        keys=["conv_id", "turn_idx"],
    )
    rec2 = recommend_compaction(t)
    assert rec2["action"] in ("major", "full")
    assert rec2["delete_ratio"] > 0


def test_delete_where_hybrid(spark, tmp_warehouse):
    """DELETE WHERE: files fully inside the predicate drop by metadata
    only; straddling files get position deletes; untouched files keep
    their rows. Scan equals a plain filter of the pre-delete content."""
    import os

    from pyspark.sql import functions as F

    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.sources.generator import create_transcripts_table

    # ts_step=60s spreads 10k turns over ~7 day-partitions, so a mid
    # cutoff fully covers earlier days (metadata drop) and straddles one
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "dw"), n_turns=10_000, n_convs=50,
        n_files=10, partitioned=True, ts_step_s=60,
    )
    before = t.scan(spark).select("conv_id", "turn_idx", "text",
                                  F.unix_timestamp("ts").alias("e")).collect()
    all_ts = sorted(r["e"] for r in before)
    cutoff_epoch = all_ts[len(all_ts) // 2]
    import datetime as dt

    cutoff = dt.datetime.utcfromtimestamp(cutoff_epoch).strftime("%Y-%m-%d %H:%M:%S")
    n_files_before = len(t.files(content="data"))
    res = delete_where(spark, t, f"ts < TIMESTAMP '{cutoff}'")
    assert res["deleted_rows"] > 0
    assert res["dropped_files"] > 0  # day-partitioned: old days drop whole
    assert res["dropped_files"] < n_files_before
    expected = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in before if r["e"] >= cutoff_epoch
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.scan(spark).select("conv_id", "turn_idx", "text").collect()
    )
    assert got == expected
    # no-match predicate: no new snapshot
    sid = t.current_snapshot_id
    res2 = delete_where(spark, t, "ts >= TIMESTAMP '2031-01-01 00:00:00'")
    assert res2["deleted_rows"] == 0 and t.current_snapshot_id == sid
    # compaction folds the position deletes in
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    CompactionRunner(
        spark, t, CompactionConfig(selection=SelectionStrategy.FULL)
    ).execute()
    got2 = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.scan(spark).select("conv_id", "turn_idx", "text").collect()
    )
    assert got2 == expected


def test_rewrite_position_deletes_consolidates(spark, tmp_warehouse):
    import os

    from iceberg_compaction_spark.operators.maintenance import (
        rewrite_position_deletes,
    )
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.table import Table

    t = Table.create(os.path.join(tmp_warehouse, "rpd"), "k bigint, v string")
    t.append_dataframe(spark.range(1000).selectExpr("id as k", "'x' as v"))
    # five separate DELETEs → five pos-delete file sets (one includes
    # a duplicated pair via re-deleting an overlapping range)
    for lo in (0, 100, 200, 300, 250):
        hits = (
            t.scan(spark, with_hidden=True)
            .filter(f"k >= {lo} AND k < {lo + 60}")
            .select("_file", "_pos")
        )
        if hits.count():
            t.add_position_deletes(hits)
    before_files = t.files(content=mf.CONTENT_POS_DEL)
    assert len(before_files) >= 4
    n_live = t.scan(spark).count()
    rewrite_position_deletes(spark, t)
    after_files = t.files(content=mf.CONTENT_POS_DEL)
    assert len(after_files) == 1
    assert t.scan(spark).count() == n_live  # visibility unchanged
    # duplicates collapsed: consolidated rows == distinct dead rows
    assert sum(f["record_count"] for f in after_files) == 1000 - n_live
    # idempotent-ish: a second run is a no-op commit-wise
    sid = t.current_snapshot_id
    assert rewrite_position_deletes(spark, t) == sid


def test_migrate_partition_spec_day_to_month(spark, tmp_warehouse):
    import json
    import os

    from iceberg_compaction_spark.operators.maintenance import migrate_partition_spec
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.table import Table

    t = Table.create(
        os.path.join(tmp_warehouse, "mig"), "k bigint, ts timestamp, v string",
        partition={"field": "_part", "expr": "date_format(ts, 'yyyy-MM-dd')"},
    )
    df = spark.range(3000).selectExpr(
        "id as k",
        "timestamp'2024-06-25 00:00:00' + make_interval(0,0,0,0,0,0,id*600) as ts",
        "concat('v', id) as v",
    )
    t.append_dataframe(df.repartition(4))
    # delete some rows, then change the grain to month and migrate
    from iceberg_compaction_spark.operators.delete_where import delete_where

    delete_where(spark, t, "k % 10 = 1")
    before = sorted(tuple(r) for r in t.scan(spark).collect())
    t.set_partition_expr("date_format(ts, 'yyyy-MM')")
    migrate_partition_spec(spark, t)
    # all files now carry month-grain partition values; deletes folded
    parts = {r["partition"] for r in t.files(content=mf.CONTENT_DATA)}
    assert parts and all(len(p) == 7 for p in parts), parts
    assert not t.files(content=mf.CONTENT_POS_DEL)
    assert sorted(tuple(r) for r in t.scan(spark).collect()) == before
    # pruning works on the new grain
    t.scan(spark, filter="ts >= TIMESTAMP '2024-07-01 00:00:00'").count()
    assert t.last_scan_pruned_files >= 1
