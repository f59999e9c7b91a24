"""Column rename: metadata-only, epoch-aware reads (old files keep the
old physical name; scans/compaction normalize to current names — never
silent NULLs)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.sources.table import Table


def _mk(spark, loc, n=200):
    t = Table.create(
        loc, "conv_id string, turn_idx int, text string",
        partition=None,
    )
    t.append_dataframe(spark.createDataFrame(
        [(f"c{i % 5}", i, f"old_{i}") for i in range(n)],
        "conv_id string, turn_idx int, text string",
    ).coalesce(2))
    return t


def test_rename_mixed_epochs_scan(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "rn"))
    t.rename_column("text", "body")
    assert t.user_columns() == ["conv_id", "turn_idx", "body"]
    # new-epoch rows written under the NEW name
    t.append_dataframe(spark.createDataFrame(
        [(f"c{i % 5}", i, f"new_{i}") for i in range(200, 260)],
        "conv_id string, turn_idx int, body string",
    ).coalesce(1))
    rows = {r["turn_idx"]: r["body"] for r in t.scan(spark).collect()}
    assert len(rows) == 260
    assert rows[7] == "old_7" and rows[255] == "new_255"
    assert all(v is not None for v in rows.values())  # the silent-NULL trap
    # filters on the new name apply across both epochs
    assert t.scan(spark).filter(F.col("body").startswith("old_")).count() == 200


def test_rename_chain_and_reuse(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "rn2"), n=50)
    t.rename_column("text", "body")
    t.rename_column("body", "content")
    rows = {r["turn_idx"]: r["content"] for r in t.scan(spark).collect()}
    assert rows[3] == "old_3" and len(rows) == 50
    # reusing a freed name maps epochs independently
    t.rename_column("conv_id", "conversation")
    t.rename_column("content", "conv_id")
    rows = t.scan(spark).collect()
    assert {r["conv_id"] for r in rows} == {f"old_{i}" for i in range(50)}
    assert {r["conversation"] for r in rows} == {f"c{i}" for i in range(5)}


def test_compaction_migrates_renamed_files(spark, tmp_warehouse):
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    t = _mk(spark, os.path.join(tmp_warehouse, "rn3"))
    t.rename_column("text", "body")
    dels = t.scan(spark).filter(F.col("turn_idx") % 7 == 1).select("conv_id", "turn_idx")
    t.add_equality_deletes(dels, keys=["conv_id", "turn_idx"])
    before = sorted((r["turn_idx"], r["body"]) for r in t.scan(spark).collect())
    CompactionRunner(
        spark, t, CompactionConfig(selection=SelectionStrategy.FULL)
    ).execute()
    after = sorted((r["turn_idx"], r["body"]) for r in t.scan(spark).collect())
    assert after == before
    # rewritten files now carry the CURRENT physical name: their stats
    # are keyed by it, so pruning on the new name works again
    import json

    st = json.loads(t.files(content="data")[0]["stats_json"])
    assert "body" in st and "text" not in st


def test_rename_guards(spark, tmp_warehouse):
    t = Table.create(
        os.path.join(tmp_warehouse, "rn4"),
        "conv_id string, turn_idx int, text string, ts timestamp",
        partition={"field": "_part", "expr": "date_format(ts, 'yyyy-MM-dd')"},
    )
    t.append_dataframe(spark.createDataFrame(
        [("c0", 1, "x", None)], "conv_id string, turn_idx int, text string, ts timestamp",
    ))
    with pytest.raises(ValidationError):
        t.rename_column("nope", "x")
    with pytest.raises(ValidationError):
        t.rename_column("text", "conv_id")  # exists
    with pytest.raises(ValidationError):
        t.rename_column("_part", "part2")  # partition field
    t.add_equality_deletes(
        spark.createDataFrame([("c0", 1)], "conv_id string, turn_idx int"),
        keys=["conv_id", "turn_idx"],
    )
    with pytest.raises(ValidationError):
        t.rename_column("conv_id", "conversation")  # live eq-delete key


def test_widen_column_across_epochs(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "wd"), n=50)
    with pytest.raises(ValidationError):
        t.widen_column("turn_idx", "string")  # not a lossless promotion
    with pytest.raises(ValidationError):
        t.widen_column("nope", "bigint")
    t.widen_column("turn_idx", "bigint")
    big = 2**40
    t.append_dataframe(spark.createDataFrame(
        [("c9", big, "huge")], "conv_id string, turn_idx bigint, text string",
    ))
    rows = {r["turn_idx"]: r["text"] for r in t.scan(spark).collect()}
    assert rows[big] == "huge" and rows[7] == "old_7" and len(rows) == 51
    assert dict(t.scan(spark).dtypes)["turn_idx"] == "bigint"
    # compaction rewrites old files at the widened type
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    CompactionRunner(
        spark, t, CompactionConfig(selection=SelectionStrategy.FULL)
    ).execute()
    rows2 = {r["turn_idx"]: r["text"] for r in t.scan(spark).collect()}
    assert rows2 == rows


def test_add_column_with_default(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "dflt"), n=30)
    t.add_column("lang", "string", default="en")
    t.append_dataframe(spark.createDataFrame(
        [("c9", 100, "x", "fr"), ("c9", 101, "y", None)],
        "conv_id string, turn_idx int, text string, lang string",
    ))
    got = {r["turn_idx"]: r["lang"] for r in t.scan(spark).collect()}
    assert got[0] == "en" and got[100] == "fr"
    assert got[101] is None  # post-add NULLs stay NULL (not defaulted)
    # default + rename compose
    t.rename_column("lang", "language")
    got2 = {r["turn_idx"]: r["language"] for r in t.scan(spark).collect()}
    assert got2[0] == "en" and got2[100] == "fr" and got2[101] is None


def test_changelog_and_incremental_across_rename(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.changelog import changelog_scan

    t = _mk(spark, os.path.join(tmp_warehouse, "rn5"), n=40)
    sid0 = t.current_snapshot_id
    t.rename_column("text", "body")
    t.append_dataframe(spark.createDataFrame(
        [("c9", 100, "late")], "conv_id string, turn_idx int, body string",
    ))
    inc = t.incremental_scan(spark, sid0)
    assert [(r["conv_id"], r["body"]) for r in inc.collect()] == [("c9", "late")]
    ch = changelog_scan(spark, t, None, columns=["conv_id", "turn_idx", "body"])
    got = {(r["conv_id"], r["turn_idx"]): r["body"] for r in ch.collect()}
    assert got[("c9", 100)] == "late" and got[("c0", 0)] == "old_0"
    assert all(v is not None for v in got.values())
