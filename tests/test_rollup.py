"""Incremental rollup: refresh folds ONLY the appended delta, the
merged state equals a full recompute, replays are no-ops, and a
replace commit inside the refresh window is refused (it would
double-count rewritten rows)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.rollup import refresh_rollup
from iceberg_compaction_spark.sources.table import Table

SRC_DDL = "k BIGINT, v DOUBLE"
ROLLUP_DDL = "k BIGINT, cnt BIGINT, sv DOUBLE, mn DOUBLE, mx DOUBLE"
AGGS = {
    "cnt": ("count", ""),
    "sv": ("sum", "v"),
    "mn": ("min", "v"),
    "mx": ("max", "v"),
}


def _state(rollup, spark):
    return {
        r["k"]: (r["cnt"], round(r["sv"], 6), r["mn"], r["mx"])
        for r in rollup.scan(spark).collect()
    }


def _full(spark, rows):
    df = spark.createDataFrame(rows, SRC_DDL)
    return {
        r["k"]: (r["cnt"], round(r["sv"], 6), r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }


def test_refresh_rollup_incremental(spark, tmp_warehouse):
    src = Table.create(os.path.join(tmp_warehouse, "src"), SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "roll"), ROLLUP_DDL)

    b1 = [(i % 3, float(i)) for i in range(30)]
    src.append_dataframe(spark.createDataFrame(b1, SRC_DDL).coalesce(1))
    r1 = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r1["delta_rows"] == 30
    assert _state(roll, spark) == _full(spark, b1)

    b2 = [(i % 4, float(100 + i)) for i in range(17)]
    src.append_dataframe(spark.createDataFrame(b2, SRC_DDL).coalesce(1))
    r2 = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r2["delta_rows"] == 17  # only the delta was scanned
    assert _state(roll, spark) == _full(spark, b1 + b2)

    # replayed refresh: no new snapshot, nothing changes
    r3 = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r3["delta_rows"] == 0
    assert _state(roll, spark) == _full(spark, b1 + b2)


def test_refresh_refuses_replace_in_window(spark, tmp_warehouse):
    import pytest

    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    src = Table.create(os.path.join(tmp_warehouse, "src2"), SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "roll2"), ROLLUP_DDL)
    rows = [(i % 2, float(i)) for i in range(40)]
    src.append_dataframe(spark.createDataFrame(rows[:20], SRC_DDL).coalesce(1))
    src.append_dataframe(spark.createDataFrame(rows[20:], SRC_DDL).coalesce(1))
    CompactionRunner(
        spark,
        src,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.SINGLE,
            sort_order=(("k", False),),
        ),
    ).execute()
    with pytest.raises(ValueError, match="replace"):
        refresh_rollup(spark, src, roll, ["k"], AGGS)


def test_refresh_rollup_hll_distinct_state(spark, tmp_warehouse):
    """HLL sketch state is mergeable across refreshes: two incremental
    refreshes' unioned sketch estimates the distinct count over BOTH
    appends (within HLL error), including values seen in both."""
    from iceberg_compaction_spark.operators.rollup import hll_estimates

    src = Table.create(os.path.join(tmp_warehouse, "src3"), SRC_DDL)
    roll = Table.create(
        os.path.join(tmp_warehouse, "roll3"), "k BIGINT, cnt BIGINT, nd BINARY"
    )
    aggs = {"cnt": ("count", ""), "nd": ("hll", "v")}
    # overlap: batch2 repeats half of batch1's values
    b1 = [(0, float(i)) for i in range(500)]
    b2 = [(0, float(i)) for i in range(250, 750)]
    src.append_dataframe(spark.createDataFrame(b1, SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], aggs)
    src.append_dataframe(spark.createDataFrame(b2, SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], aggs)
    row = hll_estimates(roll.scan(spark), ["nd"]).collect()[0]
    assert row["cnt"] == 1000  # rows, exact
    assert abs(row["nd"] - 750) / 750 < 0.05  # distinct, sketched


def test_refresh_rollup_fuzz_interleavings(spark, tmp_warehouse):
    """Random interleavings of appends and refreshes (including
    back-to-back appends folded by ONE refresh, and refreshes with
    nothing new) must always leave the rollup equal to a full
    recompute over everything appended so far."""
    import random

    rng = random.Random(20260817)
    for trial in range(3):
        src = Table.create(os.path.join(tmp_warehouse, f"fz_src{trial}"), SRC_DDL)
        roll = Table.create(os.path.join(tmp_warehouse, f"fz_roll{trial}"), ROLLUP_DDL)
        appended: list = []
        refreshed_through = 0
        for step in range(6):
            if rng.random() < 0.6:
                batch = [
                    (rng.randrange(3), float(rng.randrange(50)))
                    for _ in range(rng.randrange(1, 8))
                ]
                src.append_dataframe(
                    spark.createDataFrame(batch, SRC_DDL).coalesce(1)
                )
                appended.extend(batch)
            else:
                r = refresh_rollup(spark, src, roll, ["k"], AGGS)
                assert r["delta_rows"] == len(appended) - refreshed_through
                refreshed_through = len(appended)
                if refreshed_through:
                    assert _state(roll, spark) == _full(spark, appended)
        refresh_rollup(spark, src, roll, ["k"], AGGS)
        if appended:
            assert _state(roll, spark) == _full(spark, appended)
