"""Merge-on-read delete application.

Canonical oracle ported from the reference's only end-to-end
correctness test (``crates/worker/tests/logical_plan_minio.rs:177-178``):
live rows after apply == total − |applicable deletes|, exact; plus the
seq semantics fixture (data seq=1, delete seq=10 ⇒ delete wins;
delete seq ≤ data seq ⇒ data survives, logical_plan_minio.rs:58-65,213).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.mor import FILE_COL, POS_COL
from iceberg_compaction_spark.sources.generator import (
    TRANSCRIPT_DDL,
    create_transcripts_table,
    transcripts_df,
)
from iceberg_compaction_spark.sources.table import Table


def test_position_deletes_applied(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "p"), n_turns=5000, n_convs=50, n_files=8
    )
    # delete every 10th position of every file — deterministic
    hidden = t.scan(spark, with_hidden=True)
    dels = hidden.filter(F.col(POS_COL) % 10 == 0).select(FILE_COL, POS_COL)
    n_del = dels.count()
    t.add_position_deletes(dels)
    assert n_del > 0
    assert t.scan(spark).count() == 5000 - n_del
    # time travel: previous snapshot still sees everything
    assert t.scan(spark, snapshot_id=1).count() == 5000


def test_equality_deletes_seq_semantics(spark, tmp_warehouse):
    t = Table.create(os.path.join(tmp_warehouse, "e"), TRANSCRIPT_DDL)
    data = transcripts_df(spark, 1000, 10)
    t.append_dataframe(data)  # data files get seq=1
    victims = data.filter(F.col("turn_idx") % 17 == 0).select("conv_id", "turn_idx")
    n_victims = victims.count()
    t.add_equality_deletes(victims, keys=["conv_id", "turn_idx"])  # delete seq=2 > 1
    assert t.scan(spark).count() == 1000 - n_victims

    # rows appended AFTER the delete (data seq=3 > delete seq=2) survive
    readd = data.filter((F.col("turn_idx") % 17 == 0) & (F.col("conv_id") == "conv_00000001"))
    n_readd = readd.count()
    assert n_readd > 0
    t.append_dataframe(readd)
    assert t.scan(spark).count() == 1000 - n_victims + n_readd
    resurrected = (
        t.scan(spark)
        .filter((F.col("turn_idx") % 17 == 0) & (F.col("conv_id") == "conv_00000001"))
        .count()
    )
    assert resurrected == n_readd


def test_pos_and_eq_deletes_compose(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "pe"), n_turns=3000, n_convs=30, n_files=6
    )
    hidden = t.scan(spark, with_hidden=True)
    pos = hidden.filter(F.col(POS_COL) % 7 == 0).select(FILE_COL, POS_COL)
    t.add_position_deletes(pos)
    eq_keys = (
        transcripts_df(spark, 3000, 30)
        .filter(F.col("turn_idx") % 13 == 5)
        .select("conv_id", "turn_idx")
    )
    t.add_equality_deletes(eq_keys, keys=["conv_id", "turn_idx"])

    # independent oracle: base rows minus pos-deleted minus eq-keyed
    # (all data seq=1 < delete seq ⇒ every eq delete applies)
    base_hidden = t.scan(spark, snapshot_id=1, with_hidden=True)
    expect = (
        base_hidden.join(pos, on=[FILE_COL, POS_COL], how="left_anti")
        .join(eq_keys, on=["conv_id", "turn_idx"], how="left_anti")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    surv = t.scan(spark)
    assert surv.count() == expect.count()
    assert surv.exceptAll(expect).count() == 0
    assert expect.exceptAll(surv).count() == 0
