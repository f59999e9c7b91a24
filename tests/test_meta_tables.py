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


def test_analyze_table_and_column_stats(spark, tmp_warehouse):
    """Round 4: ANALYZE persists exact/HLL column stats; the
    .column_stats metadata table surfaces them; scan answers match."""
    import os

    import pytest

    from iceberg_compaction_spark.errors import ValidationError
    from iceberg_compaction_spark.operators.analyze import (
        analyze_table,
        column_stats_table,
    )
    from iceberg_compaction_spark.sources.table import Table

    loc = os.path.join(tmp_warehouse, "an")
    t = Table.create(loc, "k bigint, v string, w string")
    df = spark.range(1000).selectExpr(
        "id % 77 as k",
        "concat('v', id % 13) as v",
        "CASE WHEN id % 4 = 0 THEN NULL ELSE 'x' END as w",
    )
    t.append_dataframe(df)
    # empty before analyze
    assert column_stats_table(spark, t).count() == 0
    st = analyze_table(spark, t, exact=True)
    assert st["rows"] == 1000
    assert st["columns"]["k"] == {"nulls": 0, "ndv": 77, "min": 0, "max": 76}
    assert st["columns"]["v"]["ndv"] == 13
    assert st["columns"]["w"]["nulls"] == 250
    rows = {r["column"]: r for r in column_stats_table(spark, t).collect()}
    assert rows["k"]["ndv"] == 77 and rows["k"]["exact"] is True
    assert rows["w"]["nulls"] == 250
    # stats survive a reload (persisted in table.json)
    t2 = Table.load(loc)
    assert column_stats_table(spark, t2).count() == 3
    # HLL mode lands within a sane band
    st2 = analyze_table(spark, t, exact=False)
    assert abs(st2["columns"]["k"]["ndv"] - 77) <= 8
    with pytest.raises(ValidationError):
        analyze_table(spark, t, ["nope"])
    # stats respect MoR deletes (analyze after a delete sees fewer rows)
    from pyspark.sql import functions as F

    t.add_equality_deletes(spark.range(10).select(F.col("id").alias("k")), ["k"])
    st3 = analyze_table(spark, t, ["k"], exact=True)
    assert st3["rows"] < 1000 and st3["columns"]["k"]["ndv"] == 67
