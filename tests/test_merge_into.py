"""MERGE INTO upsert semantics keyed (conv_id, turn_idx) — M3."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
from iceberg_compaction_spark.operators.merge_into import merge_into
from iceberg_compaction_spark.plans.compaction import CompactionRunner
from iceberg_compaction_spark.sources.generator import create_transcripts_table, transcripts_df

KEYS = ["conv_id", "turn_idx"]


def test_merge_updates_and_inserts(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "m1"), n_turns=5000, n_convs=25, n_files=8
    )
    base = transcripts_df(spark, 5000, 25)
    # updates: every turn_idx % 10 == 0 row, text rewritten
    updates = base.filter(F.col("turn_idx") % 10 == 0).withColumn(
        "text", F.concat(F.lit("UPDATED: "), F.col("text"))
    )
    # inserts: brand-new conversation
    inserts = base.limit(100).withColumn("conv_id", F.lit("conv_brandnew"))
    inserts = inserts.groupBy("conv_id", "turn_idx").agg(
        *[F.first(c).alias(c) for c in ("role", "text", "tool", "ts")]
    ).select(*base.columns)
    n_upd, n_ins = updates.count(), inserts.count()
    source = updates.unionByName(inserts)

    merge_into(t, source, KEYS)

    scan = t.scan(spark)
    assert scan.count() == 5000 + n_ins
    assert scan.filter(F.col("text").startswith("UPDATED: ")).count() == n_upd
    # keys unique after merge
    assert scan.groupBy(*KEYS).count().filter(F.col("count") > 1).count() == 0
    # untouched rows identical
    untouched = scan.join(source.select(*KEYS), KEYS, "left_anti")
    expect = base.join(source.select(*KEYS), KEYS, "left_anti")
    assert untouched.exceptAll(expect).count() == 0


def test_merge_source_dedup_latest_wins(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "m2"), n_turns=1000, n_convs=10, n_files=4
    )
    base = transcripts_df(spark, 1000, 10)
    v1 = base.limit(50).withColumn("text", F.lit("v1")).withColumn("ts", F.expr("ts"))
    v2 = v1.withColumn("text", F.lit("v2")).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    merge_into(t, v1.unionByName(v2), KEYS, precedence="ts")
    scan = t.scan(spark)
    assert scan.filter(F.col("text") == "v2").count() == 50
    assert scan.filter(F.col("text") == "v1").count() == 0


def test_merge_delete_matched_only(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "m3"), n_turns=1000, n_convs=10, n_files=4
    )
    tombstones = transcripts_df(spark, 1000, 10).filter(F.col("turn_idx") < 5)
    n = tombstones.count()
    merge_into(t, tombstones, KEYS, delete_matched_only=True)
    assert t.scan(spark).count() == 1000 - n


def test_merge_then_compaction_folds_deletes(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "m4"), n_turns=5000, n_convs=25, n_files=8
    )
    base = transcripts_df(spark, 5000, 25)
    updates = base.filter(F.col("turn_idx") % 7 == 0).withColumn("text", F.lit("U"))
    merge_into(t, updates, KEYS)
    before = t.scan(spark).orderBy(*KEYS).collect()

    cfg = CompactionConfig(
        selection=SelectionStrategy.FULL,
        group_target_size_bytes=256 << 10,
        target_file_size_bytes=4 << 20,
    )
    res = CompactionRunner(spark, t, cfg).execute()
    assert res.removed_delete_files >= 1
    assert all(r["content"] == "data" for r in t.manifest())
    after = t.scan(spark).orderBy(*KEYS).collect()
    assert after == before


# ----------------------------------------------------------------------
# round 5: copy-on-write MERGE (write.merge.mode parity with DELETE/UPDATE)
def test_merge_cow_equals_mor_result(spark, tmp_warehouse):
    import os

    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.table import Table

    def build(loc):
        t = Table.create(loc, "k bigint, v string")
        t.append_dataframe(
            spark.createDataFrame(
                [(i, f"old{i}") for i in range(100)], "k bigint, v string"
            ),
            max_records_per_file=25,
        )
        return t

    src = spark.createDataFrame(
        [(k, f"new{k}") for k in (3, 7, 150)], "k bigint, v string"
    )
    t_mor = build(os.path.join(tmp_warehouse, "mor"))
    merge_into(t_mor, src, keys=["k"], mode="mor")
    t_cow = build(os.path.join(tmp_warehouse, "cow"))
    merge_into(t_cow, src, keys=["k"], mode="cow")

    mor_rows = sorted(tuple(r) for r in t_mor.scan(spark).collect())
    cow_rows = sorted(tuple(r) for r in t_cow.scan(spark).collect())
    assert mor_rows == cow_rows
    assert ("new150", ) not in []  # insert present in both
    assert (150, "new150") in cow_rows and (3, "new3") in cow_rows
    # CoW leaves NO delete files; MoR leaves eq deletes
    assert t_cow.files(content=mf.CONTENT_EQ_DEL) == []
    assert len(t_mor.files(content=mf.CONTENT_EQ_DEL)) >= 1


def test_merge_cow_disjoint_source_is_pure_append(spark, tmp_warehouse):
    import os

    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.table import Table

    loc = os.path.join(tmp_warehouse, "cowapp")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(
        spark.createDataFrame([(i, f"v{i}") for i in range(50)], "k bigint, v string")
        .coalesce(1)
    )
    before_paths = {r["path"] for r in t.files(content=mf.CONTENT_DATA)}
    src = spark.createDataFrame([(1000, "x"), (1001, "y")], "k bigint, v string")
    merge_into(t, src, keys=["k"], mode="cow")
    after = t.files(content=mf.CONTENT_DATA)
    # original file untouched (bounds disjoint → no rewrite)
    assert before_paths <= {r["path"] for r in after}
    assert t.scan(spark).count() == 52


def test_merge_mode_table_property_drives_default(spark, tmp_warehouse):
    import os

    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.table import Table

    loc = os.path.join(tmp_warehouse, "cowprop")
    t = Table.create(loc, "k bigint, v string")
    t.set_property("write.merge.mode", "cow")
    t.append_dataframe(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string").coalesce(1)
    )
    merge_into(t, spark.createDataFrame([(1, "A")], "k bigint, v string"), keys=["k"])
    assert t.files(content=mf.CONTENT_EQ_DEL) == []  # property picked cow
    assert sorted(tuple(r) for r in t.scan(spark).collect()) == [(1, "A"), (2, "b")]


def test_merge_cow_delete_matched_only(spark, tmp_warehouse):
    import os

    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources.table import Table

    loc = os.path.join(tmp_warehouse, "cowdel")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k bigint, v string")
        .coalesce(1)
    )
    merge_into(
        t,
        spark.createDataFrame([(3,), (5,)], "k bigint"),
        keys=["k"],
        mode="cow",
        delete_matched_only=True,
    )
    ks = sorted(r["k"] for r in t.scan(spark).collect())
    assert ks == [0, 1, 2, 4, 6, 7, 8, 9]
