"""Round-4 catalog layer + timestamp time travel."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.sources.catalog import Catalog
from iceberg_compaction_spark.sources.table import Table


def test_catalog_crud_and_maintain_all(spark, tmp_warehouse):
    cat = Catalog(os.path.join(tmp_warehouse, "wh"))
    assert cat.list_tables() == []
    a = cat.create_table("alpha", "k bigint, v string")
    cat.create_table("beta", "k bigint, v string")
    assert cat.list_tables() == ["alpha", "beta"]
    with pytest.raises(ValidationError):
        cat.create_table("alpha", "k bigint")
    with pytest.raises(ValidationError):
        cat.load_table("gamma")
    with pytest.raises(ValidationError):
        cat.create_table("../evil", "k bigint")

    # fragment alpha so maintain_all has work; beta stays trivial
    for i in range(5):
        a.append_dataframe(
            spark.range(i * 50, (i + 1) * 50).selectExpr("id as k", "'x' as v")
        )
    res = cat.maintain_all(spark, retain_last=1)
    assert set(res) == {"alpha", "beta"}
    assert "error" not in res["alpha"] and "error" not in res["beta"]
    a2 = cat.load_table("alpha")
    assert a2.scan(spark).count() == 250

    cat.drop_table("beta")
    assert cat.list_tables() == ["alpha"]
    assert not cat.table_exists("beta")
    with pytest.raises(ValidationError):
        cat.drop_table("beta")


def test_maintain_all_survives_one_bad_table(spark, tmp_warehouse):
    cat = Catalog(os.path.join(tmp_warehouse, "wh2"))
    g = cat.create_table("good", "k bigint, v string")
    g.append_dataframe(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    bad = cat.create_table("bad", "k bigint, v string")
    bad.append_dataframe(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    # corrupt bad's current pointer
    with open(os.path.join(bad._meta_dir, "current.json"), "w") as f:
        f.write("{not json")
    res = cat.maintain_all(spark)
    assert "error" in res["bad"]
    assert "error" not in res["good"]


def test_scan_as_of_timestamp(spark, tmp_warehouse):
    t = Table.create(os.path.join(tmp_warehouse, "asof"), "k bigint, v string")
    t.append_dataframe(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    ts1 = t.snapshot(t.current_snapshot_id)["timestamp_ms"]
    time.sleep(0.02)
    t.append_dataframe(spark.createDataFrame([(2, "b")], "k bigint, v string"))
    ts2 = t.snapshot(t.current_snapshot_id)["timestamp_ms"]

    assert t.scan(spark, as_of_ms=ts1).count() == 1
    assert t.scan(spark, as_of_ms=ts2 + 10).count() == 2
    assert {r["k"] for r in t.scan(spark, as_of_ms=ts1).collect()} == {1}
    with pytest.raises(ValidationError):
        t.scan(spark, as_of_ms=ts1 - 10_000)
    with pytest.raises(ValidationError):
        t.scan(spark, snapshot_id=1, as_of_ms=ts1)
    # branch snapshots never leak into main's as-of ancestry
    t.create_branch("b")
    t.append_dataframe(
        spark.createDataFrame([(9, "z")], "k bigint, v string"), branch="b"
    )
    assert t.scan(spark, as_of_ms=int(time.time() * 1000) + 1000).count() == 2
    t.drop_branch("b")


def test_table_properties_drive_dml_and_compaction_defaults(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.update_where import update_where
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources import manifest as mf

    t = Table.create(os.path.join(tmp_warehouse, "props"), "k bigint, v string")
    t.append_dataframe(spark.range(500).selectExpr("id as k", "concat('v', id) as v"))
    # properties persist across reloads
    t.set_property("write.delete.mode", "cow")
    t.set_property("write.update.mode", "cow")
    t.set_property("compaction.target-file-size-bytes", 123456)
    t2 = Table.load(t.location)
    assert t2.get_property("write.delete.mode") == "cow"
    assert t2.get_property("missing", "dflt") == "dflt"
    # DML defaults come from properties: cow leaves no delete files
    delete_where(spark, t2, "k >= 450")
    update_where(spark, t2, "k < 10", {"v": "'u'"})
    assert not t2.files(content=mf.CONTENT_POS_DEL)
    assert t2.scan(spark).count() == 450
    assert t2.scan(spark).filter("v = 'u'").count() == 10
    # explicit argument beats the property
    delete_where(spark, t2, "k >= 440", mode="mor")
    assert t2.files(content=mf.CONTENT_POS_DEL)
    assert t2.scan(spark).count() == 440
    # compaction default config picks up the property
    runner = CompactionRunner(spark, t2)
    assert runner.config.target_file_size_bytes == 123456
    t2.unset_property("write.delete.mode")
    assert t2.get_property("write.delete.mode") is None
