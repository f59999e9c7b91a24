"""Round-4 UPDATE WHERE (MoR) + MIN/MAX pushdown."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.operators.stats_agg import fast_min_max
from iceberg_compaction_spark.operators.update_where import update_where
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources.table import Table


def _mk(spark, loc, partitioned=True):
    t = Table.create(
        loc, "conv_id bigint, ts timestamp, score int, v string",
        partition=(
            {"field": "_part", "expr": "date_format(ts, 'yyyy-MM-dd')"}
            if partitioned
            else None
        ),
    )
    df = spark.range(2000).selectExpr(
        "id as conv_id",
        "timestamp'2024-06-01 00:00:00' + make_interval(0,0,0,0,0,0,id*90) as ts",
        "cast(id % 100 as int) as score",
        "concat('v', id) as v",
    )
    t.append_dataframe(df.repartition(4), max_records_per_file=500)
    return t


def test_update_where_roundtrip(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "upd"))
    res = update_where(
        spark, t, "score >= 90", {"v": "concat(v, '!')", "score": "score + 1000"}
    )
    assert res["updated_rows"] == 200
    out = t.scan(spark)
    assert out.count() == 2000  # row count invariant
    assert out.filter("score >= 1090").count() == 200
    assert out.filter("v LIKE '%!'").count() == 200
    # untouched rows byte-identical
    assert out.filter("score < 90 AND v LIKE '%!'").count() == 0
    # assignments see PRE-update values (score+1000 used old score)
    assert out.filter("score = 1090").count() == 20


def test_update_moves_partition(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "updpart"))
    update_where(
        spark, t, "conv_id = 7", {"ts": "ts + INTERVAL 30 DAYS"}
    )
    rows = t.scan(spark, with_hidden=False).filter("conv_id = 7").collect()
    assert len(rows) == 1
    assert rows[0]["ts"].month == 7  # moved from June to July
    # the new image lives in a July partition file
    july = [
        r for r in t.files(content=mf.CONTENT_DATA) if r["partition"].startswith("2024-07")
    ]
    assert july


def test_update_where_no_match_and_validation(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "updnone"))
    sid = t.current_snapshot_id
    res = update_where(spark, t, "score > 10000", {"v": "'x'"})
    assert res["updated_rows"] == 0 and res["snapshot_id"] == sid
    with pytest.raises(ValidationError):
        update_where(spark, t, "score > 0", {"nope": "'x'"})
    with pytest.raises(ValidationError):
        update_where(spark, t, "score > 0", {"_part": "'2024-01-01'"})


def test_update_twice_latest_wins(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "updtwice"))
    update_where(spark, t, "conv_id = 3", {"v": "'first'"})
    update_where(spark, t, "conv_id = 3", {"v": "'second'"})
    rows = t.scan(spark).filter("conv_id = 3").collect()
    assert len(rows) == 1 and rows[0]["v"] == "second"


def test_fast_min_max_paths(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "mm"))
    r = fast_min_max(spark, t, "score")
    assert (r["min"], r["max"]) == (0, 99)
    assert r["scanned_files"] == 0 and r["metadata_files"] > 0
    # string column: parquet stats may truncate — always scans
    r2 = fast_min_max(spark, t, "v")
    assert r2["scanned_files"] > 0
    assert (r2["min"], r2["max"]) == ("v0", "v999")
    # deletes force the scan path and stay exact (delete the max rows)
    t.add_equality_deletes(
        spark.createDataFrame([(i,) for i in range(1900, 2000)], "conv_id bigint"),
        ["conv_id"],
    )
    r3 = fast_min_max(spark, t, "ts")
    assert r3["metadata_files"] == 0
    truth = t.scan(spark).agg(F.max("ts")).collect()[0][0]
    assert r3["max"] == truth


# ---------------------------------------------------------------------------
# copy-on-write modes: same logical result, zero delete files
def test_delete_where_cow_mode(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.delete_where import delete_where

    t = _mk(spark, os.path.join(tmp_warehouse, "delcow"))
    # pre-existing tombstones must NOT resurrect through the rewrite
    hits = (
        t.scan(spark, with_hidden=True).filter("conv_id % 100 = 7")
        .select("_file", "_pos")
    )
    t.add_position_deletes(hits)
    n_live = t.scan(spark).count()
    res = delete_where(spark, t, "score >= 95", mode="cow")
    assert res["deleted_rows"] == t_expected_deleted(n_live)
    out = t.scan(spark)
    assert out.filter("score >= 95").count() == 0
    assert out.filter("conv_id % 100 = 7").count() == 0  # stayed dead
    assert out.count() == n_live - res["deleted_rows"]
    # cow leaves NO new delete files; the folded-in pos deletes may
    # remain attached to untouched files only
    assert t.snapshot(t.current_snapshot_id)["operation"] == "delete"


def t_expected_deleted(n_live):
    # scores 95..99 over conv_id 0..1999 (id%100), minus the 20 rows
    # with conv_id%100==7 already dead (7 is not in 95..99, so none)
    return 5 * 20


def test_update_where_cow_mode(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.update_where import update_where

    t = _mk(spark, os.path.join(tmp_warehouse, "updcow"))
    res = update_where(
        spark, t, "score >= 90", {"v": "concat(v, '!')", "score": "score + 1000"},
        mode="cow",
    )
    assert res["updated_rows"] == 200
    out = t.scan(spark)
    assert out.count() == 2000
    assert out.filter("score >= 1090").count() == 200
    assert out.filter("score < 90 AND v LIKE '%!'").count() == 0
    # cow: zero delete files exist
    assert not t.files(content=mf.CONTENT_POS_DEL)
    assert not t.files(content=mf.CONTENT_EQ_DEL)


def test_cow_and_mor_agree(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.update_where import update_where

    t1 = _mk(spark, os.path.join(tmp_warehouse, "agree1"))
    t2 = _mk(spark, os.path.join(tmp_warehouse, "agree2"))
    args = ("score % 10 = 3", {"v": "upper(v)"})
    update_where(spark, t1, *args, mode="mor")
    update_where(spark, t2, *args, mode="cow")
    a = sorted(tuple(r) for r in t1.scan(spark).collect())
    b = sorted(tuple(r) for r in t2.scan(spark).collect())
    assert a == b
