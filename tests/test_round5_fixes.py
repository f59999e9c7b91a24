"""Round-5 ADVICE regressions: locked table.json read-modify-write,
uncached bloom-sidecar failures + true LRU, expiry-durable streaming
batch guard, delete_where full-drop row accounting under existing
tombstones, fast_min_max one-sided-stats fallback."""

from __future__ import annotations

import json
import os
import shutil
import threading

from pyspark.sql import functions as F

from iceberg_compaction_spark.functions import bloom
from iceberg_compaction_spark.operators.delete_where import delete_where
from iceberg_compaction_spark.operators.stats_agg import fast_min_max
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources.table import Table


# ---------------------------------------------------------------------------
# ADVICE: set_property / unset_property / analyze must not lose a
# concurrent writer's table.json update (refs.json-style lock + disk
# refresh).
def test_property_writes_from_stale_handles_do_not_clobber(tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "props")
    t1 = Table.create(loc, "id bigint")
    t2 = Table.load(loc)  # second handle: meta snapshot predates t1's write
    t1.set_property("a", 1)
    t2.set_property("b", 2)  # old code: rewrites t2's stale meta, losing 'a'
    fresh = Table.load(loc)
    assert fresh.get_property("a") == 1
    assert fresh.get_property("b") == 2
    # unset through yet another stale handle keeps the other key
    t3 = Table.load(loc)
    t1.set_property("c", 3)
    t3.unset_property("a")
    fresh = Table.load(loc)
    assert fresh.get_property("a") is None
    assert fresh.get_property("c") == 3


def test_concurrent_property_writers_all_land(tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "props_mt")
    Table.create(loc, "id bigint")

    def writer(i: int) -> None:
        t = Table.load(loc)
        for j in range(5):
            t.set_property(f"k{i}_{j}", i * 100 + j)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    fresh = Table.load(loc)
    for i in range(4):
        for j in range(5):
            assert fresh.get_property(f"k{i}_{j}") == i * 100 + j


# ---------------------------------------------------------------------------
# ADVICE: a transient sidecar read failure must not be cached (probes
# would degrade to 'maybe present' for the process lifetime), and the
# cache is true LRU (hits move to the end).
def test_sidecar_failure_not_cached_and_recovers(tmp_warehouse):
    # build a real sidecar via the public writer
    blooms = {"f1": {"b64": "AAAA", "m": 16, "k": 2, "t": "str"}}
    desc = bloom.write_sidecar(blooms, tmp_warehouse, "c")
    side_path = desc["f1"]["ref"]
    bloom._SIDECAR_CACHE.clear()
    hidden = side_path + ".hidden"
    os.rename(side_path, hidden)  # transient IO failure
    assert bloom._load_sidecar(side_path) is None
    assert side_path not in bloom._SIDECAR_CACHE  # failure NOT cached
    os.rename(hidden, side_path)  # IO recovers
    loaded = bloom._load_sidecar(side_path)
    assert loaded is not None and "f1" in loaded
    assert bloom._SIDECAR_CACHE[side_path] is loaded


def test_sidecar_cache_is_lru_not_fifo(tmp_warehouse):
    paths = []
    for i in range(3):
        desc = bloom.write_sidecar(
            {f"f{i}": {"b64": "AAAA", "m": 16, "k": 2, "t": "str"}},
            tmp_warehouse,
            f"c{i}",
        )
        paths.append(desc[f"f{i}"]["ref"])
    old_max = bloom._SIDECAR_CACHE_MAX
    bloom._SIDECAR_CACHE.clear()
    bloom._SIDECAR_CACHE_MAX = 2
    try:
        bloom._load_sidecar(paths[0])
        bloom._load_sidecar(paths[1])
        bloom._load_sidecar(paths[0])  # touch: 0 becomes most-recent
        bloom._load_sidecar(paths[2])  # evicts 1 (LRU), not 0 (FIFO would)
        assert paths[0] in bloom._SIDECAR_CACHE
        assert paths[1] not in bloom._SIDECAR_CACHE
        assert paths[2] in bloom._SIDECAR_CACHE
    finally:
        bloom._SIDECAR_CACHE_MAX = old_max
        bloom._SIDECAR_CACHE.clear()


# ---------------------------------------------------------------------------
# ADVICE: the streaming exactly-once guard survives snapshot expiry —
# last (stream_key, batch_id) persists as a table property.
def test_stream_batch_guard_survives_summary_loss(spark, tmp_warehouse):
    from iceberg_compaction_spark.streaming.ingest import make_idempotent_batch_writer

    loc = os.path.join(tmp_warehouse, "stream_t")
    ckpt = os.path.join(tmp_warehouse, "ckpt")
    t = Table.create(loc, "id bigint, v string")
    write_batch = make_idempotent_batch_writer(t, ckpt)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    write_batch(df, 0)
    write_batch(df, 1)
    # the durable property records the high-water mark
    props = {k: v for k, v in (Table.load(loc).meta.get("properties") or {}).items()}
    assert any(k.startswith("stream.") and v == 1 for k, v in props.items()), props
    n_snaps = len(t.snapshots())
    assert n_snaps == 2

    # simulate maintenance having expired every summary-carrying
    # snapshot: a fresh writer (fresh process) must still know batch 1
    # happened and skip its replay.
    t2 = Table.load(loc)
    t2.snapshots = lambda: []  # summaries gone
    replay = make_idempotent_batch_writer(t2, ckpt)
    replay(df, 1)  # crash-replayed batch
    assert len(Table.load(loc).snapshots()) == n_snaps  # no duplicate commit
    replay(df, 2)  # genuinely new batch still lands
    assert len(Table.load(loc).snapshots()) == n_snaps + 1


# ---------------------------------------------------------------------------
# ADVICE: delete_where's whole-file metadata drop reports LIVE rows
# removed, not raw record_count (rows already dead via position-delete
# tombstones don't count twice).
def test_delete_where_full_drop_counts_live_rows_only(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "dw")
    t = Table.create(loc, "id bigint, v string")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id bigint, v string")
    t.append_dataframe(df.coalesce(1))
    # step 1: MoR-delete 3 rows → position-delete tombstones on the file
    r1 = delete_where(spark, t, "id < 3", mode="mor")
    assert r1["deleted_rows"] == 3 and r1["dropped_files"] == 0
    # step 2: whole-file predicate → metadata drop; only 7 rows were
    # still alive (old code reported 10)
    r2 = delete_where(spark, t, "id >= 0", mode="mor")
    assert r2["dropped_files"] == 1
    assert r2["deleted_rows"] == 7, r2
    assert t.scan(spark).count() == 0


# ---------------------------------------------------------------------------
# ADVICE: fast_min_max with a one-sided stats entry (min known, max
# unknown) falls back to the scan path instead of raising TypeError.
def test_fast_min_max_one_sided_stats_falls_back_to_scan(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "mm")
    t = Table.create(loc, "id bigint, v bigint")
    t.append_dataframe(
        spark.createDataFrame([(i, i * 10) for i in range(8)], "id bigint, v bigint")
    )
    rows = t.manifest()
    # tamper: drop the max bound on one file's v stats
    for r in rows:
        if r["content"] == mf.CONTENT_DATA:
            st = json.loads(r["stats_json"])
            st["v"]["max"] = None
            r["stats_json"] = json.dumps(st)
            break
    t.manifest = lambda sid=None, _rows=rows: _rows  # instance shadow
    out = fast_min_max(spark, t, "v")
    assert out["min"] == 0 and out["max"] == 70
    assert out["scanned_files"] > 0  # took the scan fallback, no TypeError


# ---------------------------------------------------------------------------
# round-5 self-review fixes
def test_merge_cow_timestamp_first_key(spark, tmp_warehouse):
    """CoW candidate selection compares manifest ISO-string bounds
    against a datetime source range — must not TypeError, must pick the
    right files."""
    import datetime as dt

    from iceberg_compaction_spark.operators.merge_into import merge_into

    loc = os.path.join(tmp_warehouse, "cowts")
    t = Table.create(loc, "ts timestamp, v string")
    base = dt.datetime(2024, 6, 1)
    rows = [(base + dt.timedelta(hours=i), f"v{i}") for i in range(10)]
    t.append_dataframe(
        spark.createDataFrame(rows, "ts timestamp, v string").coalesce(1)
    )
    src = spark.createDataFrame(
        [(base + dt.timedelta(hours=3), "NEW")], "ts timestamp, v string"
    )
    merge_into(t, src, keys=["ts"], mode="cow")
    got = {r["v"] for r in t.scan(spark).collect()}
    assert "NEW" in got and "v3" not in got and len(got) == 10
    assert t.files(content=mf.CONTENT_EQ_DEL) == []


def test_datasource_writer_rejects_type_mismatch(spark, tmp_warehouse):
    import pytest

    from iceberg_compaction_spark.sources.datasource import register

    loc = os.path.join(tmp_warehouse, "dsw_t")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(spark.createDataFrame([(1, "a")], "k bigint, v string").coalesce(1))
    register(spark)
    bad = spark.createDataFrame([("1", "x")], "k string, v string")  # k wrong type
    with pytest.raises(Exception, match="type mismatch|TYPE"):
        bad.write.format("icemaint").mode("append").save(loc)
    assert t.scan(spark).count() == 1  # nothing committed


def test_datasource_null_eq_key_matches_native(spark, tmp_warehouse):
    """eqNullSafe parity: a NULL-keyed equality delete kills the
    NULL-keyed row in BOTH the native scan and the connector read."""
    from iceberg_compaction_spark.sources.datasource import register

    loc = os.path.join(tmp_warehouse, "dsnull")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(
        spark.createDataFrame([(1, "a"), (None, "nullrow"), (3, "c")], "k bigint, v string").coalesce(1)
    )
    t.add_equality_deletes(spark.createDataFrame([(None,)], "k bigint"), ["k"])
    register(spark)
    native = sorted((r["k"], r["v"]) for r in t.scan(spark).collect())
    assert native == [(1, "a"), (3, "c")]
    via_ds = sorted(
        (r["k"], r["v"]) for r in spark.read.format("icemaint").load(loc).collect()
    )
    assert via_ds == native


def test_delete_where_straddler_counts_live_rows_only(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.delete_where import delete_where

    loc = os.path.join(tmp_warehouse, "dwstrad")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k bigint, v string").coalesce(1)
    )
    r1 = delete_where(spark, t, "k < 3", mode="mor")
    assert r1["deleted_rows"] == 3
    # overlapping straddler delete: only rows 3 and 4 are still alive
    r2 = delete_where(spark, t, "k < 5", mode="mor")
    assert r2["deleted_rows"] == 2, r2
    assert sorted(r["k"] for r in t.scan(spark).collect()) == [5, 6, 7, 8, 9]


def test_stream_batch_mark_failure_is_nonfatal(spark, tmp_warehouse):
    from iceberg_compaction_spark.streaming.ingest import make_idempotent_batch_writer

    loc = os.path.join(tmp_warehouse, "streamnf")
    t = Table.create(loc, "id bigint, v string")
    write_batch = make_idempotent_batch_writer(t, os.path.join(tmp_warehouse, "ck"))

    def boom(*a, **kw):
        raise RuntimeError("lock contended")

    t.set_property = boom
    df = spark.createDataFrame([(1, "a")], "id bigint, v string")
    write_batch(df, 0)  # must not raise: data commit already landed
    assert t.scan(spark).count() == 1
