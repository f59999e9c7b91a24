"""Per-file manifest bloom filters: hash parity with the JVM, no false
negatives, and end-to-end point-lookup file pruning where min/max
bounds cannot discriminate."""

from __future__ import annotations

import json
import os
import random
import string

import numpy as np
from pyspark.sql import functions as F

from iceberg_compaction_spark.functions import bloom
from iceberg_compaction_spark.functions.xxh import xxh64
from iceberg_compaction_spark.sources.table import Table


def test_xxh64_matches_spark(spark):
    """Driver-side probe and executor-side build must hash identically;
    covers every XXH64 length branch (<4, <8, <32, ≥32 bytes) and
    multi-byte UTF-8."""
    rng = random.Random(7)
    vals = ["", "a", "ab", "abc", "abcd", "abcdefg", "x" * 31, "x" * 32,
            "x" * 33, "conv_000042", "üñïçødé ⚡ 漢字"]
    vals += ["".join(rng.choices(string.printable, k=rng.randint(0, 100)))
             for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert xxh64(r["s"].encode("utf-8")) == r["h"] & ((1 << 64) - 1), repr(r["s"])


def test_bloom_no_false_negatives_and_sane_fp_rate():
    rng = random.Random(11)
    keys = [f"conv_{rng.randrange(10**9):09d}" for _ in range(5000)]
    hs = np.array([np.uint64(xxh64(k.encode())) for k in set(keys)], dtype=np.uint64)
    b64, m, k = bloom.build_bitmap(hs, fpp=0.01)
    bl = {"m": m, "k": k, "b64": b64}
    for key in keys:  # a bloom NEVER misses an inserted key
        assert bloom.maybe_contains(bl, key)
    absent = [f"other_{i}" for i in range(2000)]
    fp = sum(bloom.maybe_contains(bl, a) for a in absent) / len(absent)
    assert fp < 0.05, fp
    # malformed blooms never prune
    assert bloom.maybe_contains({"m": "x"}, "anything")
    assert bloom.maybe_contains({}, "anything")


def _mk_bloom_table(spark, loc, n_files=16):
    t = Table.create(
        loc, "conv_id string, turn_idx int, text string",
        bloom={"columns": ["conv_id"], "fpp": 0.01, "ndv": 1000},
    )
    df = spark.range(40_000).selectExpr(
        "concat('conv_', lpad(cast(id % 400 as string), 6, '0')) as conv_id",
        "cast(id as int) as turn_idx",
        "concat('text ', id) as text",
    )
    # hash-distribute BY KEY: each conv lands in one file, but hash
    # order ≠ lexicographic order, so every file's [min, max] conv_id
    # bounds span nearly the whole key space — min/max alone can never
    # prune a point lookup; only the bloom can
    t.append_dataframe(df.repartition(n_files, "conv_id"))
    return t, df


def test_point_lookup_prunes_files_and_matches(spark, tmp_warehouse):
    t, df = _mk_bloom_table(spark, os.path.join(tmp_warehouse, "bl"))
    n_files = len(t.files(content="data"))
    # manifest rows carry blooms
    st = json.loads(t.files(content="data")[0]["stats_json"])
    assert "bloom" in st["conv_id"] and st["conv_id"]["bloom"]["m"] >= 1024
    # bounds overlap everywhere: min/max pruning would keep everything
    key = "conv_000123"
    expected = sorted(
        (r["turn_idx"], r["text"]) for r in df.filter(F.col("conv_id") == key).collect()
    )
    got = t.scan(spark, filter=f"conv_id = '{key}'")
    rows = sorted((r["turn_idx"], r["text"]) for r in got.collect())
    assert rows == expected and len(rows) == 100
    assert t.last_scan_pruned_files > 0, "bloom pruned nothing"
    # a key that was never written prunes EVERY file
    t.scan(spark, filter="conv_id = 'conv_999999'").count()
    assert t.last_scan_pruned_files == n_files
    # IN (...) prunes to the union of the members' files
    got_in = t.scan(spark, filter="conv_id IN ('conv_000123', 'conv_000124')")
    assert got_in.count() == 200
    assert t.last_scan_pruned_files > 0


def test_long_key_bloom(spark, tmp_warehouse):
    """Integral key columns bloom too (hashed as long both sides)."""
    import struct

    from pyspark.sql import functions as SF

    vals = [0, 1, -1, 42, 2**40, -(2**40), 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", SF.xxhash64("v").alias("h")
    )
    for r in df.collect():  # probe-side packing == JVM layout
        assert xxh64(struct.pack("<q", r["v"])) == r["h"] & ((1 << 64) - 1)

    t = Table.create(
        os.path.join(tmp_warehouse, "bll"), "user_id bigint, turn_idx int, text string",
        bloom={"columns": ["user_id"], "fpp": 0.01, "ndv": 1000},
    )
    data = spark.range(20_000).selectExpr(
        "(id % 500) * 9973 as user_id", "cast(id as int) as turn_idx",
        "concat('t', id) as text",
    )
    t.append_dataframe(data.repartition(12, "user_id"))
    n_files = len(t.files(content="data"))
    st = json.loads(t.files(content="data")[0]["stats_json"])["user_id"]
    assert st["bloom"]["t"] == "long"
    assert t.scan(spark, filter=f"user_id = {123 * 9973}").count() == 40
    assert t.last_scan_pruned_files > 0
    t.scan(spark, filter="user_id = 17").count()  # 17 is not a multiple of 9973
    assert t.last_scan_pruned_files == n_files
    # int-typed key columns are cast to long at build: same probe path
    t2 = Table.create(
        os.path.join(tmp_warehouse, "bli"), "k int, text string",
        bloom={"columns": ["k"], "fpp": 0.01, "ndv": 100},
    )
    t2.append_dataframe(
        spark.range(1000).selectExpr("cast(id % 50 as int) as k", "'x' as text")
        .repartition(8, "k")
    )
    assert t2.scan(spark, filter="k = 7").count() == 20
    assert t2.last_scan_pruned_files > 0


def test_blooms_survive_compaction_rewrite(spark, tmp_warehouse):
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    t, df = _mk_bloom_table(spark, os.path.join(tmp_warehouse, "blc"), n_files=8)
    cfg = CompactionConfig(
        selection=SelectionStrategy.FULL,
        group_target_size_bytes=256 << 10,  # several output bins/files
        target_file_size_bytes=256 << 10,
        sort_order=(("conv_id", False), ("turn_idx", False)),
    )
    CompactionRunner(spark, t, cfg).execute()
    rows = t.files(content="data")
    assert all("bloom" in json.loads(r["stats_json"]).get("conv_id", {}) for r in rows)
    # post-compaction the data is conv_id-sorted, so bounds prune too —
    # but a missing key must still prune everything via blooms
    t.scan(spark, filter="conv_id = 'conv_999999'").count()
    assert t.last_scan_pruned_files == len(rows)
    assert t.scan(spark, filter="conv_id = 'conv_000007'").count() == 100


def test_bloom_never_drops_live_rows_fuzz(spark, tmp_warehouse):
    """Every written key must be fully readable through a bloom-pruned
    point scan (no false negatives end-to-end)."""
    t, df = _mk_bloom_table(spark, os.path.join(tmp_warehouse, "blf"), n_files=12)
    rng = random.Random(3)
    for _ in range(20):
        key = f"conv_{rng.randrange(400):06d}"
        assert t.scan(spark, filter=f"conv_id = '{key}'").count() == 100, key
