"""Z-order / Hilbert key correctness + clustering integration."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
from iceberg_compaction_spark.functions.clustering import (
    add_cluster_key,
    hilbert_index,
    interleave_bits,
)
from iceberg_compaction_spark.plans.compaction import CompactionRunner
from iceberg_compaction_spark.sources.generator import create_transcripts_table


def test_interleave_known_vectors():
    # (x=0b11, y=0b00) bits=2, dim0 is MSB → 1010
    coords = np.array([[0b11, 0b00], [0b00, 0b11], [0b11, 0b11], [0, 0]], dtype=np.uint32)
    out = interleave_bits(coords, 2)
    assert out.tolist() == [0b1010, 0b0101, 0b1111, 0]


def test_interleave_monotone_in_both_dims():
    a = interleave_bits(np.array([[3, 4]], dtype=np.uint32), 8)[0]
    b = interleave_bits(np.array([[5, 6]], dtype=np.uint32), 8)[0]
    assert b > a


def test_hilbert_bijective_and_adjacent():
    """Defining property: visiting cells in index order moves exactly
    one step in exactly one dimension (continuity), covering every cell
    once (bijectivity). Holds for any orientation, so no hard-coded
    curve tables are needed."""
    bits, d = 3, 2
    side = 1 << bits
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    coords = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.uint32)
    idx = hilbert_index(coords, bits)
    assert sorted(idx.tolist()) == list(range(side * side))
    order = np.argsort(idx)
    path = coords[order].astype(int)
    steps = np.abs(np.diff(path, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_hilbert_3d_bijective():
    bits, side = 2, 4
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), axis=-1).reshape(-1, 3)
    idx = hilbert_index(g.astype(np.uint32), bits)
    assert sorted(idx.tolist()) == list(range(side**3))


def test_add_cluster_key_spark(spark):
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    for curve in ("zorder", "hilbert"):
        out = add_cluster_key(df, ["x", "y"], curve=curve)
        assert out.schema["_cluster"].dataType.simpleString() == "bigint"
        n_distinct = out.select("_cluster").distinct().count()
        assert n_distinct > 1000  # keys actually spread
        # vectorized Arrow execution, never per-row Python
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_compaction_with_zorder_clustering(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "z1"), n_turns=10_000, n_convs=50, n_files=16
    )
    before = t.scan(spark).orderBy("conv_id", "turn_idx").collect()
    cfg = CompactionConfig(
        selection=SelectionStrategy.FULL,
        group_target_size_bytes=2 << 20,
        target_file_size_bytes=1 << 20,
        min_size_per_partition_bytes=64 << 10,
        clustering="hilbert",
        cluster_columns=("conv_id", "ts"),
    )
    res = CompactionRunner(spark, t, cfg).execute()
    assert res.snapshot_after == t.current_snapshot_id
    assert t.scan(spark).orderBy("conv_id", "turn_idx").collect() == before
