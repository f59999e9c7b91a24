"""Round-7 advice/verdict items: transform-projection safety across
partition-spec evolution, streaming pending-sort determinism, and
source hygiene gates for the single-pass rollup refresh."""

from __future__ import annotations

import os

import pytest

from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, transcripts_df
from iceberg_compaction_spark.sources.table import Table, bucket_partition_spec


def test_projection_exempts_pre_evolution_files(spark, tmp_warehouse):
    """ADVICE r6 (high): after ``set_partition_expr`` evolution, files
    written under the OLD spec carry partition values the CURRENT expr
    never produces (pmod(hash,16) vs pmod(hash,32)) — transform
    projection must exempt them (sequence_number ≤ spec floor) or
    point lookups silently lose rows until migration completes."""
    t = Table.create(
        os.path.join(tmp_warehouse, "evo"),
        TRANSCRIPT_DDL,
        partition=bucket_partition_spec("conv_id", 16),
    )
    t.append_dataframe(transcripts_df(spark, 4000, 40))
    # pick keys whose bucket value CHANGES under the evolved modulus —
    # exactly the rows the pre-fix pruner dropped
    moved = [
        r["conv_id"]
        for r in spark.sql(
            "SELECT conv_id FROM (SELECT DISTINCT conv_id FROM {df}) "
            "WHERE pmod(hash(conv_id), 32) >= 16 LIMIT 3",
            df=t.scan(spark),
        ).collect()
    ]
    assert moved, "fixture needs at least one bucket-moving key"
    t.set_partition_expr("CAST(pmod(hash(conv_id), 32) AS STRING)")
    t.append_dataframe(transcripts_df(spark, 1000, 10))
    for key in moved:
        expect = t.scan(spark).filter(f"conv_id = '{key}'").count()
        got = t.scan(spark, filter=f"conv_id = '{key}'").count()
        assert got == expect > 0, f"projection dropped pre-evolution rows for {key}"


def test_projection_prunes_again_after_migration(spark, tmp_warehouse):
    """The exemption is transitional: once ``migrate_partition_spec``
    rewrites the old-grain files (seq > floor), projection prunes the
    whole table again and results stay exact."""
    from iceberg_compaction_spark.operators.maintenance import migrate_partition_spec

    t = Table.create(
        os.path.join(tmp_warehouse, "evo2"),
        TRANSCRIPT_DDL,
        partition=bucket_partition_spec("conv_id", 8),
    )
    t.append_dataframe(transcripts_df(spark, 4000, 40))
    t.set_partition_expr("CAST(pmod(hash(conv_id), 32) AS STRING)")
    migrate_partition_spec(spark, t)
    n_files = len(t.files(content="data"))
    key = "conv_00000005"
    expect = t.scan(spark).filter(f"conv_id = '{key}'").count()
    got = t.scan(spark, filter=f"conv_id = '{key}'").count()
    assert got == expect > 0
    assert t.last_scan_pruned_files > n_files // 2, (
        "post-migration files all carry current-spec values: projection "
        "must prune most buckets again"
    )


def test_rollup_refresh_is_single_pass_source_gate():
    """VERDICT r6 'what's wrong' #1: no ``delta.count()`` second scan
    in the refresh — delta_rows must come from the persisted partial's
    count state (behavioral proof: test_rollup.py::
    test_refresh_reads_delta_exactly_once)."""
    src = open(
        os.path.join(
            os.path.dirname(__file__), "..",
            "iceberg_compaction_spark", "operators", "rollup.py",
        )
    ).read()
    assert "delta.count()" not in src
    assert ".persist()" in src and "__delta_cnt" in src


def test_indexed_probe_prunes_bucket_partitions(spark, tmp_warehouse):
    """VERDICT r6 next #2: the persisted MinHash index lives in a
    bucket-partitioned Table, and the incremental-dedup probe restricts
    its scan to the increment's signature buckets — files-pruned > 0
    on the probe path, with results identical to the unpruned probe."""
    from iceberg_compaction_spark.operators.dedup import (
        incremental_minhash_dedup,
        incremental_minhash_dedup_indexed,
        minhash_index,
    )

    corpus = spark.createDataFrame(
        [
            (i, f"corpus doc {i} with words alpha{i} beta{i * 7} "
                f"gamma{i % 13} delta{i} epsilon{i * 3} zeta{i} end")
            for i in range(200)
        ],
        "doc_id BIGINT, text STRING",
    )
    inc_rows = [
        (1001, "corpus doc 5 with words alpha5 beta35 gamma5 delta5 "
               "epsilon15 zeta5 end"),          # exact dup of corpus 5
        (1002, "a genuinely fresh document about spark partition pruning"),
        (1003, "another fresh one counting shuffles and broadcast joins"),
        (1004, "another fresh one counting shuffles and broadcast joins"),
    ]  # 1004 intra-dups 1003
    inc = spark.createDataFrame(inc_rows, "doc_id BIGINT, text STRING")

    loc = os.path.join(tmp_warehouse, "mh_index")
    idx_table = Table.create(
        loc,
        "doc_id BIGINT, band INT, signature STRING",
        partition=bucket_partition_spec("signature", 64),
    )
    idx_table.append_dataframe(minhash_index(corpus, bands=4))
    n_files = len(idx_table.files(content="data"))

    survivors, delta = incremental_minhash_dedup_indexed(
        spark, inc, idx_table, bands=4
    )
    got = sorted(r["doc_id"] for r in survivors.select("doc_id").collect())
    assert got == [1002, 1003]
    # the probe restricted the scan: 4 docs × 4 bands = ≤16 signature
    # buckets of 64 — most index files never opened
    assert idx_table.last_probe_partition_values is not None
    assert 0 < idx_table.last_scan_pruned_files < n_files
    assert idx_table.last_scan_pruned_files >= n_files - 16
    # identical to the unpruned probe
    surv_full, _ = incremental_minhash_dedup(inc, idx_table.scan(spark), bands=4)
    assert sorted(r["doc_id"] for r in surv_full.select("doc_id").collect()) == got
    # absorbing the increment keeps index files partition-pure, so the
    # NEXT probe prunes the grown index the same way
    idx_table.append_dataframe(delta)
    assert sorted(r["doc_id"] for r in delta.select("doc_id").distinct().collect()) == [
        1002,
        1003,
    ]


def test_export_shards_floor_validation(spark, tmp_warehouse):
    """VERDICT r6 next #6: one shard = one single-reducer sort, so a
    too-small n_shards must be rejected against the documented
    rows-per-shard bound, and write_shards can auto-derive the floor."""
    from iceberg_compaction_spark.operators.mixing import (
        export_shards,
        shard_floor,
        write_shards,
    )

    assert shard_floor(0) == 1
    assert shard_floor(1_000_000) == 1
    assert shard_floor(1_000_001) == 2
    df = spark.range(1000).selectExpr("id AS doc_id", "'x' AS text")
    with pytest.raises(ValueError, match="n_shards >= 10"):
        export_shards(df, 2, max_rows_per_shard=100)
    out = export_shards(df, 10, max_rows_per_shard=100)  # exactly the floor
    assert out.count() == 1000
    # unvalidated call unchanged (oracle path)
    assert export_shards(df, 2).count() == 1000

    path = os.path.join(tmp_warehouse, "shards")
    n = write_shards(df, path, max_rows_per_shard=100)  # auto-derived
    assert n == 10
    back = spark.read.parquet(path)
    assert back.select("shard").distinct().count() == 10
    assert back.count() == 1000


def test_streaming_pending_sort_key_is_batch_id_only():
    """ADVICE r6 (low): sorting (batch_id, snapshot_dict) tuples falls
    through to dict< dict on a tie and raises TypeError — the sort key
    must be the batch id alone so duplicate ids (shared checkpoint
    dirs, replayed commits) cannot wedge the stream."""
    from iceberg_compaction_spark.streaming import ingest

    # the regression shape: two pendings with equal batch ids
    pending = [(3, {"snapshot_id": 2}), (3, {"snapshot_id": 1}), (1, {"a": 1})]
    got = sorted(pending, key=ingest._pending_sort_key)
    assert [b for b, _s in got] == [1, 3, 3]
