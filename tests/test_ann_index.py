"""Persisted IVF ANN index: incremental append ≡ one-shot assignment
at the same centroids, cell-pruned probes never change full-probe
results, and the reindex trigger reads metadata only."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.operators.ann_index import (
    create_ivf_index,
    ivf_index_append,
    ivf_index_build,
    ivf_index_probe,
    ivf_index_stats,
    recommend_reindex,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _topk_rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"], round(r["cosine"], 9))
        for r in df.collect()
    )


def test_incremental_append_equals_one_shot_build(spark, tmp_warehouse):
    emb = _emb(spark)
    old = emb.filter(F.col("vec_id") % 10 != 7)
    inc = emb.filter(F.col("vec_id") % 10 == 7)
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    a = create_ivf_index(os.path.join(tmp_warehouse, "ann_a"))
    ivf_index_build(spark, a, old, n_centroids=8)
    n_files_before = len(a.files(content="data"))
    ivf_index_append(spark, a, inc)
    # append only added files — the existing index was not rewritten
    assert len(a.files(content="data")) > n_files_before
    assert a.snapshots()[-1]["operation"] == "append"

    # one-shot: assign the FULL corpus at the same frozen centroids
    b = create_ivf_index(os.path.join(tmp_warehouse, "ann_b"))
    ivf_index_build(spark, b, old, n_centroids=8)
    b.commit("delete", removed_paths=[f["path"] for f in b.files()])
    ivf_index_append(spark, b, emb)

    full_a = ivf_index_probe(spark, a, queries, k=4, nprobe=8)
    full_b = ivf_index_probe(spark, b, queries, k=4, nprobe=8)
    assert _topk_rows(full_a) == _topk_rows(full_b)
    # index holds exactly the corpus
    assert a.scan(spark).count() == emb.count()


def test_partial_probe_prunes_files_and_keeps_recall(spark, tmp_warehouse):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "ann_p"))
    ivf_index_build(spark, idx, emb, n_centroids=8)

    full = ivf_index_probe(spark, idx, queries, k=3, nprobe=8)
    assert idx.last_scan_pruned_files == 0  # full probe reads every cell
    full_rows = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}

    # a narrow query set probes a strict cell subset — the scan must
    # skip the other cells' files outright
    narrow = emb.filter(F.col("vec_id") % 250 == 0)
    part = ivf_index_probe(spark, idx, narrow, k=3, nprobe=3)
    n_total = len(idx.files(content="data"))
    assert 0 < idx.last_scan_pruned_files < n_total
    assert len(idx.last_probe_partition_values) <= 8
    narrow_ids = {r["vec_id"] for r in narrow.select("vec_id").collect()}
    full_narrow = {p for p in full_rows if p[0] in narrow_ids}
    part_rows = {(r["query_id"], r["neighbor_id"]) for r in part.collect()}
    recall = len(part_rows & full_narrow) / max(len(full_narrow), 1)
    assert recall >= 0.6, f"nprobe=3 recall {recall}"


def test_full_probe_equals_brute_force(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.similarity import brute_force_topk

    emb = _emb(spark).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") % 25 == 5)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "ann_x"))
    ivf_index_build(spark, idx, emb, n_centroids=8)
    via_index = ivf_index_probe(spark, idx, queries, k=3, nprobe=8)
    exact = brute_force_topk(emb, queries, k=3)
    assert _topk_rows(via_index) == _topk_rows(exact)


def test_stats_metadata_only_and_reindex_trigger(spark, tmp_warehouse):
    emb = _emb(spark)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "ann_s"))
    ivf_index_build(spark, idx, emb, n_centroids=8)
    st = ivf_index_stats(idx)
    assert st["rows"] == emb.count()
    assert sum(st["cells"].values()) == st["rows"]
    assert st["imbalance"] >= 1.0
    assert recommend_reindex(idx, max_imbalance=0.5)  # anything trips a 0.5 bar

    # skew the index with a pile of near-identical vectors: the
    # metadata trigger must fire at the default bar
    hot = emb.limit(1).select("vec_id", "embedding")
    blob = hot.crossJoin(spark.range(12 * st["rows"]).select(F.col("id").alias("_i"))).select(
        (F.col("vec_id") * 0 + 10_000_000 + F.col("_i")).alias("vec_id"),
        "embedding",
    )
    ivf_index_append(spark, idx, blob)
    assert recommend_reindex(idx)


def test_index_compaction_preserves_purity_pruning_and_results(spark, tmp_warehouse):
    """The index is an ordinary engine Table, so small appended files
    accreting per cell compact through the ordinary rewrite path — and
    because bins never span table partitions, the rewrite keeps files
    cell-pure: probes prune and return identical rows afterwards."""
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "ann_c"))
    ivf_index_build(spark, idx, emb.filter(F.col("vec_id") % 3 == 0), n_centroids=8)
    for rem in (1, 2):  # drip appends → small files in every cell
        ivf_index_append(spark, idx, emb.filter(F.col("vec_id") % 3 == rem))
    before_rows = _topk_rows(ivf_index_probe(spark, idx, queries, k=3, nprobe=8))
    n_before = len(idx.files(content="data"))

    CompactionRunner(
        spark,
        idx,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.BIN_PACK,
            sort_order=(("vec_id", False),),
        ),
    ).execute()

    files = idx.files(content="data")
    assert len(files) < n_before
    # cell purity survived the rewrite: every file carries its cell's
    # partition value, so stats stay metadata-exact …
    assert all(f.get("partition") is not None for f in files)
    st = ivf_index_stats(idx)
    assert st["rows"] == emb.count()
    assert sum(st["cells"].values()) == st["rows"]
    # … and a narrow probe still skips the unprobed cells' files
    narrow = emb.filter(F.col("vec_id") % 250 == 0)
    ivf_index_probe(spark, idx, narrow, k=3, nprobe=2).count()
    assert 0 < idx.last_scan_pruned_files < len(files)
    # results byte-identical through the rewrite
    assert _topk_rows(ivf_index_probe(spark, idx, queries, k=3, nprobe=8)) == before_rows


def test_drift_retrain_cycle(spark, tmp_warehouse):
    """recommend_reindex → ivf_index_build is the full maintenance
    loop: the rebuild atomically replaces the drifted index and the
    full-probe results afterwards cover exactly the current corpus."""
    from iceberg_compaction_spark.operators.similarity import brute_force_topk

    emb = _emb(spark).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    # 8 cells: imbalance = max/mean tops out at |cells|, so the
    # default 4.0 bar is reachable (at 4 cells it is the asymptote)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "ann_r"))
    ivf_index_build(spark, idx, emb.filter(F.col("vec_id") % 2 == 0), n_centroids=8)
    # skew with a blob of near-identical vectors until the trigger fires
    hot = emb.orderBy("vec_id").limit(1)
    blob = hot.crossJoin(spark.range(5000).select(F.col("id").alias("_i"))).select(
        (20_000_000 + F.col("_i")).alias("vec_id"), "embedding"
    )
    ivf_index_append(spark, idx, blob)
    assert recommend_reindex(idx)

    corpus_now = (
        emb.filter(F.col("vec_id") % 2 == 0)
        .select("vec_id", "embedding")
        .unionByName(blob)
    )
    ivf_index_build(spark, idx, corpus_now, n_centroids=8)  # the retrain
    assert not recommend_reindex(idx, max_imbalance=1e9)  # sane stats again
    assert ivf_index_stats(idx)["rows"] == corpus_now.count()
    queries = emb.filter(F.col("vec_id") % 50 == 25)
    got = ivf_index_probe(spark, idx, queries, k=2, nprobe=8)
    exact = brute_force_topk(corpus_now, queries, k=2)
    assert _topk_rows(got) == _topk_rows(exact)


VEC_DDL = "vec_id BIGINT, embedding ARRAY<DOUBLE>"


def test_refresh_follows_source_table(spark, tmp_warehouse):
    """ivf_index_refresh behind the committed anchor: appends absorb
    incrementally, source compaction advances the anchor without
    touching the index, a source DELETE reassigns — and membership
    equals the source at every step."""
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.operators.ann_index import ivf_index_refresh
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.similarity import brute_force_topk
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.table import Table

    emb = _emb(spark).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    src = Table.create(os.path.join(tmp_warehouse, "vsrc"), VEC_DDL)
    src.append_dataframe(emb.filter(F.col("vec_id") % 2 == 0))
    idx = create_ivf_index(os.path.join(tmp_warehouse, "vidx"))
    cur = src.current_snapshot_id
    ivf_index_build(
        spark, idx, src.scan(spark, snapshot_id=cur),
        n_centroids=8, anchor_snapshot=cur,
    )
    assert ivf_index_refresh(spark, idx, src)["mode"] == "noop"

    src.append_dataframe(emb.filter(F.col("vec_id") % 2 == 1))
    r = ivf_index_refresh(spark, idx, src)
    assert r["mode"] == "append" and r["rows"] > 0
    assert idx.snapshots()[-1]["operation"] == "append"
    assert ivf_index_stats(idx)["rows"] == src.scan(spark).count()

    # source compaction is row-set-preserving: the refresh must advance
    # the anchor WITHOUT rewriting or re-adding anything to the index
    CompactionRunner(
        spark, src,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.SINGLE,
            sort_order=(("vec_id", False),),
        ),
    ).execute()
    n_snaps = len(idx.snapshots())
    r = ivf_index_refresh(spark, idx, src)
    assert r["mode"] == "append" and r["rows"] == 0
    assert len(idx.snapshots()) == n_snaps  # anchor-only, no commit
    assert ivf_index_refresh(spark, idx, src)["mode"] == "noop"

    # a row-set-changing source commit folds the CHANGELOG: net keys
    # tombstone the index (one eq-delete file), net inserts append —
    # O(changed), the index is never rescanned or reassigned
    delete_where(spark, src, "vec_id % 10 = 3")
    r = ivf_index_refresh(spark, idx, src)
    assert r["mode"] == "changelog"
    assert r["deletes"] > 0 and r["rows"] == 0
    st = ivf_index_stats(idx)
    assert st["eq_delete_files"] == 1 and st["tombstones"] == r["deletes"]
    assert idx.scan(spark).count() == src.scan(spark).count()
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = ivf_index_probe(spark, idx, queries, k=3, nprobe=8)
    exact = brute_force_topk(src.scan(spark), queries, k=3)
    assert _topk_rows(got) == _topk_rows(exact)  # MoR applies tombstones

    # an UPSERT nets to tombstone + re-assigned new image; a second
    # refresh with a 1-file debt limit consolidates without changing
    # the scan
    from iceberg_compaction_spark.operators.merge_into import merge_into

    moved = src.scan(spark).limit(5).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    merge_into(src, moved, ["vec_id"])
    r = ivf_index_refresh(spark, idx, src, delete_file_debt_limit=1)
    assert r["mode"] == "changelog" and r["rows"] == 5 and r["consolidated"]
    assert idx.scan(spark).count() == src.scan(spark).count()
    got = ivf_index_probe(spark, idx, queries, k=3, nprobe=8)
    exact = brute_force_topk(src.scan(spark), queries, k=3)
    assert _topk_rows(got) == _topk_rows(exact)


def test_refresh_without_anchor_on_nonempty_index_reassigns(spark, tmp_warehouse):
    """An index built WITHOUT anchor_snapshot holds rows of unknown
    provenance — the first follow must reassign, never append the full
    history on top (double-indexing)."""
    from iceberg_compaction_spark.operators.ann_index import ivf_index_refresh
    from iceberg_compaction_spark.sources.table import Table

    emb = _emb(spark).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    src = Table.create(os.path.join(tmp_warehouse, "nsrc"), VEC_DDL)
    src.append_dataframe(emb)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "nidx"))
    ivf_index_build(spark, idx, src.scan(spark), n_centroids=8)  # no anchor
    r = ivf_index_refresh(spark, idx, src)
    assert r["mode"] == "reassign"
    assert ivf_index_stats(idx)["rows"] == emb.count()  # not 2×


def test_stream_ann_tails_source(spark, tmp_warehouse):
    """stream_ann drains source changes through ivf_index_refresh: the
    append-only stream triggers incremental absorbs, and a DELETE the
    stream never surfaces as rows still reaches the index (reassign)
    on the next drain with the same checkpoint."""
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.sources.table import Table
    from iceberg_compaction_spark.streaming.ingest import stream_ann

    emb = _emb(spark).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    src = Table.create(os.path.join(tmp_warehouse, "ssrc_ann"), VEC_DDL)
    src.append_dataframe(emb.filter(F.col("vec_id") % 2 == 0).coalesce(1))
    idx = create_ivf_index(os.path.join(tmp_warehouse, "sidx_ann"))
    cur = src.current_snapshot_id
    ivf_index_build(
        spark, idx, src.scan(spark, snapshot_id=cur),
        n_centroids=8, anchor_snapshot=cur,
    )
    ckpt = os.path.join(tmp_warehouse, "sann_ckpt")

    src.append_dataframe(emb.filter(F.col("vec_id") % 2 == 1).coalesce(1))
    q = stream_ann(spark, src, idx, ckpt)
    q.awaitTermination(120)
    assert idx.snapshots()[-1]["operation"] == "append"
    assert ivf_index_stats(idx)["rows"] == emb.count()

    delete_where(spark, src, "vec_id % 4 = 1")
    q2 = stream_ann(spark, src, idx, ckpt)  # same checkpoint
    q2.awaitTermination(120)
    # the delete arrived as changelog tombstones: stats stay pre-MoR,
    # the MoR scan is the exact membership
    assert ivf_index_stats(idx)["tombstones"] > 0
    assert idx.scan(spark).count() == src.scan(spark).count()


def test_guards(spark, tmp_warehouse):
    emb = _emb(spark)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "ann_g"))
    with pytest.raises(ValidationError, match="no trained centroids"):
        ivf_index_probe(spark, idx, emb, k=3, nprobe=2)
    with pytest.raises(ValidationError, match="centroid matrix"):
        ivf_index_build(spark, idx, emb, n_centroids=100_000)
    ivf_index_build(spark, idx, emb, n_centroids=4)
    with pytest.raises(ValidationError, match="nprobe"):
        ivf_index_probe(spark, idx, emb, k=3, nprobe=9)


def test_probe_plan_is_equijoin_only(spark, tmp_warehouse):
    """The candidate join (probed queries × probed cells) must compile
    to an equi-join on the cell id — never a cartesian / nested-loop
    pairing of queries with vectors."""
    emb = _emb(spark)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "ann_plan"))
    ivf_index_build(spark, idx, emb, n_centroids=8)
    out = ivf_index_probe(
        spark, idx, emb.filter(F.col("vec_id") % 50 == 0), k=3, nprobe=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_compaction_materializes_tombstones_probe_unchanged(spark, tmp_warehouse):
    """Composition: after changelog refreshes leave eq-delete
    tombstones on the index, ordinary compaction folds them into the
    data files (MoR debt goes to zero) and full-probe results are
    byte-identical across the rewrite."""
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.operators.ann_index import ivf_index_refresh
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.table import Table

    emb = _emb(spark).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    src = Table.create(os.path.join(tmp_warehouse, "csrc"), VEC_DDL)
    src.append_dataframe(emb)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "cidx"))
    cur = src.current_snapshot_id
    ivf_index_build(
        spark, idx, src.scan(spark, snapshot_id=cur),
        n_centroids=8, anchor_snapshot=cur,
    )
    delete_where(spark, src, "vec_id % 5 = 2")
    r = ivf_index_refresh(spark, idx, src)
    assert r["mode"] == "changelog" and ivf_index_stats(idx)["tombstones"] > 0

    queries = emb.filter(F.col("vec_id") % 50 == 0)
    before = _topk_rows(ivf_index_probe(spark, idx, queries, k=3, nprobe=8))

    CompactionRunner(
        spark, idx,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.BIN_PACK,
            sort_order=(("vec_id", False),),
        ),
    ).execute()
    st = ivf_index_stats(idx)
    assert st["tombstones"] == 0  # deletes materialized into the data
    assert st["rows"] == src.scan(spark).count()  # stats exact again
    assert _topk_rows(ivf_index_probe(spark, idx, queries, k=3, nprobe=8)) == before
    # and the next refresh is undisturbed by the index's own rewrite
    assert ivf_index_refresh(spark, idx, src)["mode"] == "noop"


def test_filtered_probe_ranks_within_predicate(spark, tmp_warehouse):
    """Filtered vector search: `where` is applied inside the scan, so
    the top-k ranks among MATCHING vectors (never a post-filtered
    k-truncation), manifest bounds skip non-matching files on top of
    cell pruning, and the full-probe filtered result equals brute
    force over the pre-filtered corpus."""
    from iceberg_compaction_spark.operators.similarity import brute_force_topk

    emb = _emb(spark).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") % 25 == 5)
    idx = create_ivf_index(os.path.join(tmp_warehouse, "ann_f"))
    ivf_index_build(spark, idx, emb, n_centroids=8)

    got = ivf_index_probe(
        spark, idx, queries, k=3, nprobe=8, where="vec_id % 2 = 0"
    )
    exact = brute_force_topk(emb.filter("vec_id % 2 = 0"), queries, k=3)
    assert _topk_rows(got) == _topk_rows(exact)
    assert all(r["neighbor_id"] % 2 == 0 for r in got.collect())

    # composition: a bounds-prunable predicate stacks file skips on top
    # of the cell restriction (the scan accumulates both counts)
    narrow = emb.filter(F.col("vec_id") % 250 == 0)
    part = ivf_index_probe(spark, idx, narrow, k=3, nprobe=3)
    cells_only = idx.last_scan_pruned_files
    ivf_index_probe(spark, idx, narrow, k=3, nprobe=3, where="vec_id < 0")
    assert idx.last_scan_pruned_files > cells_only
    assert part.count() > 0
