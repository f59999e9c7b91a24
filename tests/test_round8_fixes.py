"""Round-8 ADVICE items: recompute/resync snapshot pinning, the
hist_quantile read-side fixes (column naming, empty-histogram groups),
the gapfill integer-step-index join, and resync part-file hygiene."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.rollup import (
    gapfill_locf,
    hist_quantile,
    refresh_rollup,
)
from iceberg_compaction_spark.sources.table import Table


def test_hist_quantile_column_name_rounds(spark):
    """ADVICE r7: f"q{int(q*100)}" float-truncates — q=0.29 must name
    the column q29, not q28."""
    df = spark.createDataFrame(
        [("a", [1, 2, 3])], "g string, h array<bigint>"
    )
    out = hist_quantile(df, ["g"], "h", 0.29, 0.0, 1.0)
    assert "q29" in out.columns, out.columns


def test_hist_quantile_empty_histogram_group_surfaces_null(spark):
    """ADVICE r7: a group whose bins are all zero (every source value
    NULL) must surface as a NULL estimate, not vanish from the output."""
    df = spark.createDataFrame(
        [("a", [0, 4, 0, 0]), ("b", [0, 0, 0, 0])],
        "g string, h array<bigint>",
    )
    rows = {
        r["g"]: r["q50"]
        for r in hist_quantile(df, ["g"], "h", 0.5, 0.0, 1.0).collect()
    }
    assert set(rows) == {"a", "b"}
    assert rows["a"] is not None
    assert rows["b"] is None


def test_gapfill_nonintegral_step_ulp_alignment(spark):
    """ADVICE r7: with a non-integral step, the caller's
    floor(sec/step)*step and the grid's lo + i*step can differ by one
    ulp; the old double-equality join then flagged every observed
    bucket as a gap. The step-index join must match them."""
    # 7 * 0.1 = 0.7000000000000001 (the grid's arithmetic); the literal
    # 0.7 (a caller-computed bucket) differs in the last ulp
    assert 7 * 0.1 != 0.7
    src = spark.createDataFrame([(1, 0.7, 42.0)], "g int, bucket double, v double")
    out = gapfill_locf(src, ["g"], "bucket", ["v"], start=0.0, end=1.0, step=0.1)
    rows = {round(r["bucket"], 6): r for r in out.collect()}
    # 1.0 // 0.1 == 9.0 in doubles, so the grid holds buckets 0..0.9
    assert len(rows) == 10
    assert rows[0.7]["gap_filled"] is False and rows[0.7]["v"] == 42.0
    # LOCF still carries past the observation
    assert rows[0.8]["gap_filled"] is True and rows[0.8]["v_filled"] == 42.0


def test_gapfill_unaligned_source_rows_stay_excluded(spark):
    """A source bucket half a step off the grid never matched under
    double equality; the tolerance window must not start matching it."""
    src = spark.createDataFrame(
        [(1, 5.0, 1.0), (1, 2.5, 99.0)], "g int, bucket double, v double"
    )
    out = gapfill_locf(src, ["g"], "bucket", ["v"], start=0.0, end=10.0, step=5.0)
    rows = {r["bucket"]: r for r in out.collect()}
    assert set(rows) == {0.0, 5.0, 10.0}
    assert rows[5.0]["v"] == 1.0 and rows[5.0]["gap_filled"] is False
    assert all(r["v"] != 99.0 for r in rows.values())


def test_rollup_recompute_scan_pinned_to_anchor_snapshot(spark, tmp_warehouse, monkeypatch):
    """ADVICE r7 (medium): the recompute fallback must scan the source
    AT the captured anchor snapshot ``cur``, not at current — a commit
    racing in between anchor capture and scan would otherwise be folded
    in now AND again on the next refresh (double-count)."""
    from iceberg_compaction_spark.operators.delete_where import delete_where

    src = Table.create(os.path.join(tmp_warehouse, "rsrc"), "g STRING, v DOUBLE")
    roll = Table.create(os.path.join(tmp_warehouse, "rroll"), "g STRING, s DOUBLE")
    src.append_dataframe(
        spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    )
    aggs = {"s": ("sum", "v")}
    refresh_rollup(spark, src, roll, ["g"], aggs)
    # a row-set-CHANGING commit forces the recompute path
    delete_where(spark, src, "g = 'b'")
    seen: dict = {}
    orig = Table.scan

    def spy(self, spark_, *args, **kwargs):
        if self is src:
            seen["snapshot_id"] = kwargs.get("snapshot_id")
        return orig(self, spark_, *args, **kwargs)

    monkeypatch.setattr(Table, "scan", spy)
    cur = src.current_snapshot_id
    r = refresh_rollup(spark, src, roll, ["g"], aggs)
    assert r["mode"] == "recompute"
    assert seen.get("snapshot_id") == cur, (
        f"recompute scanned snapshot {seen.get('snapshot_id')}, "
        f"anchor is {cur}"
    )


def test_replicate_resync_pinned_and_drops_empty_part_files(spark, tmp_warehouse, monkeypatch):
    """ADVICE r7 (low ×2): the resync path must (a) pin its source scan
    to the anchor snapshot and (b) filter zero-record part-files before
    committing, like the incremental path."""
    from iceberg_compaction_spark.operators.replicate import apply_changelog

    ddl = "k BIGINT, v DOUBLE"
    src = Table.create(os.path.join(tmp_warehouse, "rep_src"), ddl)
    tgt = Table.create(os.path.join(tmp_warehouse, "rep_tgt"), ddl)
    # a sparse frame with empty shuffle partitions → empty part-files
    src.append_dataframe(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], ddl).repartition(8)
    )
    # force the resync branch: an anchor the changelog cannot walk from
    tgt.set_property("replicate.last-src-snapshot", 999_999_999)
    seen: dict = {}
    orig = Table.scan

    def spy(self, spark_, *args, **kwargs):
        if self is src:
            seen["snapshot_id"] = kwargs.get("snapshot_id")
        return orig(self, spark_, *args, **kwargs)

    monkeypatch.setattr(Table, "scan", spy)
    cur = src.current_snapshot_id
    r = apply_changelog(spark, src, tgt, ["k"])
    monkeypatch.undo()
    assert r["mode"] == "resync" and r["upserts"] == 2
    assert seen.get("snapshot_id") == cur
    assert all(
        f["record_count"] > 0 for f in tgt.files(content="data")
    ), "resync committed zero-record part-files"
    assert sorted(
        (row["k"], row["v"]) for row in tgt.scan(spark).collect()
    ) == [(1, 1.0), (2, 2.0)]


# ---------------------------------------------------------------------------
# salted gapfill (round 8, VERDICT #4): equivalence + hot-group plan gate

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_compaction_spark.operators.rollup import gapfill_locf_salted

_gf_rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # group
        st.integers(0, 20),  # bucket index
        st.one_of(st.none(), st.integers(0, 99)),  # value (NULLs too)
    ),
    min_size=1,
    max_size=14,
)


@settings(max_examples=12, deadline=None)
@given(_gf_rows, st.sampled_from([1, 3, 7, 100]))
def test_gapfill_salted_equivalent_to_plain(spark, rows, chunk_buckets):
    """The chunked form (per-(group, time-chunk) windows + cross-chunk
    carry) must be row-identical to the plain gapfill — including
    chunk sizes that force the carry (1: every bucket its own chunk)
    and one that degenerates to a single chunk (100). NULL observed
    values must stay non-observations for the fill in both forms."""
    # unique (group, bucket) — the documented determinism rule
    rows = list({(g, b): (g, b, v) for g, b, v in rows}.values())
    src = spark.createDataFrame(
        [(g, float(b), v) for g, b, v in rows], "g int, bucket double, v int"
    )
    kw = dict(start=0.0, end=20.0, step=1.0)
    cols = ("g", "bucket", "v", "v_filled", "gap_filled")
    plain = sorted(
        tuple(r[c] for c in cols)
        for r in gapfill_locf(src, ["g"], "bucket", ["v"], **kw).collect()
    )
    salted = sorted(
        tuple(r[c] for c in cols)
        for r in gapfill_locf_salted(
            src, ["g"], "bucket", ["v"], chunk_buckets=chunk_buckets, **kw
        ).collect()
    )
    assert plain == salted, (rows, chunk_buckets)


def test_gapfill_salted_splits_hot_group_partitions(spark):
    """The LOCF window must partition by (group, chunk) — a hot group's
    grid lands in many window partitions, not one — and the carry must
    repair chunk-crossing fills."""
    src = spark.createDataFrame(
        [(1, 0.0, 7), (1, 500.0, 9)], "g int, bucket double, v int"
    )
    out = gapfill_locf_salted(
        src, ["g"], "bucket", ["v"], start=0.0, end=1000.0, step=1.0,
        chunk_buckets=64,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_chunk" in plan, "LOCF window does not partition by chunk"
    rows = {r["bucket"]: r for r in out.collect()}
    assert len(rows) == 1001
    # bucket 499 is many chunks past the observation at 0: carry path
    assert rows[499.0]["v_filled"] == 7 and rows[499.0]["gap_filled"] is True
    assert rows[500.0]["v_filled"] == 9 and rows[500.0]["gap_filled"] is False
    assert rows[1000.0]["v_filled"] == 9


def test_brute_force_vectorized_query_side_guard(spark):
    """VERDICT r7 'what's wrong' #2: the vectorized exact top-k
    COLLECTS the query side (by contract — it rides in task closures);
    an oversized query set must refuse, not explode the driver."""
    import pytest

    from iceberg_compaction_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )

    df = spark.range(10).selectExpr(
        "id AS vec_id", "array(CAST(id AS DOUBLE), 1.0D) AS embedding"
    )
    with pytest.raises(ValueError, match="query rows"):
        brute_force_topk_vectorized(df, df, k=1, max_query_rows=5)
    out = brute_force_topk_vectorized(
        df, df.filter("vec_id < 3"), k=1, max_query_rows=5
    )
    assert out.count() == 3


def test_minhash_index_compaction_keeps_bucket_pruning(spark, tmp_warehouse):
    """Composition: the persisted MinHash index is an ordinary Table,
    so drip-appended signature files compact through the ordinary
    rewrite path — and because bins never span partitions, the rewrite
    keeps files bucket-pure: the NEXT incremental-dedup probe still
    prunes by the increment's signature buckets with identical
    survivors."""
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.operators.dedup import (
        incremental_minhash_dedup,
        incremental_minhash_dedup_indexed,
        minhash_index,
    )
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.table import bucket_partition_spec

    def _doc(i):
        return (
            i,
            f"corpus doc {i} with words alpha{i} beta{i * 7} "
            f"gamma{i % 13} delta{i} epsilon{i * 3} zeta{i} end",
        )

    idx = Table.create(
        os.path.join(tmp_warehouse, "mh_cidx"),
        "doc_id BIGINT, band INT, signature STRING",
        partition=bucket_partition_spec("signature", 64),
    )
    for batch in (range(0, 80), range(80, 160)):  # drip → small files
        idx.append_dataframe(
            minhash_index(
                spark.createDataFrame(
                    [_doc(i) for i in batch], "doc_id BIGINT, text STRING"
                ),
                bands=4,
            )
        )
    n_before = len(idx.files(content="data"))

    CompactionRunner(
        spark,
        idx,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.BIN_PACK,
            sort_order=(("doc_id", False),),
        ),
    ).execute()
    files = idx.files(content="data")
    assert len(files) < n_before
    assert all(f.get("partition") is not None for f in files)

    inc = spark.createDataFrame(
        [_doc(7), (2001, "a fresh post-compaction document about bin packing")],
        "doc_id BIGINT, text STRING",
    )
    survivors, _ = incremental_minhash_dedup_indexed(spark, inc, idx, bands=4)
    got = sorted(r["doc_id"] for r in survivors.select("doc_id").collect())
    assert got == [2001]  # doc 7 dups the indexed corpus
    assert 0 < idx.last_scan_pruned_files < len(files)
    full, _ = incremental_minhash_dedup(inc, idx.scan(spark), bands=4)
    assert sorted(r["doc_id"] for r in full.select("doc_id").collect()) == got
