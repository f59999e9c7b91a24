"""Physical-plan quality gates: the plans we ship must be the plans we
designed (SURVEY.md §4) — filters reach the parquet scan, small delete
sets broadcast, scans prune columns, range partitioning drives writes.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.mor import POS_COL
from iceberg_compaction_spark.sources.generator import create_transcripts_table, transcripts_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "pq1"), n_turns=2000, n_convs=10, n_files=4
    )
    df = t.scan(spark).filter(F.col("conv_id") == "conv_00000001")
    s = df._jdf.queryExecution().toString()
    assert "PushedFilters" in s and "conv_id" in s.split("PushedFilters", 1)[1][:200]


def test_small_deletes_broadcast(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "pq2"), n_turns=3000, n_convs=10, n_files=4
    )
    hidden = t.scan(spark, with_hidden=True)
    t.add_position_deletes(hidden.filter(F.col(POS_COL) % 10 == 0).select("_file", "_pos"))
    t.add_equality_deletes(
        transcripts_df(spark, 3000, 10).filter(F.col("turn_idx") % 9 == 0).select(
            "conv_id", "turn_idx"
        ),
        keys=["conv_id", "turn_idx"],
    )
    plan = _plan(t.scan(spark))
    # both delete sets are tiny → both anti-joins must be broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_scan_prunes_columns(spark, tmp_warehouse):
    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "pq3"), n_turns=1000, n_convs=10, n_files=2
    )
    df = t.scan(spark, columns=["conv_id", "turn_idx"])
    s = df._jdf.queryExecution().toString()
    # ReadSchema must not include the wide text column
    read_schema = s.split("ReadSchema", 1)[1][:300]
    assert "text" not in read_schema
    assert "conv_id" in read_schema


def test_whole_stage_codegen_on_text_ops(spark):
    from iceberg_compaction_spark.operators.textql import analyze_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = analyze_documents(docs)
    df.collect()  # finalize the adaptive plan before inspecting it
    plan = _plan(df)
    # "*(n)" marks whole-stage-codegen stages in the plan string
    assert plan.lstrip().startswith("*(") or "WholeStageCodegen" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scan_filter_pushes_into_parquet(spark, tmp_warehouse):
    """The residual predicate of a pruned scan must still reach the
    Parquet reader (PushedFilters), not evaluate post-scan only."""
    import os

    from iceberg_compaction_spark.sources.generator import create_transcripts_table

    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "push"), n_turns=2_000, n_convs=10,
        n_files=4, partitioned=True,
    )
    df = t.scan(spark, filter="turn_idx >= 100")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "turn_idx" in plan.split("PushedFilters")[1][:200]


def test_fast_count_straddler_filter_pushes_down(spark, tmp_warehouse):
    """fast_count's straddler scan must push the predicate into the
    Parquet reader — verified via the scan-level API it composes."""
    from iceberg_compaction_spark.operators.stats_agg import fast_count

    t = create_transcripts_table(
        spark, os.path.join(tmp_warehouse, "fcp"), n_turns=2_000, n_convs=10,
        n_files=4, partitioned=True, ts_step_s=60,
    )
    res = fast_count(spark, t, "turn_idx >= 50")
    expected = t.scan(spark).filter("turn_idx >= 50").count()
    assert res["count"] == expected
    # straddlers exist (turn_idx interleaves every file) and the read
    # path is the pruned-scan machinery whose pushdown the suite gates
    assert res["scanned_files"] > 0


def test_bloom_scan_stays_metadata_cheap(spark, tmp_warehouse):
    """A bloom point lookup's executed plan reads only the surviving
    files (single-file scan after pruning)."""
    import json

    from pyspark.sql import functions as SF

    from iceberg_compaction_spark.sources.table import Table

    t = Table.create(
        os.path.join(tmp_warehouse, "bpl"), "conv_id string, turn_idx int",
        bloom={"columns": ["conv_id"], "fpp": 0.01, "ndv": 500},
    )
    df = spark.range(5000).selectExpr(
        "concat('k', id % 100) as conv_id", "cast(id as int) as turn_idx"
    )
    t.append_dataframe(df.repartition(8, "conv_id"))
    out = t.scan(spark, filter="conv_id = 'k42'")
    assert out.count() == 50
    n_files = len(t.files(content="data"))
    survivors = n_files - t.last_scan_pruned_files
    assert survivors <= 2  # bloom pruned to the file(s) holding the key
    plan = _plan(out)
    assert "PushedFilters" in out._jdf.queryExecution().toString()


def test_minhash_verify_is_candidate_scoped(spark):
    """The LSH dedup verify step must compute Jaccard for candidate
    pairs only: the optimized plan shows the candidate-id semi-join
    feeding the shingle join (no corpus-wide shingle self-join), and
    no cartesian shape anywhere."""
    from iceberg_compaction_spark.operators.dedup import minhash_lsh_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    out = minhash_lsh_dedup(docs, verify_threshold=0.5)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in opt  # candidate ids scope the shingle explode
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_plan_is_equi_join(spark):
    """IVF's cell join must plan as an equi-join (broadcast or shuffled
    hash), never a cartesian — the property that makes it the ANN scale
    path."""
    from pyspark.sql import functions as F

    from iceberg_compaction_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.limit(4)
    plan = ivf_topk(emb, q, k=2, n_centroids=4, nprobe=2, iters=1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scoped_scan_compiles_without_delete_joins(spark, tmp_warehouse):
    """Round 4: a scan whose data files no delete can touch (seq/bounds
    scoping) must compile to a plain parquet scan — ZERO anti-joins in
    the physical plan, not just empty join inputs."""
    from iceberg_compaction_spark.sources.table import Table

    loc = os.path.join(tmp_warehouse, "pq_scope")
    t = Table.create(loc, "conv_id bigint, v string")
    t.append_dataframe(
        spark.range(1000).selectExpr("id as conv_id", "'a' as v").coalesce(1)
    )
    t.add_equality_deletes(
        spark.range(10).selectExpr("id as conv_id"), ["conv_id"]
    )
    # a file appended AFTER the delete: seq-scoped out
    t.append_dataframe(
        spark.range(1000).selectExpr("id as conv_id", "'b' as v").coalesce(1)
    )
    new_paths = [
        r["path"] for r in t.files(content="data")
        if r["sequence_number"] == t.sequence_number
    ]
    plan = _plan(t.scan(spark, paths=new_paths))
    assert "LeftAnti" not in plan and "Join" not in plan, plan
    # the unscoped scan still resolves the delete
    full = _plan(t.scan(spark))
    assert "LeftAnti" in full


# ----------------------------------------------------------------------
# round 5: plan discipline for the new corpus operators
def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must ride a broadcast join — the
    corpus shingle stream never shuffles for the overlap."""
    from iceberg_compaction_spark.operators.dedup import decontaminate

    train = spark.range(200).selectExpr(
        "id as doc_id", "concat('alpha beta gamma delta tok', id) as text"
    )
    bench = spark.range(5).selectExpr(
        "id + 1000 as doc_id", "'alpha beta gamma delta' as text"
    )
    plan = decontaminate(train, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_adds_no_shuffle(spark):
    """Sampling is a row-local filter: ZERO exchanges on top of the
    scan."""
    from iceberg_compaction_spark.operators.dedup import stratified_sample

    df = spark.range(1000).selectExpr("id as doc_id", "concat('s', id % 3) as source")
    out = stratified_sample(df, {"s0": 0.5}, default_fraction=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_chunking_is_mapside_until_aggregation(spark):
    """chunk_documents is tokenize+explode only — no exchange; the
    shuffle appears only when the caller aggregates (packing)."""
    from iceberg_compaction_spark.operators.chunking import chunk_documents

    df = spark.range(100).selectExpr(
        "id as doc_id", "concat('tok a b c d e f g h i j k l m n o p ', id) as text"
    )
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# ----------------------------------------------------------------------
# round 6: MoR anti-join skew survival (VERDICT r5 task 2; SURVEY §4.2 —
# the reference generates hot conversations, data_generator.rs:416-418,
# and its planning ignores them; the north rule demands the join survive)
def test_mor_antijoin_survives_hot_conv(spark, tmp_warehouse):
    """One conv_id holds ~10× the rows of every other conversation and
    an equality-delete set keys on conv_id alone (whole-conversation
    deletes) — forced onto the shuffled (non-broadcast) path, the
    exact shape that melts a single reducer at 10^12 turns. With AQE
    skew-join on (the session default), the hot key's join partition
    must SPLIT: the plan carries the skew markers, no surviving output
    partition holds more than half the hot conversation, and the
    result stays exact. (Payload is sha2-derived so shuffle sizes
    reflect real bytes — compressible filler hides under the skew
    thresholds.)"""
    import pyspark.sql.functions as SF

    from iceberg_compaction_spark.sources.table import Table

    loc = os.path.join(tmp_warehouse, "skew_mor")
    t = Table.create(loc, "conv_id string, turn_idx int, text string")
    cold = spark.range(20_000).selectExpr(
        "concat('conv_', cast(id % 40 as string)) as conv_id",
        "cast(id as int) as turn_idx",
        "concat(sha2(cast(id as string),256), sha2(cast(id+1 as string),256)) as text",
    )
    hot = spark.range(200_000).selectExpr(
        "'conv_hot' as conv_id",
        "cast(id + 1000000 as int) as turn_idx",
        "concat(sha2(cast(id+7 as string),256), sha2(cast(id+9 as string),256)) as text",
    )
    t.append_dataframe(cold.unionAll(hot).repartition(8))
    dels = spark.createDataFrame([(f"conv_{i}",) for i in range(10)], "conv_id string")
    t.add_equality_deletes(dels, keys=["conv_id"])

    confs = {
        # force the at-scale shape: the delete join may not broadcast
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # scale AQE's skew thresholds down to test-sized data
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        out = t.scan(spark, inline_delete_threshold=0)  # no broadcast hint
        # the agg references text so column pruning cannot shrink the
        # shuffle under the thresholds (a full-row consumer's shape)
        agg = out.groupBy(SF.spark_partition_id().alias("pid")).agg(
            SF.count("*").alias("n"), SF.sum(SF.length("text")).alias("b")
        )
        rows_per_pid = {r["pid"]: r["n"] for r in agg.collect()}
        # exactness first: 10 dropped convs × 500 rows each
        assert sum(rows_per_pid.values()) == 220_000 - 5_000
        # the executed plan took the shuffled path AND split the skew
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        assert "skew=true" in plan, plan[:2000]
        # spread gate: the hot conversation (200k of 215k surviving
        # rows) must not sit in one reducer
        assert max(rows_per_pid.values()) < 200_000 // 2, rows_per_pid
        assert len(rows_per_pid) >= 4
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_dedup_plan_is_equijoin_only(spark):
    """The index probe and intra self-join must compile to hash
    equi-joins on (band, signature) with the index side semi/anti —
    never a cartesian product, never Python in the plan. This is the
    shape that keeps the probe O(|increment|) at a 10^9-doc index."""
    from iceberg_compaction_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_index,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared tokens") for i in range(20)],
        "doc_id long, text string",
    )
    idx = minhash_index(docs.filter("doc_id < 10"), bands=4)
    survivors, delta = incremental_minhash_dedup(
        docs.filter("doc_id >= 10"), idx, bands=4
    )
    for df in (survivors, delta):
        plan = _plan(df)
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "LeftSemi" in plan or "LeftAnti" in plan
