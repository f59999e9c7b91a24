"""Driver-contract queries, part 2: corpus-pipeline operators over
``documents`` / ``embeddings``, plus the flagship end-to-end engine
round-trip. Same determinism rules as queries.py."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_compaction_spark import benchphase
from iceberg_compaction_spark.queries import _t, _utc

# Shared normalization (Spark + DuckDB spellings kept in lockstep)
_NORM_SPARK = lambda c: F.split(  # noqa: E731
    F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " ")), r"\s+"
)
_NORM_SQL = (
    "string_split_regex(trim(regexp_replace(lower({c}), '[^a-z0-9\\s]', ' ', 'g')), '\\s+')"
)


# ======================================================================
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one survivor per md5(text), smallest doc_id wins."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id", "lang", "source", "n_chars")


EXACT_DEDUP_SQL = """
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents)
SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn = 1
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard similarity pairs ≥ 0.2 (shared-shingle equi-join,
    never a cross product)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    # exact pair set (the API default; corpus-scale callers opt into
    # the hot-shingle cap via dedup.DEFAULT_MAX_SHINGLE_DF)
    pairs = ngram_jaccard_pairs(docs, max_shingle_df=None).filter(F.col("jaccard") >= 0.2)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard_r"))


NGRAM_JACCARD_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(c / (sa.sz + sb.sz - c), 4) AS jaccard_r
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c / (sa.sz + sb.sz - c) >= 0.2
"""


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: benchmark decontamination — flag corpus documents
    sharing any distinct 4-gram with the held-out 'benchmark' slice
    (doc_id % 20 = 0). Broadcast equi-join against the benchmark
    shingle set; no cross product."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(docs, bench, n=4).select("doc_id", "contaminated_ngrams")


DECONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, greatest(len(t) - 3, 1))) AS u(i)),
bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0)
SELECT doc_id, count(*) AS contaminated_ngrams
FROM sh JOIN bsh USING (shingle)
GROUP BY doc_id
HAVING count(*) >= 1
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: deterministic hash-based stratified sampling — the
    training-mix assembly primitive. Per-source keep fractions ride an
    md5-prefix threshold: reproducible across engines and cluster
    sizes, zero shuffles, exactly oracle-expressible."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        docs,
        {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0},
        strata_col="source",
        default_fraction=0.125,
    )
    return out.select("doc_id", "source", "lang")


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, source, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE source WHEN 'src0' THEN 'g'
                  WHEN 'src1' THEN '8000'
                  WHEN 'src2' THEN '4000'
                  WHEN 'src3' THEN '0000'
                  ELSE '2000' END
"""


def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: Gopher-style repetition filters — top-2-gram share and
    duplicate-5-gram fraction per document (boilerplate/spam gate)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.textql import repetition_metrics

    docs = _t(spark, sf_dir, "documents")
    out = repetition_metrics(docs)
    return out.select(
        "doc_id",
        F.round("top2_frac", 4).alias("top2_r"),
        F.round("dup5_frac", 4).alias("dup5_r"),
    )


REPETITION_METRICS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
g2 AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2),
g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
m2 AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top2 FROM g2c GROUP BY doc_id),
g5 AS (
  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
  WHERE len(t) >= 5),
m5 AS (
  SELECT doc_id, (count(*) - count(DISTINCT g))::DOUBLE / count(*) AS dup5
  FROM g5 GROUP BY doc_id)
SELECT d.doc_id,
       round(coalesce(m2.top2, 0.0), 4) AS top2_r,
       round(coalesce(m5.dup5, 0.0), 4) AS dup5_r
FROM documents d
LEFT JOIN m2 USING (doc_id)
LEFT JOIN m5 USING (doc_id)
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: overlapping token-window chunking (64-token chunks,
    16-token overlap) — the pre-tokenization shaping step for
    context-window training data. Chunk text rides as md5 so the
    compared relation stays narrow."""
    _utc(spark)
    from iceberg_compaction_spark.operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    ch = chunk_documents(docs, chunk_tokens=64, overlap=16)
    return ch.select(
        "doc_id", "chunk_idx", F.md5("chunk_text").alias("chunk_md5"), "n_tokens"
    )


_CHUNKS_SQL_BODY = f"""
toks AS (
  SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
ok AS (
  SELECT doc_id, t, len(t) AS n FROM toks
  WHERE t IS NOT NULL AND NOT (len(t) = 1 AND t[1] = '')),
nc AS (
  SELECT doc_id, t, n,
         CASE WHEN n <= 64 THEN 1
              ELSE CAST(ceil((n - 64) / 48.0) AS INT) + 1 END AS c
  FROM ok),
ch AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(t[i*48+1 : i*48+64], ' ') AS chunk_text,
         len(t[i*48+1 : i*48+64]) AS n_tokens
  FROM nc, UNNEST(generate_series(0, c - 1)) AS u(i))
"""

DOC_CHUNKS_SQL = f"""
WITH {_CHUNKS_SQL_BODY}
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       md5(chunk_text) AS chunk_md5, CAST(n_tokens AS INT) AS n_tokens
FROM ch
"""


def q_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: greedy sequence packing — chunks assigned to
    256-token training sequences by the deterministic running-total
    rule in (doc_id, chunk_idx) order; compared as per-sequence
    rollups."""
    _utc(spark)
    from iceberg_compaction_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
    )

    docs = _t(spark, sf_dir, "documents")
    ch = chunk_documents(docs, chunk_tokens=64, overlap=16)
    packed = pack_sequences(ch, budget=256)
    return packed.groupBy("seq_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").alias("seq_tokens"),
    )


PACKED_SEQUENCES_SQL = f"""
WITH {_CHUNKS_SQL_BODY},
packed AS (
  SELECT doc_id, chunk_idx, n_tokens,
         CAST(floor(
           (sum(n_tokens) OVER (ORDER BY doc_id ASC, chunk_idx ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_tokens) / 256.0
         ) AS BIGINT) AS seq_id
  FROM ch)
SELECT seq_id, count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
FROM packed GROUP BY seq_id
"""


def q_minhash_band_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH band signatures (salted-md5 min per hash slot,
    4 bands × 2 rows)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import minhash_signatures

    docs = _t(spark, sf_dir, "documents")
    return minhash_signatures(docs, bands=4, rows_per_band=2)


def _minhash_sql() -> str:
    mins = ",\n       ".join(
        f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(8)
    )
    bands = []
    for b in range(4):
        bands.append(
            f"SELECT doc_id, {b} AS band, h{2*b} || '#' || h{2*b+1} AS signature FROM sig"
        )
    union = "\nUNION ALL\n".join(bands)
    return f"""
WITH toks AS (
  SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)),
sig AS (
  SELECT doc_id,
       {mins}
  FROM sh GROUP BY doc_id)
{union}
"""


MINHASH_BAND_SIGNATURES_SQL = _minhash_sql()


def q_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (token md5 hashes, bitwise vote)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import simhash

    docs = _t(spark, sf_dir, "documents")
    return simhash(docs)


def _simhash_sql(bits: int = 16) -> str:
    votes = ",\n       ".join(
        f"sum(((h >> {i}) & 1) * 2 - 1) AS v{i}" for i in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{i} > 0 THEN 1 ELSE 0 END) * {1 << i}" for i in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_NORM_SQL.format(c='text')}) AS tok FROM documents),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
  FROM toks WHERE tok <> ''),
votes AS (
  SELECT doc_id,
       {votes}
  FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
"""


SIMHASH_FINGERPRINT_SQL = _simhash_sql()


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text metrics: token counts, quality score, language ID,
    canonical fingerprint."""
    _utc(spark)
    from iceberg_compaction_spark.operators.textql import analyze_documents

    docs = _t(spark, sf_dir, "documents")
    return analyze_documents(docs).select(
        "doc_id", "tokens_ws", "tokens_bpe", "quality", "lang_pred", "fingerprint"
    )


def _stop_hits_sql() -> str:
    words = ("the", "and", "of", "to", "in", "is", "a", "that")
    return " + ".join(
        f"(CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END)"
        for w in words
    )


def _lang_sql() -> str:
    markers = {
        "en": ("the", "and", "is", "of"),
        "de": ("der", "und", "die", "nicht"),
        "fr": ("le", "la", "et", "les"),
        "es": ("el", "los", "que", "y"),
    }
    scores = {
        lang: " + ".join(
            f"length(regexp_extract_all(lower(text), '\\b{m}\\b'))" for m in ms
        )
        for lang, ms in markers.items()
    }
    best = f"greatest({scores['en']}, {scores['de']}, {scores['fr']}, {scores['es']})"
    out = "'und'"
    for lang in ("es", "fr", "de", "en"):
        out = f"CASE WHEN ({best}) > 0 AND ({scores[lang]}) = ({best}) THEN '{lang}' ELSE {out} END"
    return out


TEXT_ANALYSIS_SQL = f"""
SELECT doc_id,
  CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE array_length(string_split_regex(trim(text), '\\s+')) END AS tokens_ws,
  CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^\\sA-Za-z0-9]')) AS INT)
    AS tokens_bpe,
  round(greatest(least(
      (CASE WHEN array_length(string_split_regex(trim(text), '\\s+')) BETWEEN 5 AND 100000
            THEN 0.25 ELSE 0.0 END)
      + least(CASE WHEN length(text) > 0
                   THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / CAST(length(text) AS DOUBLE)
                   ELSE 0.0 END, 0.6) * (0.5 / 0.6)
      + least(({_stop_hits_sql()}) / 4.0, 1.0) * 0.25
      - least((CASE WHEN length(text) > 0
                    THEN length(regexp_extract_all(text, '[.,!?;:]')) / CAST(length(text) AS DOUBLE)
                    ELSE 0.0 END) * 2.0, 0.25)
    , 1.0), 0.0), 4) AS quality,
  {_lang_sql()} AS lang_pred,
  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')))
    AS fingerprint
FROM documents
"""


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) document fingerprints — the MOSS
    signature: min hash per sliding window of character 5-gram hashes,
    distinct per doc. Any shared substring ≥ k+window−1 chars forces a
    shared fingerprint."""
    _utc(spark)
    from iceberg_compaction_spark.operators.textql import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=5, window=4)


WINNOW_FINGERPRINTS_SQL = """
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
  FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(substr(s, i, 5)), 1, 8))::BIGINT AS h
  FROM norm, UNNEST(generate_series(1, greatest(length(s) - 4, 1))) AS u(i)
  WHERE length(s) >= 5),
win AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM grams)
SELECT DISTINCT doc_id, wmin AS fingerprint_hash
FROM win WHERE pos <= n - 4
"""


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 neighbors for a deterministic query set
    (vec_id % 100 == 0), double-precision math in both engines.

    Round 9 (guide §4.2): the matmul (mapInPandas + BLAS) form replaces
    the crossJoin + interpreted higher-order aggregate — no |Q|×|corpus|
    row explosion, same exact results (old == new == DuckDB verified
    bit-for-bit on (query_id, neighbor_id, rank, cosine_r) at
    sf0.001/0.01/0.1/1.0; min adjacent-rank cosine gap 8.6e-6 vs ~1e-16
    summation-order perturbation)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = brute_force_topk_vectorized(emb, queries, k=3)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine_r")
    )


EMBEDDING_TOPK_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
           AS cosine
  FROM q, e WHERE q.query_id <> e.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine_r
FROM ranked WHERE rank <= 3
"""


def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup removal at cosine ≥ 0.98 (larger id dies)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import embedding_dedup

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    return embedding_dedup(emb, threshold=0.98).select("vec_id", "label")


EMBEDDING_DEDUP_SQL = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
victims AS (
  SELECT DISTINCT b.vec_id
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.98)
SELECT e.vec_id, e.label FROM e ANTI JOIN victims x ON e.vec_id = x.vec_id
"""


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via multi-table sign-LSH (pandas-UDF
    signatures). The LSH result itself is approximate by construction
    — what IS DuckDB-computable (round 8, VERDICT #6) is the EXACT
    top-k for the same query points, so the query runs the LSH path,
    SELF-GATES recall ≥ 0.6 against the exact set (red driver row if
    the LSH path ever degrades; tests/test_pipeline_ops.py pins the
    same floor), and returns the exact relation for the value check.
    Query points differ from `embedding_topk`'s (%100==50 vs ==0) so
    the two keys prove different slices."""
    _utc(spark)
    from iceberg_compaction_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 50)
    approx = lsh_topk(emb, queries, k=3)
    emb_d = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    exact = brute_force_topk(
        emb_d, emb_d.filter(F.col("vec_id") % 100 == 50), k=3
    )
    n_exact = exact.count()
    n_hit = approx.join(exact, ["query_id", "neighbor_id"], "left_semi").count()
    recall = n_hit / max(n_exact, 1)
    if recall < 0.6:
        raise AssertionError(f"LSH ANN recall degraded: {recall:.3f} < 0.6")
    return exact.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine_r")
    )


LSH_ANN_TOPK_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 50),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
           AS cosine
  FROM q, e WHERE q.query_id <> e.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, round(cosine, 4) AS cosine_r
FROM ranked WHERE rank <= 3
"""


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (inverted-file index: Lloyd-refined centroids, probed
    cells, exact re-rank) run at FULL probe (nprobe = n_centroids),
    where IVF is provably lossless — so the entire IVF machinery
    (training, assignment, cell join, re-rank) is value-checked against
    the brute-force SQL oracle. The approximate regime (nprobe <
    n_centroids) is pinned by tests/test_pipeline_ops.py recall ≥ 0.6."""
    _utc(spark)
    from iceberg_compaction_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = ivf_topk(emb, queries, k=3, n_centroids=8, nprobe=8)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine_r")
    )


IVF_ANN_TOPK_SQL = EMBEDDING_TOPK_SQL  # full probe ⇒ identical to exact


def q_incremental_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: PERSISTED incremental IVF ANN index
    (`operators/ann_index.py`) — the embeddings twin of the persisted
    MinHash dedup index: the index lives in a cell-partitioned Table,
    an increment (vec_id%10==7) is absorbed by ASSIGN+APPEND only
    (existing index files untouched), and probes restrict the scan to
    the probed cells' partition values. Returned relation: the
    FULL-probe top-3 through the index — lossless, so the value check
    proves the incrementally-built index holds exactly the corpus.
    Self-gated: the increment must land as a pure append, a narrow
    partial probe must PRUNE index files (metadata-only) while keeping
    recall ≥ 0.6 on its own slice, and the manifest row count must
    equal the corpus."""
    _utc(spark)
    from iceberg_compaction_spark.operators.ann_index import (
        create_ivf_index,
        ivf_index_append,
        ivf_index_build,
        ivf_index_probe,
        ivf_index_stats,
    )

    emb = _t(spark, sf_dir, "embeddings")
    tdir = tempfile.mkdtemp(prefix="icemaint_ann_")
    try:
        old = emb.filter(F.col("vec_id") % 10 != 7)
        inc = emb.filter(F.col("vec_id") % 10 == 7)
        queries = emb.filter(F.col("vec_id") % 100 == 25)
        with benchphase.phase("build"):  # corpus-history fixture
            idx = create_ivf_index(os.path.join(tdir, "ivf"))
            ivf_index_build(spark, idx, old, n_centroids=8)
        n_before = len(idx.files(content="data"))
        ivf_index_append(spark, idx, inc)
        if idx.snapshots()[-1]["operation"] != "append":
            raise AssertionError("increment was not absorbed as an append")
        if len(idx.files(content="data")) <= n_before:
            raise AssertionError("append added no index files")
        n_total = emb.count()
        if ivf_index_stats(idx)["rows"] != n_total:
            raise AssertionError("index manifest row count != corpus size")

        out = ivf_index_probe(spark, idx, queries, k=3, nprobe=8).select(
            "query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine_r")
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        out = spark.read.parquet(result_dir)

        # pruning gate: a single-query probe at nprobe=2 opens only its
        # two cells' files — the metadata restriction must skip the rest
        one = queries.orderBy("vec_id").limit(1)
        ivf_index_probe(spark, idx, one, k=3, nprobe=2).count()
        if not 0 < idx.last_scan_pruned_files < len(idx.files(content="data")):
            raise AssertionError(
                f"partial probe pruned {idx.last_scan_pruned_files} files"
            )
        # recall gate, decoupled (single-query recall is 3 samples of
        # noise): the whole query set at half probe vs the exact set
        part = ivf_index_probe(spark, idx, queries, k=3, nprobe=4)
        part_rows = {(r["query_id"], r["neighbor_id"]) for r in part.collect()}
        exact_rows = {
            (r["query_id"], r["neighbor_id"]) for r in out.collect()
        }
        recall = len(part_rows & exact_rows) / max(len(exact_rows), 1)
        if recall < 0.6:
            raise AssertionError(f"nprobe=4 recall degraded: {recall:.3f}")
        return out
    finally:
        # the result parquet must outlive this call (the driver reads
        # the returned frame afterwards) — drop only the index
        shutil.rmtree(os.path.join(tdir, "ivf"), ignore_errors=True)


INCREMENTAL_ANN_SQL = EMBEDDING_TOPK_SQL.replace(
    "vec_id % 100 = 0", "vec_id % 100 = 25"
)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns + mapInPandas feature extraction (decode
    stubbed deterministically). Round 8 (VERDICT #6): the DECODE
    columns stay pytest-pinned (DuckDB lacks sha1 and the luma math),
    but the deterministic metadata slice — declared mime, byte length,
    and an md5 checksum of the payload — IS DuckDB-recomputable, so
    the driver now value-checks it. Self-gates keep the decode path
    red-on-regression: the mapInPandas sha1 must equal the JVM
    ``F.sha1`` over the same binary, and brightness must be a valid
    luma mean."""
    _utc(spark)
    from iceberg_compaction_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    feats = extract_features(media, decode="fake")
    joined = feats.join(
        media.select(
            "doc_id",
            F.sha1("media").alias("_jvm_sha1"),
            F.md5("media").alias("media_md5"),
        ),
        "doc_id",
    )
    bad = joined.filter(
        (F.col("sha1") != F.col("_jvm_sha1"))
        | F.col("brightness").isNull()
        | (F.col("brightness") < 0)
        | (F.col("brightness") > 255)
    ).count()
    if bad:
        raise AssertionError(f"{bad} rows failed the decode self-gate")
    return joined.select("doc_id", "media_type", "byte_len", "media_md5")


MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       (['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 AS INT) + 1]
         AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS byte_len,
       md5(text) AS media_md5
FROM documents
"""


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical training-data filter, composed from the text
    operators: keep documents that pass quality, language, and
    exact-dup gates in one pass — the shape a 100 TB corpus sweep runs
    at scan speed."""
    _utc(spark)
    from iceberg_compaction_spark.operators.textql import analyze_documents

    docs = _t(spark, sf_dir, "documents")
    enriched = analyze_documents(docs)
    w = Window.partitionBy("fingerprint").orderBy(F.asc("doc_id"))
    return (
        enriched.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("quality") >= 0.5) & (F.col("tokens_ws") >= 10))
        .select("doc_id", "lang", "tokens_ws", "quality")
    )


CORPUS_FILTER_SQL = f"""
WITH enriched AS ({TEXT_ANALYSIS_SQL.replace('SELECT doc_id,', 'SELECT doc_id, lang,')}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM enriched)
SELECT doc_id, lang, tokens_ws, quality
FROM ranked WHERE rn = 1 AND quality >= 0.5 AND tokens_ws >= 10
"""


# ======================================================================
# flagship: full engine round-trip
def build_transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → transcript rows: conv_id per user, dense turn_idx in
    (ts, event_id) order — deterministic in both engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        F.format_string("conv_%06d", F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
            (F.pmod(F.row_number().over(w) - 1, F.lit(4)) + 1).cast("int"),
        ).alias("role"),
        F.concat_ws("|", "event_type", "props").alias("text"),
        F.when(F.col("event_type") == "click", F.lit("mouse")).alias("tool"),
        F.col("ts"),
    )


TRANSCRIPTS_BASE_SQL = """
SELECT printf('conv_%06d', user_id) AS conv_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - 1 AS INT)
         AS turn_idx,
       ['user','assistant','system','tool']
         [((row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - 1) % 4) + 1]
         AS role,
       concat_ws('|', event_type, props) AS text,
       CASE WHEN event_type = 'click' THEN 'mouse' END AS tool,
       ts
FROM events
"""


def q_transcripts_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship: build a transcripts table from events, write it as
    many small files, add equality deletes, bin-pack-compact with
    merge-on-read resolution, and scan the result — which must equal
    the plain SQL anti-join over the original events. Exercises S1-S9,
    P1-P6, J1-J3, A1-A4, O1-O2, C1-C7 end-to-end against DuckDB."""
    _utc(spark)
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_flagship_")
    loc = os.path.join(tdir, "transcripts")
    try:
        with benchphase.phase("build"):  # fixture, not the measured op
            table = Table.create(loc, TRANSCRIPT_DDL)
            base = build_transcripts_from_events(spark, sf_dir)
            table.append_dataframe(
                base.repartition(16, F.xxhash64("conv_id", "turn_idx"))
            )
            # delete keys come from the *written table*, not the
            # unmaterialized lineage (which would re-run the events
            # window end-to-end)
            dels = (
                table.scan(spark)
                .filter(F.col("turn_idx") % 7 == 3)
                .select("conv_id", "turn_idx")
            )
            table.add_equality_deletes(dels, keys=["conv_id", "turn_idx"])
        cfg = CompactionConfig(
            selection=SelectionStrategy.FULL,
            group_target_size_bytes=8 << 20,
            target_file_size_bytes=8 << 20,
        )
        CompactionRunner(spark, table, cfg).execute()
        out = table.scan(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        # materialize outside the (about-to-vanish) warehouse; parquet
        # round-trip keeps the result executor-side instead of hauling
        # every row through the driver
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        # keep tdir: the caller consumes the returned DataFrame lazily;
        # the ~MB-scale result dir lives in tmp until the OS reaps it
        shutil.rmtree(loc, ignore_errors=True)


TRANSCRIPTS_COMPACTION_ROUNDTRIP_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE turn_idx % 7 <> 3
"""


def q_delete_where_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE WHERE over a day-partitioned table: whole days
    before the cutoff drop by manifest metadata only; the straddling
    day gets position deletes; the MoR scan must equal the plain SQL
    filter. The function raises if the metadata fast path never fired."""
    _utc(spark)
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_delwhere_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        table.append_dataframe(
            build_transcripts_from_events(spark, sf_dir), distribute=True
        )
        res = delete_where(
            spark, table, "ts < TIMESTAMP '2024-01-10 06:30:00'"
        )
        if res["dropped_files"] == 0 or res["deleted_rows"] == 0:
            raise AssertionError(f"hybrid delete degenerated: {res}")
        out = table.scan(spark).select(
            "conv_id", "turn_idx", "role", F.unix_timestamp("ts").alias("ts_epoch")
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


DELETE_WHERE_ROUNDTRIP_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE ts >= TIMESTAMP '2024-01-10 06:30:00'
"""


def q_merge_into_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 end-to-end: a real MERGE INTO against an engine table —
    updates (key matched: old row dies via the equality delete, new row
    wins by sequence number) and inserts (unmatched keys) land in ONE
    atomic commit; the MoR scan must equal the plain-SQL upsert."""
    _utc(spark)
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_merge_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.repartition(8, F.xxhash64("conv_id", "turn_idx")))
        updates = (
            table.scan(spark)
            .filter(F.col("turn_idx") % 10 == 5)
            .withColumn("text", F.concat(F.lit("UPD|"), F.col("text")))
        )
        inserts = (
            table.scan(spark)
            .filter(F.col("turn_idx") == 0)
            .withColumn("turn_idx", F.lit(-1).cast("int"))
            .withColumn("text", F.lit("INSERTED"))
        )
        merge_into(
            table, updates.unionByName(inserts), keys=["conv_id", "turn_idx"]
        )
        out = table.scan(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


MERGE_INTO_ROUNDTRIP_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL}),
src AS (
  SELECT conv_id, turn_idx, role, 'UPD|' || text AS text, ts
  FROM base WHERE turn_idx % 10 = 5
  UNION ALL
  SELECT conv_id, CAST(-1 AS INT) AS turn_idx, role, 'INSERTED' AS text, ts
  FROM base WHERE turn_idx = 0)
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base b
ANTI JOIN (SELECT DISTINCT conv_id, turn_idx FROM src) k USING (conv_id, turn_idx)
UNION ALL
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM src
"""


def q_merge_cow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: the SAME upsert as merge_into_roundtrip but in
    copy-on-write mode (``write.merge.mode=cow``): may-match files are
    rewritten without the matched rows and replaced with the source
    data files in one commit — self-gated on zero delete files
    surviving — and the scan must equal the identical plain-SQL upsert
    relation the MoR twin checks."""
    _utc(spark)
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_mcow_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        table.set_property("write.merge.mode", "cow")
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.repartition(8, F.xxhash64("conv_id", "turn_idx")))
        updates = (
            table.scan(spark)
            .filter(F.col("turn_idx") % 10 == 5)
            .withColumn("text", F.concat(F.lit("UPD|"), F.col("text")))
        )
        inserts = (
            table.scan(spark)
            .filter(F.col("turn_idx") == 0)
            .withColumn("turn_idx", F.lit(-1).cast("int"))
            .withColumn("text", F.lit("INSERTED"))
        )
        merge_into(table, updates.unionByName(inserts), keys=["conv_id", "turn_idx"])
        if table.files(content=mf.CONTENT_EQ_DEL) or table.files(
            content=mf.CONTENT_POS_DEL
        ):
            raise AssertionError("CoW merge left delete files")
        out = table.scan(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def q_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: the Spark-4 Python DataSource connector — the same
    MERGE+DELETE table as delete_where_roundtrip is read back through
    ``spark.read.format("icemaint")`` (per-file partitions with scoped
    deletes, executor-side pyarrow MoR), so a plain Spark SQL user
    gets the identical relation without this engine's Table API.
    Self-gated: the connector result must equal the native scan."""
    _utc(spark)
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources.datasource import register
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    register(spark)
    tdir = tempfile.mkdtemp(prefix="icemaint_dsq_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.repartition(8, F.xxhash64("conv_id", "turn_idx")))
        upd = (
            table.scan(spark)
            .filter(F.col("turn_idx") % 10 == 5)
            .withColumn("text", F.concat(F.lit("UPD|"), F.col("text")))
        )
        merge_into(table, upd, keys=["conv_id", "turn_idx"])
        delete_where(spark, table, "turn_idx % 9 = 5", mode="mor")
        via_ds = spark.read.format("icemaint").load(loc)
        out = via_ds.select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        got = spark.read.parquet(result_dir)
        native = table.scan(spark).count()
        if got.count() != native:
            raise AssertionError("datasource read diverges from native scan")
        return got
    finally:
        shutil.rmtree(loc, ignore_errors=True)


DATASOURCE_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role,
       CASE WHEN turn_idx % 10 = 5 THEN 'UPD|' || text ELSE text END AS text,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE turn_idx % 9 <> 5
"""


def q_time_travel_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-pinned reads (S1/C7): append two batches as separate
    commits, scan the FIRST snapshot — it must show only batch one, no
    matter how the table advanced (and the read resolves through the
    delta-manifest chain)."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_tt_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        sid1 = table.append_dataframe(
            base.filter(F.col("turn_idx") % 2 == 0).repartition(4)
        )
        table.append_dataframe(base.filter(F.col("turn_idx") % 2 == 1).repartition(4))
        out = table.scan(spark, snapshot_id=sid1).select(
            "conv_id", "turn_idx", "role", F.unix_timestamp("ts").alias("ts_epoch")
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


TIME_TRAVEL_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE turn_idx % 2 = 0
"""


def q_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (CDC-style) read: three append commits; the
    incremental scan between snapshot 1 and snapshot 3 must return
    exactly the rows of batches 2+3 — the poll-for-new-data shape an
    ingest-then-derive pipeline runs."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_incr_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        sid1 = table.append_dataframe(base.filter(F.col("turn_idx") % 3 == 0).repartition(4))
        table.append_dataframe(base.filter(F.col("turn_idx") % 3 == 1).repartition(4))
        sid3 = table.append_dataframe(base.filter(F.col("turn_idx") % 3 == 2).repartition(4))
        out = table.incremental_scan(spark, sid1, sid3).select(
            "conv_id", "turn_idx", "role", F.unix_timestamp("ts").alias("ts_epoch")
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


INCREMENTAL_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE turn_idx % 3 IN (1, 2)
"""


def q_schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution: add a column after the first commit, append a
    second batch carrying it — rows written before the column existed
    scan as NULL (metadata-only evolution, no rewrite), new rows carry
    values. Checked value-for-value against the SQL reconstruction."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_evo_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.filter(F.col("turn_idx") % 2 == 0).repartition(4))
        table.add_column("score", "double")
        table.append_dataframe(
            base.filter(F.col("turn_idx") % 2 == 1)
            .withColumn("score", F.round(F.col("turn_idx") * 0.5, 1))
            .repartition(4)
        )
        out = table.scan(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "score",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


SCHEMA_EVOLUTION_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role,
       CASE WHEN turn_idx % 2 = 1
            THEN CAST(round(turn_idx * 0.5, 1) AS DOUBLE) END AS score,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base
"""


def q_stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful STREAMING operator (applyInPandasWithState,
    SURVEY §2.9 extension) with a full SQL oracle: gap-sessionize the
    events stream (availableNow over the parquet source). With each
    user's events inside one micro-batch, the emitted sessions — closed
    plus the final open one — are exactly the batch sessionization, so
    DuckDB can check the stateful operator value-for-value."""
    _utc(spark)
    from iceberg_compaction_spark.streaming.windows import stream_sessionize

    ev_schema = _t(spark, sf_dir, "events").schema
    tdir = tempfile.mkdtemp(prefix="icemaint_sessstream_")
    result_dir = os.path.join(tdir, "result")

    # stateful ops can't use AQE, so the state-store shuffle runs at the
    # raw spark.sql.shuffle.partitions (200 on a default session) — size
    # it to the machine for this query and restore afterwards
    shuffle_key = "spark.sql.shuffle.partitions"
    prev_shuffle = spark.conf.get(shuffle_key, None)
    spark.conf.set(shuffle_key, str(spark.sparkContext.defaultParallelism))

    def _sink(df: DataFrame, _bid: int) -> None:
        df.write.mode("append").parquet(result_dir)

    # the file source wants a directory; pathGlobFilter picks the table
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    q = (
        stream_sessionize(stream, gap_s=1800)
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", os.path.join(tdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if prev_shuffle is None:
            spark.conf.unset(shuffle_key)
        else:
            spark.conf.set(shuffle_key, prev_shuffle)
    return spark.read.parquet(result_dir).select(
        "user_id", "session_seq", "n_events", "start_epoch", "end_epoch"
    )


STREAM_SESSIONIZATION_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
sess AS (
  SELECT *, CAST(sum(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked)
SELECT user_id, session_id - 1 AS session_seq, count(*) AS n_events,
       min(CAST(floor(epoch(ts)) AS BIGINT)) AS start_epoch,
       max(CAST(floor(epoch(ts)) AS BIGINT)) AS end_epoch
FROM sess GROUP BY user_id, session_id
"""


_RANGE_LO = "2024-01-10 00:00:00"
_RANGE_HI = "2024-01-13 00:00:00"


def q_clustered_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction with Z-ORDER clustering in the rewrite (M4 wired into
    C1–C7): the physical layout changes (repartitionByRange on the
    interleaved key), the logical content must not — the scan after a
    clustered rewrite equals the plain SQL anti-join, value-for-value."""
    _utc(spark)
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_zorder_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.repartition(8, F.xxhash64("conv_id", "turn_idx")))
        dels = (
            table.scan(spark)
            .filter(F.col("turn_idx") % 5 == 2)
            .select("conv_id", "turn_idx")
        )
        table.add_equality_deletes(dels, keys=["conv_id", "turn_idx"])
        cfg = CompactionConfig(
            selection=SelectionStrategy.FULL,
            group_target_size_bytes=8 << 20,
            target_file_size_bytes=8 << 20,
            clustering="zorder",
            cluster_columns=("conv_id", "turn_idx"),
        )
        CompactionRunner(spark, table, cfg).execute()
        out = table.scan(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


CLUSTERED_COMPACTION_ROUNDTRIP_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE turn_idx % 5 <> 2
"""


def q_pruned_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file pruning (S1 + reference scan planning,
    file_selection.rs:29 / mod.rs:400-435): build a day-partitioned
    transcripts table from events, then scan a 3-of-30-day ts range.
    The scan must (a) return exactly the SQL-filtered rows and (b) have
    pruned most data files from the plan using only manifest bounds —
    the function raises if nothing was pruned, so the driver row goes
    red if pruning ever silently stops working."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_prune_")
    loc = os.path.join(tdir, "transcripts")
    try:
        with benchphase.phase("build"):  # fixture, not the measured op
            table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
            base = build_transcripts_from_events(spark, sf_dir)
            table.append_dataframe(base, distribute=True)
        n_total = len(table.files(content="data"))
        out = table.scan(
            spark,
            filter=f"ts >= TIMESTAMP '{_RANGE_LO}' AND ts < TIMESTAMP '{_RANGE_HI}'",
        ).select(
            "conv_id",
            "turn_idx",
            "role",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        if not (0 < table.last_scan_pruned_files < n_total):
            raise AssertionError(
                f"file pruning ineffective: {table.last_scan_pruned_files}/{n_total}"
            )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


PRUNED_RANGE_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base
WHERE ts >= TIMESTAMP '{_RANGE_LO}' AND ts < TIMESTAMP '{_RANGE_HI}'
"""


# the common backfill shape: two disjoint ts windows ORed together
_OR_A_LO, _OR_A_HI = "2024-01-03 00:00:00", "2024-01-05 00:00:00"
_OR_B_LO, _OR_B_HI = "2024-01-20 00:00:00", "2024-01-22 00:00:00"
_OR_PRED = (
    f"(ts >= TIMESTAMP '{_OR_A_LO}' AND ts < TIMESTAMP '{_OR_A_HI}')"
    f" OR (ts >= TIMESTAMP '{_OR_B_LO}' AND ts < TIMESTAMP '{_OR_B_HI}')"
)


def q_pruned_or_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-disjunct file pruning for a top-level OR predicate (two
    disjoint backfill windows): each disjunct prunes independently and
    the survivor sets union, so files in NEITHER window never enter the
    plan. Raises if nothing was pruned — the driver row goes red if
    disjunctive pruning regresses to keep-everything."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_prune_or_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        table.append_dataframe(
            build_transcripts_from_events(spark, sf_dir), distribute=True
        )
        n_total = len(table.files(content="data"))
        out = table.scan(spark, filter=_OR_PRED).select(
            "conv_id",
            "turn_idx",
            "role",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        if not (0 < table.last_scan_pruned_files < n_total):
            raise AssertionError(
                f"OR-disjunct pruning ineffective: {table.last_scan_pruned_files}/{n_total}"
            )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


PRUNED_OR_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base
WHERE (ts >= TIMESTAMP '{_OR_A_LO}' AND ts < TIMESTAMP '{_OR_A_HI}')
   OR (ts >= TIMESTAMP '{_OR_B_LO}' AND ts < TIMESTAMP '{_OR_B_HI}')
"""


def q_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file manifest BLOOM pruning for point lookups: transcripts
    are hash-distributed by conv_id across 16 files, so every file's
    [min, max] conv_id bounds span ~the whole key space and bounds
    pruning keeps everything — the bloom must prune most files anyway.
    Raises unless ≥ half the files were pruned; values are checked
    against the SQL oracle (blooms have no false negatives, so pruning
    never changes the result)."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_bloom_")
    loc = os.path.join(tdir, "transcripts")
    try:
        with benchphase.phase("build"):  # fixture, not the measured op
            table = Table.create(
                loc, TRANSCRIPT_DDL,
                bloom={"columns": ["conv_id"], "fpp": 0.01, "ndv": 10_000},
            )
            base = build_transcripts_from_events(spark, sf_dir)
            table.append_dataframe(base.repartition(16, "conv_id"))
            key = base.agg(F.min("conv_id")).first()[0]
        n_total = len(table.files(content="data"))
        out = table.scan(spark, filter=f"conv_id = '{key}'").select(
            "conv_id", "turn_idx", "role", F.unix_timestamp("ts").alias("ts_epoch")
        )
        if table.last_scan_pruned_files < n_total // 2:
            raise AssertionError(
                f"bloom pruning ineffective: {table.last_scan_pruned_files}/{n_total}"
            )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


BLOOM_POINT_LOOKUP_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE conv_id = (SELECT min(conv_id) FROM base)
"""


def q_changelog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog between snapshots: a MERGE upsert (update every
    turn_idx%7==3 row, insert one new turn per conversation) must emit
    the standard delete(old)+insert(new) pairs — and the stream must be
    INVARIANT under compaction (replace commits move bytes, not rows),
    which the query proves by compacting before reading the log."""
    _utc(spark)
    from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
    from iceberg_compaction_spark.operators.changelog import changelog_scan
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_cdc_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.repartition(8, F.xxhash64("conv_id", "turn_idx")))
        sid0 = table.current_snapshot_id
        upd = (
            table.scan(spark)
            .filter(F.col("turn_idx") % 7 == 3)
            .withColumn("text", F.concat(F.col("text"), F.lit("~v2")))
        )
        new = base.groupBy("conv_id").agg(F.max("turn_idx").alias("mx")).select(
            F.col("conv_id"),
            (F.col("mx") + 1).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.lit("appended turn").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.lit("2024-06-01 00:00:00").cast("timestamp").alias("ts"),
        )
        merge_into(table, upd.unionByName(new.select(*upd.columns)),
                   keys=["conv_id", "turn_idx"])
        # maintenance between the snapshots must not change the log
        CompactionRunner(
            spark, table, CompactionConfig(selection=SelectionStrategy.FULL)
        ).execute()
        out = changelog_scan(
            spark, table, sid0, columns=["conv_id", "turn_idx", "text"]
        ).select("conv_id", "turn_idx", "text", "_change_type")
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


def q_rename_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column rename across epochs: half the rows are
    written under the old name, the column is renamed, the other half
    under the new name — the scan must surface BOTH halves under the
    current name (Spark's name-based parquet resolution would silently
    NULL the old files without epoch-aware reads). Raises if any body
    value comes back null."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_ren_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.filter(F.col("turn_idx") % 2 == 0))
        table.rename_column("text", "body")
        late = base.filter(F.col("turn_idx") % 2 == 1).withColumnRenamed("text", "body")
        table.append_dataframe(late)
        out = table.scan(spark).select("conv_id", "turn_idx", "body")
        if out.filter(F.col("body").isNull()).count() > 0:
            raise AssertionError("rename produced NULL bodies (old epoch misread)")
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


RENAME_EVOLUTION_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, text AS body FROM base
"""


def q_type_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless type widening (turn_idx int→bigint) + a column added
    with an initial default ('lang', default 'en'): pre-evolution files
    read at the narrow type and materialize the default; post-evolution
    rows keep their own values (including genuine NULLs). Metadata-only
    — no rewrite."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_tev_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.filter(F.col("turn_idx") % 2 == 0))
        table.widen_column("turn_idx", "bigint")
        table.add_column("lang", "string", default="en")
        late = base.filter(F.col("turn_idx") % 2 == 1).select(
            "conv_id",
            (F.col("turn_idx").cast("bigint") + F.lit(1_000_000_000_000)).alias("turn_idx"),
            "role", "text", "tool", "ts",
            F.when(F.col("turn_idx") % 3 == 0, F.lit("fr")).alias("lang"),
        )
        table.append_dataframe(late)
        out = table.scan(spark).select("conv_id", "turn_idx", "lang")
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


TYPE_EVOLUTION_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, 'en' AS lang
FROM base WHERE turn_idx % 2 = 0
UNION ALL
SELECT conv_id, CAST(turn_idx AS BIGINT) + 1000000000000 AS turn_idx,
       CASE WHEN turn_idx % 3 = 0 THEN 'fr' END AS lang
FROM base WHERE turn_idx % 2 = 1
"""


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: Jaccard-similar pairs become an
    undirected graph; connected components (distributed min-label
    propagation, rounds = cluster diameter) label every clustered doc
    with its component's min id — the closure one-level dedup misses
    (A~B, B~C ⇒ one cluster even when A≁C)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, max_shingle_df=None).filter(F.col("jaccard") >= 0.2)
    comp = connected_components(pairs)
    return comp.select(F.col("node").alias("doc_id"), "component")


NEARDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE
pairs AS ({NGRAM_JACCARD_PAIRS_SQL}),
e(a, b) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(node, label) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.node
)
SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node
"""


def q_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate pushdown into the manifest: a ts-range COUNT(*) where
    whole days are answered from file metadata (record_count sums),
    only the boundary files are scanned, and out-of-range files are
    pruned. Raises unless BOTH the metadata path and pruning actually
    fired; the count must equal the SQL oracle's."""
    _utc(spark)
    from iceberg_compaction_spark.operators.stats_agg import fast_count
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_cnt_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        table.append_dataframe(
            build_transcripts_from_events(spark, sf_dir), distribute=True
        )
        res = fast_count(
            spark, table,
            f"ts >= TIMESTAMP '{_RANGE_LO}' AND ts < TIMESTAMP '{_RANGE_HI}'",
        )
        if res["metadata_files"] == 0 or res["pruned_files"] == 0:
            raise AssertionError(f"metadata count path ineffective: {res}")
        return spark.createDataFrame([(res["count"],)], "cnt bigint")
    finally:
        shutil.rmtree(loc, ignore_errors=True)


METADATA_COUNT_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT CAST(count(*) AS BIGINT) AS cnt FROM base
WHERE ts >= TIMESTAMP '{_RANGE_LO}' AND ts < TIMESTAMP '{_RANGE_HI}'
"""


def q_metadata_count_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: COUNT stays metadata-shaped under POSITION deletes —
    the per-file death toll comes from one narrow scan of the delete
    files (delete-set-sized), so a day-aligned predicate opens ZERO
    data files even though rows were deleted. Raises unless the
    metadata path fired with scanned_files == 0."""
    _utc(spark)
    from iceberg_compaction_spark.operators.stats_agg import fast_count
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_cntdel_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        table.append_dataframe(
            build_transcripts_from_events(spark, sf_dir), distribute=True
        )
        # delete every turn_idx % 5 == 2 row as POSITION deletes (the
        # logical delete set is engine-independent: turn_idx is
        # deterministic)
        hits = (
            table.scan(spark, with_hidden=True)
            .filter("turn_idx % 5 = 2")
            .select("_file", "_pos")
        )
        table.add_position_deletes(hits)
        res = fast_count(
            spark, table,
            f"ts >= TIMESTAMP '{_RANGE_LO}' AND ts < TIMESTAMP '{_RANGE_HI}'",
        )
        if res["scanned_files"] != 0:
            raise AssertionError(f"expected a 0-data-file count, got: {res}")
        if res["metadata_files"] == 0 or res["pruned_files"] == 0:
            raise AssertionError(f"metadata count path ineffective: {res}")
        return spark.createDataFrame([(res["count"],)], "cnt bigint")
    finally:
        shutil.rmtree(loc, ignore_errors=True)


METADATA_COUNT_WITH_DELETES_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT CAST(count(*) AS BIGINT) AS cnt FROM base
WHERE ts >= TIMESTAMP '{_RANGE_LO}' AND ts < TIMESTAMP '{_RANGE_HI}'
  AND turn_idx % 5 <> 2
"""


def q_update_where_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: row-level UPDATE ... SET ... WHERE, merge-on-read —
    matching rows die as position-delete tombstones, their updated
    images land in new files, one atomic commit; untouched rows are
    never rewritten. Scan-after must equal the SQL CASE projection."""
    _utc(spark)
    from iceberg_compaction_spark.operators.update_where import update_where
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_upd_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        table.append_dataframe(
            build_transcripts_from_events(spark, sf_dir), distribute=True
        )
        n_before = table.scan(spark).count()
        res = update_where(
            spark, table,
            "turn_idx % 7 = 2",
            {"text": "concat(text, '~upd')", "tool": "'edited'"},
        )
        if res["updated_rows"] == 0:
            raise AssertionError("update matched nothing")
        out = table.scan(spark)
        if out.count() != n_before:
            raise AssertionError("UPDATE changed the row count")
        # materialize outside the (about-to-vanish) warehouse
        result_dir = os.path.join(tdir, "result")
        out.select("conv_id", "turn_idx", "role", "text", "tool").write.parquet(
            result_dir
        )
        return spark.read.parquet(result_dir).orderBy("conv_id", "turn_idx")
    finally:
        shutil.rmtree(loc, ignore_errors=True)


UPDATE_WHERE_ROUNDTRIP_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role,
       CASE WHEN turn_idx % 7 = 2 THEN text || '~upd' ELSE text END AS text,
       CASE WHEN turn_idx % 7 = 2 THEN 'edited' ELSE tool END AS tool
FROM base
ORDER BY conv_id, turn_idx
"""


def q_minmax_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: MIN/MAX aggregate pushdown — answered from manifest
    bounds with ZERO data files opened (numeric + timestamp columns;
    strings always scan because parquet string stats may be truncated).
    Self-gates on scanned_files == 0."""
    _utc(spark)
    from iceberg_compaction_spark.operators.stats_agg import fast_min_max
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_mm_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        table.append_dataframe(
            build_transcripts_from_events(spark, sf_dir), distribute=True
        )
        r_ts = fast_min_max(spark, table, "ts")
        r_ti = fast_min_max(spark, table, "turn_idx")
        if r_ts["scanned_files"] != 0 or r_ti["scanned_files"] != 0:
            raise AssertionError(f"min/max pushdown ineffective: {r_ts} {r_ti}")
        # manifest ts bounds are isoformat strings: normalize to epoch
        # seconds so Spark and DuckDB hash identically
        return spark.createDataFrame(
            [(str(r_ts["min"]), str(r_ts["max"]), int(r_ti["min"]), int(r_ti["max"]))],
            "min_ts string, max_ts string, min_turn bigint, max_turn bigint",
        ).select(
            F.unix_timestamp(F.to_timestamp("min_ts")).alias("min_ts_epoch"),
            F.unix_timestamp(F.to_timestamp("max_ts")).alias("max_ts_epoch"),
            "min_turn",
            "max_turn",
        )
    finally:
        shutil.rmtree(loc, ignore_errors=True)


MINMAX_PUSHDOWN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS min_ts_epoch,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS max_ts_epoch,
       CAST(min(turn_idx) AS BIGINT) AS min_turn,
       CAST(max(turn_idx) AS BIGINT) AS max_turn
FROM base
"""


def q_bm25_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: BM25 query-relevance over the documents corpus (the
    topic-mining scorer training-data curation uses). Every document is
    returned with its rounded score so the comparison is
    order-independent."""
    _utc(spark)
    from iceberg_compaction_spark.operators.textql import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    out = bm25_scores(docs, ["table", "scan", "merge"])
    return out.select("doc_id", F.round("bm25", 4).alias("bm25_r"))


BM25_RELEVANCE_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT avg(dl) FROM dl) AS avgdl
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ('table', 'scan', 'merge') GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS bm25
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT d.doc_id, round(coalesce(s.bm25, 0.0), 4) AS bm25_r
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def q_conversation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: per-conversation curation metrics over the transcripts
    relation — turn count, role diversity, tool-call turns, mean turn
    chars, adjacent-role repeats (alternation violations)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.transcripts import conversation_stats

    tr = build_transcripts_from_events(spark, sf_dir)
    out = conversation_stats(tr)
    return out.select(
        "conv_id",
        "n_turns",
        "n_roles",
        "tool_turns",
        F.round("avg_chars", 4).alias("avg_chars_r"),
        "role_repeats",
    )


CONVERSATION_STATS_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL}),
lagged AS (
  SELECT conv_id, role, text, tool,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx ASC) AS prev_role
  FROM base)
SELECT conv_id,
       count(*) AS n_turns,
       count(DISTINCT role) AS n_roles,
       CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tool_turns,
       round(avg(length(text)), 4) AS avg_chars_r,
       CAST(coalesce(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END), 0) AS BIGINT) AS role_repeats
FROM lagged
GROUP BY conv_id
"""


def q_eq_delete_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: equality-delete consolidation (the eq twin of
    rewrite_position_deletes; reference dedups delete files per group,
    file_selection.rs:82-117). Two MERGEs leave two eq-delete files
    with overlapping keys at different seqs; consolidation collapses
    them into ONE file carrying per-row max seq — self-gated on the
    file count — and the post-consolidation MoR scan must equal the
    plain-SQL two-layer upsert (per-key seq semantics preserved)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.maintenance import (
        rewrite_equality_deletes,
    )
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_eqc_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.repartition(8, F.xxhash64("conv_id", "turn_idx")))
        u1 = (
            table.scan(spark)
            .filter(F.col("turn_idx") % 7 == 3)
            .withColumn("text", F.concat(F.lit("U1|"), F.col("text")))
        )
        merge_into(table, u1, keys=["conv_id", "turn_idx"])
        u2 = (
            table.scan(spark)
            .filter(F.col("turn_idx") % 11 == 4)
            .withColumn("text", F.concat(F.lit("U2|"), F.col("text")))
        )
        merge_into(table, u2, keys=["conv_id", "turn_idx"])
        if len(table.files(content=mf.CONTENT_EQ_DEL)) < 2:
            raise AssertionError("expected two eq-delete files pre-consolidation")
        rewrite_equality_deletes(spark, table)
        if len(table.files(content=mf.CONTENT_EQ_DEL)) != 1:
            raise AssertionError("consolidation did not leave exactly one eq file")
        out = table.scan(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


EQ_DELETE_CONSOLIDATION_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role,
       CASE WHEN turn_idx % 11 = 4 AND turn_idx % 7 = 3 THEN 'U2|U1|' || text
            WHEN turn_idx % 11 = 4 THEN 'U2|' || text
            WHEN turn_idx % 7 = 3 THEN 'U1|' || text
            ELSE text END AS text,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base
"""


def q_spec_migration_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 5: binned partition-spec migration — day-grain table with
    row-level deletes evolves to month grain; ``migrate_partition_spec``
    rewrites it in several per-bin replace commits (self-gated: >1
    migration commit, per-bin lineage rows in the checkpoint table,
    every surviving file month-pure, deletes folded away) and the
    post-migration scan must equal the plain filtered relation."""
    _utc(spark)
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.maintenance import migrate_partition_spec
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_smig_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base, max_records_per_file=2000)
        delete_where(spark, table, "turn_idx % 9 = 5")
        table.set_partition_expr("date_format(ts, 'yyyy-MM')")
        total = sum(r["size_bytes"] for r in table.files(content=mf.CONTENT_DATA))
        migrate_partition_spec(
            spark, table, group_target_size_bytes=max(1, total // 3), run_id="smig"
        )
        files = table.files(content=mf.CONTENT_DATA)
        if not files or any(len(r["partition"]) != 7 for r in files):
            raise AssertionError("migration left non-month-grain files")
        if table.files(content=mf.CONTENT_POS_DEL):
            raise AssertionError("deletes survived migration")
        ckpt = os.path.join(loc, "meta", "checkpoints", "run-smig")
        n_bins = len([f for f in os.listdir(ckpt) if f.endswith(".parquet")])
        if n_bins < 2:
            raise AssertionError(f"expected a multi-bin migration, got {n_bins}")
        out = table.scan(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


SPEC_MIGRATION_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE turn_idx % 9 <> 5
"""


def q_maintenance_lifecycle_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: the full table lifecycle through the one-call
    maintainer — ingest as small files, MERGE-update a slice, DELETE a
    slice, then ``run_maintenance`` (threshold-scored compaction +
    dangling-delete cleanup + expiry + orphan sweep + manifest
    collapse); the post-maintenance scan must equal the plain SQL
    CASE/filter relation, with all delete files folded away
    (self-gated)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.maintenance import run_maintenance
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_life_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base, max_records_per_file=1500)  # many small files
        upd = base.filter("turn_idx % 6 = 4").withColumn(
            "text", F.concat(F.col("text"), F.lit("~merged"))
        )
        merge_into(table, upd, keys=["conv_id", "turn_idx"])
        delete_where(spark, table, "turn_idx % 9 = 5")
        res = run_maintenance(spark, table, retain_last=1)
        if "compaction" not in res or res["compaction"]["bins_executed"] == 0:
            raise AssertionError(f"maintenance compacted nothing: {res}")
        man = table.manifest()
        if any(r["content"] != "data" for r in man):
            raise AssertionError("delete files survived maintenance")
        out = table.scan(spark).select(
            "conv_id", "turn_idx", "role", "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


MAINTENANCE_LIFECYCLE_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role,
       CASE WHEN turn_idx % 6 = 4 THEN text || '~merged' ELSE text END AS text,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE turn_idx % 9 <> 5
"""


def q_partition_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: partition evolution at the oracle gate — half the rows
    are written under DAY grain, the spec evolves to MONTH, the rest
    land under the new grain; the mixed-layout scan must equal the
    full relation, and bounds pruning must still fire across BOTH
    grains (self-gated)."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_pev_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.filter("turn_idx % 2 = 0"))
        table.set_partition_expr("date_format(ts, 'yyyy-MM')")
        table.append_dataframe(base.filter("turn_idx % 2 = 1"))
        # pruning still fires on the mixed layout (real ts bounds, not
        # partition names, drive it)
        table.scan(
            spark, filter=f"ts >= TIMESTAMP '{_RANGE_LO}' AND ts < TIMESTAMP '{_RANGE_HI}'"
        ).count()
        if table.last_scan_pruned_files == 0:
            raise AssertionError("mixed-grain pruning fired on zero files")
        out = table.scan(spark).select(
            "conv_id", "turn_idx", "role", "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


PARTITION_EVOLUTION_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base
"""


def q_wap_publish_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: write-audit-publish at the oracle gate — one third of
    the rows land on main, the rest arrive via TWO branch commits and
    a fast-forward publish; a second branch stages junk and is dropped
    unpublished. The final scan must equal the full base relation
    (and contain zero junk)."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_wap_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        table.append_dataframe(base.filter("turn_idx % 3 = 0"))
        table.create_branch("audit")
        table.append_dataframe(base.filter("turn_idx % 3 = 1"), branch="audit")
        table.append_dataframe(base.filter("turn_idx % 3 = 2"), branch="audit")
        # a rejected audit: staged rows must never reach main
        table.create_branch("bad")
        junk = base.filter("turn_idx % 3 = 0").withColumn(
            "text", F.lit("JUNK-REJECTED")
        )
        table.append_dataframe(junk, branch="bad")
        table.drop_branch("bad")
        table.fast_forward_main("audit")
        out = table.scan(spark).select(
            "conv_id", "turn_idx", "role", "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


WAP_PUBLISH_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base
"""


def q_rollback_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: snapshot rollback at the oracle gate — append the even
    turns, then the odds, then DELETE a slice, then roll back to the
    first snapshot: the scan must equal exactly the even-turn
    relation (rollback commits the content diff, pinned against
    concurrent commits)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_rb_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL)
        base = build_transcripts_from_events(spark, sf_dir)
        sid_even = table.append_dataframe(base.filter("turn_idx % 2 = 0"))
        table.append_dataframe(base.filter("turn_idx % 2 = 1"))
        delete_where(spark, table, "turn_idx % 10 = 0")
        table.rollback_to(sid_even)
        out = table.scan(spark).select(
            "conv_id", "turn_idx", "role", "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


ROLLBACK_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE turn_idx % 2 = 0
"""


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: corpus-wide PARAGRAPH-level exact dedup (first
    occurrence by (doc_id, position) wins; documents reassembled in
    order; sub-5-char units exempt) — the boilerplate-removal shape
    document-level dedup can't express. Paragraph boundaries are
    synthesized deterministically (literal replace) since the synthetic
    docs are single-line."""
    _utc(spark)
    from iceberg_compaction_spark.operators.dedup import paragraph_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr("replace(text, ' table ', '\n\n')").alias("text")
    )
    return paragraph_dedup(docs, min_chars=5).select("doc_id", "text")


PARAGRAPH_DEDUP_SQL = """
WITH docs AS (
  SELECT doc_id, replace(text, ' table ', e'\n\n') AS text FROM documents
),
parts AS (
  SELECT doc_id,
         unnest(string_split(text, e'\n\n')) AS para,
         unnest(generate_series(1, len(string_split(text, e'\n\n')))) AS pos
  FROM docs
),
ranked AS (
  SELECT doc_id, pos, para,
         CASE WHEN length(para) < 5 THEN 1
              ELSE row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos)
         END AS rn
  FROM parts
)
SELECT doc_id,
       coalesce(
         string_agg(para, e'\n\n' ORDER BY pos) FILTER (WHERE rn = 1), ''
       ) AS text
FROM ranked GROUP BY doc_id
"""


def q_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: per-partition row counts answered from manifest
    metadata — ZERO data files opened even with position deletes
    applied (death toll from the narrow delete-file scan). The
    'rows per day' dashboard as a metadata query."""
    _utc(spark)
    from iceberg_compaction_spark.operators.stats_agg import fast_partition_counts
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_pc_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        table.append_dataframe(
            build_transcripts_from_events(spark, sf_dir), distribute=True
        )
        hits = (
            table.scan(spark, with_hidden=True)
            .filter("turn_idx % 5 = 2")
            .select("_file", "_pos")
        )
        table.add_position_deletes(hits)
        res = fast_partition_counts(spark, table)
        if res["scanned_files"] != 0 or res["metadata_files"] == 0:
            raise AssertionError(f"partition-count pushdown ineffective: {res}")
        return spark.createDataFrame(
            sorted(res["counts"].items()), "part string, cnt bigint"
        )
    finally:
        shutil.rmtree(loc, ignore_errors=True)


PARTITION_COUNTS_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT strftime(ts, '%Y-%m-%d') AS part, CAST(count(*) AS BIGINT) AS cnt
FROM base WHERE turn_idx % 5 <> 2
GROUP BY 1
"""


def q_analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: ANALYZE TABLE — per-column rows/nulls/NDV persisted to
    table metadata and surfaced as the .column_stats metadata table
    (exact mode here so DuckDB can verify; production uses one-pass
    HyperLogLog)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.analyze import (
        analyze_table,
        column_stats_table,
    )
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_an_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        table.append_dataframe(
            build_transcripts_from_events(spark, sf_dir), distribute=True
        )
        analyze_table(
            spark, table, ["conv_id", "turn_idx", "role", "tool"], exact=True
        )
        # built from table METADATA (literal rows) — no file dependency,
        # safe to return lazily after the warehouse is removed
        return column_stats_table(spark, table).select(
            F.col("column").alias("col_name"),
            F.col("rows").alias("n_rows"),
            F.col("nulls").alias("n_nulls"),
            F.col("ndv").alias("n_distinct"),
        )
    finally:
        shutil.rmtree(loc, ignore_errors=True)


ANALYZE_COLUMN_STATS_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT 'conv_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(conv_id) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_distinct FROM base
UNION ALL
SELECT 'role', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(role) AS BIGINT),
       CAST(count(DISTINCT role) AS BIGINT) FROM base
UNION ALL
SELECT 'tool', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(tool) AS BIGINT),
       CAST(count(DISTINCT tool) AS BIGINT) FROM base
UNION ALL
SELECT 'turn_idx', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(turn_idx) AS BIGINT),
       CAST(count(DISTINCT turn_idx) AS BIGINT) FROM base
"""


CHANGELOG_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, text, _change AS _change_type FROM (
  SELECT conv_id, turn_idx, text || '~v2' AS text, 'insert' AS _change
  FROM base WHERE turn_idx % 7 = 3
  UNION ALL
  SELECT conv_id, CAST(max(turn_idx) + 1 AS INT), 'appended turn', 'insert'
  FROM base GROUP BY conv_id
  UNION ALL
  SELECT conv_id, turn_idx, text, 'delete' FROM base WHERE turn_idx % 7 = 3
) u(conv_id, turn_idx, text, _change)
"""


# ======================================================================
# round 6 additions


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation: PII redaction over documents (emails, phone
    numbers, dotted-quad IPs → placeholders) with per-rule match
    counts. Deterministic PII is injected from doc fields so the
    operator is exercised non-vacuously at every SF; patterns are the
    RE2/Java common subset so DuckDB runs the byte-identical regexes.
    Map-only: one projection, JVM regex in whole-stage codegen, zero
    shuffles (reference contrast: the engine has no text ops at all —
    this is §2.12 pipeline surface)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.textql import redact_pii

    docs = _t(spark, sf_dir, "documents")
    inj = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-867-5309 from 10.0.0."),
            (F.col("doc_id") % 255).cast("string"),
        ).alias("text"),
    )
    out = redact_pii(inj)
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.md5("text_redacted").alias("redacted_md5"),
    )


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

PII_REDACTION_SQL = f"""
WITH inj AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-867-5309 from 10.0.0.'
              || CAST(doc_id % 255 AS VARCHAR) AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
       len(regexp_extract_all(text, '{_PII_IP}')) AS n_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g')) AS redacted_md5
FROM inj
"""


def q_datasource_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: the connector's Arrow WRITE path, driver-proven — a
    day-partitioned table is populated ENTIRELY through
    ``df.write.format("icemaint")`` (caller-derived ``_part``,
    per-task fanout, one atomic append commit) and read back through
    the connector; the relation must equal the plain SQL lineage.
    Self-gated against the native scan and partition purity."""
    _utc(spark)
    from iceberg_compaction_spark.sources import manifest as mf
    from iceberg_compaction_spark.sources.datasource import register
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    register(spark)
    tdir = tempfile.mkdtemp(prefix="icemaint_dswrite_")
    loc = os.path.join(tdir, "transcripts")
    try:
        table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
        base = build_transcripts_from_events(spark, sf_dir)
        expr = table.meta["partition"]["expr"]
        (
            # the writer type-checks against the table DDL (timestamp =
            # LTZ); events parquet infers ts as NTZ — cast explicitly
            base.withColumn("ts", F.col("ts").cast("timestamp"))
            .withColumn("_part", F.expr(expr))
            .repartition(4)
            .write.format("icemaint")
            .mode("append")
            .save(loc)
        )
        table = Table.load(loc)
        files = table.files(content=mf.CONTENT_DATA)
        if not files or any(not r["partition"] for r in files):
            raise AssertionError("fanout wrote a partition-impure or empty file set")
        via_ds = spark.read.format("icemaint").load(loc)
        out = via_ds.select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        got = spark.read.parquet(result_dir)
        if got.count() != table.scan(spark).count():
            raise AssertionError("connector write/read diverges from native scan")
        return got
    finally:
        shutil.rmtree(loc, ignore_errors=True)


DATASOURCE_WRITE_ROUNDTRIP_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base
"""


# ======================================================================
# round 6: substring-level duplicate-span detection / trimming
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: cross-document duplicate PASSAGE detection — maximal
    token spans covered by 4-grams occurring in ≥2 distinct documents
    (the distributed re-expression of suffix-array substring dedup,
    Lee et al. 2022). Gram-key shuffle → count-distinct → equi-join →
    gaps-and-islands window; no cross product, no collect."""
    _utc(spark)
    from iceberg_compaction_spark.operators.spans import duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    out = duplicate_spans(docs, n=4, min_docs=2)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_len").cast("long").alias("span_len"),
    )


DUPLICATE_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
g AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+3], ' ') AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
h AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
m AS (
  SELECT doc_id, pos,
         max(pos + 3) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM h),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM m)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 3 AS BIGINT) AS span_end,
       CAST(max(pos) + 3 - min(pos) + 1 AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, isl
"""


def q_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: the destructive half of substring dedup — rewrite each
    document with its duplicated spans removed; per-doc token
    accounting plus the md5 of the trimmed text (value-parity proof of
    the rewritten corpus without shipping full texts to the oracle
    compare)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.spans import trim_duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    out = trim_duplicate_spans(docs, n=4, min_docs=2)
    return out.select(
        "doc_id", "n_tokens", "n_dup_tokens", F.md5("text_trimmed").alias("trimmed_md5")
    )


SPAN_TRIM_SQL = f"""
WITH toks AS (SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
g AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+3], ' ') AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
h AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
cov AS (SELECT DISTINCT doc_id, pos + k AS cp
        FROM h, UNNEST(generate_series(0, 3)) AS v(k)),
tokpos AS (
  SELECT doc_id, i, t[i] AS tok
  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)),
kept AS (
  SELECT tp.doc_id, tp.i, tp.tok
  FROM tokpos tp LEFT JOIN cov c ON tp.doc_id = c.doc_id AND tp.i - 1 = c.cp
  WHERE c.cp IS NULL),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS txt, count(*) AS nk
  FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - coalesce(a.nk, 0) AS BIGINT) AS n_dup_tokens,
       md5(coalesce(a.txt, '')) AS trimmed_md5
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


# ======================================================================
# round 6: temperature mixture + shard export
def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: temperature-α domain rebalancing — keep fractions
    derived from the corpus's own (deliberately skewed) domain
    distribution, f_d = base·sqrt(n_max/n_d) capped at 1, applied via
    the deterministic md5 threshold. The documents table's ``source``
    is uniform by construction, so the domain here is a derived skew
    (60/20/10/10) — the operator's rebalancing is what's under test."""
    _utc(spark)
    from iceberg_compaction_spark.operators.mixing import mixture_resample

    docs = _t(spark, sf_dir, "documents").withColumn(
        "domain",
        F.when(F.col("doc_id") % 10 < 6, "web")
        .when(F.col("doc_id") % 10 < 8, "books")
        .when(F.col("doc_id") % 10 == 8, "code")
        .otherwise("wiki"),
    )
    out = mixture_resample(docs, source_col="domain", alpha=0.5, base_fraction=0.5)
    return out.select("doc_id", "domain", "lang")


MIXTURE_RESAMPLE_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 < 6 THEN 'web'
              WHEN doc_id % 10 < 8 THEN 'books'
              WHEN doc_id % 10 = 8 THEN 'code'
              ELSE 'wiki' END AS domain
  FROM documents),
c AS (SELECT domain, count(*) AS n FROM d GROUP BY domain),
f AS (
  SELECT domain,
         round(least(1.0, 0.5 * sqrt((SELECT max(n) FROM c) / CAST(n AS DOUBLE))), 6) AS kf
  FROM c)
SELECT doc_id, domain, lang
FROM d JOIN f USING (domain)
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      < CAST(floor(kf * 4294967296.0) AS BIGINT)
"""


def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: deterministic global shuffle for training export —
    every row assigned a shard and a dense within-shard rank, both
    pure functions of (seed, doc_id): identical at any cluster size,
    which is what checkpointed training resume requires."""
    _utc(spark)
    from iceberg_compaction_spark.operators.mixing import export_shards

    docs = _t(spark, sf_dir, "documents")
    out = export_shards(docs, n_shards=8, seed="train-v1")
    return out.select("shard", "shard_rank", "doc_id")


EXPORT_SHARDS_SQL = """
WITH k AS (
  SELECT doc_id,
         ('0x' || substr(md5('train-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS sort_key
  FROM documents),
s AS (SELECT doc_id, sort_key, CAST(sort_key % 8 AS INTEGER) AS shard FROM k)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY sort_key, doc_id) AS BIGINT) AS shard_rank,
       doc_id
FROM s
"""


# ======================================================================
# round 6: hashed linear classifier + C4-style line cleaning
def q_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: fasttext-style quality-model scoring over hashed
    bag-of-words features, map-only in built-ins. The integer-milli
    accumulator makes the score engine-exact (FP addition order never
    enters); weights here are hash-derived so the oracle needs no
    side-channel model table — a trained model plugs into the same
    operator as a broadcast array literal."""
    _utc(spark)
    from iceberg_compaction_spark.operators.textql import hashed_linear_score

    docs = _t(spark, sf_dir, "documents")
    out = hashed_linear_score(docs, dim=256)
    # the float `score` stays operator-side: it is a single division of
    # the integer fields below, and its 6-decimal rounding can land on
    # an exact decimal half (e.g. 1047/16000) where engines' tie rules
    # diverge — the oracle compares the exact integers instead
    return out.select("doc_id", "n_toks", "score_milli_sum", "label")


HASHED_CLASSIFIER_SQL = f"""
WITH toks AS (SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
tp AS (SELECT doc_id, t[i] AS tok
       FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)),
b AS (SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256 AS bucket
      FROM tp),
s AS (SELECT doc_id,
             CAST(sum((bucket * 2654435761) % 1000 - 500) AS BIGINT) AS milli
      FROM b GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_toks,
       s.milli AS score_milli_sum,
       s.milli > 0 AS label
FROM toks t JOIN s USING (doc_id)
"""


def q_line_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: C4-style line-rule cleaning (Raffel et al. 2020 §2.2)
    — min-words, natural-language marker, and blocklist rules per
    line, document rebuilt from survivors. The synthetic corpus has no
    newlines, so lines are fixed 8-token windows; the rule engine is
    the operator under test. Map-only built-ins, zero shuffles."""
    _utc(spark)
    from iceberg_compaction_spark.operators.textql import clean_lines

    docs = _t(spark, sf_dir, "documents")
    out = clean_lines(docs, line_tokens=8, min_words=5)
    return out.select(
        "doc_id", "n_lines", "n_kept_lines", F.md5("text_clean").alias("clean_md5")
    )


LINE_CLEANING_SQL = f"""
WITH toks AS (SELECT doc_id, {_NORM_SQL.format(c='text')} AS t FROM documents),
ln AS (
  SELECT doc_id, i, t[(i * 8 + 1):(i * 8 + 8)] AS line
  FROM toks,
       UNNEST(generate_series(0, CAST(ceil(len(t) / 8.0) AS BIGINT) - 1)) AS u(i)),
good AS (
  SELECT doc_id, i, line FROM ln
  WHERE len(line) >= 5
    AND list_has_any(line, ['the', 'a'])
    AND NOT list_has_any(line, ['slow'])),
agg AS (
  SELECT doc_id, count(*) AS nk,
         string_agg(array_to_string(line, ' '), ' ' ORDER BY i) AS txt
  FROM good GROUP BY doc_id)
SELECT t.doc_id,
       CAST(ceil(len(t.t) / 8.0) AS BIGINT) AS n_lines,
       CAST(coalesce(a.nk, 0) AS BIGINT) AS n_kept_lines,
       md5(coalesce(a.txt, '')) AS clean_md5
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


def q_bucket_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: Iceberg-style bucket[16] hidden partitioning with
    TRANSFORM PREDICATE PROJECTION (plans/transforms.py): the
    ``conv_id = key`` point lookup is projected through
    ``pmod(hash(conv_id), 16)`` to the exact bucket value, pruning
    every other bucket's files — co-located key access without the
    caller naming the partition column. Self-gates on ≥half the files
    pruned; values checked against the plain SQL lineage (projection
    is layered under the residual filter, so it can never change the
    result)."""
    _utc(spark)
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table, bucket_partition_spec

    tdir = tempfile.mkdtemp(prefix="icemaint_bucket_")
    loc = os.path.join(tdir, "transcripts")
    try:
        with benchphase.phase("build"):  # fixture, not the measured op
            table = Table.create(
                loc, TRANSCRIPT_DDL, partition=bucket_partition_spec("conv_id", 16)
            )
            base = build_transcripts_from_events(spark, sf_dir)
            table.append_dataframe(base.repartition(4))
            key = base.agg(F.max("conv_id")).first()[0]
        n_total = len(table.files(content="data"))
        out = table.scan(spark, filter=f"conv_id = '{key}'").select(
            "conv_id", "turn_idx", "role", F.unix_timestamp("ts").alias("ts_epoch")
        )
        if table.last_scan_pruned_files < n_total // 2:
            raise AssertionError(
                f"bucket projection ineffective: {table.last_scan_pruned_files}/{n_total}"
            )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


BUCKET_PRUNED_LOOKUP_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base WHERE conv_id = (SELECT max(conv_id) FROM base)
"""


def q_filtered_rewrite_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: filtered rewrite — Iceberg's
    ``rewrite_data_files(filter => ...)``, `CompactionConfig.row_filter`
    (cf. reference full-table selection, file_selection.rs:29): a
    day-partitioned table's recent-day files are compacted in place
    while older files stay untouched. Selection is bounds-based via the
    same conservative stats evaluator the scan pruner uses, and
    matching files are rewritten WHOLE — the filter chooses candidates,
    it never drops rows. Self-gated: the rewrite touches exactly the
    files whose day >= the cutoff (>0 and < all), every untouched file
    survives, every matching file is replaced; the post-rewrite full
    scan must equal the plain base relation."""
    _utc(spark)
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL, day_partition_spec
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_rowf_")
    loc = os.path.join(tdir, "transcripts")
    try:
        with benchphase.phase("build"):  # fixture, not the measured op
            table = Table.create(loc, TRANSCRIPT_DDL, partition=day_partition_spec())
            base = build_transcripts_from_events(spark, sf_dir)
            # two appends -> two files per day partition at ANY scale,
            # so in-scope bins are never single-file no-op skips
            table.append_dataframe(base.filter("turn_idx % 2 = 0"))
            table.append_dataframe(base.filter("turn_idx % 2 = 1"))
        before = {f["path"]: f["partition"] for f in table.files(content="data")}
        cfg = CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.SINGLE,
            row_filter=f"ts >= TIMESTAMP '{_RANGE_LO}'",
        )
        res = CompactionRunner(spark, table, cfg).execute()
        cut_day = _RANGE_LO[:10]
        matching = {p for p, day in before.items() if day >= cut_day}
        if not (0 < len(matching) < len(before)):
            raise AssertionError(
                f"fixture degenerate: {len(matching)}/{len(before)} files match"
            )
        if res.input_files != len(matching):
            raise AssertionError(
                f"row_filter selected {res.input_files} files, "
                f"bounds say exactly {len(matching)} match"
            )
        after = {f["path"] for f in table.files(content="data")}
        untouched = set(before) - matching
        if not untouched <= after:
            raise AssertionError("filtered rewrite touched out-of-scope files")
        if matching & after:
            raise AssertionError("matching files survived the rewrite")
        out = table.scan(spark).select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            F.unix_timestamp("ts").alias("ts_epoch"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


FILTERED_REWRITE_SCAN_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, role, text, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM base
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: incremental dedup against a persisted LSH index — the
    rolling-ingest shape: even-doc_id documents are the accumulated
    corpus (only their ``minhash_index`` band signatures are kept),
    odd-doc_id documents are today's increment. The increment is
    deduped against itself and the index by ``(band, signature)``
    equi-joins — the corpus text is never rescanned. Round 7: the index
    lives in a ``bucket[16]``-partitioned ``Table`` and the probe
    restricts its scan to the increment's signature buckets
    (``incremental_minhash_dedup_indexed``) — metadata-first file
    selection like the reference's planner
    (crates/planner/src/file_selection.rs:205-217). Self-gated: some
    increment docs must hit the index or each other, the index delta
    must be exactly bands rows per survivor, and the probe's pruned-
    file count must equal EXACTLY the index files outside the
    increment's bucket set."""
    _utc(spark)
    import shutil

    from iceberg_compaction_spark.operators.dedup import (
        incremental_minhash_dedup_indexed,
        minhash_index,
    )
    from iceberg_compaction_spark.sources.table import (
        Table,
        bucket_partition_spec,
    )

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    tdir = tempfile.mkdtemp(prefix="icemaint_incdedup_")
    try:
        with benchphase.phase("build"):  # the corpus index pre-exists
            # in production — building it here is fixture cost, not the op
            idx_table = Table.create(
                os.path.join(tdir, "minhash_index"),
                "doc_id BIGINT, band INT, signature STRING",
                partition=bucket_partition_spec("signature", 16),
            )
            idx_table.append_dataframe(minhash_index(old, bands=4), distribute=True)
        survivors, new_index = incremental_minhash_dedup_indexed(
            spark, new, idx_table, bands=4
        )
        n_new, n_surv = new.count(), survivors.count()
        if not (0 < n_surv < n_new):
            raise AssertionError(f"degenerate increment: {n_surv}/{n_new} survive")
        if new_index.count() != 4 * n_surv:
            raise AssertionError("index delta is not bands rows per survivor")
        pvals = idx_table.last_probe_partition_values
        if pvals is None:
            raise AssertionError("bucket projection did not engage on the probe")
        files = idx_table.files(content="data")
        outside = sum(
            1 for f in files if f["partition"] and f["partition"] not in pvals
        )
        if idx_table.last_scan_pruned_files != outside:
            raise AssertionError(
                f"probe pruned {idx_table.last_scan_pruned_files} index files, "
                f"bucket accounting says exactly {outside} of {len(files)}"
            )
        return survivors.select("doc_id")
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


INCREMENTAL_DEDUP_SQL = f"""
WITH bands AS ({MINHASH_BAND_SIGNATURES_SQL}),
new_b AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
old_b AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
hit AS (
  SELECT DISTINCT n.doc_id
  FROM new_b n JOIN old_b o ON n.band = o.band AND n.signature = o.signature
  UNION
  SELECT DISTINCT n.doc_id
  FROM new_b n JOIN new_b m
    ON n.band = m.band AND n.signature = m.signature AND m.doc_id < n.doc_id
)
SELECT doc_id FROM documents
WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM hit)
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: as-of join — each click event picks up the latest
    at-or-before view event of the same user (`operators/asof.py`,
    the union-tag + running-window form: ONE shuffle on user_id, no
    pairwise join). The oracle is DuckDB's native ASOF LEFT JOIN.
    Self-gated: both matched and never-matched clicks must exist."""
    _utc(spark)
    from iceberg_compaction_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    views = (
        ev.filter("event_type = 'view'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(clicks, views, by="user_id")
    # materialize ONCE (round 9, the strict query's pattern): the
    # gates and the returned relation read parquet instead of
    # re-running the union-tag window per count
    tdir = tempfile.mkdtemp(prefix="icemaint_asof_")
    out.write.parquet(os.path.join(tdir, "out"))
    out = spark.read.parquet(os.path.join(tdir, "out"))
    gate = out.agg(
        F.count(F.col("ts_r")).alias("n_match"),
        F.sum(F.col("ts_r").isNull().cast("int")).alias("n_miss"),
    ).first()
    n_match, n_miss = gate["n_match"], gate["n_miss"] or 0
    if not (n_match > 0 and n_miss > 0):
        raise AssertionError(f"degenerate as-of fixture: {n_match} matched, {n_miss} missed")
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.unix_timestamp("ts_r").alias("view_ts_epoch"),
        F.col("view_event_id_r").alias("view_event_id"),
    )


ASOF_JOIN_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
views AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_epoch,
       CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts_epoch,
       v.view_event_id AS view_event_id
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: range join — each click event matched to every 6-hour
    error window of the same user it falls inside
    (`operators/intervals.py`, the binning form: intervals explode to
    overlapped bins, points map to ONE bin, equi-join + exact filter —
    never a nested-loop join). Oracle: a plain DuckDB inequality join
    (BETWEEN), executed natively by its IEJoin."""
    _utc(spark)
    from iceberg_compaction_spark.operators.intervals import range_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    errors = ev.filter("event_type = 'error'").select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end"),
        F.col("event_id").alias("err_id"),
    )
    out = range_join(clicks, errors, by="user_id", bin_width=21600.0)
    # materialize ONCE (round 9): the emptiness gate previously went
    # through out.rdd (a full internal-row -> Python conversion of the
    # plan, guide §1.4) and the returned relation re-ran the join
    tdir = tempfile.mkdtemp(prefix="icemaint_range_")
    out.write.parquet(os.path.join(tdir, "out"))
    out = spark.read.parquet(os.path.join(tdir, "out"))
    if out.isEmpty():
        raise AssertionError("degenerate range-join fixture: no pairs")
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.col("err_id_r").alias("err_event_id"),
        F.unix_timestamp("start_r").alias("err_start_epoch"),
    )


RANGE_JOIN_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
errors AS (
  SELECT user_id, ts AS estart, ts + INTERVAL 6 HOUR AS eend, event_id AS err_id
  FROM events WHERE event_type = 'error')
SELECT c.event_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_epoch,
       e.err_id AS err_event_id,
       CAST(floor(epoch(e.estart)) AS BIGINT) AS err_start_epoch
FROM clicks c JOIN errors e
  ON c.user_id = e.user_id AND c.ts BETWEEN e.estart AND e.eend
"""


def q_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: incremental materialized rollup (the hypertable
    continuous-aggregate shape, `operators/rollup.py`): events land in
    two appends; each `refresh_rollup` folds ONLY the newly appended
    files into per-event-type count/sum/min/max state and REPLACE-
    commits the (tiny) rollup table. Self-gated: the second refresh's
    delta is exactly the second append, and the two deltas partition
    the input. The final state must equal the full-recompute SQL."""
    _utc(spark)
    from iceberg_compaction_spark.operators.rollup import refresh_rollup
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_roll_")
    src_loc = os.path.join(tdir, "src")
    roll_loc = os.path.join(tdir, "roll")
    try:
        ev_ddl = (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        aggs = {
            "cnt": ("count", ""),
            "sum_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        }
        ev = _t(spark, sf_dir, "events")
        with benchphase.phase("build"):  # warehouse fixture, not the op
            src = Table.create(src_loc, ev_ddl)
            roll = Table.create(
                roll_loc,
                "event_type STRING, cnt BIGINT, sum_value DOUBLE, "
                "min_value DOUBLE, max_value DOUBLE",
            )
            src.append_dataframe(ev.filter("event_id % 2 = 0").select(cols))
        r1 = refresh_rollup(spark, src, roll, ["event_type"], aggs)
        with benchphase.phase("build"):
            src.append_dataframe(ev.filter("event_id % 2 = 1").select(cols))
        r2 = refresh_rollup(spark, src, roll, ["event_type"], aggs)
        n_total = ev.count()
        if not (0 < r2["delta_rows"] < n_total):
            raise AssertionError(f"refresh was not incremental: {r2}")
        if r1["delta_rows"] + r2["delta_rows"] != n_total:
            raise AssertionError("refresh deltas do not partition the input")
        out = roll.scan(spark).select(
            "event_type",
            "cnt",
            F.round("sum_value", 3).alias("sum_value"),
            "min_value",
            "max_value",
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(src_loc, ignore_errors=True)
        shutil.rmtree(roll_loc, ignore_errors=True)


ROLLUP_REFRESH_SQL = """
SELECT event_type,
       COUNT(*) AS cnt,
       ROUND(SUM(value), 3) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY event_type
"""


def q_rollup_refresh_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: CHANGELOG-INCREMENTAL rollup refresh
    (`operators/rollup.py::refresh_rollup` with invertible states) —
    a DELETE WHERE + a MERGE land on the source after the first
    refresh; with count/sum/hist aggregates the second refresh folds
    the signed row-level changelog instead of recomputing (round 7
    recomputed on ANY row-set change). Deletes decrement the count,
    the sum, and the histogram bins exactly. Self-gated: the second
    refresh's mode must be incremental_changelog with a bounded
    nonzero delta; the relation is the rollup state (hist exploded),
    which the oracle recomputes from the source operations alone."""
    _utc(spark)
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.operators.rollup import refresh_rollup
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_rollc_")
    try:
        ev_ddl = (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        aggs = {
            "cnt": ("count", ""),
            "sv": ("sum", "value"),
            "h": ("hist", "value", (0.0, 25.0, 16)),
        }
        ev = _t(spark, sf_dir, "events")
        n_total = ev.count()
        with benchphase.phase("build"):
            src = Table.create(os.path.join(tdir, "src"), ev_ddl)
            roll = Table.create(
                os.path.join(tdir, "roll"),
                "event_type STRING, cnt BIGINT, sv DOUBLE, h ARRAY<BIGINT>",
            )
            src.append_dataframe(ev.select(cols))
        r1 = refresh_rollup(spark, src, roll, ["event_type"], aggs)
        if r1["mode"] != "incremental":
            raise AssertionError(f"first refresh not incremental: {r1}")
        with benchphase.phase("build"):  # source churn is the scenario
            # fixture; the measured op is the changelog-delta refresh
            delete_where(spark, src, "value < 10.0")
            merge_into(
                src,
                ev.filter("event_id % 100 = 0")
                .withColumn("value", F.col("value") + 1000.0)
                .select(cols),
                ["event_id"],
            )
        r2 = refresh_rollup(spark, src, roll, ["event_type"], aggs)
        if r2["mode"] != "incremental_changelog":
            raise AssertionError(f"refresh did not fold the changelog: {r2}")
        if not (0 < r2["delta_rows"] < 3 * n_total):
            raise AssertionError(f"unreasonable changelog delta: {r2}")
        out = roll.scan(spark).select(
            "event_type",
            "cnt",
            F.round("sv", 3).alias("sv_r"),
            F.posexplode("h").alias("bin", "bin_cnt"),
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(os.path.join(tdir, "src"), ignore_errors=True)
        shutil.rmtree(os.path.join(tdir, "roll"), ignore_errors=True)


ROLLUP_REFRESH_CHANGELOG_SQL = """
WITH cur AS (
  SELECT event_type,
         CASE WHEN event_id % 100 = 0 THEN value + 1000.0 ELSE value END AS v
  FROM events
  WHERE value >= 10.0 OR event_id % 100 = 0),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, ROUND(SUM(v), 3) AS sv_r
  FROM cur GROUP BY event_type),
binned AS (
  SELECT event_type, least(15, greatest(0, CAST(floor(v / 25.0) AS INTEGER))) AS b
  FROM cur WHERE v IS NOT NULL),
bins AS (
  SELECT a.event_type, g.b
  FROM (SELECT DISTINCT event_type FROM cur) a, generate_series(0, 15) AS g(b))
SELECT agg.event_type, agg.cnt, agg.sv_r,
       CAST(bins.b AS INTEGER) AS bin,
       CAST(count(binned.b) AS BIGINT) AS bin_cnt
FROM bins
JOIN agg ON agg.event_type = bins.event_type
LEFT JOIN binned
  ON binned.event_type = bins.event_type AND binned.b = bins.b
GROUP BY 1, 2, 3, 4
"""


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: FORWARD as-of join — each click picks up the EARLIEST
    at-or-after purchase of the same user (`operators/asof.py`
    direction="forward": same union-tag window scanned descending).
    Oracle: DuckDB ASOF LEFT JOIN with `<=`."""
    _utc(spark)
    from iceberg_compaction_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    buys = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("buy_event_id"))
    )
    out = asof_join(clicks, buys, by="user_id", direction="forward")
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.unix_timestamp("ts_r").alias("buy_ts_epoch"),
        F.col("buy_event_id_r").alias("buy_event_id"),
    )


ASOF_JOIN_FORWARD_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
buys AS (
  SELECT user_id, ts, max(event_id) AS buy_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_epoch,
       CAST(floor(epoch(v.ts)) AS BIGINT) AS buy_ts_epoch,
       v.buy_event_id AS buy_event_id
FROM clicks c ASOF LEFT JOIN buys v
  ON c.user_id = v.user_id AND c.ts <= v.ts
"""


def q_asof_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7: the HOT-KEY as-of form in the FORWARD direction
    (`operators/asof.py::asof_join_salted`): the same clicks→next-
    purchase lookup as `asof_join_forward`, but computed through
    (user, 6h-time-bucket) windows with a cross-bucket carry — the
    recipe for a key whose history exceeds one core. Must be
    row-identical to the plain form, so it shares the DuckDB ASOF
    oracle. Self-gated: the bucket width must actually split the
    timeline (>1 bucket) and some match must cross a bucket boundary
    (the carry path is exercised, not just stage 1)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.asof import asof_join, asof_join_salted

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    buys = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("buy_event_id"))
    )
    out = asof_join_salted(
        clicks, buys, by="user_id", bucket_width=21600.0, direction="forward"
    )
    # materialize ONCE (round 9, the strict query's pattern): the
    # carry gate, the row-count gate and the returned relation read
    # parquet instead of re-running the three-stage salted pipeline
    tdir = tempfile.mkdtemp(prefix="icemaint_asofsalt_")
    out.write.parquet(os.path.join(tdir, "out"))
    out = spark.read.parquet(os.path.join(tdir, "out"))
    n_buckets = clicks.select(
        F.floor(F.col("ts").cast("timestamp").cast("double") / 21600.0)
    ).distinct().count()
    if n_buckets < 2:
        raise AssertionError(f"bucket width does not split the timeline: {n_buckets}")
    cross = out.filter(
        F.col("ts_r").isNotNull()
        & (
            F.floor(F.col("ts").cast("timestamp").cast("double") / 21600.0)
            != F.floor(F.col("ts_r").cast("timestamp").cast("double") / 21600.0)
        )
    ).count()
    if cross == 0:
        raise AssertionError("no match crossed a bucket boundary: carry untested")
    plain_n = asof_join(clicks, buys, by="user_id", direction="forward").count()
    if out.count() != plain_n:
        raise AssertionError("salted form row count differs from plain as-of")
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.unix_timestamp("ts_r").alias("buy_ts_epoch"),
        F.col("buy_event_id_r").alias("buy_event_id"),
    )


ASOF_JOIN_SALTED_SQL = ASOF_JOIN_FORWARD_SQL


def q_asof_join_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: STRICT-match as-of join (pandas ``merge_asof``
    ``allow_exact_matches=False``), driven through the SALTED form —
    the round-7 gap (`operators/asof.py::asof_join_salted` lacked the
    option). Each click looks up the user's PREVIOUS click: the right
    side is the clicks themselves, so EVERY left row has an equal-ts
    candidate the strict comparison must skip (the events data has no
    natural cross-type ts collisions). Self-gated: no match may be at
    or after the left ts, some matches must exist, the bucket width
    must split the timeline, and some match must cross a bucket
    boundary (carry path exercised under strictness)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.asof import asof_join_salted

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    prev = clicks.groupBy("user_id", "ts").agg(
        F.max("event_id").alias("prev_click_id")
    )
    width = 21600.0
    out = asof_join_salted(
        clicks, prev, by="user_id", bucket_width=width,
        direction="backward", allow_exact_matches=False,
    )
    # materialize ONCE (the repo's write+reread pattern): the gates and
    # the returned relation then read parquet instead of re-running the
    # salted pipeline per count
    tdir = tempfile.mkdtemp(prefix="icemaint_asofs_")
    out.write.parquet(os.path.join(tdir, "wide"))
    w = spark.read.parquet(os.path.join(tdir, "wide"))
    if w.filter(F.col("ts_r") >= F.col("ts")).count() != 0:
        raise AssertionError("strict as-of matched an at-or-after right row")
    bkt_l = F.floor(F.col("ts").cast("timestamp").cast("double") / width)
    bkt_r = F.floor(F.col("ts_r").cast("timestamp").cast("double") / width)
    n_match = w.filter(F.col("ts_r").isNotNull())
    if n_match.count() == 0:
        raise AssertionError("degenerate fixture: no strict match at all")
    if n_match.filter(bkt_l != bkt_r).count() == 0:
        raise AssertionError("no match crossed a bucket boundary: carry untested")
    return w.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.unix_timestamp("ts_r").alias("prev_ts_epoch"),
        F.col("prev_click_id_r").alias("prev_click_id"),
    )


ASOF_JOIN_STRICT_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
prev AS (
  SELECT user_id, ts, max(event_id) AS prev_click_id
  FROM clicks GROUP BY user_id, ts)
SELECT c.event_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_epoch,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS prev_ts_epoch,
       p.prev_click_id AS prev_click_id
FROM clicks c ASOF LEFT JOIN prev p
  ON c.user_id = p.user_id AND c.ts > p.ts
"""


def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7: NEAREST as-of join (pandas ``merge_asof`` semantics) —
    each click picks the temporally CLOSEST view of the same user,
    ties to the at-or-before side. One shuffle: both directional fills
    run as two windows over the same hash partitioning
    (`operators/asof.py::_asof_join_nearest`). Oracle: two DuckDB ASOF
    joins + a CASE on the distances. Self-gated: both sides must win
    somewhere (some row matched backward-closer, some forward-closer),
    so the CASE is exercised in both branches."""
    _utc(spark)
    from iceberg_compaction_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    views = (
        ev.filter("event_type = 'view'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(clicks, views, by="user_id", direction="nearest")
    # materialize ONCE (round 9, the strict query's pattern): both
    # direction gates and the returned relation read parquet
    tdir = tempfile.mkdtemp(prefix="icemaint_asofn_")
    out.write.parquet(os.path.join(tdir, "out"))
    out = spark.read.parquet(os.path.join(tdir, "out"))
    gate = out.agg(
        F.sum((F.col("ts_r") <= F.col("ts")).cast("int")).alias("n_back"),
        F.sum((F.col("ts_r") > F.col("ts")).cast("int")).alias("n_fwd"),
    ).first()
    n_back, n_fwd = gate["n_back"] or 0, gate["n_fwd"] or 0
    if not (n_back > 0 and n_fwd > 0):
        raise AssertionError(
            f"degenerate nearest fixture: {n_back} backward, {n_fwd} forward wins"
        )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.unix_timestamp("ts_r").alias("view_ts_epoch"),
        F.col("view_event_id_r").alias("view_event_id"),
    )


ASOF_JOIN_NEAREST_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
views AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
b AS (
  SELECT c.event_id, v.ts AS vts, v.view_event_id AS vid
  FROM clicks c ASOF LEFT JOIN views v
    ON c.user_id = v.user_id AND c.ts >= v.ts),
f AS (
  SELECT c.event_id, v.ts AS vts, v.view_event_id AS vid
  FROM clicks c ASOF LEFT JOIN views v
    ON c.user_id = v.user_id AND c.ts <= v.ts)
SELECT c.event_id, c.user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_epoch,
       CAST(floor(epoch(CASE WHEN f.vts IS NULL
                 OR (b.vts IS NOT NULL
                     AND epoch(c.ts) - epoch(b.vts) <= epoch(f.vts) - epoch(c.ts))
            THEN b.vts ELSE f.vts END)) AS BIGINT) AS view_ts_epoch,
       CASE WHEN f.vts IS NULL
                 OR (b.vts IS NOT NULL
                     AND epoch(c.ts) - epoch(b.vts) <= epoch(f.vts) - epoch(c.ts))
            THEN b.vid ELSE f.vid END AS view_event_id
FROM clicks c
JOIN b ON b.event_id = c.event_id
JOIN f ON f.event_id = c.event_id
"""


def q_rollup_refresh_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7: rollup refresh COEXISTING with maintenance
    (`operators/rollup.py`): refresh, then compact the source (a
    replace commit of already-counted files), then append + refresh
    again. The second refresh must stay INCREMENTAL — the rewrite's
    outputs re-add counted rows and are folded around, so only the new
    append is scanned; no manual ordering between ingest and
    maintenance. Self-gated on the refresh mode and on the deltas
    partitioning the input; final state must equal the full-recompute
    SQL."""
    _utc(spark)
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.operators.rollup import refresh_rollup
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_rollm_")
    src_loc = os.path.join(tdir, "src")
    roll_loc = os.path.join(tdir, "roll")
    try:
        ev_ddl = (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        aggs = {
            "cnt": ("count", ""),
            "sum_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        }
        ev = _t(spark, sf_dir, "events")
        with benchphase.phase("build"):  # fixture: tables + appends
            src = Table.create(src_loc, ev_ddl)
            roll = Table.create(
                roll_loc,
                "event_type STRING, cnt BIGINT, sum_value DOUBLE, "
                "min_value DOUBLE, max_value DOUBLE",
            )
            # two appends -> the compaction below has >1 input file
            src.append_dataframe(ev.filter("event_id % 4 = 0").select(cols))
            src.append_dataframe(ev.filter("event_id % 4 = 2").select(cols))
        r1 = refresh_rollup(spark, src, roll, ["event_type"], aggs)
        with benchphase.phase("build"):  # the interleaved maintenance
            # and follow-up append are scenario fixture; the measured
            # op is the refresh that must fold around them
            CompactionRunner(
                spark,
                src,
                CompactionConfig(
                    selection=SelectionStrategy.FULL,
                    grouping=GroupingStrategy.SINGLE,
                    sort_order=(("event_id", False),),
                    # round 9: 8 MB targets (the flagship's own sizing)
                    # give the rewrite output_parallelism > 1; the 1 GB
                    # default sorted + wrote the whole source in ONE
                    # task. Scenario and downstream rows unchanged (a
                    # replace commit is invisible to the changelog).
                    target_file_size_bytes=8 << 20,
                    min_size_per_partition_bytes=16 << 20,
                ),
            ).execute()
            src.append_dataframe(ev.filter("event_id % 2 = 1").select(cols))
        r2 = refresh_rollup(spark, src, roll, ["event_type"], aggs)
        if r2["mode"] != "incremental":
            raise AssertionError(
                f"replace of counted files forced {r2['mode']}; expected fold-around"
            )
        n_total = ev.count()
        if r1["delta_rows"] + r2["delta_rows"] != n_total:
            raise AssertionError("refresh deltas do not partition the input")
        if not (0 < r2["delta_rows"] < n_total):
            raise AssertionError(f"refresh was not incremental: {r2}")
        out = roll.scan(spark).select(
            "event_type",
            "cnt",
            F.round("sum_value", 3).alias("sum_value"),
            "min_value",
            "max_value",
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(src_loc, ignore_errors=True)
        shutil.rmtree(roll_loc, ignore_errors=True)


ROLLUP_REFRESH_MAINTAIN_SQL = """
SELECT event_type,
       COUNT(*) AS cnt,
       ROUND(SUM(value), 3) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY event_type
"""

def q_cdc_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7: CDC apply / incremental replication
    (`operators/replicate.py::apply_changelog`): a source table of
    events is replicated into a target — initial full load, then a
    DELETE WHERE + a MERGE upsert + a COMPACTION land on the source
    and ONE incremental apply folds the net row changes (latest per
    key; the rewrite is invisible to the changelog) into the target
    atomically. Self-gated: the second apply must be incremental with
    0 < upserts < total and deletes > 0, a replay must no-op, and the
    returned relation is the TARGET's scan — which the oracle predicts
    from the source operations alone."""
    _utc(spark)
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.operators.replicate import apply_changelog
    from iceberg_compaction_spark.plans.compaction import CompactionRunner
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_cdc_")
    try:
        ev_ddl = (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ev = _t(spark, sf_dir, "events")
        n_total = ev.count()
        with benchphase.phase("build"):
            src = Table.create(os.path.join(tdir, "src"), ev_ddl)
            tgt = Table.create(os.path.join(tdir, "tgt"), ev_ddl)
            src.append_dataframe(ev.select(cols))
        r1 = apply_changelog(spark, src, tgt, ["event_id"])
        if r1["upserts"] != n_total:
            raise AssertionError(f"initial load applied {r1['upserts']}/{n_total}")
        with benchphase.phase("build"):  # the source-side churn is the
            # scenario fixture; the measured op is the CDC apply
            delete_where(spark, src, "value < 10.0")
            merge_into(
                src,
                ev.filter("event_id % 100 = 0")
                .withColumn("props", F.lit("updated"))
                .select(cols),
                ["event_id"],
            )
            CompactionRunner(
                spark,
                src,
                CompactionConfig(
                    selection=SelectionStrategy.FULL,
                    grouping=GroupingStrategy.SINGLE,
                    sort_order=(("event_id", False),),
                    # round 9: 8 MB targets (the flagship's own sizing)
                    # give the rewrite output_parallelism > 1; the 1 GB
                    # default sorted + wrote the whole source in ONE
                    # task. Scenario and downstream rows unchanged (a
                    # replace commit is invisible to the changelog).
                    target_file_size_bytes=8 << 20,
                    min_size_per_partition_bytes=16 << 20,
                ),
            ).execute()
        r2 = apply_changelog(spark, src, tgt, ["event_id"])
        if r2["mode"] != "incremental" or not (0 < r2["upserts"] < n_total):
            raise AssertionError(f"apply was not incremental: {r2}")
        if r2["deletes"] == 0:
            raise AssertionError("no net deletes reached the target")
        if apply_changelog(spark, src, tgt, ["event_id"])["mode"] != "noop":
            raise AssertionError("replayed apply was not a no-op")
        out = tgt.scan(spark).select(
            "event_id",
            F.unix_timestamp("ts").alias("ts_epoch"),
            "user_id",
            "event_type",
            F.round("value", 3).alias("value"),
            "props",
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(os.path.join(tdir, "src"), ignore_errors=True)
        shutil.rmtree(os.path.join(tdir, "tgt"), ignore_errors=True)


def q_changelog_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: CDC update pre/post images
    (`operators/changelog.py::compute_update_images` — Iceberg
    ``create_changelog_view`` with compute_updates + remove_carryovers):
    a DELETE WHERE then a COPY-ON-WRITE merge land on the transcripts
    table; the raw changelog carries one delete+insert pair for every
    untouched row of every rewritten file (carryovers), which the
    refinement must cancel, while the genuinely-updated keys pair into
    update_before/update_after and the appended turns stay inserts.
    Self-gated: carryovers must exist (raw stream strictly larger than
    the refined one) and all four change types must be present; the
    oracle predicts the refined stream from the source operations
    alone."""
    _utc(spark)
    from iceberg_compaction_spark.operators.changelog import (
        UPDATE_AFTER,
        UPDATE_BEFORE,
        changelog_scan,
        compute_update_images,
    )
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_cdcu_")
    loc = os.path.join(tdir, "transcripts")
    try:
        with benchphase.phase("build"):  # fixture, not the measured op
            table = Table.create(loc, TRANSCRIPT_DDL)
            base = build_transcripts_from_events(spark, sf_dir)
            table.append_dataframe(
                base.repartition(8, F.xxhash64("conv_id", "turn_idx"))
            )
            sid0 = table.current_snapshot_id
            delete_where(spark, table, "turn_idx % 11 = 5")
            upd = (
                table.scan(spark)
                .filter(F.col("turn_idx") % 7 == 3)
                .withColumn("text", F.concat(F.col("text"), F.lit("~v2")))
            )
            new = base.groupBy("conv_id").agg(
                F.max("turn_idx").alias("mx")
            ).select(
                F.col("conv_id"),
                (F.col("mx") + 1).cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.lit("appended turn").alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit("2024-06-01 00:00:00").cast("timestamp").alias("ts"),
            )
            merge_into(
                table, upd.unionByName(new.select(*upd.columns)),
                keys=["conv_id", "turn_idx"], mode="cow",
            )
        raw = changelog_scan(
            spark, table, sid0, columns=["conv_id", "turn_idx", "text"]
        )
        out = compute_update_images(raw, keys=["conv_id", "turn_idx"]).select(
            "conv_id", "turn_idx", "text", "_change_type"
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        out = spark.read.parquet(result_dir)
        n_raw, n_out = raw.count(), out.count()
        if n_raw <= n_out:
            raise AssertionError(
                f"CoW rewrite produced no carryovers to cancel ({n_raw} raw vs {n_out})"
            )
        types = {r["_change_type"] for r in out.select("_change_type").distinct().collect()}
        if types != {"insert", "delete", UPDATE_BEFORE, UPDATE_AFTER}:
            raise AssertionError(f"expected all four change types, got {types}")
        return out
    finally:
        shutil.rmtree(loc, ignore_errors=True)


CHANGELOG_UPDATES_SQL = f"""
WITH base AS ({TRANSCRIPTS_BASE_SQL})
SELECT conv_id, turn_idx, text, _change AS _change_type FROM (
  SELECT conv_id, turn_idx, text, 'delete' FROM base WHERE turn_idx % 11 = 5
  UNION ALL
  SELECT conv_id, turn_idx, text, 'update_before' FROM base
  WHERE turn_idx % 7 = 3 AND turn_idx % 11 <> 5
  UNION ALL
  SELECT conv_id, turn_idx, text || '~v2', 'update_after' FROM base
  WHERE turn_idx % 7 = 3 AND turn_idx % 11 <> 5
  UNION ALL
  SELECT conv_id, CAST(max(turn_idx) + 1 AS INT), 'appended turn', 'insert'
  FROM base GROUP BY conv_id
) u(conv_id, turn_idx, text, _change)
"""


CDC_REPLICATE_SQL = """
SELECT event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       user_id, event_type,
       ROUND(value, 3) AS value,
       CASE WHEN event_id % 100 = 0 THEN 'updated' ELSE props END AS props
FROM events
WHERE value >= 10.0 OR event_id % 100 = 0
"""


def q_cdc_schema_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: CDC replication FOLLOWS source schema evolution
    (`operators/replicate.py::sync_target_schema`): after the initial
    load the source renames ``props``→``attrs`` and adds ``category``
    (initial default 'none'), then a MERGE updates every
    event_id%50==0 row with a real category — one follow-enabled apply
    must replay the rename, add the column (metadata-only, default
    included), and land the net rows, so the target's scan equals the
    oracle's prediction: pre-evolution rows materialize the default,
    updated rows carry their values. Self-gated on the exact DDL
    action list."""
    _utc(spark)
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.operators.replicate import apply_changelog
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_cdcs_")
    try:
        ev_ddl = (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ev = _t(spark, sf_dir, "events")
        with benchphase.phase("build"):
            src = Table.create(os.path.join(tdir, "src"), ev_ddl)
            tgt = Table.create(os.path.join(tdir, "tgt"), ev_ddl)
            src.append_dataframe(ev.select(cols))
            r1 = apply_changelog(spark, src, tgt, ["event_id"], follow_schema=True)
            if r1["schema_actions"]:
                raise AssertionError(f"initial apply took DDL actions: {r1}")
            src.rename_column("props", "attrs")
            src.add_column("category", "STRING", default="none")
            merge_into(
                src,
                ev.filter("event_id % 50 = 0").select(
                    "event_id", "ts", "user_id", "event_type", "value",
                    F.lit("updated").alias("attrs"),
                    F.lit("hot").alias("category"),
                ),
                ["event_id"],
            )
        r2 = apply_changelog(spark, src, tgt, ["event_id"], follow_schema=True)
        if r2["schema_actions"] != [
            "rename props -> attrs", "add category string",
        ]:
            raise AssertionError(f"unexpected DDL follow: {r2['schema_actions']}")
        if r2["mode"] != "incremental" or r2["upserts"] == 0:
            raise AssertionError(f"apply was not an incremental upsert: {r2}")
        out = tgt.scan(spark).select(
            "event_id",
            F.unix_timestamp("ts").alias("ts_epoch"),
            "user_id",
            "event_type",
            F.round("value", 3).alias("value"),
            "attrs",
            "category",
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(os.path.join(tdir, "src"), ignore_errors=True)
        shutil.rmtree(os.path.join(tdir, "tgt"), ignore_errors=True)


CDC_SCHEMA_SYNC_SQL = """
SELECT event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
       user_id, event_type,
       ROUND(value, 3) AS value,
       CASE WHEN event_id % 50 = 0 THEN 'updated' ELSE props END AS attrs,
       CASE WHEN event_id % 50 = 0 THEN 'hot' ELSE 'none' END AS category
FROM events
"""


def q_rollup_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7: mergeable HISTOGRAM rollup state
    (`operators/rollup.py` fn="hist"): per-event-type fixed-bin value
    counts accumulated across two incremental refreshes — fixed-bin
    counts are the simplest sum-mergeable quantile state (Spark's
    percentile_approx sketch is not re-aggregatable). Out-of-range
    values clamp into the edge bins. Returns the exploded
    (event_type, bin, bin_cnt) state; the oracle recomputes the same
    bins in one pass, so the incremental merge is proven EXACT.
    Self-gated: the second refresh must be incremental and the
    read-side median estimate must be finite."""
    _utc(spark)
    from iceberg_compaction_spark.operators.rollup import hist_quantile, refresh_rollup
    from iceberg_compaction_spark.sources.table import Table

    tdir = tempfile.mkdtemp(prefix="icemaint_rollh_")
    try:
        ev_ddl = (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING"
        )
        cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
        aggs = {
            "cnt": ("count", ""),
            "h": ("hist", "value", (0.0, 25.0, 16)),
        }
        ev = _t(spark, sf_dir, "events")
        with benchphase.phase("build"):
            src = Table.create(os.path.join(tdir, "src"), ev_ddl)
            roll = Table.create(
                os.path.join(tdir, "roll"),
                "event_type STRING, cnt BIGINT, h ARRAY<BIGINT>",
            )
            src.append_dataframe(ev.filter("event_id % 2 = 0").select(cols))
        refresh_rollup(spark, src, roll, ["event_type"], aggs)
        with benchphase.phase("build"):
            src.append_dataframe(ev.filter("event_id % 2 = 1").select(cols))
        r2 = refresh_rollup(spark, src, roll, ["event_type"], aggs)
        if r2["mode"] != "incremental" or r2["delta_rows"] == 0:
            raise AssertionError(f"second refresh not incremental: {r2}")
        med = hist_quantile(roll.scan(spark), ["event_type"], "h", 0.5, 0.0, 25.0)
        if med.filter(F.col("q50").isNull()).count() != 0:
            raise AssertionError("median estimate missing for some event_type")
        out = roll.scan(spark).select(
            "event_type", F.posexplode("h").alias("bin", "bin_cnt")
        )
        result_dir = os.path.join(tdir, "result")
        out.write.parquet(result_dir)
        return spark.read.parquet(result_dir)
    finally:
        shutil.rmtree(os.path.join(tdir, "src"), ignore_errors=True)
        shutil.rmtree(os.path.join(tdir, "roll"), ignore_errors=True)


ROLLUP_HIST_SQL = """
WITH binned AS (
  SELECT event_type,
         least(15, greatest(0, CAST(floor(value / 25.0) AS INTEGER))) AS b
  FROM events WHERE value IS NOT NULL),
bins AS (SELECT DISTINCT event_type, g.b
         FROM (SELECT DISTINCT event_type FROM binned),
              generate_series(0, 15) AS g(b))
SELECT bins.event_type,
       CAST(bins.b AS INTEGER) AS bin,
       CAST(count(binned.b) AS BIGINT) AS bin_cnt
FROM bins LEFT JOIN binned
  ON binned.event_type = bins.event_type AND binned.b = bins.b
GROUP BY 1, 2
"""


# events testdata spans 2024-01-01 .. 2024-01-30 (all SFs): a fixed
# UTC grid keeps the gapfill query deterministic and SF-agnostic
_GAPFILL_START = 1_704_067_200  # 2024-01-01T00:00:00Z
_GAPFILL_END = 1_706_659_200  # 2024-01-31T00:00:00Z
_GAPFILL_STEP = 21_600  # 6 h


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7: time_bucket gap-fill + LOCF (the hypertable
    ``time_bucket_gapfill``/``locf`` read-side of a continuous
    aggregate, `operators/rollup.py::gapfill_locf`): per-user 6-hour
    event counts on a fixed 30-day grid — every (user, bucket) row
    exists, empty buckets carry the latest earlier count and are
    flagged. Grid = map-side sequence+explode; fill = ONE running
    last-ignorenulls window per user. Self-gated: gaps must exist and
    some gap must carry a non-null value (the LOCF path is exercised),
    and observed rows must never be flagged."""
    _utc(spark)
    from iceberg_compaction_spark.operators.rollup import gapfill_locf, time_bucket

    ev = _t(spark, sf_dir, "events").filter("user_id % 37 = 5")
    src = ev.groupBy(
        "user_id", time_bucket("ts", _GAPFILL_STEP).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    out = gapfill_locf(
        src, ["user_id"], "bucket", ["cnt"],
        start=_GAPFILL_START, end=_GAPFILL_END, step=_GAPFILL_STEP,
    )
    # materialize ONCE (round 9, the salted twin's pattern): the three
    # gates and the returned relation read parquet, not four re-runs
    tdir = tempfile.mkdtemp(prefix="icemaint_gf_")
    out.write.parquet(os.path.join(tdir, "out"))
    out = spark.read.parquet(os.path.join(tdir, "out"))
    gate = out.agg(
        F.sum(F.col("gap_filled").cast("int")).alias("n_gap"),
        F.sum(
            (F.col("gap_filled") & F.col("cnt_filled").isNotNull()).cast("int")
        ).alias("n_carried"),
        F.sum(
            (~F.col("gap_filled") & F.col("cnt").isNull()).cast("int")
        ).alias("n_bad"),
    ).first()
    n_gap = gate["n_gap"] or 0
    n_carried = gate["n_carried"] or 0
    n_bad = gate["n_bad"] or 0
    if not (n_gap > 0 and n_carried > 0 and n_bad == 0):
        raise AssertionError(
            f"degenerate gapfill fixture: gaps={n_gap} carried={n_carried} bad={n_bad}"
        )
    return out.select(
        "user_id",
        F.col("bucket").cast("bigint").alias("bucket"),
        "cnt",
        "cnt_filled",
        "gap_filled",
    )


GAPFILL_LOCF_SQL = f"""
WITH src AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / {_GAPFILL_STEP}) * {_GAPFILL_STEP} AS BIGINT) AS bucket,
         count(*) AS cnt
  FROM events WHERE user_id % 37 = 5 GROUP BY 1, 2),
grid AS (
  SELECT u.user_id, CAST(g.b AS BIGINT) AS bucket
  FROM (SELECT DISTINCT user_id FROM src) u,
       generate_series({_GAPFILL_START}, {_GAPFILL_END}, {_GAPFILL_STEP}) AS g(b)),
j AS (
  SELECT g.user_id, g.bucket, s.cnt, s.cnt IS NULL AS gap_filled
  FROM grid g LEFT JOIN src s ON s.user_id = g.user_id AND s.bucket = g.bucket)
SELECT user_id, bucket, cnt,
       last_value(cnt IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_filled,
       gap_filled
FROM j
"""


def q_gapfill_locf_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 8: the HOT-GROUP gapfill form
    (`operators/rollup.py::gapfill_locf_salted`) — the same per-user
    6-hour grid as `gapfill_locf`, but the LOCF window runs per
    (user, 32-bucket chunk) with a cross-chunk carry, the recipe for a
    group whose bucket range exceeds one core's share. Row-identical
    to the plain form, so it shares the DuckDB oracle. Self-gated: the
    chunking must actually split the grid (>1 chunk in the plan's
    window key) and some gap must fill ACROSS a chunk boundary from
    the carry (a filled gap in a chunk with no earlier observation in
    that same chunk)."""
    _utc(spark)
    from iceberg_compaction_spark.operators.rollup import (
        gapfill_locf_salted,
        time_bucket,
    )

    chunk = 32  # 121 6-hour buckets -> 4 chunks
    ev = _t(spark, sf_dir, "events").filter("user_id % 37 = 5")
    src = ev.groupBy(
        "user_id", time_bucket("ts", _GAPFILL_STEP).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    out = gapfill_locf_salted(
        src, ["user_id"], "bucket", ["cnt"],
        start=_GAPFILL_START, end=_GAPFILL_END, step=_GAPFILL_STEP,
        chunk_buckets=chunk,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "_chunk" not in plan:
        raise AssertionError("LOCF window is not chunk-partitioned")
    # materialize once; the carry gate and the returned relation read
    # parquet instead of re-running the chunked fill
    tdir = tempfile.mkdtemp(prefix="icemaint_gfs_")
    out.write.parquet(os.path.join(tdir, "out"))
    out = spark.read.parquet(os.path.join(tdir, "out"))
    step_i = F.round(
        (F.col("bucket") - F.lit(float(_GAPFILL_START))) / F.lit(float(_GAPFILL_STEP))
    ).cast("bigint")
    chunked = out.withColumn("_c", (step_i / chunk).cast("bigint")).withColumn(
        "_i", step_i
    )
    w_obs = Window.partitionBy("user_id", "_c").orderBy("_i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carry_fills = (
        chunked.withColumn(
            "_seen_obs",
            F.max(F.when(~F.col("gap_filled"), F.lit(1)).otherwise(F.lit(0))).over(
                w_obs
            ),
        )
        .filter(
            F.col("gap_filled")
            & F.col("cnt_filled").isNotNull()
            & (F.col("_seen_obs") == 0)
        )
        .count()
    )
    if carry_fills == 0:
        raise AssertionError("no gap filled across a chunk boundary: carry untested")
    return out.select(
        "user_id",
        F.col("bucket").cast("bigint").alias("bucket"),
        "cnt",
        "cnt_filled",
        "gap_filled",
    )


GAPFILL_LOCF_SALTED_SQL = GAPFILL_LOCF_SQL
