"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k per query — a broadcast join of the
query set against the corpus with JVM-side vector math (``zip_with`` +
``aggregate``), then a per-query window top-k. Exact, and the right
plan when |queries| is small: the corpus is scanned once, no shuffle of
the corpus itself.

Scale path: sign-LSH (random hyperplanes) bucketing — corpus and
queries hash to ``n_planes``-bit signatures; candidates share a
signature block; exact cosine re-ranks candidates only. Planes are
derived deterministically from (plane index, dimension index) hashes,
so no RNG state, no fitted model, identical across runs/executors; at
10^9 vectors the bucket join is an equi-join on the block key.
Multi-probe: each vector emits ``probes`` blocks (the signature plus
single-bit flips) to trade recall for fan-out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _cosine_cols(qv: str, cv: str):
    dot = F.aggregate(F.zip_with(qv, cv, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    nq = F.sqrt(F.aggregate(qv, F.lit(0.0), lambda a, x: a + x * x))
    nc = F.sqrt(F.aggregate(cv, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (nq * nc)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k, excluding
    self-matches. Query set is broadcast (it is the small side)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id", "neighbor_id", _cosine_cols("_qv", "_cv").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_matrix(dim: int, n_planes: int, table: int = 0) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: component (p, d) from a
    splitmix64-style integer mix of (table, p, d) — reproducible
    anywhere with no RNG object."""
    base = np.uint64((table * 0x2545F4914F6CDD1D) % (1 << 64))  # wraparound intended
    idx = (np.arange(n_planes * dim, dtype=np.uint64) + base).reshape(n_planes, dim)
    z = idx * np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    # map to [-1, 1)
    return (z.astype(np.float64) / 2**63) - 1.0


def add_lsh_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int | None = None,
    table: int = 0,
    out_col: str = "_sig",
) -> DataFrame:
    """Append ``out_col`` (int64): sign bits of projections onto the
    deterministic hyperplanes of hash table ``table``. Arrow-batched
    numpy matmul per batch."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    planes = _plane_matrix(dim, n_planes, table)  # closure-captured, small

    @pandas_udf("long")
    def _sig(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        proj = mat @ planes.T  # (batch, n_planes)
        bits = (proj > 0).astype(np.int64)
        out = np.zeros(len(vs), dtype=np.int64)
        for p in range(planes.shape[0]):
            out |= bits[:, p] << p
        return pd.Series(out)

    return df.withColumn(out_col, _sig(F.col(vec_col)))


def _score_block(ids, vecs, q_ids, q_mat, q_norm, k):
    """One BLAS-scored batch of the vectorized exact top-k: cosine of
    every (batch row × query), self-matches excluded, and the LOCAL
    top-k per query selected with the GLOBAL tie order (cosine desc,
    id asc) so a boundary tie can never evict the id the final window
    would have kept — batch rows are pre-sorted by id and the
    per-query selection is a stable sort on descending similarity.
    Yields zero or one pandas DataFrames."""
    if len(ids) == 0:
        return
    mat = np.stack(vecs.apply(lambda v: np.asarray(v, dtype=np.float64)))
    order = np.argsort(ids)  # ids unique per batch; ascending for tie order
    ids, mat = ids[order], mat[order]
    nrm = np.linalg.norm(mat, axis=1)
    nrm[nrm == 0] = 1.0
    sims = (mat @ q_mat.T) / np.outer(nrm, q_norm)  # (batch, q)
    sims[ids[:, None] == q_ids[None, :]] = -np.inf  # no self-match
    top = min(k, sims.shape[0])
    idx = np.argsort(-sims, axis=0, kind="stable")[:top]  # per query
    rows = {
        "query_id": np.repeat(q_ids[None, :], top, 0).ravel(),
        "neighbor_id": ids[idx].ravel(),
        "cosine": np.take_along_axis(sims, idx, axis=0).ravel(),
    }
    out = pd.DataFrame(rows)
    out = out[np.isfinite(out["cosine"])]
    if len(out):
        yield out


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact top-k, matmul form: the (small) query matrix rides in a
    closure; each corpus partition computes a batch × queries similarity
    matrix with one numpy matmul and emits only its LOCAL top-k per
    query; a global window keeps the true top-k. Versus the crossJoin +
    interpreted higher-order aggregate: no |Q|×|corpus| row explosion
    ever materializes and the arithmetic is BLAS, not expression
    interpretation — the scale path when |Q| is hundreds+.

    The query side is COLLECTED to the driver by contract (it rides in
    every task's closure); ``max_query_rows`` makes misuse refuse
    rather than explode (the range-join/gapfill guard rule). A truly
    large query set belongs in ``lsh_topk``/``ivf_topk``, whose
    query-side stays distributed."""
    q_rows = queries.select(id_col, vec_col).limit(max_query_rows + 1).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"brute_force_topk_vectorized collects the query side into "
            f"task closures; got > {max_query_rows} query rows — raise "
            "max_query_rows deliberately or use lsh_topk/ivf_topk"
        )
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = 1.0

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        for pdf in batches:
            for out in _score_block(
                pdf[id_col].to_numpy(),
                pdf[vec_col],
                q_ids,
                q_mat,
                q_norm,
                k,
            ):
                yield out

    from iceberg_compaction_spark.functions.util import spread_small_input

    # guide §2.5: a small corpus scan arrives in fewer splits than
    # cores; spread so the per-batch matmuls parallelize (no-op at
    # scale, and the global window makes any partitioning exact)
    local = spread_small_input(corpus.select(id_col, vec_col)).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _nearest_centroids_udf(centroids: np.ndarray, nprobe: int):
    """pandas_udf: ids of the ``nprobe`` nearest centroids (by cosine)
    for each vector; the centroid matrix rides in the closure (small)."""
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0] = 1.0

    @pandas_udf("array<int>")
    def _probe(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        vnorm = np.linalg.norm(mat, axis=1)
        vnorm[vnorm == 0] = 1.0
        sims = (mat @ centroids.T) / np.outer(vnorm, norms)
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return _probe


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    iters: int = 3,
    max_driver_rows: int = 200_000,
) -> np.ndarray:
    """Deterministic coarse quantizer: initial centroids are the
    vectors with the smallest xxhash64(id) (seedless deterministic
    sample), refined by ``iters`` Lloyd rounds. Every step is
    DataFrame-distributed; only centroid-sized results (n_centroids ×
    dim) ever reach the driver, so training cost is O(iters) corpus
    scans regardless of table size.

    Round 9 (guide §1.2): a corpus within ``max_driver_rows`` trains
    entirely on the driver — one collect, then pure-numpy Lloyd with
    the identical assignment math — instead of paying O(iters) Spark
    jobs of fixed overhead for kilobytes of useful work. Larger
    corpora keep the distributed loop (same greedy, same init)."""
    small = corpus.select(
        F.xxhash64(F.col(id_col)).alias("_h"), F.col(vec_col).alias("_v")
    ).limit(max_driver_rows + 1).collect()
    if len(small) <= max_driver_rows:
        mat = np.array([r["_v"] for r in small], dtype=np.float64)
        hs = np.array([r["_h"] for r in small])
        cents = mat[np.argsort(hs, kind="stable")[:n_centroids]].copy()
        for _ in range(iters):
            c_norm = np.linalg.norm(cents, axis=1)
            c_norm[c_norm == 0] = 1.0
            vnorm = np.linalg.norm(mat, axis=1)
            vnorm[vnorm == 0] = 1.0
            sims = (mat @ cents.T) / np.outer(vnorm, c_norm)
            cid = np.argsort(-sims, axis=1)[:, 0]
            new = cents.copy()  # empty clusters keep their previous centroid
            cnt = np.bincount(cid, minlength=len(cents))
            sums = np.zeros_like(cents)
            np.add.at(sums, cid, mat)
            nz = cnt > 0
            new[nz] = sums[nz] / cnt[nz, None]
            cents = new
        return cents
    init = (
        corpus.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    cents = np.array([r["v"] for r in init], dtype=np.float64)
    # round 9 (guide §4.2/§2.3): each Lloyd round is ONE vectorized
    # pass — per Arrow batch, assign via a BLAS similarity matmul and
    # accumulate per-cell (sum vector, count) partials; only
    # partitions × n_centroids tiny rows leave the executors (the
    # posexplode form shuffled rows × dim exploded elements and ran
    # the assignment UDF as a separate stage). The corpus rows are
    # spread across the default parallelism first (small parquet
    # inputs otherwise run the whole pass in one task).
    from iceberg_compaction_spark.functions.util import spread_small_input

    vecs = spread_small_input(corpus.select(vec_col))
    out_schema = "cell int, s array<double>, n long"
    for _ in range(iters):
        c_norm = np.linalg.norm(cents, axis=1)
        c_norm[c_norm == 0] = 1.0
        frozen = cents

        def partials(batches, _c=frozen, _cn=c_norm):
            k, dim = _c.shape
            sums = np.zeros((k, dim))
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.stack(
                    pdf[vec_col].apply(lambda v: np.asarray(v, dtype=np.float64))
                )
                vnorm = np.linalg.norm(mat, axis=1)
                vnorm[vnorm == 0] = 1.0
                sims = (mat @ _c.T) / np.outer(vnorm, _cn)
                # same tie resolution as _nearest_centroids_udf
                cid = np.argsort(-sims, axis=1)[:, 0]
                np.add.at(sums, cid, mat)
                counts += np.bincount(cid, minlength=k)
            out = pd.DataFrame(
                {
                    "cell": np.arange(k, dtype=np.int32),
                    "s": list(sums),
                    "n": counts,
                }
            )
            yield out[out["n"] > 0]

        rows = vecs.mapInPandas(partials, out_schema).collect()
        new = cents.copy()  # empty clusters keep their previous centroid
        acc = np.zeros_like(cents)
        cnt = np.zeros(len(cents), dtype=np.int64)
        for r in rows:
            acc[r["cell"]] += np.asarray(r["s"], dtype=np.float64)
            cnt[r["cell"]] += r["n"]
        nz = cnt > 0
        new[nz] = acc[nz] / cnt[nz, None]
        cents = new
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    centroids: np.ndarray | None = None,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the other
    classic ANN scale path next to sign-LSH: corpus vectors list under
    their nearest centroid; each query probes its ``nprobe`` nearest
    cells; exact cosine re-ranks the probed lists only. The cell join
    is an equi-join on the centroid id, so the plan is
    broadcast/shuffle-hash, never all-pairs; recall grows with
    nprobe/n_centroids ratio.

    Round 9 (guide §4.2): when the query side fits ``max_query_rows``
    the probed lists are scored like the persisted-index probe — per
    assigned-corpus batch, one BLAS matmul per probed cell against the
    closure-resident query group, no candidate join, no interpreted
    per-pair aggregate. Larger query sets keep the distributed
    equi-join plan; both paths produce identical rows."""
    cents = centroids if centroids is not None else train_ivf_centroids(
        corpus, vec_col, id_col, n_centroids, iters
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c_assigned = c.withColumn("_cid", _nearest_centroids_udf(cents, 1)(F.col("_cv"))[0])

    q_rows = q.withColumn(
        "_cells", _nearest_centroids_udf(cents, nprobe)(F.col("_qv"))
    ).limit(max_query_rows + 1).collect()
    if len(q_rows) <= max_query_rows:
        by_qid: dict = {}
        for r in q_rows:
            by_qid.setdefault(r["query_id"], (r["_qv"], r["_cells"]))
        cell_groups: dict[int, list] = {}
        for qid, (qv, qcells) in by_qid.items():
            for cell in set(qcells):
                cell_groups.setdefault(int(cell), []).append((qid, qv))
        per_cell = {}
        for cell, grp in cell_groups.items():
            q_ids = np.array([qid for qid, _ in grp])
            q_mat = np.stack([np.asarray(qv, dtype=np.float64) for _, qv in grp])
            q_norm = np.linalg.norm(q_mat, axis=1)
            q_norm[q_norm == 0] = 1.0
            per_cell[cell] = (q_ids, q_mat, q_norm)
        out_schema = "query_id long, neighbor_id long, cosine double"

        def score(batches):
            for pdf in batches:
                for cell, grp in pdf.groupby("_cid", sort=False):
                    qd = per_cell.get(int(cell))
                    if qd is None:
                        continue
                    yield from _score_block(
                        grp["neighbor_id"].to_numpy(), grp["_cv"], *qd, k
                    )

        from iceberg_compaction_spark.functions.util import spread_small_input

        scored = spread_small_input(
            c_assigned.select("neighbor_id", "_cv", "_cid")
        ).mapInPandas(score, out_schema)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )
    q_probed = q.withColumn(
        "_cid", F.explode(_nearest_centroids_udf(cents, nprobe)(F.col("_qv")))
    )
    cand = (
        q_probed.join(c_assigned, "_cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", _cosine_cols("_qv", "_cv").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    probes: int = 6,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k with multi-table sign-LSH: ``tables``
    independent plane sets; per table, candidates share the query's
    signature or any of its ``probes − 1`` single-bit flips; exact
    cosine re-ranks the union. Recall grows with tables × probes while
    each bucket join stays an equi-join on (table, signature) —
    corpus-side fan-out is ``tables``×, query-side ``tables×probes``×.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    dim = int(c.select(F.size("_cv").alias("d")).first()["d"])

    c_parts, q_parts = [], []
    for t in range(tables):
        ct = add_lsh_signature(c, "_cv", n_planes, dim=dim, table=t).withColumn(
            "_tbl", F.lit(t)
        )
        qt = add_lsh_signature(q, "_qv", n_planes, dim=dim, table=t)
        flips = F.array(
            F.col("_sig"),
            *[F.col("_sig").bitwiseXOR(F.lit(1 << p)) for p in range(probes - 1)],
        )
        qt = qt.select(
            "query_id", "_qv", F.lit(t).alias("_tbl"), F.explode(flips).alias("_sig")
        )
        c_parts.append(ct)
        q_parts.append(qt)
    c_all = c_parts[0]
    for p in c_parts[1:]:
        c_all = c_all.unionByName(p)
    q_all = q_parts[0]
    for p in q_parts[1:]:
        q_all = q_all.unionByName(p)

    cand = (
        q_all.join(c_all, ["_tbl", "_sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "_qv", "neighbor_id", "_cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # (round 9 note: scoring these deduped PAIR rows with an einsum in
    # mapInPandas measured SLOWER at every SF (13.3 vs 11.0 s at sf1.0)
    # — the pairs carry both 64-dim vectors, so the JVM→Arrow→Python
    # transfer of |pairs|×2×d doubles swamps the arithmetic saving.
    # The interpreted per-pair aggregate stays; the vectorized wins
    # come from paths that never materialize pairs at all
    # (brute_force_topk_vectorized, ivf_topk, ivf_index_probe).)
    scored = cand.select(
        "query_id", "neighbor_id", _cosine_cols("_qv", "_cv").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
