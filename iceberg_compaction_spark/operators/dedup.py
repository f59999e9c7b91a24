"""Deduplication operators for training-data pipelines over a
``documents(doc_id, text, …)`` table.

Beyond the reference's scope (it maintains tables; these maintain
*corpora*), but built on the same engine discipline: built-in JVM
expressions everywhere, deterministic tie-breaking (the survivor of a
duplicate group is always the smallest ``doc_id``), and shuffle-aware
plans (dedup keys are hashes → uniformly distributed → no skew; the
candidate-pair joins are equi-joins on bucket keys, never cross
products).

Hash choice: ``md5`` for anything an external oracle must reproduce
(DuckDB's md5 is bit-identical), ``xxhash64`` where speed matters and
only Spark consumes the value.

Scale notes (100 TB corpus):
  * exact dedup: one hash-shuffle on a 32-byte key.
  * MinHash-LSH: O(docs × shingles) explode → per-band min-agg →
    bucket equi-join. Bands bound candidate-pair fan-out; no O(n²).
  * SimHash: explode tokens → bitwise vote agg → 64-bit key; near-dup
    = bucket join on rotated prefixes (hamming ≤ k probing).
  * embedding cosine: LSH hyperplane buckets (deterministic planes from
    a seeded hash) → exact verify inside buckets only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_compaction_spark.functions.util import spread_small_input


# ----------------------------------------------------------------------
# exact
def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (by md5), smallest id wins."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ----------------------------------------------------------------------
# paragraph-level exact dedup: sub-document granularity, the shape
# training-data pipelines use for boilerplate removal (repeated
# headers/footers/licenses across millions of pages) — document-level
# dedup never catches a paragraph duplicated across distinct docs.
def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Remove duplicate PARAGRAPHS corpus-wide, keeping each
    paragraph's first occurrence (smallest (doc id, position)); every
    document is reassembled from its surviving paragraphs in original
    order. Paragraphs shorter than ``min_chars`` always survive
    (too-short units — blank lines, bullets — would dedup meaninglessly
    aggressively).

    Plan shape: posexplode(split) → one window over md5(paragraph)
    (hash-shuffled, uniform) → groupBy doc reassembly with
    ``array_join(sort by position)``. Two shuffles total, both on
    uniform keys; no joins, no candidate pairs — exact by
    construction. Documents whose every paragraph was a duplicate come
    back with empty text (callers drop or keep them; count preserved
    so downstream joins don't lose rows)."""
    other_cols = [c for c in df.columns if c != text_col]
    parts = df.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias("_pos", "_para"),
    )
    keep_always = F.length("_para") < min_chars
    w = Window.partitionBy(F.md5(F.col("_para"))).orderBy(
        F.col(id_col), F.col("_pos")
    )
    survivors = parts.withColumn(
        "_rn", F.when(keep_always, F.lit(1)).otherwise(F.row_number().over(w))
    ).filter(F.col("_rn") == 1)
    rebuilt = (
        survivors.groupBy(*other_cols)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_para")))
                    ),
                    lambda s: s["_para"],
                ),
                sep,
            ).alias(text_col)
        )
    )
    # documents that lost every paragraph reappear with empty text
    lost = df.select(*other_cols).join(
        rebuilt.select(*other_cols), other_cols, "left_anti"
    ).withColumn(text_col, F.lit(""))
    return rebuilt.unionByName(lost).select(*df.columns)


# ----------------------------------------------------------------------
# shingling
def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: normalize → split →
    slide. All built-ins (sequence + transform + array slicing).

    The token array is materialized as its own projection BEFORE the
    higher-order ``transform``: an expression captured inside the
    lambda is re-evaluated per element, so tokenizing inline turns
    O(tokens) into O(tokens²) re-tokenizations per document — measured
    17× slower on real documents. Same output, one tokenize per row."""
    # round 9 (guide §2.5): spread the small pre-explosion rows so the
    # tokenize + shingle + hash expressions parallelize; no-op when the
    # scan already has enough splits.
    df = spread_small_input(df)
    toks = F.split(F.trim(F.lower(F.regexp_replace(text_col, r"[^a-zA-Z0-9\s]", " "))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0))),
        lambda i: F.array_join(F.slice("_toks", i + 1, n), " "),
    )
    return df.withColumn("_toks", toks).select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


#: RECOMMENDED hot-shingle document-frequency cap for corpus-scale
#: runs: a shingle in ≤10⁴ docs contributes ≤ ~5·10⁷ candidate pairs —
#: bounded fan-out at any corpus size. NOT the default: the API
#: default is ``None`` (exact), because silently capping would make
#: every existing caller approximate. Production call sites opt in
#: with ``max_shingle_df=DEFAULT_MAX_SHINGLE_DF``.
DEFAULT_MAX_SHINGLE_DF = 10_000


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard over shared shingles: candidate pairs are
    generated ONLY for documents sharing ≥1 shingle (equi-join on the
    shingle), then |∩| / (|A|+|B|−|∩|). Returns (id_a < id_b, jaccard).

    ``max_shingle_df``: OPT-IN document-frequency cap for candidate
    generation (``None`` = exact, the default). A shingle occurring in
    10^6 documents would alone create ~10^12 candidate pairs; capping
    drops such stopword-grams from the *join side only* (each
    surviving shingle contributes at most df·(df−1)/2 ≤ K² pairs).
    Sizes still count every shingle, so uncapped jaccard is exact;
    WITH the cap, common counts are a LOWER BOUND — pairs whose only
    shared shingles are hot are dropped. Corpus-scale callers should
    pass ``DEFAULT_MAX_SHINGLE_DF`` (the standard trade for bounded
    fan-out); oracle/exactness callers keep the default."""
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    joinable = sh
    if max_shingle_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        joinable = sh.join(
            dfreq.filter(F.col("_df") <= max_shingle_df).select("shingle"), "shingle"
        )
    a = joinable.select(F.col(id_col).alias("id_a"), "shingle")
    b = joinable.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))).alias(
                "jaccard"
            ),
        )
    )


def ngram_jaccard_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Drop any document having a Jaccard-similar document with a
    smaller id (single-linkage approximated one level deep —
    deterministic and oracle-expressible; a full transitive closure
    would iterate this to fixpoint). ``max_shingle_df``: opt-in hot-
    shingle cap, same exactness trade as ``ngram_jaccard_pairs`` —
    corpus-scale callers pass ``DEFAULT_MAX_SHINGLE_DF``."""
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n, max_shingle_df).filter(
        F.col("jaccard") >= threshold
    )
    victims = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(victims, id_col, "left_anti")


# ----------------------------------------------------------------------
# MinHash + LSH
def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, band, signature): per band, the signature is the concat of
    ``rows_per_band`` min-hashes; hash_i(shingle) = hash(i || shingle).

    ``hash_fn``: ``"md5"`` keeps an external oracle reproducible
    (DuckDB's md5 is bit-identical; lexicographic min of hex == numeric
    min of the underlying 128-bit value). ``"xxhash64"`` is the
    production flag — one 64-bit JVM hash instead of a 128-bit digest
    per (slot, shingle), same LSH semantics, materially less CPU on the
    hot explode→agg path."""
    sh = shingles(df, id_col, text_col, n)

    def _h(i: int):
        salted = F.concat(F.lit(f"{i}|"), F.col("shingle"))
        if hash_fn == "xxhash64":
            # fixed-width hex so lexicographic min == numeric min of
            # the unsigned 64-bit value
            return F.lpad(F.hex(F.xxhash64(salted)), 16, "0")
        return F.md5(salted)

    aggs = []
    for b in range(bands):
        for r in range(rows_per_band):
            i = b * rows_per_band + r
            aggs.append(F.min(_h(i)).alias(f"h{i}"))
    sig = sh.groupBy(id_col).agg(*aggs)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("#", *parts).alias("signature"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.signature").alias("signature"))


def candidate_jaccard(
    df: DataFrame,
    cand: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact Jaccard for GIVEN candidate pairs only — the verify step
    of any LSH-style dedup. ``cand``: (id_a, id_b). Cost scales with
    |candidates| × shingles-per-doc, never with corpus pair count:
    shingles are computed only for docs appearing in ``cand`` (semi
    join), and the common-shingle count joins candidates to the two
    docs' shingle sets (equi-joins on id then (id, shingle)). Pairs
    sharing zero shingles are emitted with jaccard 0."""
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = shingles(df.join(ids, id_col, "left_semi"), id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        cand.join(common, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.coalesce(F.col("common"), F.lit(0))
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("common"), F.lit(0)))
            ).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    verify_threshold: float | None = 0.7,
) -> DataFrame:
    """MinHash-LSH near-dup removal: docs sharing any band signature
    are candidates; optionally verified with exact Jaccard computed for
    the CANDIDATE PAIRS ONLY (``candidate_jaccard`` — verify cost is
    O(|candidates|), preserving the bounding LSH exists for; a corpus-
    wide pair join here would re-introduce the quadratic path); the
    larger id of each surviving pair is dropped."""
    sigs = minhash_signatures(df, id_col, text_col, n, bands, rows_per_band)
    a = sigs.select(F.col(id_col).alias("id_a"), "band", "signature")
    b = sigs.select(F.col(id_col).alias("id_b"), "band", "signature")
    cand = (
        a.join(b, ["band", "signature"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is not None:
        cand = candidate_jaccard(df, cand, id_col, text_col, n).filter(
            F.col("jaccard") >= verify_threshold
        )
    victims = cand.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(victims, id_col, "left_anti")


# ----------------------------------------------------------------------
# transitive closure: connected components over a similarity graph
def connected_components_star(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    each round, large-star hangs every strictly-larger neighbor of a
    node onto the minimum of its closed neighborhood, then small-star
    does the same for the smaller-or-equal neighbors. Path lengths
    shrink geometrically ⇒ O(log n) rounds even on a degenerate
    10⁴-long chain, where min-label propagation would need
    diameter-many rounds. Converges when the edge set reaches its
    star-graph fixpoint (every edge = (node, component-min)).
    """
    e = (
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # localCheckpoint (not cache): TRUNCATES the logical plan, so
        # the per-round plan tree stays O(1) — a cached 15-round loop
        # otherwise accretes a plan deep enough to OOM codegen
        .localCheckpoint()
    )
    n_e = e.count()
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: emit (v, m) for every neighbor v > u, m = min(Γ⁺(u))
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("_mn"))
        mins = mins.select("a", F.least("_mn", F.col("a")).alias("_m"))
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .distinct()
        )
        # small-star over (u > v)-oriented edges: hang u and all its
        # smaller neighbors onto the minimum of the group
        o = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins2 = o.groupBy("u").agg(F.min("v").alias("_m"))
        small = (
            o.join(mins2, "u")
            .filter(F.col("v") != F.col("_m"))
            .select(F.col("v").alias("a"), F.col("_m").alias("b"))
            .unionByName(mins2.select(F.col("u").alias("a"), F.col("_m").alias("b")))
            .distinct()
            .localCheckpoint()
        )
        n_small = small.count()
        same = n_small == n_e and small.subtract(e).isEmpty()
        e, n_e = small, n_small
        if same:
            break
    from iceberg_compaction_spark.metrics import GLOBAL as _METRICS

    _METRICS.inc("cc.star_rounds", rounds)
    # fixpoint edges ARE (node, component-min) stars; roots and
    # isolated nodes label themselves
    labels = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    star_after: int = 4,
) -> DataFrame:
    """(node, component) where component = min node id reachable via
    ``edges`` (undirected). Min-label propagation to fixpoint: each
    round joins labels across edges and keeps the minimum — rounds
    needed = graph diameter, and near-dup clusters are shallow (a dup
    cluster's diameter is small by construction), so convergence is a
    handful of shuffle-join rounds on the EDGE set, never an all-pairs
    computation. Each round materializes (cache + count) to cut the
    lineage and test convergence.

    ``star_after``: rounds of label propagation after which a
    still-unconverged graph is handed to the alternating
    large-star/small-star algorithm (``connected_components_star``,
    O(log n) rounds) — deep chains and high-diameter graphs converge
    there instead of grinding out diameter-many propagation rounds.

    Turns one-level single-linkage dedup into true cluster dedup:
    A~B, B~C ⇒ {A,B,C} share one component even when A≁C directly.
    """
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    ).distinct()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("component")).cache()
    labels.count()
    for it in range(max_iter):
        if it >= star_after:
            # high-diameter graph: restart on the ORIGINAL edges with
            # the O(log n) star algorithm (partial labels don't form a
            # connectivity-preserving edge set — a star center's early
            # min-label can orphan its leaves — so no state carries over)
            labels.unpersist()
            return connected_components_star(edges, a_col, b_col)
        # candidate labels flowing across one hop
        prop = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "component")
        )
        new = (
            labels.select("node", "component").unionByName(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .cache()
        )
        changed = (
            new.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    return labels


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep exactly one document (the smallest id) per connected
    component of the similarity-pair graph ``pairs`` (id_a, id_b);
    documents in no pair survive untouched."""
    comp = connected_components(pairs)
    victims = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(victims, id_col, "left_anti")


# ----------------------------------------------------------------------
# SimHash
def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """(id, simhash): per-token md5-derived ``bits``-bit hash, bitwise
    ±1 vote across tokens, sign → fingerprint bit. Pure built-ins
    (explode + conv + shift/mask + sum), so an external SQL oracle can
    reproduce it bit-for-bit."""
    toks = F.split(F.trim(F.lower(F.regexp_replace(text_col, r"[^a-zA-Z0-9\s]", " "))), r"\s+")
    t = df.select(F.col(id_col), F.explode(toks).alias("tok")).filter(F.col("tok") != "")
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    t = t.select(id_col, h.alias("h"))
    votes = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = t.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << i)
        fp = bit if fp is None else fp + bit
    return agg.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 2,
) -> DataFrame:
    """Near-dup removal by SimHash: candidates share the fingerprint
    bucket (hamming 0) or differ in ≤ ``max_hamming`` bits, found via a
    self-join on fingerprint with a bit_count filter. At corpus scale
    the self-join is bucketed by fingerprint prefix (hamming ≤ k ⇒ at
    least one of k+1 prefix blocks equal — standard multi-index)."""
    fps = simhash(df, id_col, text_col, bits)
    # block on high bits: any pair within hamming k shares ≥1 of k+1
    # disjoint bit-blocks; explode docs into blocks → equi-join
    block_bits = bits // (max_hamming + 1)
    blocks = []
    for bi in range(max_hamming + 1):
        blocks.append(
            F.struct(
                F.lit(bi).alias("blk"),
                F.shiftright(F.col("simhash"), bi * block_bits)
                .bitwiseAND(F.lit((1 << block_bits) - 1))
                .alias("key"),
            )
        )
    ex = fps.select(id_col, "simhash", F.explode(F.array(*blocks)).alias("b")).select(
        id_col, "simhash", "b.blk", "b.key"
    )
    a = ex.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "key")
    b = ex.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "key")
    cand = (
        a.join(b, ["blk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .filter(
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= max_hamming
        )
    )
    victims = cand.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(victims, id_col, "left_anti")


# ----------------------------------------------------------------------
# embedding cosine near-dup
def cosine_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact pairwise cosine similarity (id_a < id_b) — the verify step
    run *inside* LSH buckets at scale (similarity.py provides the
    bucketing); calling it bare is all-pairs, test scale only."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    base = emb.select(F.col(id_col), F.col(vec_col), norm.alias("_n"))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("_n").alias("na")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("_n").alias("nb")
    )
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return joined.select(
        "id_a", "id_b", (dot / (F.col("na") * F.col("nb"))).alias("cosine")
    )


def lsh_candidate_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    tables: int = 16,
) -> DataFrame:
    """(id_a < id_b) candidate pairs from multi-table sign-LSH buckets:
    per table, vectors sharing the ``n_planes``-bit signature pair up
    via an equi-join on (table, signature) — never a cross product.
    Near-identical vectors (the dedup regime, cosine ≥ 0.95 ⇒ angle ≤
    18°) collide in ≥1 of 16 tables with probability > 1−10⁻⁵; planes
    are deterministic, so recall is a fixed property of the dataset,
    not a per-run coin flip."""
    from iceberg_compaction_spark.operators.similarity import add_lsh_signature

    base = emb.select(F.col(id_col), F.col(vec_col))
    dim_row = base.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return base.select(
            F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b")
        ).limit(0)
    parts = []
    for t in range(tables):
        parts.append(
            add_lsh_signature(base, vec_col, n_planes, dim=int(dim_row["d"]), table=t)
            .select(id_col, "_sig")
            .withColumn("_tbl", F.lit(t))
        )
    sigs = parts[0]
    for p in parts[1:]:
        sigs = sigs.unionByName(p)
    a = sigs.select(F.col(id_col).alias("id_a"), "_tbl", "_sig")
    b = sigs.select(F.col(id_col).alias("id_b"), "_tbl", "_sig")
    return (
        a.join(b, ["_tbl", "_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def embedding_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    tables: int = 16,
    bucketed: bool = True,
) -> DataFrame:
    """Drop vectors having a near-identical earlier vector.

    Scale shape (default): LSH bucket candidates (equi-join,
    ``lsh_candidate_pairs``) → exact cosine verify on candidates only →
    anti-join victims. All-pairs exact verify (``bucketed=False``) is
    the O(n²) fallback for tiny inputs or recall audits."""
    if not bucketed:
        pairs = cosine_pairs(emb, id_col, vec_col).filter(F.col("cosine") >= threshold)
        victims = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return emb.join(victims, id_col, "left_anti")
    cand = lsh_candidate_pairs(emb, id_col, vec_col, n_planes, tables)
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    base = emb.select(F.col(id_col), F.col(vec_col), norm.alias("_n"))
    va = base.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("_n").alias("na")
    )
    vb = base.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("_n").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", (dot / (F.col("na") * F.col("nb"))).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    victims = verified.select(F.col("id_b").alias(id_col)).distinct()
    return emb.join(victims, id_col, "left_anti")


# ----------------------------------------------------------------------
# incremental dedup against a persisted LSH index (round 6)
def minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    hash_fn: str = "md5",
) -> DataFrame:
    """The persisted LSH index relation for incremental dedup:
    ``(id, band, signature)`` — ~``bands`` short rows per document, NOT
    the text. A corpus's index is the only state a rolling ingest
    pipeline keeps; at 10⁹ docs × 8 bands × ~50 B it is a few hundred
    GB — joinable, and naturally bucketable on ``(band, signature)``."""
    return minhash_signatures(df, id_col, text_col, n, bands, rows_per_band, hash_fn)


def incremental_minhash_dedup(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    hash_fn: str = "md5",
    intra: bool = True,
    sigs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW increment (today's crawl) against the accumulated
    corpus WITHOUT rescanning the corpus: the index holds band
    signatures only, so the probe is one equi-join of the increment's
    signatures against the index on ``(band, signature)`` — any hit
    drops the new doc. With ``intra`` (default) the increment is also
    deduped against itself under the same banding first (smallest id
    survives), so two copies arriving in the same batch don't both
    slip past an index that predates them.

    Returns ``(survivors, new_index_rows)``; append ``new_index_rows``
    to the index table to absorb the increment. Signature params must
    match the ones the index was built with (``minhash_index``).
    ``sigs`` lets a caller that already computed the increment's
    signatures (the bucket-pruned table probe below) pass them in
    instead of recomputing.

    Scale shape: signatures are computed for the INCREMENT only (the
    corpus is never touched); both the intra self-join and the index
    probe are equi-joins on near-uniform hash keys — no skew, no
    cross product, and the index side streams (left-semi, no
    materialization of matched rows)."""
    if sigs is None:
        sigs = minhash_signatures(
            new_df, id_col, text_col, n, bands, rows_per_band, hash_fn
        )
    victims = sigs.join(
        index_df.select("band", "signature"), ["band", "signature"], "left_semi"
    ).select(id_col)
    if intra:
        smaller = sigs.select(
            F.col(id_col).alias("_id_small"), "band", "signature"
        )
        intra_victims = (
            sigs.join(smaller, ["band", "signature"])
            .filter(F.col("_id_small") < F.col(id_col))
            .select(id_col)
        )
        victims = victims.unionByName(intra_victims)
    survivors = new_df.join(victims.distinct(), id_col, "left_anti")
    new_index = sigs.join(
        survivors.select(id_col), id_col, "left_semi"
    )
    return survivors, new_index


def incremental_minhash_dedup_indexed(
    spark,
    new_df: DataFrame,
    index_table,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 8,
    rows_per_band: int = 2,
    hash_fn: str = "md5",
    intra: bool = True,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """``incremental_minhash_dedup`` against a PERSISTED index
    ``Table`` — the round-7 composition of the incremental probe with
    bucket hidden partitioning: when the index table carries a
    ``bucket_partition_spec`` on the signature column, the probe first
    projects the increment's signatures through the spec expr and
    restricts the index scan to exactly those partition values
    (``Table.scan(partition_values=...)``). A daily increment then
    opens only the index files whose bucket can contain a matching
    signature, instead of the whole few-hundred-GB index — the same
    metadata-first selection the reference applies to every plan
    (crates/planner/src/file_selection.rs:205-217).

    The bucket set is at most |buckets| values (spec-bounded, not
    data-bounded), so the driver collect is O(spec). An unpartitioned
    index degrades to a full scan — results are identical either way
    (pruning drops only files whose partition value provably cannot
    match). Pruned-file count is readable at
    ``index_table.last_scan_pruned_files`` for plan gates.

    Returns ``(survivors, new_index_rows)``; the caller appends
    ``new_index_rows`` to ``index_table`` to absorb the increment —
    ``write_data_files`` re-derives the bucket per row, keeping index
    files partition-pure.

    ``materialize`` (default) eagerly ``localCheckpoint``s both
    outputs inside the signature-cache scope, so the increment is read
    once and the caller can act on the results after this returns.
    The checkpointed blocks live on executors — on a real cluster an
    executor loss after heavy decommissioning makes them
    unrecoverable, so a long-pipeline caller that prefers pure lineage
    (recomputable, reads the increment once more per action) passes
    ``materialize=False``."""
    from pyspark.sql import functions as F  # noqa: F811 (module-level alias)

    sigs = minhash_signatures(
        new_df, id_col, text_col, n, bands, rows_per_band, hash_fn
    ).persist()
    try:
        spec = index_table.meta.get("partition") or {}
        expr = spec.get("expr")
        pvals = None
        if expr and spec.get("source_col") == "signature":
            pvals = {
                r["pv"]
                for r in sigs.select(
                    F.expr(expr).cast("string").alias("pv")
                ).distinct().collect()
            }
        # introspection for plan gates / self-gating queries: the exact
        # bucket restriction this probe handed to the scan
        index_table.last_probe_partition_values = pvals
        if index_table.files(content="data"):
            index_df = index_table.scan(spark, partition_values=pvals)
        else:
            index_df = spark.createDataFrame([], schema=index_table.schema())
        survivors, new_index = incremental_minhash_dedup(
            new_df, index_df, id_col, text_col, n, bands, rows_per_band,
            hash_fn, intra, sigs=sigs,
        )
        if materialize:
            # materialize inside the persist scope: both outputs derive
            # from sigs, and the caller's actions run after unpersist
            survivors = survivors.localCheckpoint(eager=True)
            new_index = new_index.localCheckpoint(eager=True)
    finally:
        if materialize:
            sigs.unpersist()
        # materialize=False: leave sigs cached for the caller's own
        # actions; Spark evicts LRU, so an abandoned cache is benign
    return survivors, new_index


# ----------------------------------------------------------------------
# benchmark decontamination (round 5)
def decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_hits: int = 1,
) -> DataFrame:
    """Flag training documents sharing ≥ ``min_hits`` distinct word
    n-grams with ANY benchmark document — the eval-overlap filter every
    large-scale training-data pipeline runs before training (the GPT-3
    13-gram-style check). Returns (id, contaminated_ngrams) for flagged
    docs; anti-join it against the corpus to drop them.

    100-TB shape: both sides reuse the ``shingles`` machinery (distinct
    n-grams per doc, all built-ins); the benchmark's distinct shingle
    set is tiny relative to the corpus, so the overlap is a BROADCAST
    equi-join against it (no shuffle of the corpus shingles beyond the
    per-doc group-by), then one count per flagged doc. No cross
    product, no UDFs."""
    tr = shingles(train_df, id_col, text_col, n)
    be = shingles(bench_df, id_col, text_col, n).select("shingle").distinct()
    return (
        tr.join(F.broadcast(be), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("contaminated_ngrams"))
        .filter(F.col("contaminated_ngrams") >= min_hits)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling for training-mix assembly:
    keep a row iff the first 4 hex chars of md5(id) fall below the
    stratum's threshold — reproducible across runs, engines and
    cluster sizes (no RNG, no seed plumbing), and exactly expressible
    in ANSI SQL for oracle checks. Fractions are quantized to 1/65536
    granularity. Pure JVM expressions, zero shuffles — sampling
    composes with the scan."""
    def _thresh(frac: float) -> str:
        q = max(0, min(65536, round(frac * 65536)))
        # 'g' sorts after every hex digit, so a full fraction keeps all
        # rows; '10000' would NOT (lexicographic compare against 4-char
        # buckets: 'a…' > '10000')
        return "g" if q >= 65536 else format(q, "04x")

    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    expr = F.lit(_thresh(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        expr = F.when(F.col(strata_col) == stratum, F.lit(_thresh(frac))).otherwise(expr)
    return df.filter(bucket < expr)
