"""Text-analysis operators for training-data pipelines: token counts,
quality scoring, language ID, fingerprinting.

All pure built-in Column expressions (JVM, whole-stage codegen) —
deliberately no UDFs, so they run at full scan speed over a 100 TB
``documents`` table and are reproducible by an external SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(text: str | Column = "text") -> Column:
    """Whitespace tokens."""
    t = F.trim(text) if isinstance(text, str) else F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: str | Column = "text") -> Column:
    """A BPE-flavored proxy: word pieces + digits + punctuation marks
    each count (regex segmentation, no vocab). Useful as a fast
    token-budget estimator in the scan itself."""
    pieces = F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"))
    return pieces.cast("int")


def char_classes(text: str | Column = "text"):
    total = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.regexp_count(text, F.lit(r"[.,!?;:]"))
    space = F.regexp_count(text, F.lit(r"\s"))
    return total, alpha, digit, punct, space


_STOPWORDS = ("the", "and", "of", "to", "in", "is", "a", "that")


def quality_score(text: str | Column = "text") -> Column:
    """Deterministic [0,1] quality heuristic: length band + alpha ratio
    + stopword presence − punctuation excess. Matches common corpus
    filters (Gopher/C4-style rules, public)."""
    total, alpha, digit, punct, space = char_classes(text)
    words = token_count(text)
    alpha_ratio = F.when(total > 0, alpha / total).otherwise(F.lit(0.0))
    punct_ratio = F.when(total > 0, punct / total).otherwise(F.lit(0.0))
    low = F.lower(text)
    stop_hits = None
    for s in _STOPWORDS:
        h = F.when(low.rlike(rf"\b{s}\b"), 1).otherwise(0)
        stop_hits = h if stop_hits is None else stop_hits + h
    len_band = (
        F.when((words >= 5) & (words <= 100_000), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    score = (
        len_band
        + F.least(alpha_ratio, F.lit(0.6)) * F.lit(0.5 / 0.6)
        + F.least(stop_hits.cast("double") / F.lit(4.0), F.lit(1.0)) * F.lit(0.25)
        - F.least(punct_ratio * F.lit(2.0), F.lit(0.25))
    )
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 4)


_LANG_MARKERS = {
    "en": ("the", "and", "is", "of"),
    "de": ("der", "und", "die", "nicht"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "que", "y"),
}


def lang_id(text: str | Column = "text") -> Column:
    """N-gram/stopword-marker language ID over {en,de,fr,es} with
    'und' (undetermined) fallback — a deterministic heuristic, the
    classic fast pre-filter before a real classifier."""
    low = F.lower(text)
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        s = None
        for m in markers:
            h = F.regexp_count(low, F.lit(rf"\b{m}\b"))
            s = h if s is None else s + h
        scores[lang] = s
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic precedence on ties: en > de > fr > es
    for lang in reversed(list(_LANG_MARKERS)):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: str | Column = "text") -> Column:
    """Canonical document fingerprint: md5 of lowercased,
    whitespace-collapsed, punctuation-stripped text — stable under
    formatting noise; the key for cross-corpus exact dedup."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", ""), r"\s+", " ")
    )
    return F.md5(norm)


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass enrichment with all text metrics."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("tokens_ws"),
        bpe_ish_token_count(t).alias("tokens_bpe"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS algorithm, public): hash every character k-gram of the
    normalized text (rolling-hash family; md5-prefix here so an
    external SQL oracle reproduces it bit-for-bit), slide a window of
    ``window`` consecutive k-gram hashes, keep each window's minimum.
    The distinct (doc, hash) survivors are a position-robust signature:
    any shared substring of length ≥ k + window − 1 guarantees a shared
    fingerprint, which whole-document hashing cannot do.

    Plan shape: posexplode(k-grams) → min over an ordered row window
    per doc → distinct. One shuffle on doc_id; no UDFs, scan-speed
    expressions throughout.
    """
    from pyspark.sql import Window as W

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("_norm") - k + 1, F.lit(1))),
        lambda i: F.col("_norm").substr(i, F.lit(k)),
    )
    ex = (
        df.withColumn("_norm", norm)
        .filter(F.length("_norm") >= k)
        .select(F.col(id_col), F.posexplode(grams).alias("_pos", "_g"))
        .select(
            id_col,
            "_pos",
            F.conv(F.substring(F.md5("_g"), 1, 8), 16, 10).cast("long").alias("_h"),
        )
    )
    w = W.partitionBy(id_col).orderBy("_pos").rowsBetween(0, window - 1)
    return (
        ex.withColumn("_n", F.count("*").over(W.partitionBy(id_col)))
        .withColumn("_win_min", F.min("_h").over(w))
        # only full windows select fingerprints (the final short windows
        # repeat earlier minima or under-sample; SIGMOD defn uses full)
        .filter(F.col("_pos") <= F.col("_n") - window)
        .select(F.col(id_col), F.col("_win_min").alias("fingerprint_hash"))
        .distinct()
    )


def bm25_scores(
    df,
    query_terms,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 relevance of every document against ``query_terms`` — the
    query-relevance-mining shape training-data curation uses to surface
    documents about a topic from a raw corpus. Returns (id, bm25).

    Plan: one explode to (doc, term) with per-doc term frequencies and
    lengths (map-side combine), corpus count + avgdl as ONE scalar
    aggregate round-trip, score as a pure JVM expression —
    scan-dominated, one shuffle on the (doc, term) group-by, no UDFs.
    Documents sharing no term score 0 (kept: the caller thresholds)."""
    from pyspark.sql import functions as F

    terms = [t.lower() for t in query_terms]
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")),
        r"\s+",
    )
    base = df.select(F.col(id_col), toks.alias("_toks")).select(
        id_col, F.size("_toks").alias("_dl"), F.explode("_toks").alias("_term")
    )
    # both corpus scalars in ONE driver round-trip and one narrow scan:
    # n_docs counts every row (null-text docs included, scoring 0
    # downstream), avgdl averages token counts (size of the split
    # array == exploded token count; null arrays are ignored by avg,
    # matching the oracle's per-tokenized-doc mean)
    stats = (
        df.select(F.size(toks).alias("_dl"))
        .agg(F.count("*").alias("_n"), F.avg("_dl").alias("_avgdl"))
        .collect()[0]
    )
    n_docs, avgdl = stats["_n"], stats["_avgdl"]
    tf = (
        base.filter(F.col("_term").isin(terms))
        .groupBy(id_col, "_term")
        .agg(F.count("*").alias("_tf"), F.max("_dl").alias("_dl"))
    )
    dfreq = tf.groupBy("_term").agg(F.count("*").alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "_term")
        .withColumn(
            "_idf",
            F.log((F.lit(float(n_docs)) - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1))
            / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.lit(float(avgdl)))),
        )
        .groupBy(id_col)
        .agg(F.sum("_s").alias("bm25"))
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col, F.coalesce("bm25", F.lit(0.0)).alias("bm25"))
    )


def repetition_metrics(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1), the
    curation signals that catch boilerplate/spam before training:
      * ``top2_frac`` — share of the document's word 2-grams taken by
        its single most frequent 2-gram;
      * ``dup5_frac`` — share of word 5-grams that are duplicates
        (1 − distinct/total).
    Documents too short for an n-gram score 0. Pure built-ins: one
    tokenize, two (doc, gram) explode→group-bys on uniform keys — the
    same bounded-shuffle shape as shingling, no UDFs."""
    from pyspark.sql import functions as F

    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")),
        r"\s+",
    )

    def grams(n: int):
        return F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.array_join(F.slice("_toks", i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = df.select(F.col(id_col), toks.alias("_toks"))
    g2 = (
        base.select(id_col, F.explode(grams(2)).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg((F.max("_c") / F.sum("_c")).alias("top2_frac"))
    )
    g5 = (
        base.select(id_col, F.explode(grams(5)).alias("_g"))
        .groupBy(id_col)
        .agg(
            (
                (F.count("*") - F.count_distinct(F.col("_g"))) / F.count("*")
            ).alias("dup5_frac")
        )
    )
    return (
        df.select(id_col)
        .join(g2, id_col, "left")
        .join(g5, id_col, "left")
        .select(
            id_col,
            F.coalesce("top2_frac", F.lit(0.0)).alias("top2_frac"),
            F.coalesce("dup5_frac", F.lit(0.0)).alias("dup5_frac"),
        )
    )


# ----------------------------------------------------------------------
# round 6: PII redaction — the corpus-curation pass every training-data
# pipeline runs before anything ships. Pure built-ins (JVM regex inside
# whole-stage codegen), map-only: zero shuffles, zero Python.
#
# Pattern dialect is the RE2/Java COMMON SUBSET (no lookaround, no \b)
# so the DuckDB oracle runs the byte-identical patterns.
PII_RULES: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", rules: tuple = PII_RULES
) -> DataFrame:
    """Per-rule match counts (on the ORIGINAL text, order-independent)
    plus ``<text_col>_redacted`` with placeholders substituted in rule
    order (email before ipv4, so a dotted-quad inside an email domain
    redacts as part of the email). Counts are bigint for oracle-type
    parity (DuckDB ``len(regexp_extract_all(...))``)."""
    t = F.col(text_col)
    cols = list(df.columns)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _tok in rules
    ]
    red = t
    for _name, pat, tok in rules:
        red = F.regexp_replace(red, pat, tok)
    return df.select(*cols, *counts, red.alias(f"{text_col}_redacted"))


# ----------------------------------------------------------------------
# hashed linear classifier (quality-model scoring plumbing)
def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 256,
    weights: list[float] | None = None,
) -> DataFrame:
    """Bag-of-words linear classifier over hashed token features — the
    fasttext-style quality-model scoring pass every corpus pipeline
    runs, expressed entirely in built-ins so it rides the scan
    (map-only, zero shuffles, no Python in the loop).

    Each token hashes to a bucket in [0, dim) via its first 32 md5
    bits; the document score is the mean bucket weight. With
    ``weights`` given, the (broadcast-literal) model array is real —
    plug a trained model in. With ``weights=None`` the weight is
    DERIVED from the bucket id (Knuth-hash → integer milli-weight in
    [-500, 500)), which keeps the whole computation reproducible by an
    external SQL oracle with no side-channel model table.

    Determinism note: the per-token sum is carried in exact INTEGER
    millis via ``aggregate`` over the token array — floating-point
    addition order can differ between engines, integer addition
    cannot — and becomes a double only in the final single division.

    Adds: n_toks (long), score_milli_sum (long), score (double),
    label (boolean, score > 0)."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(text_col), r"[^a-z0-9\s]", " ")), r"\s+"
    )
    bucket = lambda tok: (  # noqa: E731
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % dim
    )
    if weights is None:
        # Knuth multiplicative hash of the bucket id → millis in [-500, 500)
        w_milli = lambda tok: F.pmod(bucket(tok) * 2654435761, 1000) - 500  # noqa: E731
    else:
        if len(weights) != dim:
            raise ValueError(f"weights has {len(weights)} entries, dim={dim}")
        arr = F.lit([int(round(w * 1000)) for w in weights])
        w_milli = lambda tok: F.element_at(arr, (bucket(tok) + 1).cast("int")).cast("long")  # noqa: E731
    milli_sum = F.aggregate(
        "_toks", F.lit(0).cast("long"), lambda acc, tok: acc + w_milli(tok)
    )
    return (
        df.withColumn("_toks", toks)
        .withColumn("n_toks", F.size("_toks").cast("long"))
        .withColumn("score_milli_sum", milli_sum)
        .withColumn(
            "score",
            F.col("score_milli_sum") / (F.col("n_toks") * 1000.0),
        )
        .withColumn("label", F.col("score") > 0)
        .drop("_toks")
    )


# ----------------------------------------------------------------------
# C4-style line-level cleaning
_LINE_STOPWORDS = ("the", "a")


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    line_tokens: int = 8,
    min_words: int = 5,
    stopwords: tuple = _LINE_STOPWORDS,
    banned: tuple = ("slow",),
) -> DataFrame:
    """C4-style line filtering (Raffel et al. 2020 §2.2: drop lines
    with too few words, no terminal punctuation / no natural-language
    marker, or containing blocklisted terms), re-expressed over this
    corpus's structure: the synthetic documents carry no newlines, so
    "lines" are fixed ``line_tokens`` windows — the rule engine, not
    the segmentation, is the operator. A real corpus passes its own
    segmentation by splitting on '\\n' upstream.

    A line survives when it has ≥ ``min_words`` tokens, contains at
    least one ``stopwords`` marker (C4's "natural language" proxy),
    and no ``banned`` term. Map-only built-ins: slicing + higher-order
    filter, zero shuffles, zero Python.

    Adds: n_lines, n_kept_lines (long), text_clean (kept lines
    rejoined)."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(text_col), r"[^a-z0-9\s]", " ")), r"\s+"
    )
    n_lines = F.ceil(F.size("_toks") / float(line_tokens)).cast("long")
    lines = F.transform(
        F.sequence(F.lit(0), (n_lines - 1).cast("int")),
        lambda i: F.slice("_toks", i * line_tokens + 1, line_tokens),
    )
    good = lambda ln: (  # noqa: E731
        (F.size(ln) >= min_words)
        & F.arrays_overlap(ln, F.lit(list(stopwords)))
        & ~F.arrays_overlap(ln, F.lit(list(banned)))
    )
    kept = F.filter(lines, good)
    return (
        df.withColumn("_toks", toks)
        .withColumn("n_lines", n_lines)
        .withColumn("n_kept_lines", F.size(F.filter(lines, good)).cast("long"))
        .withColumn(
            "text_clean",
            F.array_join(F.transform(kept, lambda ln: F.array_join(ln, " ")), " "),
        )
        .drop("_toks")
    )
