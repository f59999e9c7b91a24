"""Substring-level duplicate-span detection and trimming.

Document-level dedup (``operators/dedup.py``) removes whole near-copy
documents; this module removes *repeated passages* inside otherwise
distinct documents — the "deduplicating training data" substring pass
(Lee et al. 2022 use a suffix array; the distributed re-expression is
position-tagged n-gram hashing, the standard cluster-scale
approximation). The reference engine has no corpus operators at all
(its pipeline surface stops at table maintenance, crates/planner); this
is part of the SURVEY §2.12 training-pipeline extension family.

Scale shape (the whole point):
  * tokenize once per row (map-side),
  * posexplode position-tagged n-grams — one shuffle on the gram key
    (uniform: grams are near-unique, no hot keys),
  * global gram → distinct-doc-count aggregation (partial aggregation
    map-side),
  * equi-join hits back (never a cross product; the duplicated-gram
    relation is a small fraction of all grams),
  * per-document window to merge covered positions into maximal spans —
    one shuffle on doc_id, bounded by document length per key.
No collect() anywhere; every stage is a hash-partitioned DataFrame op
that survives a 1000-executor corpus. For corpora where even the gram
relation is too wide, pass ``gram_hash=True`` to shuffle 8-byte
xxhash64 keys instead of gram strings (same join shape, ~10× narrower
shuffle rows; the driver oracle uses the string form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_compaction_spark.functions.util import spread_small_input


def _tokens(text_col) -> "F.Column":
    """Shared normalization: lower → strip non-alnum → split on
    whitespace. Matches the DuckDB oracle spelling in
    queries_pipeline._NORM_SQL."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(text_col), r"[^a-z0-9\s]", " ")), r"\s+"
    )


def positional_grams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    gram_hash: bool = False,
) -> DataFrame:
    """(id, pos, gram) — one row per n-gram occurrence, ``pos`` the
    0-based start token index. Documents shorter than ``n`` tokens
    contribute no grams (a shorter slice would alias across lengths).
    Unlike ``dedup.shingles`` the array is NOT distinct'd: positions
    matter here."""
    # round 9 (guide §2.5 input skew): spread the small pre-explosion
    # rows so the tokenize + gram expressions parallelize; no-op when
    # the scan already has enough splits.
    df = spread_small_input(df)
    toks = _tokens(text_col)
    grams = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - n),
            lambda i: F.array_join(F.slice("_toks", i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = (
        df.withColumn("_toks", toks)
        .select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
    )
    if gram_hash:
        out = out.withColumn("gram", F.xxhash64("gram"))
    return out


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 2,
    gram_hash: bool = False,
) -> DataFrame:
    """Maximal token spans covered by n-grams that occur in at least
    ``min_docs`` DISTINCT documents. Returns (id, span_start, span_end,
    span_len) with token-index bounds inclusive.

    Span merge is the gaps-and-islands window: a gram starting at
    ``pos`` covers [pos, pos+n-1]; a new island starts where the
    running max covered end leaves a gap. Output spans are exactly the
    maximal contiguous runs of covered tokens."""
    grams = positional_grams(df, id_col, text_col, n, gram_hash=gram_hash)
    if min_docs == 2:
        # round 9 (guide §2.4): "appears in ≥2 distinct documents" is
        # exactly min(id) != max(id), so ONE shuffle of the gram
        # relation (a whole-partition window) replaces the
        # count-distinct aggregation + join-back — which shuffled the
        # same gram keys twice and recomputed the tokenize + gram
        # expressions for each side. A hot gram lands in one window
        # partition, but the old plan's distinct aggregation sent the
        # identical (gram, id) pairs to one reducer too — no new skew.
        wg = Window.partitionBy("gram")
        hits = (
            grams.withColumn("_mn", F.min(id_col).over(wg))
            .withColumn("_mx", F.max(id_col).over(wg))
            .filter(F.col("_mn") != F.col("_mx"))
            .select(id_col, "pos")
        )
    else:
        dup = (
            grams.groupBy("gram")
            .agg(F.countDistinct(id_col).alias("_nd"))
            .filter(F.col("_nd") >= min_docs)
            .select("gram")
        )
        hits = grams.join(dup, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + n - 1).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    islands = hits.withColumn("_isl", F.sum(new_island).over(w))
    return (
        islands.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


def trim_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 2,
    gram_hash: bool = False,
) -> DataFrame:
    """Rewrite each document with duplicated spans removed. Returns the
    input columns plus ``n_tokens`` (before), ``n_dup_tokens`` (tokens
    inside duplicated spans) and ``text_trimmed`` (surviving tokens
    rejoined with single spaces; normalized casing — trimming is a
    destructive corpus pass by nature).

    The span set rides back as one ARRAY per document (bounded by
    document length — a per-row payload, not a driver structure), and
    the token drop is a higher-order filter over the token array:
    map-side after the one spans join."""
    spans = duplicate_spans(df, id_col, text_col, n, min_docs, gram_hash=gram_hash)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    out = df.join(per_doc, id_col, "left").withColumn("_toks", _tokens(text_col))
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 1),
            lambda i: F.struct(i.alias("i"), F.element_at("_toks", i + 1).alias("t")),
        ),
        lambda s: ~F.exists(
            F.coalesce(
                F.col("_spans"),
                F.array().cast("array<struct<span_start:long,span_end:long>>"),
            ),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] <= sp["span_end"]),
        ),
    )
    dup_count = F.when(F.col("_spans").isNull(), F.lit(0)).otherwise(
        F.aggregate(
            "_spans",
            F.lit(0).cast("long"),
            lambda acc, s: acc + (s["span_end"] - s["span_start"] + 1),
        )
    )
    return (
        out.withColumn("n_tokens", F.size("_toks").cast("long"))
        .withColumn("n_dup_tokens", dup_count.cast("long"))
        .withColumn(
            "text_trimmed",
            F.array_join(F.transform(kept, lambda s: s["t"]), " "),
        )
        .drop("_toks", "_spans")
    )
