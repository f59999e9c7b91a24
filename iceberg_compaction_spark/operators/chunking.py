"""Document chunking + sequence packing — the shaping steps between a
curated corpus and a training run.

Long documents become overlapping fixed-token-window chunks
(``chunk_documents``), and chunks are assigned to fixed-budget training
sequences (``pack_sequences``) by a deterministic running-total rule —
both pure built-in Column expressions (tokenize once, slice per chunk;
one window for the running total), so they run at scan speed over a
100 TB corpus and are exactly reproducible by an external SQL oracle
(no RNG, no UDFs, no driver loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into word-token windows of ``chunk_tokens``
    with ``overlap`` tokens shared between consecutive chunks
    (stride = chunk_tokens − overlap). Returns
    (id, chunk_idx, chunk_text, n_tokens).

    Chunk count: 1 for docs within one window, else
    ``ceil((n − chunk) / stride) + 1`` — the final chunk may be short
    (its real token count is returned; no padding here). Docs with no
    tokens produce no chunks. Plan: tokenize once per row, then one
    posexplode over the per-doc chunk index range — map-side only
    until the caller aggregates."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")),
        r"\s+",
    )
    n = F.size("_toks")
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.when(n <= chunk_tokens, F.lit(1)).otherwise(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1
        )
    )
    base = (
        df.withColumn("_toks", toks)
        # empty text tokenizes to [''] — treat as no tokens
        .withColumn(
            "_toks",
            F.when(
                (F.size("_toks") == 1) & (F.element_at("_toks", 1) == ""),
                F.array().cast("array<string>"),
            ).otherwise(F.col("_toks")),
        )
        .withColumn("_nc", n_chunks)
        .filter(F.col("_nc") > 0)
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return (
        base.select(
            F.col(id_col),
            F.col("_toks"),
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).alias("n_tokens"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
    n_shards: int | None = None,
) -> DataFrame:
    """Assign chunks to fixed-token-budget training sequences by the
    deterministic running-total rule: in (id, chunk_idx) order,
    ``seq_id = floor(tokens_before_this_chunk / budget)`` — the
    greedy-concatenation packing every large-scale pretraining
    pipeline uses (documents concatenated in a canonical order, cut
    every ``budget`` tokens; a chunk straddling a boundary belongs to
    the sequence it starts in). Adds ``seq_id``.

    ``n_shards=None`` uses ONE global window — exact single-stream
    semantics, fine up to maybe 10^8 chunks but a single-partition
    sort beyond that. At corpus scale pass ``n_shards``: documents are
    hash-sharded (md5-prefix, engine-portable and deterministic) into
    independent token streams packed in parallel — sequences never
    span shards (standard practice; each shard is its own stream) and
    ``seq_id = shard * 2^40 + local_seq`` keeps ids globally unique
    and collision-free below ~10^12 tokens per shard."""
    if n_shards is None:
        w = (
            Window.orderBy(F.asc(id_col), F.asc(idx_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        running = F.sum(tokens_col).over(w)
        return chunks.withColumn(
            "seq_id",
            F.floor((running - F.col(tokens_col)) / F.lit(budget)).cast("long"),
        )
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    sharded = chunks.withColumn("_shard", shard)
    w = (
        Window.partitionBy("_shard")
        .orderBy(F.asc(id_col), F.asc(idx_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(tokens_col).over(w)
    local = F.floor((running - F.col(tokens_col)) / F.lit(budget)).cast("long")
    return sharded.withColumn(
        "seq_id", (F.col("_shard") * F.lit(1 << 40) + local).cast("long")
    ).drop("_shard")
