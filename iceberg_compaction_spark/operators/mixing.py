"""Training-mix assembly: temperature-based domain rebalancing and
deterministic shard export.

Companion to ``dedup.stratified_sample`` (explicit per-stratum
fractions): here the fractions are *derived from the corpus itself* —
the multilingual-LM "temperature sampling" scheme that flattens a
skewed source distribution — and the export side materializes the
training order as hash-sharded, hash-ordered files.

Everything is deterministic and engine-portable (md5 arithmetic, no
RNG), so results are identical across cluster sizes, retries, and the
DuckDB oracle — the property that makes a 100 TB pipeline re-runnable.
The reference engine has no corpus surface (SURVEY §2.12 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: md5-prefix keep threshold domain: first 8 hex chars as an integer
#: in [0, 2^32). A fraction f keeps ids whose prefix < floor(f·2^32).
_HASH_SPACE = 1 << 32


def _hash32(col) -> "F.Column":
    """First 32 bits of md5(value) as a long in [0, 2^32) — the
    deterministic uniform draw shared with the DuckDB oracle
    (('0x' || substr(md5(x), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def temperature_fractions(
    df: DataFrame, source_col: str = "source", alpha: float = 0.5,
    base_fraction: float = 1.0,
) -> DataFrame:
    """Per-source keep fractions that flatten the source distribution
    with temperature ``alpha``: f_s = base_fraction · (n_max/n_s)^(1-α),
    capped at 1. α=1 keeps every source at ``base_fraction`` (no
    rebalance); α=0 targets equal post-sample counts per source; the
    α=0.5 default is the sqrt-flattening used for multilingual mixes.

    Anchoring on n_max (not a normalizing sum) is deliberate: max() of
    integers is exact and order-independent, and with α=0.5 the only
    non-exact step is IEEE sqrt (correctly rounded by spec), so the
    fraction is BIT-IDENTICAL in any engine — a floating-point sum
    across sources would depend on addition order. Fractions are
    rounded to 6 decimals before thresholding for the same reason
    (documented ±ulp guard for non-half alphas, where pow() is only
    faithfully rounded).

    One tiny aggregate (|sources| rows) + a window over it; nothing
    touches the driver."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    n_max = F.max("_n").over(Window.partitionBy())
    ratio = n_max / F.col("_n")
    scale = (
        F.sqrt(ratio)
        if alpha == 0.5
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    frac = F.round(F.least(F.lit(1.0), F.lit(base_fraction) * scale), 6)
    return counts.select(source_col, F.col("_n").alias("n_source"), frac.alias("keep_frac"))


def mixture_resample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    base_fraction: float = 1.0,
) -> DataFrame:
    """Deterministically resample the corpus to the temperature-α
    mixture: broadcast-join the per-source fractions (|sources| rows)
    and keep rows whose 32-bit md5 draw falls under the threshold.
    Map-side except the fraction broadcast — no data-sized shuffle, and
    the same rows survive at any parallelism."""
    fracs = temperature_fractions(df, source_col, alpha, base_fraction)
    thresh = F.floor(F.col("keep_frac") * F.lit(float(_HASH_SPACE))).cast("long")
    return (
        df.join(F.broadcast(fracs), source_col)
        .filter(_hash32(F.col(id_col)) < thresh)
        .drop("n_source", "keep_frac")
    )


#: default per-shard row bound for the validated/auto-derived export
#: paths: one shard is one window partition (sorted on one core), and
#: ~1M rows of few-KB documents is a low-GB sort that fits executor
#: memory with headroom — the SCALE.md "n_shards floor" contract
DEFAULT_MAX_ROWS_PER_SHARD = 1_000_000


def shard_floor(n_rows: int, max_rows_per_shard: int = DEFAULT_MAX_ROWS_PER_SHARD) -> int:
    """Smallest n_shards that keeps expected rows/shard under the
    bound. Shard keys are uniform md5 draws, so per-shard counts
    concentrate tightly around n_rows/n_shards (binomial; the ±4σ
    spread is <1% at these sizes) — the floor is computed on the
    expectation."""
    if max_rows_per_shard <= 0:
        raise ValueError(f"max_rows_per_shard must be positive, got {max_rows_per_shard}")
    return max(1, -(-int(n_rows) // int(max_rows_per_shard)))


def export_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "train-v1",
    max_rows_per_shard: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training export: every row gets
    a shard in [0, n_shards) and a dense 1-based rank inside its shard,
    both pure functions of (seed, id). Changing the seed reshuffles;
    re-running at any cluster size reproduces the exact order — the
    property checkpointed training needs from its data loader.

    shard = md5₃₂(seed:id) mod n_shards; within-shard order is the
    hash value itself (id as tiebreak for the 2⁻³² collision case).
    One shuffle (the per-shard window); shard keys are uniform by
    construction, so the window never sees a hot key at any scale.

    The seam is shard COUNT, not key skew: one shard is ONE window
    partition sorted on one core, corpus/n_shards rows — with a small
    n_shards on a large corpus that single sort is the bottleneck and
    can spill. Pass ``max_rows_per_shard`` (or use ``write_shards``,
    which validates by default) to enforce the documented floor:
    n_shards ≥ ceil(rows / max_rows_per_shard) — the check costs one
    count of ``df``."""
    if max_rows_per_shard is not None:
        n_rows = df.count()
        floor_n = shard_floor(n_rows, max_rows_per_shard)
        if n_shards < floor_n:
            raise ValueError(
                f"n_shards={n_shards} puts ~{n_rows // max(1, n_shards)} rows in "
                f"each single-reducer shard partition (> {max_rows_per_shard}); "
                f"use n_shards >= {floor_n} for this {n_rows}-row corpus"
            )
    key = _hash32(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        df.withColumn("sort_key", key)
        .withColumn("shard", (F.col("sort_key") % n_shards).cast("int"))
        .withColumn("shard_rank", F.row_number().over(w).cast("long"))
    )


def write_shards(
    df: DataFrame, path: str, n_shards: int | None = None, id_col: str = "doc_id",
    seed: str = "train-v1",
    max_rows_per_shard: int = DEFAULT_MAX_ROWS_PER_SHARD,
) -> int:
    """Materialize the export: one directory per shard
    (``shard=K/``), rows within each file in shard_rank order.
    ``repartition(shard)`` + ``sortWithinPartitions`` keeps the write
    single-pass (the window in export_shards already shuffled by the
    same key, so AQE coalesces rather than re-exchanging).

    ``n_shards=None`` auto-derives the count from the corpus size
    (``shard_floor``); an explicit ``n_shards`` below the floor raises
    rather than silently serializing the export through a handful of
    giant sorts. Returns the shard count used."""
    if n_shards is None:
        n_shards = shard_floor(df.count(), max_rows_per_shard)
        checked = None  # already at the floor by construction
    else:
        checked = max_rows_per_shard
    out = export_shards(df, n_shards, id_col, seed, max_rows_per_shard=checked)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_rank")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    return n_shards
