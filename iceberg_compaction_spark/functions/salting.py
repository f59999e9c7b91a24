"""Explicit skew salting for hot keys (north-rule requirement;
SURVEY.md §4.2 — the reference generates hot keys,
``data_generator.rs:416-418``, but never handles the skew).

Two mechanisms, used where each fits:
  * range-partitioned *writes* already divide hot conversations
    because ``turn_idx`` participates in the range key — a single
    conv_id spanning many partitions is fine for files;
  * key-only *aggregations/joins* (e.g. per-conversation rollups,
    dedup by key) need salting: ``_salt = pmod(xxhash64(keys…), S)``
    for keys found hot, two-phase aggregate, AQE skew-join for joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def hot_keys(df: DataFrame, key: str, threshold_share: float = 0.10, max_keys: int = 64):
    """Keys holding more than ``threshold_share`` of all rows. One
    aggregation pass over the key column only."""
    total = df.count()
    if total == 0:
        return []
    rows = (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= F.lit(int(total * threshold_share)))
        .orderBy(F.desc("n"))
        .limit(max_keys)
        .collect()
    )
    return [r[key] for r in rows]


def with_salt(df: DataFrame, keys: list[str], buckets: int, hot: list | None = None) -> DataFrame:
    """Add ``_salt`` ∈ [0, buckets): real salt for hot keys, 0 for the
    rest (so cold keys don't shuffle-explode). ``hot`` restricts
    salting to those values of ``keys[0]``; None salts everything."""
    salt = F.pmod(F.xxhash64(*keys, F.lit("salt")), F.lit(buckets)).cast("int")
    if hot is not None:
        salt = F.when(F.col(keys[0]).isin(list(hot)), salt).otherwise(F.lit(0))
    return df.withColumn(SALT_COL, salt)


def salted_count(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe count per key: partial count per (key, salt)
    then re-aggregate. Identical result to ``groupBy(key).count()``;
    bounded reducer fan-in for hot keys."""
    return (
        with_salt(df, [key], buckets)
        .groupBy(key, SALT_COL)
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("turns"))
    )
