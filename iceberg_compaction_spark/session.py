"""SparkSession factory with engine-appropriate defaults.

Pinned to UTC (duckdb-oracle parity), AQE on (runtime re-plan + skew-join
handling), Arrow on (vectorized pandas UDFs only — per-row Python UDFs are
banned engine-wide, enforced by tests/test_no_rowpython.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "iceberg-compaction-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cores}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (Spark's legacy default) carries no column statistics —
        # TIMESTAMP_MICROS gives ts min/max in footers, enabling
        # manifest bounds + predicate pushdown on time (Iceberg writes
        # int64 micros too, SURVEY.md §1.2)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # metadata tables are tiny; don't over-split them
        .config("spark.sql.files.openCostInBytes", str(4 << 20))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        # SQL shuffles have no map-side combine → the serialized
        # (UnsafeShuffleWriter) path beats bypass-merge (which creates
        # maps×reducers spill files); measured ~1.8× on compaction
        .config("spark.shuffle.sort.bypassMergeThreshold", "8")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
