"""Iceberg-style metadata tables as DataFrames.

Iceberg exposes ``db.table.files / .partitions / .snapshots / .history
/ .refs`` for operational queries; the engine's equivalents below sit
on ``files_df`` (already executor-resolved) and the snapshot JSONs
(driver-side, metadata-sized). Monitoring a 10^12-row table — which
partitions fragmented, how fast snapshots accrue, where branches point
— must itself cost metadata, never a data scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources.table import Table


def partitions_df(spark: SparkSession, table: Table, snapshot_id: int | None = None) -> DataFrame:
    """Per-partition rollup of the live manifest: file/byte/row totals
    split by content kind — the input to fragmentation dashboards and
    `recommend_compaction`-style triggers, computed as a DataFrame agg
    over the manifest (no data IO)."""
    f = table.files_df(spark, snapshot_id)
    return (
        f.groupBy("partition")
        .agg(
            F.sum(F.when(F.col("content") == mf.CONTENT_DATA, 1).otherwise(0)).alias("data_files"),
            F.sum(F.when(F.col("content") != mf.CONTENT_DATA, 1).otherwise(0)).alias("delete_files"),
            F.sum(F.when(F.col("content") == mf.CONTENT_DATA, F.col("size_bytes")).otherwise(0)).alias("data_bytes"),
            F.sum(F.when(F.col("content") == mf.CONTENT_DATA, F.col("record_count")).otherwise(0)).alias("record_count"),
        )
        .orderBy("partition")
    )


_SNAP_DDL = (
    "snapshot_id bigint, parent_id bigint, sequence_number bigint, "
    "timestamp_ms bigint, operation string, manifest_kind string, "
    "delta_depth int, added_files bigint, removed_files bigint, "
    "added_records bigint, total_files bigint"
)


def snapshots_df(spark: SparkSession, table: Table) -> DataFrame:
    rows = [
        (
            s["snapshot_id"],
            s.get("parent_id"),
            s["sequence_number"],
            s["timestamp_ms"],
            s["operation"],
            s.get("manifest_kind", "base"),
            s.get("delta_depth", 0),
            s["summary"].get("added_files", 0),
            s["summary"].get("removed_files", 0),
            s["summary"].get("added_records", 0),
            s["summary"].get("total_files", 0),
        )
        for s in table.snapshots()
    ]
    return spark.createDataFrame(rows, _SNAP_DDL)


def history_df(spark: SparkSession, table: Table) -> DataFrame:
    """Main's ancestry, newest first: (snapshot_id, timestamp_ms,
    is_current). Snapshots off this chain (branch lines, rolled-past
    states) appear in ``snapshots_df`` but not here."""
    rows = []
    sid = table.current_snapshot_id
    cur = True
    while sid is not None:
        s = table.snapshot(sid)
        rows.append((sid, s["timestamp_ms"], cur))
        cur = False
        sid = s["parent_id"]
    return spark.createDataFrame(
        rows, "snapshot_id bigint, timestamp_ms bigint, is_current boolean"
    )


def refs_df(spark: SparkSession, table: Table) -> DataFrame:
    """Named refs: tags + branches + main, like Iceberg's ``.refs``."""
    rows = [("main", "branch", table.current_snapshot_id)]
    rows += [(n, "branch", s) for n, s in sorted(table.refs().items())]
    rows += [(n, "tag", s) for n, s in sorted(table.tags().items())]
    return spark.createDataFrame(rows, "name string, type string, snapshot_id bigint")
