"""File-selection strategies (P2–P5) as manifest-DataFrame filters.

Reference: ``SelectionStrategy::filter``
(``/root/reference/crates/planner/src/file_selection.rs:180-217``):
SmallFiles keeps ``length <= threshold`` (default 32 MB,
``config.rs:39``); FilesWithDeletes keeps files with
``deletes.len() >= min_delete_count``; Full keeps everything. The
content-type predicate (:36-39) excludes delete files from the data
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.config import CompactionConfig, SelectionStrategy
from iceberg_compaction_spark.operators.mor import FILE_COL
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources import scan as scan_mod


def with_delete_counts(spark: SparkSession, files_df: DataFrame) -> DataFrame:
    """Attach ``delete_count`` to each data file: the number of delete
    *files* applicable to it. The reference carries attached delete
    files per FileScanTask (``file_selection.rs:103-114``); we derive
    the association: position deletes reference data files explicitly
    by path; an equality delete applies to every data file with a lower
    sequence number.
    """
    data = files_df.filter(F.col("content") == mf.CONTENT_DATA)
    pos = files_df.filter(F.col("content") == mf.CONTENT_POS_DEL)
    eq = files_df.filter(F.col("content") == mf.CONTENT_EQ_DEL)

    pos_paths = [r["path"] for r in pos.select("path").collect()]
    if pos_paths:
        refs = (
            scan_mod.read_position_deletes(spark, pos_paths)
            .select(
                F.col(FILE_COL).alias("path"),
                scan_mod.norm_file_path(F.input_file_name()).alias("_del_file"),
            )
            .groupBy("path")
            .agg(F.countDistinct("_del_file").alias("pos_delete_count"))
        )
        data = data.join(F.broadcast(refs), on="path", how="left")
    else:
        data = data.withColumn("pos_delete_count", F.lit(None).cast("long"))

    eq_seqs = [r["sequence_number"] for r in eq.select("sequence_number").collect()]
    if eq_seqs:
        # data file with seq s is affected by eq deletes with seq > s
        seqs = sorted(eq_seqs)
        # count = |{d : d.seq > s}| as a sum of indicator literals
        # (the number of eq-delete *files* is small by construction)
        expr = None
        for s in seqs:
            ind = F.when(F.col("sequence_number") < F.lit(int(s)), 1).otherwise(0)
            expr = ind if expr is None else (expr + ind)
        data = data.withColumn("eq_delete_count", expr)
    else:
        data = data.withColumn("eq_delete_count", F.lit(0))

    return data.withColumn(
        "delete_count", F.coalesce("pos_delete_count", F.lit(0)) + F.col("eq_delete_count")
    ).drop("pos_delete_count", "eq_delete_count")


def select_files(
    spark: SparkSession,
    files_df: DataFrame,
    config: CompactionConfig,
    col_types: dict | None = None,
) -> DataFrame:
    """P2/P3/P4 over the manifest DataFrame, post content filter (P5).
    ``config.partition_filter`` scopes any strategy to named partitions
    (hot-partition maintenance never plans over the table's history);
    ``config.row_filter`` additionally scopes to data files whose
    column bounds MAY match a row-domain predicate — Iceberg's
    ``rewrite_data_files(filter=...)``, via the same conservative
    stats evaluator the scan pruner uses (``plans/pruning_df``), so an
    unprunable predicate degrades to selecting everything."""
    if config.partition_filter:
        files_df = files_df.filter(
            (F.col("content") != mf.CONTENT_DATA)
            | F.col("partition").isin(list(config.partition_filter))
        )
    if config.row_filter:
        from iceberg_compaction_spark.plans.pruning_df import prune_files_df

        data = prune_files_df(
            files_df.filter(F.col("content") == mf.CONTENT_DATA),
            config.row_filter,
            col_types=col_types,
        )
        files_df = files_df.filter(F.col("content") != mf.CONTENT_DATA).unionByName(
            data
        )
    strat = config.selection
    if strat == SelectionStrategy.FULL:
        return files_df.filter(F.col("content") == mf.CONTENT_DATA)
    if strat == SelectionStrategy.SMALL_FILES:
        return files_df.filter(
            (F.col("content") == mf.CONTENT_DATA)
            & (F.col("size_bytes") <= F.lit(config.small_file_threshold_bytes))
        )
    if strat == SelectionStrategy.FILES_WITH_DELETES:
        counted = with_delete_counts(spark, files_df)
        return counted.filter(F.col("delete_count") >= F.lit(config.min_delete_count))
    raise ValueError(f"unknown strategy {strat}")
