"""MERGE INTO upserts, merge-on-read style (M3).

The reference has no MERGE (it is a maintenance engine), but MoR
engines implement MERGE with exactly the machinery it *does* have:
write one **equality-delete file** for the matched keys plus new
**data files** for the source rows, in a single commit — subsequent
scans resolve the upsert via the J2 anti-join with the sequence-number
predicate (``sql_builder.rs:120-152`` semantics). Compaction later
folds the delete in.

Semantics (keyed on (conv_id, turn_idx) per the north rule):
  * whenMatched → update: old row dies via the eq delete, new row wins;
  * whenNotMatched → insert: eq delete for its key matches nothing;
  * source duplicates: latest-wins dedup by a window over the key
    (SURVEY.md §2.5), deterministic via an explicit precedence column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_compaction_spark.sources.table import Table


def dedup_source(source: DataFrame, keys: Sequence[str], precedence: str | None = None) -> DataFrame:
    """Latest-version-wins per key. ``precedence`` names a column whose
    highest value wins (e.g. an event timestamp); without one, source
    rows must already be unique per key (enforced)."""
    if precedence:
        w = Window.partitionBy(*keys).orderBy(F.col(precedence).desc())
        return (
            source.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return source


def merge_into(
    table: Table,
    source: DataFrame,
    keys: Sequence[str],
    precedence: str | None = None,
    delete_matched_only: bool = False,
) -> int:
    """Upsert ``source`` into ``table`` keyed by ``keys``. Returns the
    new snapshot id. One commit carries both the equality-delete file
    and the new data files (atomic upsert).

    ``delete_matched_only=True`` turns this into MERGE ... WHEN MATCHED
    THEN DELETE (no inserts) — the source rows are pure key tombstones.
    """
    src = dedup_source(source, keys, precedence)

    # 1. equality-delete file for all source keys (unmatched keys are
    #    harmless no-ops in the anti-join, so no target scan is needed —
    #    MERGE costs O(source), not O(table))
    del_dir_keys = src.select(*keys)
    infos_del = table_write_eq_delete(table, del_dir_keys, keys)

    # 2. new data files for the source rows (skipped for pure deletes)
    infos_data = [] if delete_matched_only else table.write_data_files(src)

    return table.commit("merge", added=list(infos_del) + list(infos_data))


def table_write_eq_delete(table: Table, keys_df: DataFrame, keys: Sequence[str]):
    from iceberg_compaction_spark.sources import manifest as mf

    # size-based fan-out (Table.DELETE_ROWS_PER_FILE): a MERGE with a
    # 10^9-row source writes ~128 eq-delete files in parallel instead of
    # funnelling the whole delete set through one task
    return table.write_delete_files(
        keys_df, list(keys), mf.CONTENT_EQ_DEL, equality_ids=list(keys)
    )
