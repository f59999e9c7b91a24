"""ANALYZE TABLE: column-level statistics for planning.

Iceberg engines persist table/column stats (NDV sketches, null counts)
for the cost-based optimizer; the reference's planner consumes
per-file stats only, so this is a forward extension on the same
metadata spine. One MoR scan computes, per column: non-null count,
null count, NDV (exact ``countDistinct`` for oracle-verifiable runs,
HyperLogLog ``approx_count_distinct`` — one pass, fixed memory — for
corpus scale), and min/max. Results persist in table metadata keyed by
the snapshot they describe, surfaced as the ``.column_stats`` metadata
table.

Scale: a single whole-stage-codegen aggregate over the scan (all
columns in one pass, map-side partial aggregation); HLL keeps state at
a few KB per column regardless of cardinality. Stats are advisory
(planning input, never a correctness dependency) and carry their
snapshot id so staleness is detectable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import ValidationError
from iceberg_compaction_spark.sources.table import Table


def analyze_table(
    spark: SparkSession,
    table: Table,
    columns: Sequence[str] | None = None,
    exact: bool = False,
    snapshot_id: int | None = None,
) -> dict:
    """Compute + persist column stats → the stats dict. ``exact=True``
    uses ``countDistinct`` (oracle-verifiable); default is
    HyperLogLog (±~2%, one pass, bounded memory)."""
    user_cols = table.user_columns()
    cols = list(columns or user_cols)
    for c in cols:
        if c not in user_cols:
            raise ValidationError(f"no such column {c}")
    sid = snapshot_id if snapshot_id is not None else table.current_snapshot_id
    df = table.scan(spark, snapshot_id=sid, columns=cols)
    ndv_fn = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            ndv_fn(F.col(c)).alias(f"ndv_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    n_rows = row["_rows"]

    def _j(v):  # json-safe scalar
        if v is None or isinstance(v, (int, float, str, bool)):
            return v
        return str(v)

    stats = {
        "snapshot_id": sid,
        "rows": n_rows,
        "exact": bool(exact),
        "columns": {
            c: {
                "nulls": n_rows - row[f"nn_{c}"],
                "ndv": row[f"ndv_{c}"],
                "min": _j(row[f"min_{c}"]),
                "max": _j(row[f"max_{c}"]),
            }
            for c in cols
        },
    }
    # under the commit lock with a disk refresh: a concurrent property
    # write or second ANALYZE must not be lost to this read-modify-write
    table._locked_meta_write(lambda: table.meta.__setitem__("column_stats", stats))
    return stats


def column_stats_table(spark: SparkSession, table: Table) -> DataFrame:
    """The ``.column_stats`` metadata table: one row per analyzed
    column (column, rows, nulls, ndv, min, max as strings, snapshot_id,
    exact). Empty when the table was never analyzed."""
    ddl = (
        "column string, rows bigint, nulls bigint, ndv bigint,"
        " min string, max string, snapshot_id bigint, exact boolean"
    )
    st = table.meta.get("column_stats")
    if not st:
        return spark.createDataFrame([], ddl)
    rows = [
        (
            c,
            int(st["rows"]),
            int(v["nulls"]),
            int(v["ndv"]),
            None if v["min"] is None else str(v["min"]),
            None if v["max"] is None else str(v["max"]),
            int(st["snapshot_id"]),
            bool(st["exact"]),
        )
        for c, v in sorted(st["columns"].items())
    ]
    return spark.createDataFrame(rows, ddl)
