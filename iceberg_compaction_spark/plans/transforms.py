"""Partition-transform predicate projection (Iceberg ``Projections``).

Hidden partitioning stores a *derived* value per file (``_part =
expr(source_col)``); Iceberg projects row-domain predicates through the
transform so a ``conv_id = 42`` point lookup prunes to exactly the
files of bucket ``hash(42) % N`` without the user ever naming the
partition column (iceberg-api Projections / BucketUtil; reference
tables are identity-partitioned so its planner has no equivalent —
file_selection.rs filters on explicit partition values only).

Scope is deliberately conservative, like everything in
``plans/pruning.py``:
  * the spec must declare ``source_col`` (opting in that ``expr`` is a
    deterministic pure function of that single column),
  * every OR-disjunct of the predicate must constrain ``source_col``
    with ``=`` or ``IN`` (a disjunct without one can reach any
    partition → no projection),
  * literal kinds are limited to numbers and plain strings,
  * failure at any step returns None — the scan then simply keeps its
    stats-based pruning; projection is an optimization, never a
    correctness dependency (the full predicate is always re-applied to
    surviving rows).

The transform is evaluated by the ENGINE itself (a |literals|-row Spark
job), so any deterministic Spark expression — bucket ``pmod(hash(c),
n)``, truncate, date_format — projects without this module knowing its
algebra.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from iceberg_compaction_spark.plans import pruning

#: partition values are compared as manifest strings; refuse projection
#: for values outside this charset rather than risk a quoting bug
_SAFE_VALUE = re.compile(r"^[A-Za-z0-9_.:+\- ]*$")


def source_literals(predicate: str, source_col: str) -> list | None:
    """Extract the = / IN literal values constraining ``source_col``
    from every OR-disjunct of ``predicate``. None when any disjunct
    lacks one (projection would be unsound) or the predicate doesn't
    decompose."""
    disjuncts = pruning.parse_predicate(predicate)
    if disjuncts is None:
        return None
    out = []
    for conj in disjuncts:
        found = None
        for c in conj:
            if not isinstance(c, tuple) or len(c) != 3:
                continue
            col, op, lits = c
            if col == source_col and op in ("=", "in"):
                if all(kind in ("num", "str") for kind, _v in lits):
                    found = [v for _k, v in lits]
                    break
        if not found:
            return None
        out.extend(found)
    return out


def project_partition_values(
    spark: SparkSession, meta_partition: dict | None, schema: StructType,
    predicate: str,
) -> set[str] | None:
    """→ the exact set of partition-value strings the predicate can
    reach, or None when projection doesn't apply. ``meta_partition``
    is the table's partition spec dict; ``schema`` the physical schema
    (for the source column's type)."""
    p = meta_partition or {}
    src, expr = p.get("source_col"), p.get("expr")
    if not src or not expr:
        return None
    lits = source_literals(predicate, src)
    if not lits:
        return None
    try:
        field = next(f for f in schema.fields if f.name == src)
    except StopIteration:
        return None
    one = StructType([field])
    try:
        lit_df = spark.createDataFrame([(v,) for v in lits], schema=one)
        rows = lit_df.select(F.expr(expr).cast("string").alias("pv")).collect()
    except Exception:
        return None  # type mismatch etc. — keep stats pruning only
    vals = {r["pv"] for r in rows}
    if any(v is None or not _SAFE_VALUE.match(v) for v in vals):
        return None
    return vals
