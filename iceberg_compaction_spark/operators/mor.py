"""Merge-on-read delete resolution — the reference engine's only
row-level relational operators, re-expressed as Spark anti-joins.

Reference semantics (SURVEY.md §2.3, §3.4):
  * position deletes: remove rows whose (file_path, pos) appears in a
    position-delete set — SQL ``RIGHT ANTI JOIN`` at
    ``crates/worker/src/datafusion/sql_builder.rs:96-117``.
  * equality deletes: remove rows whose key columns match a delete row
    AND ``data.seq < delete.seq`` (only *older* rows die) —
    ``sql_builder.rs:120-152``; LogicalPlan form
    ``logical_plan_sketch.rs:33-89``.
  * small delete sets are shipped inline ("InlineDeleteData",
    ``README.md:60-69``) — here an explicit ``broadcast()`` hint.

Spark-first notes: the equi-keys plan as broadcast-hash or shuffled
joins chosen by Catalyst/AQE; the ``seq`` comparison rides along as a
join filter on the same hash join (non-equi conjunct of an equi join),
so no extra pass is needed. Hidden columns follow the reference's
``sys_hidden_file_path`` / ``sys_hidden_pos`` / ``sys_hidden_seq_num``
(``crates/worker/src/datafusion/mod.rs:35-37``) as ``_file``, ``_pos``,
``_seq``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FILE_COL = "_file"
POS_COL = "_pos"
SEQ_COL = "_seq"


def apply_position_deletes(
    data: DataFrame, pos_deletes: DataFrame, broadcast_hint: bool = False
) -> DataFrame:
    """J1: anti-join on (_file, _pos).

    ``data`` must carry ``_file``/``_pos`` hidden columns;
    ``pos_deletes`` has columns (_file string, _pos long) — the
    reference's position-delete schema (file_scan.rs:94-97).
    """
    dels = pos_deletes.select(FILE_COL, POS_COL)
    if broadcast_hint:
        dels = F.broadcast(dels)
    return data.join(dels, on=[FILE_COL, POS_COL], how="left_anti")


def apply_equality_deletes(
    data: DataFrame,
    eq_deletes: DataFrame,
    keys: Sequence[str],
    broadcast_hint: bool = False,
) -> DataFrame:
    """J2: anti-join on equality keys with the theta term
    ``data._seq < delete._seq`` (P6).

    ``eq_deletes`` carries the key columns plus ``_seq``. Multiple
    equality-delete files with the *same* key set should be unioned
    before calling; different key sets compose by chaining calls, like
    the reference's nested RIGHT ANTI JOINs (sql_builder.rs:144-151).
    """
    dels = eq_deletes.select(*keys, SEQ_COL)
    if broadcast_hint:
        dels = F.broadcast(dels)
    d = data.alias("d")
    x = dels.alias("x")
    cond = None
    for k in keys:
        c = F.col(f"d.{k}").eqNullSafe(F.col(f"x.{k}"))
        cond = c if cond is None else (cond & c)
    cond = cond & (F.col(f"d.{SEQ_COL}") < F.col(f"x.{SEQ_COL}"))
    return d.join(x, on=cond, how="left_anti")


def apply_deletes(
    data: DataFrame,
    pos_deletes: DataFrame | None,
    eq_deletes: DataFrame | None,
    eq_keys: Sequence[str] = (),
    broadcast_pos: bool = False,
    broadcast_eq: bool = False,
) -> DataFrame:
    """Composed MoR plan in the reference's nesting order
    (sql_builder grammar, SURVEY.md §3.4): base → position deletes →
    equality deletes. Returns the surviving rows, hidden cols intact."""
    out = data
    if pos_deletes is not None:
        out = apply_position_deletes(out, pos_deletes, broadcast_hint=broadcast_pos)
    if eq_deletes is not None:
        out = apply_equality_deletes(out, eq_deletes, list(eq_keys), broadcast_hint=broadcast_eq)
    return out
