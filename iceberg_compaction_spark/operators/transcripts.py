"""Transcript-corpus analytics — the payload-specific curation layer.

The engine's payload is multi-turn conversation / agent transcripts
(BASELINE.json input_hint: conv_id, turn_idx, role, text, tool, ts);
before such a corpus trains anything, per-conversation health metrics
gate what stays: degenerate role runs, tool-call density, length
profile. All window + aggregate built-ins, one shuffle on conv_id
(the natural partitioning key at 10^12-turn scale — hot conversations
are an agg skew problem, handled by the salting helpers when needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation curation metrics: turn count, distinct roles,
    tool-call turns, mean turn length (chars), and role repeats
    (adjacent turns with the same role in turn order — alternation
    violations an agent-transcript pipeline filters on)."""
    w = Window.partitionBy(conv_col).orderBy(F.asc(turn_col))
    base = df.withColumn(
        "_rep", (F.col(role_col) == F.lag(role_col).over(w)).cast("int")
    )
    return base.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.count_distinct(F.col(role_col)).alias("n_roles"),
        F.sum(
            F.when(F.col(tool_col).isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("tool_turns"),
        F.avg(F.length(text_col)).alias("avg_chars"),
        F.coalesce(F.sum("_rep"), F.lit(0)).alias("role_repeats"),
    )
