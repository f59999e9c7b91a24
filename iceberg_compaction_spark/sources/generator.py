"""Deterministic synthetic transcripts generator (S8).

Mirrors the reference's formulaic generator
(``/root/reference/crates/planner/examples/data_generator.rs:324-447``:
``id`` arithmetic, hot keys via ``user_id = (base+i) % 10000 + 1``,
``event_type = i % 5`` lookup, ``ts = base + i``) — but produces the
BASELINE.json transcript schema
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` with **hot-conversation skew**: the top conversation
holds ``hot_share`` of all rows (FIXTURES.md §1), the tail is uniform.
Everything is closed-form column arithmetic over ``spark.range`` — no
RNG state, fully reproducible, and embarrassingly parallel at any
scale (10^12 rows is just a bigger range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.sources.table import Table

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

DEFAULT_BASE_TS = 1_700_000_000  # same epoch anchor family as data_generator.rs:410-415


def transcripts_df(
    spark: SparkSession,
    n_turns: int,
    n_convs: int,
    hot_share: float = 0.2,
    base_ts: int = DEFAULT_BASE_TS,
    ts_step_s: int = 1,
    pad_words_mod: int = 24,
) -> DataFrame:
    """Deterministic transcripts: row ``i`` maps to a conversation by a
    hot-head + uniform-tail mixture; ``turn_idx`` is dense and unique
    within each conversation."""
    assert n_convs >= 2
    hot_n = int(n_turns * hot_share)
    tail_convs = n_convs - 1

    df = spark.range(0, n_turns, 1)
    i = F.col("id")
    is_hot = i < F.lit(hot_n)
    conv = F.when(is_hot, F.lit(0)).otherwise(
        F.lit(1) + F.pmod(i - F.lit(hot_n), F.lit(tail_convs))
    )
    turn = F.when(is_hot, i).otherwise((i - F.lit(hot_n)) / F.lit(tail_convs)).cast("int")
    conv_id = F.format_string("conv_%08d", conv)
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        F.pmod(turn, F.lit(4)).cast("int") + F.lit(1),
    )
    # high-entropy padding (md5 of the row id) so parquet compression
    # reflects realistic transcript text, length varied deterministically
    pad = F.repeat(
        F.concat(F.lit(" "), F.md5(i.cast("string"))),
        F.pmod(i * F.lit(2654435761), F.lit(pad_words_mod)).cast("int"),
    )
    text = F.format_string("turn %d of %s role %s:%s", turn, conv_id, role, pad)
    tool = (
        F.when(F.pmod(turn, F.lit(7)) == 0, F.lit("search"))
        .when(F.pmod(turn, F.lit(7)) == 3, F.lit("python"))
        .otherwise(F.lit(None).cast("string"))
    )
    ts = F.timestamp_seconds(F.lit(base_ts) + i * F.lit(ts_step_s))
    return df.select(
        conv_id.alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def day_partition_spec() -> dict:
    return {"field": "_part", "expr": "date_format(ts, 'yyyy-MM-dd')"}


def create_transcripts_table(
    spark: SparkSession,
    location: str,
    n_turns: int = 100_000,
    n_convs: int = 1_000,
    n_files: int = 64,
    hot_share: float = 0.2,
    partitioned: bool = True,
    ts_step_s: int = 1,
) -> Table:
    """Create a transcripts table with **small-file skew**: the payload
    is appended as ``n_files`` shards (reference E2E generates many
    fixed-size files, ``scripts/e2e_minio_dhat.sh:10-12``), giving the
    SmallFiles strategy + bin-packer real work."""
    table = Table.create(
        location,
        TRANSCRIPT_DDL,
        partition=day_partition_spec() if partitioned else None,
    )
    df = transcripts_df(spark, n_turns, n_convs, hot_share=hot_share, ts_step_s=ts_step_s)
    # deterministic shard assignment -> round-robin over global row id,
    # so every shard mixes conversations (worst case for clustering)
    shards = df.repartition(n_files, F.xxhash64("conv_id", "turn_idx"))
    table.append_dataframe(shards)
    return table
