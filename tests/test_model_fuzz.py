"""Model-based fuzz of the table stack: a random sequence of engine
operations (append / merge upsert / merge delete / compact in either
commit mode / maintenance) applied both to the real table and to a
plain-dict model; after every step the MoR scan must equal the model.

This is the strongest correctness net for the metadata layer: it
exercises delta-manifest chains, sequence-number semantics, dangling
delete cleanup, expiry, and manifest rewrites in random interleavings
no hand-written scenario covers.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from iceberg_compaction_spark.config import CommitMode, CompactionConfig, SelectionStrategy
from iceberg_compaction_spark.operators.maintenance import (
    clean_dangling_deletes,
    expire_snapshots,
    rewrite_manifests,
)
from iceberg_compaction_spark.operators.merge_into import merge_into
from iceberg_compaction_spark.plans.compaction import CompactionRunner
from iceberg_compaction_spark.sources.generator import TRANSCRIPT_DDL
from iceberg_compaction_spark.sources.table import Table


def _df(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", txt, None, None) for c, t, txt in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def _scan_state(spark, table):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.scan(spark).select("conv_id", "turn_idx", "text").collect()
    }


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_random_op_sequences_match_model(spark, tmp_warehouse, seed):
    rng = random.Random(seed)
    t = Table.create(os.path.join(tmp_warehouse, f"fuzz{seed}"), TRANSCRIPT_DDL)
    model: dict = {}
    next_key = 0

    def fresh_rows(n):
        nonlocal next_key
        out = []
        for _ in range(n):
            out.append((f"c{next_key % 7}", next_key, f"v{rng.randrange(10_000)}"))
            next_key += 1
        return out

    cfg = CompactionConfig(
        selection=SelectionStrategy.FULL,
        group_target_size_bytes=64 << 10,
        min_size_per_partition_bytes=64 << 10,
        commit_mode=CommitMode.PLANNER_COMMIT,
    )

    ops = ["append", "upsert", "delete", "compact", "maintenance"]
    for step in range(14):
        op = rng.choice(ops)
        if op == "append" or not model:
            rows = fresh_rows(rng.randrange(5, 40))
            t.append_dataframe(_df(spark, rows).coalesce(1))
            model.update({(c, k): txt for c, k, txt in rows})
        elif op == "upsert":
            keys = rng.sample(sorted(model), min(len(model), rng.randrange(1, 12)))
            rows = [(c, k, f"upd{step}_{i}") for i, (c, k) in enumerate(keys)]
            rows += fresh_rows(rng.randrange(0, 6))  # some inserts too
            merge_into(t, _df(spark, rows), keys=["conv_id", "turn_idx"])
            model.update({(c, k): txt for c, k, txt in rows})
        elif op == "delete":
            keys = rng.sample(sorted(model), min(len(model), rng.randrange(1, 10)))
            rows = [(c, k, "") for c, k in keys]
            merge_into(
                t, _df(spark, rows), keys=["conv_id", "turn_idx"], delete_matched_only=True
            )
            for c, k in keys:
                model.pop((c, k), None)
        elif op == "compact":
            mode = rng.choice([CommitMode.PLANNER_COMMIT, CommitMode.WORKER_COMMIT])
            c = CompactionConfig(**{**cfg.__dict__, "commit_mode": mode, "extra": {}})
            CompactionRunner(spark, t, c).execute()
        else:
            kind = rng.choice(["expire", "dangling", "rewrite"])
            if kind == "expire":
                expire_snapshots(t, older_than_ms=2**62, retain_last=rng.randrange(1, 4))
            elif kind == "dangling":
                clean_dangling_deletes(spark, t)
            else:
                rewrite_manifests(t)
        assert _scan_state(spark, t) == model, f"seed {seed} diverged at step {step} ({op})"
