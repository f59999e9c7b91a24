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


@pytest.mark.parametrize("seed", [3, 57])
def test_random_sequences_with_rollback_branches_cdc(spark, tmp_warehouse, seed):
    """Fuzz the round-3 surface: DELETE WHERE, rollback, WAP branches,
    expiry — still dict-model-exact after every step, and the CDC
    changelog replays the state delta exactly."""
    from collections import Counter

    from iceberg_compaction_spark.operators.changelog import changelog_scan
    from iceberg_compaction_spark.operators.delete_where import delete_where

    rng = random.Random(seed)
    t = Table.create(os.path.join(tmp_warehouse, f"fz3_{seed}"), TRANSCRIPT_DDL)
    model: dict = {}
    next_key = 0
    history: list = []  # (sid, model copy) at safe replay anchors

    def fresh_rows(n):
        nonlocal next_key
        out = []
        for _ in range(n):
            out.append((f"c{next_key % 5}", next_key, f"v{rng.randrange(10_000)}"))
            next_key += 1
        return out

    cfg = CompactionConfig(
        selection=SelectionStrategy.FULL,
        group_target_size_bytes=64 << 10,
        min_size_per_partition_bytes=64 << 10,
    )
    t.append_dataframe(_df(spark, fresh_rows(20)).coalesce(1))
    model.update({(c, k): txt for c, k, txt in fresh_rows(0)})
    model = _scan_state(spark, t)
    cdc_anchor = (t.current_snapshot_id, dict(model))
    history.append((t.current_snapshot_id, dict(model)))

    ops = ["append", "upsert", "delete_where", "compact", "rollback", "branch_wap", "expire"]
    for step in range(12):
        op = rng.choice(ops)
        if op == "append" or not model:
            rows = fresh_rows(rng.randrange(5, 25))
            t.append_dataframe(_df(spark, rows).coalesce(1))
            model.update({(c, k): txt for c, k, txt in rows})
        elif op == "upsert":
            keys = rng.sample(sorted(model), min(len(model), rng.randrange(1, 8)))
            rows = [(c, k, f"u{step}_{i}") for i, (c, k) in enumerate(keys)]
            rows += fresh_rows(rng.randrange(0, 4))
            merge_into(t, _df(spark, rows), keys=["conv_id", "turn_idx"])
            model.update({(c, k): txt for c, k, txt in rows})
        elif op == "delete_where":
            lo = rng.randrange(0, max(next_key, 1))
            hi = lo + rng.randrange(1, 30)
            delete_where(spark, t, f"turn_idx >= {lo} AND turn_idx < {hi}")
            model = {k: v for k, v in model.items() if not (lo <= k[1] < hi)}
        elif op == "compact":
            mode = rng.choice([CommitMode.PLANNER_COMMIT, CommitMode.WORKER_COMMIT])
            c = CompactionConfig(**{**cfg.__dict__, "commit_mode": mode, "extra": {}})
            CompactionRunner(spark, t, c).execute()
        elif op == "rollback":
            alive = {s["snapshot_id"] for s in t.snapshots()}
            cands = [h for h in history if h[0] in alive]
            if cands:
                sid, saved = rng.choice(cands)
                t.rollback_to(sid)
                model = dict(saved)
        elif op == "branch_wap":
            name = f"b{step}"
            t.create_branch(name)
            rows = fresh_rows(rng.randrange(3, 10))
            t.append_dataframe(_df(spark, rows).coalesce(1), branch=name)
            if rng.random() < 0.5:
                t.fast_forward_main(name)
                model.update({(c, k): txt for c, k, txt in rows})
            t.drop_branch(name)  # staged-only rows never reach main
        else:
            expire_snapshots(t, older_than_ms=2**62, retain_last=rng.randrange(1, 4))
            cdc_anchor = (t.current_snapshot_id, dict(model))
            history = [h for h in history
                       if h[0] in {s["snapshot_id"] for s in t.snapshots()}]
        assert _scan_state(spark, t) == model, f"seed {seed} diverged at step {step} ({op})"
        history.append((t.current_snapshot_id, dict(model)))

    # CDC replay: anchor state + changelog == final state (multisets)
    from_sid, start = cdc_anchor
    changes = changelog_scan(spark, t, from_sid, columns=["conv_id", "turn_idx", "text"])
    replayed = Counter({(c, k, v): 1 for (c, k), v in start.items()})
    for r in changes.collect():
        key = (r["conv_id"], r["turn_idx"], r["text"])
        if r["_change_type"] == "delete":
            replayed[key] -= 1
            if replayed[key] == 0:
                del replayed[key]
        else:
            replayed[key] += 1
    final = Counter({(c, k, v): 1 for (c, k), v in _scan_state(spark, t).items()})
    assert replayed == final, f"seed {seed}: changelog replay diverged"


@pytest.mark.parametrize("seed", [11, 42])
def test_random_dml_modes_match_model(spark, tmp_warehouse, seed):
    """Round-4 DML surface: UPDATE WHERE / DELETE WHERE in both MoR and
    CoW modes interleaved with appends and compaction — dict-model-exact
    after every step, and fast_count stays exact throughout."""
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.stats_agg import fast_count
    from iceberg_compaction_spark.operators.update_where import update_where

    rng = random.Random(seed)
    t = Table.create(os.path.join(tmp_warehouse, f"fz4_{seed}"), TRANSCRIPT_DDL)
    model: dict = {}
    next_key = 0

    def fresh_rows(n):
        nonlocal next_key
        out = []
        for _ in range(n):
            out.append((f"c{next_key % 5}", next_key, f"v{rng.randrange(10_000)}"))
            next_key += 1
        return out

    cfg = CompactionConfig(
        selection=SelectionStrategy.FULL,
        group_target_size_bytes=64 << 10,
        min_size_per_partition_bytes=64 << 10,
    )
    ops = ["append", "update_mor", "update_cow", "delete_mor", "delete_cow", "compact"]
    for step in range(12):
        op = rng.choice(ops)
        if op == "append" or not model:
            rows = fresh_rows(rng.randrange(5, 25))
            t.append_dataframe(_df(spark, rows).coalesce(1))
            model.update({(c, k): txt for c, k, txt in rows})
        elif op.startswith("update"):
            lo = rng.randrange(0, max(next_key, 1))
            hi = lo + rng.randrange(1, 25)
            update_where(
                spark, t, f"turn_idx >= {lo} AND turn_idx < {hi}",
                {"text": "concat(text, '+')"}, mode=op.split("_")[1],
            )
            model = {
                k: (v + "+" if lo <= k[1] < hi else v) for k, v in model.items()
            }
        elif op.startswith("delete"):
            lo = rng.randrange(0, max(next_key, 1))
            hi = lo + rng.randrange(1, 20)
            delete_where(
                spark, t, f"turn_idx >= {lo} AND turn_idx < {hi}",
                mode=op.split("_")[1],
            )
            model = {k: v for k, v in model.items() if not (lo <= k[1] < hi)}
        else:
            CompactionRunner(spark, t, cfg).execute()
        assert _scan_state(spark, t) == model, f"seed {seed} step {step} ({op})"
        fc = fast_count(spark, t)
        assert fc["count"] == len(model), f"seed {seed} step {step} fast_count"

    # CDC replay across the whole run — CoW commits emit noisy
    # delete+insert pairs for rewritten files, but the multiset replay
    # must still net to the final state exactly
    from collections import Counter

    from iceberg_compaction_spark.operators.changelog import changelog_scan

    changes = changelog_scan(spark, t, None, columns=["conv_id", "turn_idx", "text"])
    replayed: Counter = Counter()
    for r in changes.collect():
        key = (r["conv_id"], r["turn_idx"], r["text"])
        if r["_change_type"] == "delete":
            replayed[key] -= 1
            if replayed[key] == 0:
                del replayed[key]
        else:
            replayed[key] += 1
    final = Counter({(c, k, v): 1 for (c, k), v in _scan_state(spark, t).items()})
    assert replayed == final, f"seed {seed}: changelog replay diverged under CoW DML"


@pytest.mark.parametrize("seed", [11, 42])
def test_random_ops_with_migration_and_consolidation(spark, tmp_warehouse, seed):
    """Round 5 net: random interleavings of appends, MoR/CoW upserts,
    row deletes, partition-grain flips + binned migration, eq/pos
    delete consolidation, and compaction — the scan must equal the
    dict model after every step."""
    import datetime as dt

    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.maintenance import (
        migrate_partition_spec,
        rewrite_equality_deletes,
        rewrite_position_deletes,
    )
    from iceberg_compaction_spark.sources.generator import day_partition_spec

    rng = random.Random(seed)
    t = Table.create(
        os.path.join(tmp_warehouse, f"fuzzm{seed}"),
        TRANSCRIPT_DDL,
        partition=day_partition_spec(),
    )
    model: dict = {}
    next_key = 0
    base = dt.datetime(2024, 6, 1)

    def _dfts(rows):
        return spark.createDataFrame(
            [
                (c, k, "user", txt, None, base + dt.timedelta(hours=k % 200))
                for c, k, txt in rows
            ],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )

    def fresh_rows(n):
        nonlocal next_key
        out = []
        for _ in range(n):
            out.append((f"c{next_key % 5}", next_key, f"v{rng.randrange(10_000)}"))
            next_key += 1
        return out

    grains = ["date_format(ts, 'yyyy-MM-dd')", "date_format(ts, 'yyyy-MM')"]
    grain = 0
    ops = [
        "append", "upsert_mor", "upsert_cow", "delete_mor", "delete_cow",
        "migrate", "eqcons", "poscons", "compact",
    ]
    for step in range(16):
        op = rng.choice(ops)
        if op == "append" or not model:
            rows = fresh_rows(rng.randrange(5, 30))
            t.append_dataframe(_dfts(rows).coalesce(1))
            model.update({(c, k): txt for c, k, txt in rows})
        elif op in ("upsert_mor", "upsert_cow"):
            keys = rng.sample(sorted(model), min(len(model), rng.randrange(1, 10)))
            rows = [(c, k, f"u{step}_{i}") for i, (c, k) in enumerate(keys)]
            rows += fresh_rows(rng.randrange(0, 5))
            merge_into(
                t, _dfts(rows), keys=["conv_id", "turn_idx"], mode=op.split("_")[1]
            )
            model.update({(c, k): txt for c, k, txt in rows})
        elif op in ("delete_mor", "delete_cow"):
            keys = rng.sample(sorted(model), min(len(model), rng.randrange(1, 8)))
            idxs = sorted(k for _, k in keys)
            delete_where(
                spark,
                t,
                f"turn_idx IN ({', '.join(map(str, idxs))})",
                mode=op.split("_")[1],
            )
            for key in [k for k in model if k[1] in set(idxs)]:
                model.pop(key, None)
        elif op == "migrate":
            grain = 1 - grain
            t.set_partition_expr(grains[grain])
            migrate_partition_spec(spark, t, group_target_size_bytes=48 << 10)
        elif op == "eqcons":
            rewrite_equality_deletes(spark, t)
        elif op == "poscons":
            rewrite_position_deletes(spark, t)
        else:
            cfg = CompactionConfig(
                selection=SelectionStrategy.FULL,
                group_target_size_bytes=64 << 10,
                min_size_per_partition_bytes=64 << 10,
                commit_mode=rng.choice(
                    [CommitMode.PLANNER_COMMIT, CommitMode.WORKER_COMMIT]
                ),
            )
            CompactionRunner(spark, t, cfg).execute()
        assert _scan_state(spark, t) == model, (
            f"seed {seed} diverged at step {step} ({op})"
        )
