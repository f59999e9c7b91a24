"""Incremental rollup: refresh folds ONLY the appended delta, the
merged state equals a full recompute, replays are no-ops, and the
refresh coexists with maintenance — a replace commit of already-counted
files is folded around, a replace that consumed an uncounted append (or
any row-set-changing commit) falls back to one full recompute. The
anchor is crash-safe (committed summary + property mirror) and each
refresh reads the appended files exactly once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.rollup import refresh_rollup
from iceberg_compaction_spark.sources.table import Table

SRC_DDL = "k BIGINT, v DOUBLE"
ROLLUP_DDL = "k BIGINT, cnt BIGINT, sv DOUBLE, mn DOUBLE, mx DOUBLE"
AGGS = {
    "cnt": ("count", ""),
    "sv": ("sum", "v"),
    "mn": ("min", "v"),
    "mx": ("max", "v"),
}


def _state(rollup, spark):
    return {
        r["k"]: (r["cnt"], round(r["sv"], 6), r["mn"], r["mx"])
        for r in rollup.scan(spark).collect()
    }


def _full(spark, rows):
    df = spark.createDataFrame(rows, SRC_DDL)
    return {
        r["k"]: (r["cnt"], round(r["sv"], 6), r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }


def test_refresh_rollup_incremental(spark, tmp_warehouse):
    src = Table.create(os.path.join(tmp_warehouse, "src"), SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "roll"), ROLLUP_DDL)

    b1 = [(i % 3, float(i)) for i in range(30)]
    src.append_dataframe(spark.createDataFrame(b1, SRC_DDL).coalesce(1))
    r1 = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r1["delta_rows"] == 30
    assert _state(roll, spark) == _full(spark, b1)

    b2 = [(i % 4, float(100 + i)) for i in range(17)]
    src.append_dataframe(spark.createDataFrame(b2, SRC_DDL).coalesce(1))
    r2 = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r2["delta_rows"] == 17  # only the delta was scanned
    assert _state(roll, spark) == _full(spark, b1 + b2)

    # replayed refresh: no new snapshot, nothing changes
    r3 = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r3["delta_rows"] == 0
    assert _state(roll, spark) == _full(spark, b1 + b2)


def _compact(spark, src):
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    CompactionRunner(
        spark,
        src,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.SINGLE,
            sort_order=(("k", False),),
        ),
    ).execute()


def test_refresh_recomputes_when_replace_consumed_pending_append(
    spark, tmp_warehouse
):
    """A compaction that rewrote files appended INSIDE the window mixes
    counted and uncounted rows in its outputs — no file-level delta
    exists, so the refresh falls back to one full recompute and still
    converges to the exact state."""
    src = Table.create(os.path.join(tmp_warehouse, "src2"), SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "roll2"), ROLLUP_DDL)
    rows = [(i % 2, float(i)) for i in range(40)]
    src.append_dataframe(spark.createDataFrame(rows[:20], SRC_DDL).coalesce(1))
    src.append_dataframe(spark.createDataFrame(rows[20:], SRC_DDL).coalesce(1))
    _compact(spark, src)
    r = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r["mode"] == "recompute"
    assert _state(roll, spark) == _full(spark, rows)
    # and the anchor advanced: replay is a no-op
    assert refresh_rollup(spark, src, roll, ["k"], AGGS)["mode"] == "noop"


def test_refresh_folds_around_replace_of_counted_files(spark, tmp_warehouse):
    """Compaction of files the rollup already counted is skipped by the
    incremental fold: its outputs re-add counted rows, so the next
    refresh stays incremental and scans only the new append."""
    src = Table.create(os.path.join(tmp_warehouse, "src2b"), SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "roll2b"), ROLLUP_DDL)
    b1 = [(i % 3, float(i)) for i in range(24)]
    src.append_dataframe(spark.createDataFrame(b1[:12], SRC_DDL).coalesce(1))
    src.append_dataframe(spark.createDataFrame(b1[12:], SRC_DDL).coalesce(1))
    assert refresh_rollup(spark, src, roll, ["k"], AGGS)["delta_rows"] == 24
    _compact(spark, src)  # rewrites only counted files
    b2 = [(i % 4, float(100 + i)) for i in range(9)]
    src.append_dataframe(spark.createDataFrame(b2, SRC_DDL).coalesce(1))
    r = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r["mode"] == "incremental" and r["delta_rows"] == 9
    assert _state(roll, spark) == _full(spark, b1 + b2)


def test_refresh_recomputes_on_rowset_changing_commit(spark, tmp_warehouse):
    """A delete commit in the window removes rows the rollup counted:
    the refresh recomputes so the materialized view reflects the
    current table instead of silently keeping ghost rows."""
    from iceberg_compaction_spark.operators.delete_where import delete_where

    src = Table.create(os.path.join(tmp_warehouse, "src2c"), SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "roll2c"), ROLLUP_DDL)
    rows = [(i % 3, float(i)) for i in range(30)]
    src.append_dataframe(spark.createDataFrame(rows, SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], AGGS)
    delete_where(spark, src, "v >= 20.0")
    r = refresh_rollup(spark, src, roll, ["k"], AGGS)
    assert r["mode"] == "recompute"
    assert _state(roll, spark) == _full(spark, [t for t in rows if t[1] < 20.0])


def test_refresh_anchor_survives_property_write_crash(spark, tmp_warehouse):
    """Crash between the replace commit and the property write: the
    committed snapshot summary is the atomic anchor record, so the
    replayed refresh sees cur == last and no-ops instead of folding
    the same delta twice."""
    src = Table.create(os.path.join(tmp_warehouse, "src2d"), SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "roll2d"), ROLLUP_DDL)
    rows = [(i % 3, float(i)) for i in range(30)]
    src.append_dataframe(spark.createDataFrame(rows, SRC_DDL).coalesce(1))

    orig = roll.set_property
    def boom(key, value):
        raise OSError("simulated crash before anchor property write")
    roll.set_property = boom  # type: ignore[method-assign]
    try:
        refresh_rollup(spark, src, roll, ["k"], AGGS)
    finally:
        roll.set_property = orig  # type: ignore[method-assign]
    assert roll.get_property("rollup.last-src-snapshot") is None  # crashed
    r = refresh_rollup(spark, src, roll, ["k"], AGGS)  # replay
    assert r["mode"] == "noop" and r["delta_rows"] == 0
    assert _state(roll, spark) == _full(spark, rows)


def test_refresh_reads_delta_exactly_once(spark, tmp_warehouse):
    """One pass over the appended files per refresh: by the time the
    merged state is written, the delta's parquet files are no longer
    needed — deleting them right before the write must not break the
    refresh (the persisted partial is the only thing read)."""
    src = Table.create(os.path.join(tmp_warehouse, "src2e"), SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "roll2e"), ROLLUP_DDL)
    b1 = [(i % 3, float(i)) for i in range(20)]
    src.append_dataframe(spark.createDataFrame(b1, SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], AGGS)
    before = {f["path"] for f in src.files(content="data")}
    b2 = [(i % 4, float(50 + i)) for i in range(11)]
    src.append_dataframe(spark.createDataFrame(b2, SRC_DDL).coalesce(1))
    delta_paths = [
        f["path"] for f in src.files(content="data") if f["path"] not in before
    ]
    assert delta_paths

    orig = roll.write_data_files
    def delete_then_write(df, **kw):
        for p in delta_paths:
            os.remove(p.removeprefix("file:"))
        return orig(df, **kw)
    roll.write_data_files = delete_then_write  # type: ignore[method-assign]
    try:
        r = refresh_rollup(spark, src, roll, ["k"], AGGS)
    finally:
        roll.write_data_files = orig  # type: ignore[method-assign]
    assert r["delta_rows"] == 11
    assert _state(roll, spark) == _full(spark, b1 + b2)


def test_refresh_rollup_hll_distinct_state(spark, tmp_warehouse):
    """HLL sketch state is mergeable across refreshes: two incremental
    refreshes' unioned sketch estimates the distinct count over BOTH
    appends (within HLL error), including values seen in both."""
    from iceberg_compaction_spark.operators.rollup import hll_estimates

    src = Table.create(os.path.join(tmp_warehouse, "src3"), SRC_DDL)
    roll = Table.create(
        os.path.join(tmp_warehouse, "roll3"), "k BIGINT, cnt BIGINT, nd BINARY"
    )
    aggs = {"cnt": ("count", ""), "nd": ("hll", "v")}
    # overlap: batch2 repeats half of batch1's values
    b1 = [(0, float(i)) for i in range(500)]
    b2 = [(0, float(i)) for i in range(250, 750)]
    src.append_dataframe(spark.createDataFrame(b1, SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], aggs)
    src.append_dataframe(spark.createDataFrame(b2, SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], aggs)
    row = hll_estimates(roll.scan(spark), ["nd"]).collect()[0]
    assert row["cnt"] == 1000  # rows, exact
    assert abs(row["nd"] - 750) / 750 < 0.05  # distinct, sketched


def test_refresh_rollup_hist_state(spark, tmp_warehouse):
    """hist state: fixed-bin counts are sum-mergeable across
    incremental refreshes (exactly a full recompute's bins, including
    edge-bin clamping of out-of-range values), and the read-side
    quantile estimate lands within one bin width of the exact
    percentile."""
    from iceberg_compaction_spark.operators.rollup import hist_quantile

    src = Table.create(os.path.join(tmp_warehouse, "hsrc"), SRC_DDL)
    roll = Table.create(
        os.path.join(tmp_warehouse, "hroll"), "k BIGINT, cnt BIGINT, h ARRAY<BIGINT>"
    )
    aggs = {"cnt": ("count", ""), "h": ("hist", "v", (0.0, 10.0, 10))}
    b1 = [(0, float(v)) for v in range(50)] + [(0, -5.0), (0, 250.0)]  # clamps
    b2 = [(0, float(v)) for v in range(25, 100)]
    src.append_dataframe(spark.createDataFrame(b1, SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], aggs)
    src.append_dataframe(spark.createDataFrame(b2, SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], aggs)

    import collections
    exact = collections.Counter(
        min(9, max(0, int(v // 10))) for _k, v in b1 + b2
    )
    row = roll.scan(spark).collect()[0]
    assert row["cnt"] == len(b1) + len(b2)
    assert list(row["h"]) == [exact.get(i, 0) for i in range(10)]

    vals = sorted(v for _k, v in b1 + b2)
    true_median = vals[len(vals) // 2]
    est = hist_quantile(roll.scan(spark), ["k"], "h", 0.5, 0.0, 10.0).collect()[0]
    assert abs(est["q50"] - true_median) <= 10.0  # within one bin width


def test_gapfill_locf_matches_python_model(spark):
    """time_bucket gapfill + LOCF vs a direct python model: every
    group×bucket cell exists, empty cells carry the latest earlier
    value (None before the first observation) and are flagged."""
    from iceberg_compaction_spark.operators.rollup import gapfill_locf

    src_rows = [  # (g, bucket, v) — gaps at 10 (g=1), 0/20 (g=2)
        (1, 0.0, 5.0), (1, 20.0, 7.0), (2, 10.0, 1.0),
    ]
    df = spark.createDataFrame(src_rows, "g INT, bucket DOUBLE, v DOUBLE")
    out = {
        (r["g"], r["bucket"]): (r["v"], r["v_filled"], r["gap_filled"])
        for r in gapfill_locf(df, ["g"], "bucket", ["v"], 0, 20, 10).collect()
    }
    assert out == {
        (1, 0.0): (5.0, 5.0, False),
        (1, 10.0): (None, 5.0, True),
        (1, 20.0): (7.0, 7.0, False),
        (2, 0.0): (None, None, True),  # before first observation
        (2, 10.0): (1.0, 1.0, False),
        (2, 20.0): (None, 1.0, True),
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="gapfill"):
        gapfill_locf(df, ["g"], "bucket", ["v"], 0, 20, 0)


def test_refresh_rollup_fuzz_interleavings(spark, tmp_warehouse):
    """Random interleavings of appends, refreshes AND compaction
    replace commits (the maintenance-coexistence contract): back-to-
    back appends folded by one refresh, refreshes with nothing new,
    compaction of counted files (folded around) and of pending appends
    (recompute fallback) must all leave the rollup equal to a full
    recompute over everything appended so far — no manual ordering."""
    import random

    rng = random.Random(20260817)
    for trial in range(3):
        src = Table.create(os.path.join(tmp_warehouse, f"fz_src{trial}"), SRC_DDL)
        roll = Table.create(os.path.join(tmp_warehouse, f"fz_roll{trial}"), ROLLUP_DDL)
        appended: list = []
        refreshed_through = 0
        compacted_in_window = False
        for step in range(8):
            roll_die = rng.random()
            if roll_die < 0.5:
                batch = [
                    (rng.randrange(3), float(rng.randrange(50)))
                    for _ in range(rng.randrange(1, 8))
                ]
                src.append_dataframe(
                    spark.createDataFrame(batch, SRC_DDL).coalesce(1)
                )
                appended.extend(batch)
            elif roll_die < 0.7 and appended:
                # a replace commit lands mid-window — the refresh must
                # cope without being told
                compacted_in_window = len(appended) > refreshed_through
                _compact(spark, src)
            else:
                r = refresh_rollup(spark, src, roll, ["k"], AGGS)
                if not compacted_in_window:
                    assert r["delta_rows"] == len(appended) - refreshed_through
                refreshed_through = len(appended)
                compacted_in_window = False
                if refreshed_through:
                    assert _state(roll, spark) == _full(spark, appended)
        refresh_rollup(spark, src, roll, ["k"], AGGS)
        if appended:
            assert _state(roll, spark) == _full(spark, appended)


# ---------------------------------------------------------------------------
# round 8: changelog-incremental refresh through row-set-changing commits

INV_SRC_DDL = "id BIGINT, k BIGINT, v DOUBLE"
INV_ROLLUP_DDL = "k BIGINT, cnt BIGINT, sv DOUBLE, h ARRAY<BIGINT>"
INV_AGGS = {
    "cnt": ("count", ""),
    "sv": ("sum", "v"),
    "h": ("hist", "v", (0.0, 10.0, 4)),
}


def _inv_state(rollup, spark):
    return {
        r["k"]: (r["cnt"], round(r["sv"], 6), tuple(r["h"]))
        for r in rollup.scan(spark).collect()
    }


def _inv_full(spark, rows):
    out: dict = {}
    for _id, k, v in rows:
        cnt, sv, h = out.get(k, (0, 0.0, [0, 0, 0, 0]))
        b = min(3, max(0, int(v // 10.0)))
        h = list(h)
        h[b] += 1
        out[k] = (cnt + 1, sv + v, h)
    return {k: (c, round(s, 6), tuple(h)) for k, (c, s, h) in out.items()}


def test_refresh_changelog_incremental_through_delete_and_merge(
    spark, tmp_warehouse
):
    """Round 8: with invertible aggregates (count/sum/hist), a window
    holding DELETE WHERE + MERGE commits refreshes via the signed
    changelog — mode incremental_changelog, never a recompute — and
    the state equals a from-scratch fold of the surviving rows."""
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into

    src = Table.create(os.path.join(tmp_warehouse, "csrc"), INV_SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "croll"), INV_ROLLUP_DDL)
    rows = [(i, i % 3, float(i)) for i in range(30)]
    src.append_dataframe(spark.createDataFrame(rows, INV_SRC_DDL).coalesce(1))
    r1 = refresh_rollup(spark, src, roll, ["k"], INV_AGGS)
    assert r1["mode"] == "incremental"

    delete_where(spark, src, "v >= 20.0")
    upd = [(i, i % 3, float(i) + 100.0) for i in range(0, 30, 7)]
    merge_into(src, spark.createDataFrame(upd, INV_SRC_DDL), ["id"])
    r2 = refresh_rollup(spark, src, roll, ["k"], INV_AGGS)
    assert r2["mode"] == "incremental_changelog", r2
    assert r2["delta_rows"] > 0
    want = {(i, i % 3, float(i)) for i in range(30) if i < 20}
    want = {t for t in want if t[0] % 7 != 0} | {
        (i, i % 3, float(i) + 100.0) for i in range(0, 30, 7)
    }
    assert _inv_state(roll, spark) == _inv_full(spark, sorted(want))
    # replay: anchor advanced, nothing to do
    assert refresh_rollup(spark, src, roll, ["k"], INV_AGGS)["mode"] == "noop"


def test_refresh_changelog_drops_dead_groups(spark, tmp_warehouse):
    """A group whose LAST row was deleted must leave the rollup —
    exactly what a recompute would produce (the count state is the
    liveness witness)."""
    from iceberg_compaction_spark.operators.delete_where import delete_where

    src = Table.create(os.path.join(tmp_warehouse, "dsrc"), INV_SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "droll"), INV_ROLLUP_DDL)
    rows = [(i, i % 3, float(i)) for i in range(12)]
    src.append_dataframe(spark.createDataFrame(rows, INV_SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], INV_AGGS)
    delete_where(spark, src, "k = 2")
    r = refresh_rollup(spark, src, roll, ["k"], INV_AGGS)
    assert r["mode"] == "incremental_changelog"
    state = _inv_state(roll, spark)
    assert 2 not in state and set(state) == {0, 1}
    assert state == _inv_full(spark, [t for t in rows if t[1] != 2])


def test_refresh_changelog_covers_consumed_pending_append(spark, tmp_warehouse):
    """The round-7 consumed-pending seam (a compaction rewrote an
    uncounted in-window append) recomputed unconditionally; with
    invertible aggregates it now folds the changelog instead — the
    changelog is layout-invariant, so the rewrite costs nothing."""
    from iceberg_compaction_spark.config import (
        CompactionConfig,
        GroupingStrategy,
        SelectionStrategy,
    )
    from iceberg_compaction_spark.plans.compaction import CompactionRunner

    src = Table.create(os.path.join(tmp_warehouse, "psrc"), INV_SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "proll"), INV_ROLLUP_DDL)
    a1 = [(i, i % 3, float(i)) for i in range(10)]
    src.append_dataframe(spark.createDataFrame(a1, INV_SRC_DDL).coalesce(1))
    refresh_rollup(spark, src, roll, ["k"], INV_AGGS)
    a2 = [(100 + i, i % 3, 5.0) for i in range(5)]
    src.append_dataframe(spark.createDataFrame(a2, INV_SRC_DDL).coalesce(1))
    CompactionRunner(
        spark,
        src,
        CompactionConfig(
            selection=SelectionStrategy.FULL,
            grouping=GroupingStrategy.SINGLE,
            sort_order=(("id", False),),
        ),
    ).execute()
    r = refresh_rollup(spark, src, roll, ["k"], INV_AGGS)
    assert r["mode"] == "incremental_changelog"
    assert r["delta_rows"] == 5  # only the uncounted append's rows
    assert _inv_state(roll, spark) == _inv_full(spark, a1 + a2)


def test_refresh_changelog_gates(spark, tmp_warehouse):
    """The changelog path must NOT engage for non-invertible states
    (min/max — AGGS), when disabled, when no count state exists, or
    past the row-set-changing commit cap — each falls back to the
    pinned recompute with identical results."""
    from iceberg_compaction_spark.operators.delete_where import delete_where

    for name, aggs, kw in (
        ("g1", AGGS, {}),  # min/max present
        ("g2", INV_AGGS, {"changelog_deltas": False}),
        ("g3", {"sv": ("sum", "v")}, {}),  # no count state
        ("g4", INV_AGGS, {"max_changelog_commits": 0}),
    ):
        ddl = SRC_DDL if aggs is AGGS else INV_SRC_DDL
        rows = (
            [(i % 3, float(i)) for i in range(12)]
            if aggs is AGGS
            else [(i, i % 3, float(i)) for i in range(12)]
        )
        src = Table.create(os.path.join(tmp_warehouse, f"{name}s"), ddl)
        rddl = {
            id(AGGS): ROLLUP_DDL,
            id(INV_AGGS): INV_ROLLUP_DDL,
        }.get(id(aggs), "k BIGINT, sv DOUBLE")
        roll = Table.create(os.path.join(tmp_warehouse, f"{name}r"), rddl)
        src.append_dataframe(spark.createDataFrame(rows, ddl).coalesce(1))
        refresh_rollup(spark, src, roll, ["k"], aggs, **kw)
        delete_where(spark, src, "v >= 6.0")
        r = refresh_rollup(spark, src, roll, ["k"], aggs, **kw)
        assert r["mode"] == "recompute", (name, r)
        got = {row["k"]: round(row["sv"], 6) for row in roll.scan(spark).collect()}
        want: dict = {}
        for t in rows:
            k, v = (t[0], t[1]) if aggs is AGGS else (t[1], t[2])
            if v < 6.0:
                want[k] = round(want.get(k, 0.0) + v, 6)
        assert got == want, name


def test_rollup_over_cdc_replication_target(spark, tmp_warehouse):
    """Round-8 composition: a rollup maintained on a CDC REPLICATION
    TARGET. Applies commit MERGE-shaped snapshots (tombstones + data),
    so the rollup's refresh goes changelog-incremental — the two
    round-8 features compose: source churn → apply_changelog → rollup
    refresh, never a recompute, state always equal to aggregating the
    source directly."""
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.operators.merge_into import merge_into
    from iceberg_compaction_spark.operators.replicate import apply_changelog

    src = Table.create(os.path.join(tmp_warehouse, "xsrc"), INV_SRC_DDL)
    tgt = Table.create(os.path.join(tmp_warehouse, "xtgt"), INV_SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "xroll"), INV_ROLLUP_DDL)
    rows = [(i, i % 3, float(i)) for i in range(24)]
    src.append_dataframe(spark.createDataFrame(rows, INV_SRC_DDL).coalesce(1))
    apply_changelog(spark, src, tgt, ["id"])
    # the initial load is itself a merge commit, so the FIRST fold
    # recomputes (changelog deltas need an anchored prior state)
    r1 = refresh_rollup(spark, tgt, roll, ["k"], INV_AGGS)
    assert r1["mode"] == "recompute"

    delete_where(spark, src, "v >= 18.0")
    merge_into(
        src,
        spark.createDataFrame([(3, 0, 33.0), (100, 1, 7.5)], INV_SRC_DDL),
        ["id"],
    )
    assert apply_changelog(spark, src, tgt, ["id"])["mode"] == "incremental"
    r2 = refresh_rollup(spark, tgt, roll, ["k"], INV_AGGS)
    assert r2["mode"] == "incremental_changelog", r2
    want = [t for t in rows if t[2] < 18.0 and t[0] != 3]
    want += [(3, 0, 33.0), (100, 1, 7.5)]
    assert _inv_state(roll, spark) == _inv_full(spark, want)


def test_stream_rollup_tails_source(spark, tmp_warehouse):
    """Streaming rollup maintenance: the source readStream triggers
    refreshes; a restart with the same checkpoint continues, and a
    DELETE on the source (which the append-only stream never surfaces
    as rows) still reaches the rollup via the changelog fold."""
    from iceberg_compaction_spark.operators.delete_where import delete_where
    from iceberg_compaction_spark.streaming.ingest import stream_rollup

    src = Table.create(os.path.join(tmp_warehouse, "ssrc"), INV_SRC_DDL)
    roll = Table.create(os.path.join(tmp_warehouse, "sroll"), INV_ROLLUP_DDL)
    ckpt = os.path.join(tmp_warehouse, "sckpt")
    rows = [(i, i % 2, float(i)) for i in range(16)]
    src.append_dataframe(spark.createDataFrame(rows, INV_SRC_DDL).coalesce(1))
    q = stream_rollup(spark, src, roll, "k", INV_AGGS, ckpt)
    q.awaitTermination(120)
    assert _inv_state(roll, spark) == _inv_full(spark, rows)

    src.append_dataframe(
        spark.createDataFrame([(100, 0, 5.0)], INV_SRC_DDL).coalesce(1)
    )
    delete_where(spark, src, "v >= 12.0")
    q2 = stream_rollup(spark, src, roll, "k", INV_AGGS, ckpt)  # same ckpt
    q2.awaitTermination(120)
    want = [t for t in rows + [(100, 0, 5.0)] if t[2] < 12.0]
    assert _inv_state(roll, spark) == _inv_full(spark, want)
