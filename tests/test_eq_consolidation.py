"""Equality-delete consolidation (round 5): N per-MERGE eq-delete
files collapse to one per key set with per-row max seq — the eq twin
of rewrite_position_deletes and the delete-maintenance parity item vs
the reference's per-group delete dedup (file_selection.rs:82-117)."""

from __future__ import annotations

import os

from iceberg_compaction_spark.operators.delete_where import delete_where
from iceberg_compaction_spark.operators.maintenance import (
    rewrite_equality_deletes,
    rewrite_position_deletes,
)
from iceberg_compaction_spark.sources import manifest as mf
from iceberg_compaction_spark.sources.table import Table


def _rows(t, spark):
    return sorted((r["k"], r["v"]) for r in t.scan(spark).collect())


def test_consolidation_preserves_per_key_seq_semantics(spark, tmp_warehouse):
    """The union-of-kills pitfall: k=1 deleted at seq2 must NOT kill
    the k=1 row re-appended at seq3, even after its entry shares a
    file with a seq4 entry for another key. A naive max-over-file
    consolidation dies here."""
    loc = os.path.join(tmp_warehouse, "eqc")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(spark.createDataFrame([(1, "a1"), (2, "b1")], "k bigint, v string"))
    t.add_equality_deletes(spark.createDataFrame([(1,)], "k bigint"), ["k"])  # seq2
    t.append_dataframe(spark.createDataFrame([(1, "a2"), (2, "b2")], "k bigint, v string"))
    t.add_equality_deletes(spark.createDataFrame([(2,)], "k bigint"), ["k"])  # seq4
    before = _rows(t, spark)
    assert before == [(1, "a2")]
    assert len(t.files(content=mf.CONTENT_EQ_DEL)) == 2

    sid = rewrite_equality_deletes(spark, t)
    assert sid == t.current_snapshot_id
    eq_files = t.files(content=mf.CONTENT_EQ_DEL)
    assert len(eq_files) == 1
    # file-level seq is the max source seq (scoping stays conservative)
    assert eq_files[0]["sequence_number"] == 4
    assert _rows(t, spark) == before  # content-invariant

    # idempotent: a second pass with one live file per group is a no-op
    assert rewrite_equality_deletes(spark, t) == sid


def test_dead_delete_files_dropped_without_rewrite(spark, tmp_warehouse):
    """Eq files whose seq ≤ min live data seq kill nothing — removed
    outright, no consolidated file written."""
    loc = os.path.join(tmp_warehouse, "eqd")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(spark.createDataFrame([(5, "x")], "k bigint, v string").coalesce(1))  # seq1
    delete_where(spark, t, "k = 5")  # seq2: whole-file metadata drop
    t.add_equality_deletes(spark.createDataFrame([(6,)], "k bigint"), ["k"])  # seq3
    t.add_equality_deletes(spark.createDataFrame([(8,)], "k bigint"), ["k"])  # seq4
    t.append_dataframe(spark.createDataFrame([(7, "y")], "k bigint, v string").coalesce(1))  # seq5
    assert len(t.files(content=mf.CONTENT_EQ_DEL)) == 2
    before = _rows(t, spark)
    assert before == [(7, "y")]

    rewrite_equality_deletes(spark, t)
    assert t.files(content=mf.CONTENT_EQ_DEL) == []
    assert _rows(t, spark) == before


def test_duplicate_key_keeps_max_seq_and_reconsolidates(spark, tmp_warehouse):
    """The same key deleted twice keeps one entry at the max seq
    (exactly the union of kills); a consolidated file re-consolidates
    with a later one without losing per-row seqs."""
    loc = os.path.join(tmp_warehouse, "eqm")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(spark.createDataFrame([(1, "a1"), (2, "b1")], "k bigint, v string"))
    t.add_equality_deletes(spark.createDataFrame([(1,)], "k bigint"), ["k"])  # seq2
    t.append_dataframe(spark.createDataFrame([(1, "a2")], "k bigint, v string"))  # seq3
    t.add_equality_deletes(spark.createDataFrame([(1,)], "k bigint"), ["k"])  # seq4
    # k=1 entries at seq2 AND seq4 → consolidated to seq4; kills a1+a2
    rewrite_equality_deletes(spark, t)
    assert len(t.files(content=mf.CONTENT_EQ_DEL)) == 1
    assert _rows(t, spark) == [(2, "b1")]

    # now a THIRD delete and a re-append; re-consolidation folds the
    # consolidated (per-row seq) file with the plain one correctly
    t.append_dataframe(spark.createDataFrame([(2, "b2")], "k bigint, v string"))  # seq6
    t.add_equality_deletes(spark.createDataFrame([(2,)], "k bigint"), ["k"])  # seq7
    t.append_dataframe(spark.createDataFrame([(2, "b3")], "k bigint, v string"))  # seq8
    before = _rows(t, spark)
    assert before == [(2, "b3")]
    rewrite_equality_deletes(spark, t)
    assert len(t.files(content=mf.CONTENT_EQ_DEL)) == 1
    assert _rows(t, spark) == before


def test_run_maintenance_consolidates_remaining_deletes(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.maintenance import run_maintenance

    loc = os.path.join(tmp_warehouse, "eqrm")
    t = Table.create(loc, "k bigint, v string")
    rows = [(i, f"v{i}") for i in range(2000)]
    t.append_dataframe(
        spark.createDataFrame(rows, "k bigint, v string"), max_records_per_file=200
    )
    for start in (0, 10, 20):
        t.add_equality_deletes(
            spark.createDataFrame([(start + j,) for j in range(5)], "k bigint"), ["k"]
        )
    before = sorted(r["k"] for r in t.scan(spark).collect())
    out = run_maintenance(spark, t, retain_last=1)
    # whatever compaction folded, no more than one eq-delete file may
    # survive the pass, and content is unchanged
    assert len(t.files(content=mf.CONTENT_EQ_DEL)) <= 1
    assert sorted(r["k"] for r in t.scan(spark).collect()) == before
    assert "recommendation" in out


def test_rewrite_position_deletes_still_consolidates(spark, tmp_warehouse):
    """files_df-sourced live set (round-5 scale fix) keeps the pos
    consolidation behavior identical."""
    loc = os.path.join(tmp_warehouse, "posc")
    t = Table.create(loc, "k bigint, v string")
    t.append_dataframe(
        spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k bigint, v string"),
        max_records_per_file=50,
    )
    delete_where(spark, t, "k % 10 = 3", mode="mor")
    delete_where(spark, t, "k % 10 = 7", mode="mor")
    assert len(t.files(content=mf.CONTENT_POS_DEL)) >= 2
    before = sorted(r["k"] for r in t.scan(spark).collect())
    rewrite_position_deletes(spark, t)
    assert len(t.files(content=mf.CONTENT_POS_DEL)) == 1
    assert sorted(r["k"] for r in t.scan(spark).collect()) == before


def test_migrate_partition_spec_binned_resume(spark, tmp_warehouse):
    """Round 5: spec migration is per-bin committed and resumable — a
    crash after bin 0 loses no work; the re-invocation migrates only
    the remaining old-grain files (bin-0 outputs are never rewritten)."""
    from iceberg_compaction_spark.operators.maintenance import migrate_partition_spec

    t = Table.create(
        os.path.join(tmp_warehouse, "migr"),
        "k bigint, ts timestamp, v string",
        partition={"field": "_part", "expr": "date_format(ts, 'yyyy-MM-dd')"},
    )
    df = spark.range(4000).selectExpr(
        "id as k",
        "timestamp'2024-06-25 00:00:00' + make_interval(0,0,0,0,0,0,id*600) as ts",
        "concat('v', id) as v",
    )
    t.append_dataframe(df.repartition(4), max_records_per_file=500)
    before = sorted(tuple(r) for r in t.scan(spark).collect())
    t.set_partition_expr("date_format(ts, 'yyyy-MM')")

    # force several bins, then crash after the first bin's commit
    total = sum(r["size_bytes"] for r in t.files(content=mf.CONTENT_DATA))
    target = max(1, total // 3)
    real_commit = t.commit
    calls = {"n": 0}

    def exploding_commit(*a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real_commit(*a, **kw)

    t.commit = exploding_commit
    try:
        migrate_partition_spec(spark, t, group_target_size_bytes=target)
        raise AssertionError("expected the simulated crash")
    except RuntimeError:
        pass
    finally:
        t.commit = real_commit

    # bin 0 landed; some files already month-grain, some still day-grain
    parts_mid = {r["partition"] for r in t.files(content=mf.CONTENT_DATA)}
    assert any(len(p) == 7 for p in parts_mid)
    assert any(len(p) == 10 for p in parts_mid), parts_mid
    migrated = {
        r["path"] for r in t.files(content=mf.CONTENT_DATA) if len(r["partition"]) == 7
    }

    # resume: a fresh invocation finishes the remaining bins only
    migrate_partition_spec(spark, t, group_target_size_bytes=target)
    files_after = t.files(content=mf.CONTENT_DATA)
    assert all(len(r["partition"]) == 7 for r in files_after)
    assert migrated <= {r["path"] for r in files_after}  # bin-0 outputs untouched
    assert sorted(tuple(r) for r in t.scan(spark).collect()) == before

    # idempotent: nothing old-grain remains, third call is a no-op
    sid = t.current_snapshot_id
    assert migrate_partition_spec(spark, t) == sid
