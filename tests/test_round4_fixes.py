"""Round-4 ADVICE regressions: type-aware ts-literal pruning (string
columns compare raw), ref-ancestry-safe snapshot expiry, locked branch
ref mutation, rollback conflict pinning, exact-by-default jaccard."""

from __future__ import annotations

import inspect
import os
import time

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.errors import CommitConflict, ValidationError
from iceberg_compaction_spark.plans import pruning
from iceberg_compaction_spark.sources.table import LockBusy, Table


# ---------------------------------------------------------------------------
# ADVICE high: ts-shaped bare string literals on a genuine STRING column
# must compare as raw strings (Spark's ordering: ' ' < 'T'), not as
# normalized instants.
def test_string_column_ts_shaped_literal_compares_raw():
    ct_str = {"c": "str"}
    ct_ts = {"c": "ts"}
    # STRING column whose rows are space-form datetime text
    st = {"c": {"min": "2024-06-01 05:00:00", "max": "2024-06-01 05:00:00", "nulls": 0}}
    pred = pruning.parse_predicate("c < '2024-06-01T00:00:00'")
    # raw ordering: '2024-06-01 05:00:00' < '2024-06-01T00:00:00' (' ' < 'T')
    # → the row MATCHES; normalizing would have pruned it (silent missing rows)
    assert pruning.file_may_match_any(st, pred, ct_str)
    # same stats interpreted as a timestamp column: instant 05:00 is NOT
    # before midnight → prunable
    assert not pruning.file_may_match_any(st, pred, ct_ts)

    # all-match inversion (the DELETE WHERE / fast_count hazard):
    # raw ordering says NO row satisfies c >= '...T00:00:00', but the
    # normalized comparison would claim ALL rows do → wrong whole-file drop
    pred_ge = pruning.parse_predicate("c >= '2024-06-01T00:00:00'")
    assert not pruning.file_all_match(st, pred_ge, ct_str)
    assert pruning.file_all_match(st, pred_ge, ct_ts)
    # and with NO type context, neither claim is provable
    assert not pruning.file_all_match(st, pred_ge)


def test_scan_filter_on_string_column_with_datetime_text(spark, tmp_warehouse):
    """End-to-end: a filter comparing a STRING column against a
    ts-shaped literal returns exactly what the unpruned filter returns
    (round-3 normalization would have pruned matching files)."""
    loc = os.path.join(tmp_warehouse, "strts")
    t = Table.create(loc, "id bigint, c string")
    df = spark.createDataFrame(
        [(i, f"2024-06-01 0{i}:00:00") for i in range(8)], "id bigint, c string"
    )
    t.append_dataframe(df)
    pred = "c < '2024-06-01T00:00:00'"  # raw: ' ' < 'T' → ALL rows match
    expected = t.scan(spark).filter(pred).count()
    got = t.scan(spark, filter=pred).count()
    assert expected == 8
    assert got == expected
    assert t.last_scan_pruned_files == 0


def test_delete_where_string_column_never_misdrops(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.delete_where import delete_where

    loc = os.path.join(tmp_warehouse, "strdel")
    t = Table.create(loc, "id bigint, c string")
    df = spark.createDataFrame(
        [(i, f"2024-06-01 0{i}:00:00") for i in range(8)], "id bigint, c string"
    )
    t.append_dataframe(df)
    # raw string ordering: no row is >= the 'T'-form literal — a
    # normalized evaluator would have metadata-dropped the whole file
    res = delete_where(spark, t, "c >= '2024-06-01T00:00:00'")
    assert res["dropped_files"] == 0
    assert res["deleted_rows"] == 0
    assert t.scan(spark).count() == 8


def test_fast_count_string_column_type_aware(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.stats_agg import fast_count

    loc = os.path.join(tmp_warehouse, "strcnt")
    t = Table.create(loc, "id bigint, c string")
    df = spark.createDataFrame(
        [(i, f"2024-06-01 0{i}:00:00") for i in range(8)], "id bigint, c string"
    )
    t.append_dataframe(df)
    res = fast_count(spark, t, "c >= '2024-06-01T00:00:00'")
    assert res["count"] == 0  # raw ordering: nothing matches
    res2 = fast_count(spark, t, "c < '2024-06-01T00:00:00'")
    assert res2["count"] == 8


# ---------------------------------------------------------------------------
# ADVICE medium: expiry must retain every ref's FULL parent chain so
# WAP publish (ancestry walk) survives expiry of branch-interior or
# branch-ancestor snapshots.
def test_expire_retains_branch_ancestry_then_publish(spark, tmp_warehouse):
    from iceberg_compaction_spark.operators.maintenance import expire_snapshots

    loc = os.path.join(tmp_warehouse, "wapexp")
    t = Table.create(loc, "id bigint, v string")
    for i in range(3):
        t.append_dataframe(spark.createDataFrame([(i, f"m{i}")], "id bigint, v string"))
    t.create_branch("audit")
    for i in range(2):  # multi-commit branch: interior snapshot exists
        t.append_dataframe(
            spark.createDataFrame([(10 + i, f"b{i}")], "id bigint, v string"),
            branch="audit",
        )
    res = expire_snapshots(t, older_than_ms=int(time.time() * 1000) + 10_000, retain_last=1)
    # every snapshot on the branch head's parent chain survived
    head = t.ref_head("audit")
    s = head
    while s is not None:
        assert os.path.exists(t._snap_path(s)), f"ancestor {s} was expired"
        s = t.snapshot(s)["parent_id"]
    # and the publish fast-forward works (walks that same chain)
    published = t.fast_forward_main("audit")
    assert published == head
    assert t.scan(spark).count() == 5
    # after dropping the ref, its exclusive history becomes expirable
    t.drop_branch("audit")
    res2 = expire_snapshots(t, older_than_ms=int(time.time() * 1000) + 10_000, retain_last=1)
    assert res2.expired_snapshot_ids  # something was finally released


def test_ancestry_walk_over_expired_snapshot_is_clean_error(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "cleanerr")
    t = Table.create(loc, "id bigint, v string")
    sids = []
    for i in range(3):
        sids.append(
            t.append_dataframe(spark.createDataFrame([(i, "x")], "id bigint, v string"))
        )
    # simulate a pre-invariant expiry: delete an interior snapshot JSON
    os.unlink(t._snap_path(sids[0]))
    with pytest.raises(ValidationError):
        t._is_ancestor(999, sids[-1])
    from iceberg_compaction_spark.operators.changelog import changelog_scan

    with pytest.raises(ValidationError):
        changelog_scan(spark, t, None, sids[-1])


# ---------------------------------------------------------------------------
# ADVICE medium: branch ref mutation happens under the commit lock
def test_create_branch_respects_commit_lock(spark, tmp_warehouse):
    loc = os.path.join(tmp_warehouse, "brlock")
    t = Table.create(loc, "id bigint, v string")
    t.append_dataframe(spark.createDataFrame([(1, "x")], "id bigint, v string"))
    lock = os.path.join(t._meta_dir, "commit.lock")
    with open(lock, "w") as f:
        f.write("held")
    try:
        with pytest.raises(LockBusy):
            t.create_branch("audit")
    finally:
        os.unlink(lock)
    t.create_branch("audit")  # lock released: succeeds
    with open(lock, "w") as f:
        f.write("held")
    try:
        with pytest.raises(LockBusy):
            t.drop_branch("audit")
    finally:
        os.unlink(lock)
    t.drop_branch("audit")
    assert "audit" not in t.refs()


# ---------------------------------------------------------------------------
# ADVICE low: rollback pins the snapshot it diffed against
def test_rollback_concurrent_commit_is_conflict(spark, tmp_warehouse, monkeypatch):
    loc = os.path.join(tmp_warehouse, "rbrace")
    t = Table.create(loc, "id bigint, v string")
    s1 = t.append_dataframe(spark.createDataFrame([(1, "a")], "id bigint, v string"))
    t.append_dataframe(spark.createDataFrame([(2, "b")], "id bigint, v string"))

    orig = Table.manifest
    state = {"fired": False}

    def hooked(self, snapshot_id=None):
        rows = orig(self, snapshot_id)
        if not state["fired"]:
            state["fired"] = True
            t2 = Table.load(loc)  # a concurrent writer lands a commit
            t2.append_dataframe(
                spark.createDataFrame([(3, "c")], "id bigint, v string")
            )
        return rows

    monkeypatch.setattr(Table, "manifest", hooked)
    with pytest.raises(CommitConflict):
        t.rollback_to(s1)


# ---------------------------------------------------------------------------
# ADVICE low: jaccard APIs are exact by default; the cap is opt-in
def test_jaccard_cap_is_opt_in():
    from iceberg_compaction_spark.operators.dedup import (
        ngram_jaccard_dedup,
        ngram_jaccard_pairs,
    )

    for fn in (ngram_jaccard_pairs, ngram_jaccard_dedup):
        assert inspect.signature(fn).parameters["max_shingle_df"].default is None


# ---------------------------------------------------------------------------
# VERDICT #7: large-star/small-star fallback for high-diameter graphs
def test_connected_components_deep_chain_uses_star(spark):
    from iceberg_compaction_spark.metrics import GLOBAL as METRICS
    from iceberg_compaction_spark.operators.dedup import connected_components

    n = 256  # a chain this deep would need 256 label-propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    before = METRICS.get("cc.star_rounds")
    labels = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    rounds = METRICS.get("cc.star_rounds") - before
    assert labels == {i: 0 for i in range(n + 1)}
    assert 0 < rounds < 10, rounds  # O(log n), not O(diameter)


def test_connected_components_star_matches_union_find(spark):
    import random

    from iceberg_compaction_spark.operators.dedup import connected_components_star

    def uf(edges, nodes):
        parent = {x: x for x in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in nodes}

    rng = random.Random(5)
    for trial in range(3):
        es = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
        es = [e for e in es if e[0] != e[1]]
        nodes = sorted({x for e in es for x in e})
        df = spark.createDataFrame(es, "id_a long, id_b long")
        got = {
            r["node"]: r["component"]
            for r in connected_components_star(df).collect()
        }
        assert got == uf(es, nodes), trial


def test_connected_components_shallow_stays_on_label_prop(spark):
    from iceberg_compaction_spark.metrics import GLOBAL as METRICS
    from iceberg_compaction_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "id_a long, id_b long"
    )
    before = METRICS.get("cc.star_rounds")
    labels = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert METRICS.get("cc.star_rounds") == before  # never switched
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


# ---------------------------------------------------------------------------
# VERDICT #8: real multimodal decode behind a runtime import probe
def test_real_decode_guard_without_pil(spark):
    from iceberg_compaction_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(1, "hello")], "doc_id bigint, text string")
    media = mm.attach_fake_media(docs)
    if mm._pil() is None:
        # this container: clean driver-side NotImplementedError, fake path fine
        with pytest.raises(NotImplementedError):
            mm.extract_features(media, decode="real")
        with pytest.raises(NotImplementedError):
            mm.resize(media, 8, 8, decode="real")
        assert mm.extract_features(media, decode="fake").count() == 1
    else:  # pragma: no cover - container has no PIL
        pytest.skip("PIL present: covered by test_real_decode_with_pil")


def test_real_decode_with_pil(spark):
    """Runs only where PIL exists: decode='real' must work with NO code
    changes (the round-4 guard)."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from iceberg_compaction_spark.operators import multimodal as mm

    buf = io.BytesIO()
    Image.new("L", (4, 4), color=200).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(png), "image/png", 4, 4, 0)],
        "doc_id bigint, media binary, media_type string, media_w int,"
        " media_h int, media_ms int",
    )
    feats = mm.extract_features(df, decode="real").collect()
    assert len(feats) == 1 and abs(feats[0]["brightness"] - 200.0) < 1e-6
    out = mm.resize(df, 8, 8, decode="real").collect()[0]
    img = Image.open(io.BytesIO(bytes(out["media"])))
    assert img.size == (8, 8)
