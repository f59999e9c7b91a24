"""Property tests: the distributed span-dedup operators against a
direct single-process Python model over random tiny corpora. The
model recomputes everything from scratch (token positions, gram
document-frequency, covered-position islands), so any divergence in
the DataFrame composition — window frames, merge rule, short-doc
guard, trim accounting — surfaces here."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_compaction_spark.operators.mixing import export_shards
from iceberg_compaction_spark.operators.spans import (
    duplicate_spans,
    trim_duplicate_spans,
)

_VOCAB = ["aa", "bb", "cc", "dd", "ee"]

_doc_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _norm(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9\s]", " ", text.lower()).strip()
    return re.split(r"\s+", t) if t else [""]


def _ref_spans(texts: list[str], n: int, min_docs: int):
    """Python reference: maximal covered-token runs per doc."""
    grams: dict[str, set[int]] = {}
    positions: dict[int, list[int]] = {}
    for d, text in enumerate(texts):
        toks = _norm(text)
        positions[d] = []
        if len(toks) < n:
            continue
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            grams.setdefault(g, set()).add(d)
            positions[d].append(i)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    spans = set()
    covered: dict[int, set[int]] = {}
    for d, text in enumerate(texts):
        toks = _norm(text)
        cov: set[int] = set()
        for i in positions[d]:
            if " ".join(toks[i : i + n]) in dup:
                cov.update(range(i, i + n))
        covered[d] = cov
        for p in sorted(cov):
            if p - 1 not in cov:  # island start
                end = p
                while end + 1 in cov:
                    end += 1
                spans.add((d, p, end, end - p + 1))
    return spans, covered


@settings(max_examples=12, deadline=None)
@given(_doc_strategy, st.integers(2, 3))
def test_duplicate_spans_matches_python_model(spark, texts, n):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(df, n=n, min_docs=2).collect()
    }
    expect, _cov = _ref_spans(texts, n, 2)
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(_doc_strategy)
def test_trim_matches_python_model(spark, texts):
    n = 2
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in trim_duplicate_spans(df, n=n, min_docs=2).collect()}
    _spans, covered = _ref_spans(texts, n, 2)
    for d, text in enumerate(texts):
        toks = _norm(text)
        cov = covered[d]
        expect_txt = " ".join(t for i, t in enumerate(toks) if i not in cov)
        assert out[d]["text_trimmed"] == expect_txt, (d, texts)
        assert out[d]["n_dup_tokens"] == len(cov)
        assert out[d]["n_tokens"] == len(toks)


@settings(max_examples=6, deadline=None)
@given(st.integers(2, 7), st.text("ab", min_size=1, max_size=4))
def test_export_shards_matches_python_model(spark, n_shards, seed):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    rows = export_shards(df, n_shards, seed=seed).collect()
    for r in rows:
        h = int(hashlib.md5(f"{seed}:{r['doc_id']}".encode()).hexdigest()[:8], 16)
        assert r["sort_key"] == h
        assert r["shard"] == h % n_shards
    # ranks follow the hash order inside each shard
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: (r["sort_key"], r["doc_id"]))
        assert [r["shard_rank"] for r in rs] == list(range(1, len(rs) + 1))


@settings(max_examples=8, deadline=None)
@given(_doc_strategy, st.integers(2, 3))
def test_gram_hash_mode_is_equivalent(spark, texts, n):
    """The production narrow-shuffle flag (xxhash64 gram keys) must
    produce byte-identical spans to the string-key form."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    cols = ("doc_id", "span_start", "span_end", "span_len")
    plain = {tuple(r[c] for c in cols)
             for r in duplicate_spans(df, n=n, min_docs=2).collect()}
    hashed = {tuple(r[c] for c in cols)
              for r in duplicate_spans(df, n=n, min_docs=2, gram_hash=True).collect()}
    assert plain == hashed
