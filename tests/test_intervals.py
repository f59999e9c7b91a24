"""Range join vs a direct Python model over random points/intervals:
inclusive bounds, per-key scoping, bin-boundary alignment, intervals
spanning many bins, and duplicate-free pair production all fall out of
the random generation (bin_width 3 against values 0..20 forces
multi-bin intervals and boundary hits)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_compaction_spark.operators.intervals import range_join

_points = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 99)),
    min_size=1,
    max_size=10,
)
_intervals = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 8), st.integers(0, 99)),
    min_size=0,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(_points, _intervals, st.sampled_from([1.0, 3.0, 100.0]))
def test_range_join_matches_python_model(spark, pts, ivs, w):
    pts = list({(k, ts, v) for k, ts, v in pts})
    ivs = list({(k, s, s + span, v) for k, s, span, v in ivs})
    pdf = spark.createDataFrame(pts, "key long, ts long, pval long")
    idf = spark.createDataFrame(
        ivs or [(0, 1, 0, 0)], "key long, start long, end long, ival long"
    )
    if not ivs:
        idf = idf.filter("end > start")  # empty, schema kept
    got = {
        (r["key"], r["ts"], r["pval"], r["start_r"], r["end_r"], r["ival_r"])
        for r in range_join(pdf, idf, by="key", bin_width=w).collect()
    }
    want = {
        (k, ts, v, s, e, iv)
        for (k, ts, v) in pts
        for (ik, s, e, iv) in ivs
        if ik == k and s <= ts <= e
    }
    assert got == want
    # duplicate-free: the DataFrame multiset equals the set
    assert range_join(pdf, idf, by="key", bin_width=w).count() == len(want)


def test_range_join_timestamp_columns(spark):
    pdf = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "key long, ts string"
    ).selectExpr("key", "CAST(ts AS TIMESTAMP) AS ts")
    idf = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 11:00:00", "in"),
         (1, "2024-01-01 11:00:01", "2024-01-01 12:00:00", "out")],
        "key long, start string, end string, tag string",
    ).selectExpr(
        "key", "CAST(start AS TIMESTAMP) AS start", "CAST(end AS TIMESTAMP) AS end", "tag"
    )
    rows = range_join(pdf, idf, by="key", bin_width=3600.0).collect()
    assert [r["tag_r"] for r in rows] == ["in"]


def test_range_join_guards_degenerate_interval(spark):
    pdf = spark.createDataFrame([(1, 5)], "key long, ts long")
    idf = spark.createDataFrame([(1, 0, 10_000_000, 1)], "key long, start long, end long, ival long")
    with pytest.raises(Exception, match="bins"):
        range_join(pdf, idf, by="key", bin_width=1.0, max_bins_per_interval=100).collect()


def test_range_join_plan_has_no_nested_loop(spark):
    pdf = spark.range(100).selectExpr("id % 3 AS key", "id AS ts")
    idf = spark.range(30).selectExpr(
        "id % 3 AS key", "id * 3 AS start", "id * 3 + 5 AS end", "id AS ival"
    )
    plan = range_join(pdf, idf, by="key", bin_width=4.0)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_range_join_null_bounds_never_match(spark):
    """SQL BETWEEN with a NULL bound (or a NULL point) is never TRUE;
    the binning form agrees — null-bin rows drop out of the equi-join
    and null-bound intervals drop at the explode."""
    pdf = spark.createDataFrame(
        [(1, 5), (1, None)], "key long, ts long"
    )
    idf = spark.createDataFrame(
        [(1, 0, 10, "full"), (1, None, 10, "nostart"), (1, 0, None, "noend")],
        "key long, start long, end long, tag string",
    )
    rows = range_join(pdf, idf, by="key", bin_width=4.0).collect()
    assert [(r["ts"], r["tag_r"]) for r in rows] == [(5, "full")]
