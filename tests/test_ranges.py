"""Unit tests: bucketed range join semantics (half-open window, bucket
boundaries, left flavor, degenerate intervals) and its plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.ranges import bucketed_range_join


def _fixture(spark):
    points = spark.createDataFrame(
        [("u1", 5), ("u1", 10), ("u1", 19), ("u1", 20), ("u2", 10)],
        "k string, p bigint",
    )
    intervals = spark.createDataFrame(
        [("u1", 10, 20, "w1"), ("u1", 0, 6, "w2"), ("u2", 50, 60, "w3")],
        "k string, s bigint, e bigint, wname string",
    )
    return points, intervals


def test_half_open_window_and_bucket_straddle(spark):
    points, intervals = _fixture(spark)
    # bucket_width=7 forces every interval to straddle bucket boundaries
    out = bucketed_range_join(
        points, intervals, on=["k"], point_col="p",
        start_col="s", end_col="e", bucket_width=7,
    ).collect()
    got = {(r.k, r.p, r.wname) for r in out}
    # p=10 and p=19 fall in [10,20); p=20 excluded (half-open); p=5 in [0,6)
    assert got == {("u1", 10, "w1"), ("u1", 19, "w1"), ("u1", 5, "w2")}


@pytest.mark.parametrize("width", [1, 3, 100])
def test_result_invariant_to_bucket_width(spark, width):
    points, intervals = _fixture(spark)
    out = bucketed_range_join(
        points, intervals, on=["k"], point_col="p",
        start_col="s", end_col="e", bucket_width=width,
    )
    assert out.count() == 3  # no duplicate matches at any width


def test_left_flavor_keeps_unmatched_points(spark):
    points, intervals = _fixture(spark)
    out = bucketed_range_join(
        points, intervals, on=["k"], point_col="p",
        start_col="s", end_col="e", bucket_width=10, how="left",
    )
    rows = out.collect()
    assert len(rows) == 5  # 3 matched + 2 unmatched (p=20, u2@10)
    unmatched = {(r.k, r.p) for r in rows if r.wname is None}
    assert unmatched == {("u1", 20), ("u2", 10)}


def test_inverted_interval_matches_nothing(spark):
    points = spark.createDataFrame([("u1", 5)], "k string, p bigint")
    bad = spark.createDataFrame(
        [("u1", 10, 0, "inv")], "k string, s bigint, e bigint, wname string"
    )
    out = bucketed_range_join(
        points, bad, on=["k"], point_col="p",
        start_col="s", end_col="e", bucket_width=5,
    )
    assert out.count() == 0


def test_negative_bucket_width_rejected(spark):
    points, intervals = _fixture(spark)
    with pytest.raises(ValueError):
        bucketed_range_join(
            points, intervals, on=["k"], point_col="p",
            start_col="s", end_col="e", bucket_width=0,
        )


def test_range_join_is_equi_join_not_nested_loop(spark):
    """The whole point of bucketization: the physical plan must be a
    hash/sort-merge equi-join on (key, bucket), never the
    BroadcastNestedLoopJoin a raw theta-join would produce."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    df = all_queries()["views_before_purchase"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
