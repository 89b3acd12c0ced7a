"""merge_into: Delta-style conditional MERGE as one equi-join pass."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.merge import (
    WhenMatched,
    WhenNotMatched,
    merge_into,
)


def _target(spark):
    return spark.createDataFrame(
        [
            Row(k=1, qty=10, status="open"),
            Row(k=2, qty=20, status="open"),
            Row(k=3, qty=30, status="closed"),
            Row(k=4, qty=40, status="open"),
        ]
    )


def _source(spark):
    return spark.createDataFrame(
        [
            Row(k=2, qty=25, status="open"),      # matched: update
            Row(k=3, qty=99, status="open"),      # matched: delete (closed)
            Row(k=5, qty=50, status="open"),      # not matched: insert
            Row(k=6, qty=60, status="closed"),    # not matched: filtered out
        ]
    )


def test_update_delete_insert_roundtrip(spark):
    out = merge_into(
        _target(spark),
        _source(spark),
        ["k"],
        matched=[
            WhenMatched("delete", lambda t, s: t("status") == "closed"),
            WhenMatched(
                "update", assignments={"qty": lambda t, s: s("qty")}
            ),
        ],
        not_matched=[
            WhenNotMatched(lambda t, s: s("status") != "closed")
        ],
    )
    got = {r.k: (r.qty, r.status) for r in out.collect()}
    assert got == {
        1: (10, "open"),   # untouched (no source match)
        2: (25, "open"),   # updated from source
        4: (40, "open"),   # untouched
        5: (50, "open"),   # inserted
    }  # 3 deleted; 6 rejected by the insert condition


def test_first_match_wins_clause_order(spark):
    tgt = spark.createDataFrame([Row(k=1, qty=10, status="open")])
    src = spark.createDataFrame([Row(k=1, qty=99, status="open")])
    # both clauses' conditions hold; the FIRST one must apply
    out = merge_into(
        tgt,
        src,
        ["k"],
        matched=[
            WhenMatched(
                "update", assignments={"qty": lambda t, s: F.lit(-1)}
            ),
            WhenMatched("delete"),
        ],
    )
    assert [r.qty for r in out.collect()] == [-1]
    # flipped order: delete wins instead
    out2 = merge_into(
        tgt,
        src,
        ["k"],
        matched=[
            WhenMatched("delete"),
            WhenMatched(
                "update", assignments={"qty": lambda t, s: F.lit(-1)}
            ),
        ],
    )
    assert out2.count() == 0


def test_unmatched_clause_keeps_target_row(spark):
    tgt = spark.createDataFrame([Row(k=1, qty=10, status="open")])
    src = spark.createDataFrame([Row(k=1, qty=99, status="open")])
    out = merge_into(
        tgt,
        src,
        ["k"],
        matched=[
            WhenMatched(
                "update",
                condition=lambda t, s: s("qty") < t("qty"),  # false
                assignments={"qty": lambda t, s: s("qty")},
            )
        ],
    )
    assert [r.qty for r in out.collect()] == [10]


def test_insert_values_and_missing_source_column(spark):
    tgt = spark.createDataFrame([Row(k=1, qty=10, status="open")])
    src = spark.createDataFrame([Row(k=7, qty=70)])  # no status column
    out = merge_into(
        tgt,
        src,
        ["k"],
        not_matched=[WhenNotMatched()],
    ).filter(F.col("k") == 7)
    row = out.collect()[0]
    assert (row.qty, row.status) == (70, None)  # default source + NULL
    out2 = merge_into(
        tgt,
        src,
        ["k"],
        not_matched=[
            WhenNotMatched(values={"status": lambda t, s: F.lit("new")})
        ],
    ).filter(F.col("k") == 7)
    assert out2.collect()[0].status == "new"


def test_duplicate_source_key_raises_in_plan(spark):
    tgt = _target(spark)
    src = spark.createDataFrame(
        [Row(k=2, qty=1, status="a"), Row(k=2, qty=2, status="b")]
    )
    out = merge_into(
        tgt,
        src,
        ["k"],
        matched=[
            WhenMatched(
                "update", assignments={"qty": lambda t, s: s("qty")}
            )
        ],
    )
    with pytest.raises(Exception, match="duplicate rows for key"):
        out.collect()


def test_clause_validation(spark):
    with pytest.raises(ValueError, match="delete clause takes no"):
        WhenMatched("delete", assignments={"x": lambda t, s: F.lit(1)})
    with pytest.raises(ValueError, match="unknown matched action"):
        WhenMatched("upsert")
    with pytest.raises(ValueError, match="missing from a side"):
        merge_into(
            _target(spark),
            _source(spark).drop("k").withColumnRenamed("qty", "q"),
            ["k"],
        )


def test_merge_plan_single_target_pass_no_cartesian(spark):
    """The target is scanned and shuffled at most once: one equi-join,
    no cartesian, and the ambiguity window runs on the source side
    only."""
    out = merge_into(
        _target(spark),
        _source(spark),
        ["k"],
        matched=[
            WhenMatched(
                "update", assignments={"qty": lambda t, s: s("qty")}
            )
        ],
        not_matched=[WhenNotMatched()],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
