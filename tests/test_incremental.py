"""Mergeable partial-agg state: merge order and batch split must not
change the result (the invariant incremental rollup maintenance rests
on)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.incremental import (
    agg_state,
    finalize_state,
    merge_agg_states,
)


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [Row(k=i % 3, v=i * 7 % 101) for i in range(lo, hi)]
    )


def test_merge_of_splits_equals_full_recompute(spark):
    full = _rows(spark, 0, 300)
    a, b, c = _rows(spark, 0, 50), _rows(spark, 50, 180), _rows(spark, 180, 300)
    want = sorted(agg_state(full, ["k"], "v").collect())
    got = sorted(
        merge_agg_states(
            agg_state(a, ["k"], "v"),
            agg_state(b, ["k"], "v"),
            agg_state(c, ["k"], "v"),
        ).collect()
    )
    assert got == want


def test_merge_is_order_invariant_and_associative(spark):
    a = agg_state(_rows(spark, 0, 100), ["k"], "v")
    b = agg_state(_rows(spark, 100, 250), ["k"], "v")
    c = agg_state(_rows(spark, 250, 300), ["k"], "v")
    abc = sorted(merge_agg_states(a, b, c).collect())
    cba = sorted(merge_agg_states(c, b, a).collect())
    nested = sorted(merge_agg_states(merge_agg_states(c, a), b).collect())
    assert abc == cba == nested


def test_finalize_derives_average(spark):
    df = spark.createDataFrame([Row(k=1, v=10), Row(k=1, v=20)])
    out = finalize_state(agg_state(df, ["k"], "v")).first()
    assert out.n == 2 and out.total == 30 and out.avg_value == 15.0


def test_empty_delta_merge_is_identity(spark):
    a = agg_state(_rows(spark, 0, 100), ["k"], "v")
    empty = agg_state(_rows(spark, 0, 100).filter(F.lit(False)), ["k"], "v")
    assert sorted(merge_agg_states(a, empty).collect()) == sorted(a.collect())
