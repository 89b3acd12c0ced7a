"""Reconcile + assert_unique operator tests (SURVEY §5 plan, items 4-5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", None)],
        "id int, name string, amount double",
    )


def test_assert_unique_passes(base):
    from asritha_metamorphetl_spark.quality import assert_unique

    assert assert_unique(base, ["id"]) is base


def test_assert_unique_raises(spark, base):
    from asritha_metamorphetl_spark.quality import DuplicateKeyError, assert_unique

    dup = base.union(spark.createDataFrame([(2, "x", 0.0)], base.schema))
    with pytest.raises(DuplicateKeyError) as e:
        assert_unique(dup, ["id"])
    assert e.value.n_dupes == 1
    assert e.value.sample[0]["id"] == 2


def test_reconcile_identical(spark, base):
    from asritha_metamorphetl_spark.quality import reconcile

    r = reconcile(base, base, ["id"])
    s = r.summary.collect()[0]
    assert s.source_rows == 4 and s.target_rows == 4
    assert s.matched_rows == 4 and s.mismatched_rows == 0
    assert s.source_only_rows == 0 and s.target_only_rows == 0
    assert r.column_mismatches.count() == 0
    r.unpersist()


def test_reconcile_single_cell_perturbation(spark, base):
    from asritha_metamorphetl_spark.quality import reconcile

    target = base.withColumn(
        "amount", F.when(F.col("id") == 2, 99.0).otherwise(F.col("amount"))
    )
    r = reconcile(base, target, ["id"])
    s = r.summary.collect()[0]
    assert s.mismatched_rows == 1
    cm = r.column_mismatches.collect()
    assert len(cm) == 1
    assert cm[0].column_name == "amount"
    assert cm[0].source_value == "20.0" and cm[0].target_value == "99.0"
    assert s.mismatch_pct == 25.0
    r.unpersist()


def test_reconcile_missing_rows_both_sides(spark, base):
    from asritha_metamorphetl_spark.quality import reconcile

    target = base.filter("id != 3").union(
        spark.createDataFrame([(9, "z", 9.0)], base.schema)
    )
    r = reconcile(base, target, ["id"])
    s = r.summary.collect()[0]
    assert s.source_only_rows == 1 and s.target_only_rows == 1
    assert [row.id for row in r.source_only.collect()] == [3]
    assert [row.id for row in r.target_only.collect()] == [9]
    r.unpersist()


def test_reconcile_null_vs_empty(spark):
    from asritha_metamorphetl_spark.quality import reconcile

    src = spark.createDataFrame([(1, None)], "id int, v string")
    tgt = spark.createDataFrame([(1, "")], "id int, v string")
    # Reference semantics: NULL == '' (Raptor na.fill('')).
    lax = reconcile(src, tgt, ["id"])
    assert lax.summary.collect()[0].matched_rows == 1
    lax.unpersist()
    strict = reconcile(src, tgt, ["id"], strict_nulls=True)
    assert strict.summary.collect()[0].mismatched_rows == 1
    strict.unpersist()


def test_column_mismatch_summary(spark, base):
    from asritha_metamorphetl_spark.quality import reconcile
    from asritha_metamorphetl_spark.quality.reconcile import column_mismatch_summary

    target = base.withColumn(
        "name", F.when(F.col("id") <= 2, "zz").otherwise(F.col("name"))
    )
    r = reconcile(base, target, ["id"])
    rows = column_mismatch_summary(r).collect()
    assert len(rows) == 1
    assert rows[0].column_name == "name"
    assert rows[0].mismatch_count == 2
    assert rows[0].mismatch_pct == 50.0
    r.unpersist()
