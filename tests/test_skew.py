"""Salted-join correctness: result multiset must equal the plain join."""

from __future__ import annotations

import pyspark.sql.functions as F


def _skewed_frames(spark):
    # 90% of fact rows share one hot key
    large = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    return large, small


def test_salted_join_matches_plain_join(spark):
    from asritha_metamorphetl_spark.operators.skew import salted_join

    large, small = _skewed_frames(spark)
    plain = large.join(small, "k")
    salted = salted_join(large, small, "k", n_salts=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_targeted_salting_matches_plain_join(spark):
    from asritha_metamorphetl_spark.operators.skew import salted_join

    large, small = _skewed_frames(spark)
    plain = large.join(small, "k")
    salted = salted_join(large, small, "k", n_salts=8, hot_keys=[7])
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salting_spreads_hot_key(spark):
    """The hot key's rows must land on >1 salt value."""
    from asritha_metamorphetl_spark.operators import skew

    large, _ = _skewed_frames(spark)
    salted = large.withColumn(
        "s", F.floor(F.rand(seed=42) * 8).cast("int")
    )
    n = salted.filter("k = 7").select("s").distinct().count()
    assert n == 8
