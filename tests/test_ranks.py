"""Scale-safe global ranking vs the single-partition window reference."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_global_row_number_matches_window(spark):
    from asritha_metamorphetl_spark.operators.ranks import global_row_number

    df = spark.range(0, 5000).withColumn("v", (F.col("id") * 37 % 1000).cast("double"))
    order = [F.col("v").desc(), F.col("id").asc()]
    got = global_row_number(df, order, out_col="grn", num_partitions=7)
    want = df.withColumn("wrn", F.row_number().over(Window.orderBy(*order)))
    joined = got.join(want.select("id", "wrn"), "id")
    assert joined.filter(F.col("grn") != F.col("wrn")).count() == 0


def test_global_percent_rank_matches_window_with_ties(spark):
    from asritha_metamorphetl_spark.operators.ranks import global_percent_rank

    # v has heavy ties (mod 50) — tie groups must share the min rank.
    df = spark.range(0, 3000).withColumn("v", (F.col("id") % 50).cast("double"))
    got = global_percent_rank(
        df, F.col("v"), descending=True, tiebreak=[F.col("id")], out_col="pr"
    )
    want = df.withColumn(
        "wpr", F.percent_rank().over(Window.orderBy(F.col("v").desc()))
    )
    joined = got.join(want.select("id", "wpr"), "id")
    assert joined.filter(F.abs(F.col("pr") - F.col("wpr")) > 1e-12).count() == 0


def test_global_percent_rank_raw_frame_never_single_partition(spark):
    """The whole point: the INPUT rows must never funnel into one
    partition. The only SinglePartition stage allowed is the one over the
    collapsed distinct-value frame — i.e. every SinglePartition exchange
    must sit above the groupBy(value) HashAggregate, never above the raw
    scan."""
    from asritha_metamorphetl_spark.operators.ranks import global_percent_rank

    df = spark.range(0, 1000).withColumn("v", (F.col("id") % 37).cast("double"))
    got = global_percent_rank(df, F.col("v"), tiebreak=[F.col("id")])
    plan = got._jdf.queryExecution().executedPlan().toString()
    for seg in plan.split("SinglePartition")[1:]:
        # The exchange's subtree is printed below it; the collapsing
        # aggregate must appear there before any scan of the input.
        agg = seg.find("HashAggregate")
        scan = seg.find("Range (")
        assert agg != -1 and (scan == -1 or agg < scan), plan


def test_top_k_per_group_matches_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from asritha_metamorphetl_spark.operators.ranks import top_k_per_group

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"),
        (F.xxhash64("id") % 10000).alias("v"),
        F.col("id"),
    ).repartition(13)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        (r["g"], r["id"], r["rnk"])
        for r in top_k_per_group(df, ["g"], order, k=5).collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r["g"], r["id"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    assert got == want


def test_grouped_row_number_and_ntile_match_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_row_number,
        ntile_from_rank,
    )

    # group 9 has only 2 rows — exercises the n < buckets NTILE edge.
    df = spark.range(500).select(
        F.when(F.col("id") < 2, 9).otherwise(F.col("id") % 4).alias("g"),
        (F.xxhash64("id") % 1000).alias("v"),
        F.col("id"),
    )
    order = [F.col("v").asc(), F.col("id").asc()]
    ranked = grouped_row_number(
        df, ["g"], order, out_col="rn", count_col="n", num_partitions=11
    )
    got = {
        (r["g"], r["id"]): (r["rn"], ntile)
        for r in ranked.withColumn(
            "q", ntile_from_rank(F.col("rn"), F.col("n"), 4)
        ).collect()
        for ntile in [r["q"]]
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r["g"], r["id"]): (r["rn"], r["q"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn("q", F.ntile(4).over(w))
        .collect()
    }
    assert got == want


def test_grouped_row_number_rejects_unbounded_group_key(spark):
    """Passing a per-row key as the group column must fail fast with a
    clear error instead of silently collecting O(rows) offsets to the
    driver — the bounded-cardinality contract, enforced."""
    import pyspark.sql.functions as F
    import pytest

    from asritha_metamorphetl_spark.operators.ranks import grouped_row_number

    df = spark.range(5000).select(
        F.col("id").alias("user_id"), (F.xxhash64("id") % 1000).alias("v")
    )
    with pytest.raises(ValueError, match="unbounded"):
        grouped_row_number(
            df,
            ["user_id"],
            [F.col("v").asc()],
            num_partitions=8,
            max_groups=100,
        ).collect()


def test_absurd_num_partitions_rejected_before_any_job(spark):
    """A row count passed as num_partitions would turn the O(partitions)
    offset collect into a driver OOM — both prefix-sum operators must
    raise on it up front, and on non-positive counts too."""
    import pyspark.sql.functions as F
    import pytest

    from asritha_metamorphetl_spark.operators.packing import global_running_sum
    from asritha_metamorphetl_spark.operators.ranks import global_row_number

    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    for bad in (2_000_000, 0, -4):
        with pytest.raises(ValueError, match="num_partitions"):
            global_row_number(df, [F.col("id").asc()], num_partitions=bad)
        with pytest.raises(ValueError, match="num_partitions"):
            global_running_sum(
                df, [F.col("id").asc()], F.col("v"), num_partitions=bad
            )


def test_global_percent_rank_enforces_distinct_cardinality(spark):
    """The collapsed single-partition stage is bounded by value-domain
    cardinality; past max_distinct the plan must raise with the
    quantize-first guidance, never silently funnel (r5 directive #7)."""
    import pytest
    from asritha_metamorphetl_spark.operators.ranks import global_percent_rank

    df = spark.range(500).select(F.col("id").alias("v"))  # 500 distinct
    with pytest.raises(Exception, match="[Qq]uantize"):
        global_percent_rank(df, F.col("v"), max_distinct=100).collect()
    # under the bound: exact SQL percent_rank semantics, guard invisible
    from pyspark.sql import Window

    got = {
        r["v"]: r["percent_rank"]
        for r in global_percent_rank(df, F.col("v"), max_distinct=1000).collect()
    }
    want = {
        r["v"]: r["pr"]
        for r in df.select(
            "v",
            F.percent_rank().over(Window.orderBy(F.col("v").desc())).alias("pr"),
        ).collect()
    }
    assert got == want


def test_global_cumsum_matches_window(spark):
    """global_cumsum == the single-partition window spelling, at any
    partitioning, including duplicate-free and total-returning forms."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum,
        global_cumsum_with_total,
    )

    df = spark.range(0, 500).select(
        (F.col("id") * 7 % 503).alias("v"),
        (F.col("id") % 9 + 1).alias("c"),
    ).repartition(13)
    w = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r["v"], r["cum"])
        for r in df.withColumn("cum", F.sum("c").over(w)).collect()
    }
    got_df, total = global_cumsum_with_total(
        df, [F.col("v").asc()], "c", out_col="cum"
    )
    got = {(r["v"], r["cum"]) for r in got_df.collect()}
    assert got == want
    assert total == sum(r["c"] for r in df.collect())
    # plain variant agrees
    got2 = {
        (r["v"], r["cum"])
        for r in global_cumsum(
            df, [F.col("v").asc()], "c", out_col="cum"
        ).collect()
    }
    assert got2 == want


def test_global_cumsum_no_single_partition_exchange(spark):
    """The running sum must never range-sort the count table into one
    partition — the plan carries the range repartition plus per-pid
    windows only."""
    import pyspark.sql.functions as F

    from asritha_metamorphetl_spark.operators.ranks import global_cumsum

    df = spark.range(0, 200).select(
        F.col("id").alias("v"), F.lit(1).alias("c")
    )
    out = global_cumsum(df, [F.col("v").asc()], "c", out_col="cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_global_cumsum_nonintegral_sum_types(spark):
    """The offset frame's type follows F.sum(sum_col)'s result type —
    double and decimal sum columns must work (ADVICE r9: the hardcoded
    `__offset long` schema raised on non-integral sums)."""
    import decimal

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )

    w = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # double
    dbl = spark.range(0, 200).select(
        (F.col("id") * 3 % 211).alias("v"),
        (F.col("id") % 4 + 0.5).cast("double").alias("c"),
    ).repartition(7)
    want = {
        (r["v"], round(r["cum"], 6))
        for r in dbl.withColumn("cum", F.sum("c").over(w)).collect()
    }
    got_df, total = global_cumsum_with_total(
        dbl, [F.col("v").asc()], "c", out_col="cum"
    )
    got = {(r["v"], round(r["cum"], 6)) for r in got_df.collect()}
    assert got == want
    assert abs(total - sum(r["c"] for r in dbl.collect())) < 1e-6
    # decimal(38,2)
    dec = spark.range(0, 100).select(
        (F.col("id") * 3 % 101).alias("v"),
        (F.col("id") % 5 + 1).cast("decimal(20,2)").alias("c"),
    ).repartition(5)
    got_df2, total2 = global_cumsum_with_total(
        dec, [F.col("v").asc()], "c", out_col="cum"
    )
    want2 = {
        (r["v"], r["cum"])
        for r in dec.withColumn("cum", F.sum("c").over(w)).collect()
    }
    assert {(r["v"], r["cum"]) for r in got_df2.collect()} == want2
    assert isinstance(total2, decimal.Decimal)


def test_global_cumsums_multi_measure(spark):
    """The k-measure one-pass cumsum agrees with k independent
    single-measure passes AND with a plain sorted prefix sum — and the
    lit(1) measure doubles as an exact global row number."""
    import random

    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.operators.ranks import global_cumsums

    rng = random.Random(17)
    rows = [(i, rng.randrange(1, 1000)) for i in range(3000)]
    df = spark.createDataFrame(rows, ["k", "v"]).withColumn(
        "one", F.lit(1).cast("bigint")
    )
    order_by = [F.col("v").asc(), F.col("k").asc()]
    out, totals = global_cumsums(df, order_by, [("v", "cum"), ("one", "rn")])
    got = {r.k: (r.cum, r.rn) for r in out.collect()}
    assert totals["rn"] == len(rows)
    assert totals["cum"] == sum(v for _, v in rows)
    run = 0
    for pos, (k, v) in enumerate(
        sorted(rows, key=lambda r: (r[1], r[0])), start=1
    ):
        run += v
        assert got[k] == (run, pos), (k, got[k], (run, pos))


def test_global_cumsums_rejects_fractional_measures(spark):
    """The multi-measure cumsum's offset fold coerces partition totals
    with int(); a decimal/double measure would silently truncate
    (int(Decimal('1.5')) == 1), so the integral-only contract must be a
    runtime TypeError, not a docstring note (r11 ADVICE)."""
    import pytest
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.operators.ranks import global_cumsums

    df = spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], ["k", "v"]
    ).withColumn("one", F.lit(1).cast("bigint"))
    with pytest.raises(TypeError, match="integral"):
        global_cumsums(
            df, [F.col("k").asc()], [("v", "cum"), ("one", "rn")]
        )
    dec = df.withColumn("v", F.col("v").cast("decimal(10,2)"))
    with pytest.raises(TypeError, match="integral"):
        global_cumsums(dec, [F.col("k").asc()], [("v", "cum")])
