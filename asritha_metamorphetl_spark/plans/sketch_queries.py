"""Sketch-accuracy audits: approximate aggregates checked against exact.

At 100 TB, exact ``COUNT(DISTINCT)`` and exact percentiles are often the
single most expensive aggregates in a workload (a full shuffle of every
distinct value / a full sort). Spark's HyperLogLog++
(``approx_count_distinct``) and Greenwald-Khanna (``percentile_approx``)
sketches compute them in one map-side-combinable pass with bounded
memory — but an engine that ships sketches must also ship the evidence
that their error is inside the advertised bound, continuously, the same
way ``minhash_recall_eval`` / ``knn_lsh_recall_eval`` keep the ANN
recall regression-visible.

Oracle pattern: the query computes BOTH the sketch and the exact value,
emits the exact value plus a boolean ``within_bound``; the DuckDB oracle
recomputes the exact value and expects the boolean to be literally TRUE.
If a Spark upgrade (or a knob change here) degrades the sketch past the
bound, the hash compare fails — the driver sees sketch drift as a
correctness failure, not a silent quality loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

# HLL++ at rsd=0.05 has a standard error of 5%; 3 sigma ≈ 15%. The
# fixture sits far inside this, so the audit bound is conservative
# without being vacuous.
_HLL_RSD = 0.05
_HLL_BOUND = 3 * _HLL_RSD


@register(
    "approx_distinct_audit",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_cust,
       COUNT(*) AS n_orders,
       TRUE AS within_bound
FROM orders
GROUP BY o_orderpriority
""",
)
def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count audit per order priority.

    One hash aggregate computes the HLL sketch AND the exact distinct
    count side by side; ``within_bound`` asserts relative error <= 3×rsd.
    The sketch is the 100 TB path (fixed ~1.5 KB of state per group, no
    distinct-expand shuffle); the exact count is the audit — affordable
    at sf0.01/sf0.1, and exactly what you'd run on a 0.1% sample in
    production to keep the sketch honest."""
    orders = Catalog(sf_dir).load(spark, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=_HLL_RSD).alias("approx_cust"),
        F.countDistinct("o_custkey").alias("exact_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    rel_err = F.abs(F.col("approx_cust") - F.col("exact_cust")) / F.col(
        "exact_cust"
    )
    return agg.select(
        "o_orderpriority",
        "exact_cust",
        "n_orders",
        (rel_err <= F.lit(_HLL_BOUND)).alias("within_bound"),
    )


# percentile_approx(accuracy=A) guarantees rank error <= n/A; the audit
# re-ranks the sketch's answer against the raw data and allows the
# guaranteed slack plus a small tie margin.
_GK_ACCURACY = 1000
_RANK_SLACK = 1.0 / _GK_ACCURACY + 0.01


@register(
    "quantile_sketch_audit",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
FROM orders
GROUP BY o_orderpriority
""",
)
def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile-sketch audit per order priority.

    Phase 1 computes ``percentile_approx`` for p25/p50/p75 in one
    map-side-combinable aggregate (the 100 TB path — no global sort).
    Phase 2 broadcasts the tiny per-group sketch answers back onto the
    raw rows and measures the ACHIEVED rank of each answer
    (``avg(price <= answer)``); each ``pXX_ok`` asserts the achieved
    rank is within the guaranteed n/accuracy slack of the target. The
    audit costs one extra scan — run it on a sample in production."""
    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    sketch = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx(
            "o_totalprice", [0.25, 0.5, 0.75], _GK_ACCURACY
        ).alias("qs")
    )
    ranked = orders.join(F.broadcast(sketch), "o_orderpriority")
    achieved = ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        *[
            F.avg(
                (F.col("o_totalprice") <= F.col("qs")[i]).cast("double")
            ).alias(f"rank_{p}")
            for i, p in enumerate((25, 50, 75))
        ],
    )
    checks = [
        (
            F.abs(F.col(f"rank_{p}") - F.lit(p / 100.0)) <= F.lit(_RANK_SLACK)
        ).alias(f"p{p}_ok")
        for p in (25, 50, 75)
    ]
    return achieved.select("o_orderpriority", "n_orders", *checks)
