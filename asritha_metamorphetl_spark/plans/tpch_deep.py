"""Deeper TPC-H-shape queries: correlated subqueries, scalar-threshold
filters, anti/semi exclusion, grouping sets, and partitioned ntile.

These extend ``tpch_queries.py`` with the decorrelation-heavy shapes
(Q2/Q7/Q8/Q9/Q13/Q15/Q16/Q17/Q21/Q22 analogues, adapted to the driver's
star schema — it has no ``partsupp``, so supplier-part relationships come
from distinct ``lineitem`` pairs).

Scale notes (100 TB design):
- Every correlated subquery is decorrelated into an aggregate + join —
  Spark cannot execute correlated per-row lookups distributedly, and the
  aggregate side is always the smaller frame (per-part / per-order
  grain), so the join is a standard shuffle or broadcast.
- Scalar thresholds (global avg / global max) are computed on an ALREADY
  AGGREGATED frame (supplier- or customer-grain) and brought in with a
  broadcast cross-join of a 1-row frame — no single-partition pass over
  raw facts.
- Threshold comparisons are restated in exact integer/decimal form
  (``qty * 5 * cnt < sum`` instead of ``qty < 0.2 * sum/cnt``) so both
  engines make identical keep/drop decisions — no float-boundary flips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

_REV_DEC = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"
)


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "nation_pair_trade",
    oracle=f"""
SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
    {_REV_DEC} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
""",
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair volume. The nation filter
    is applied to the two (tiny, broadcast) dimension chains BEFORE the
    facts join, so the fact shuffle only carries the two nations' rows;
    the disjunctive pair predicate is the join residual."""
    cat = Catalog(sf_dir)
    nations = {"NATION_1", "NATION_2"}
    n1 = (
        cat.load(spark, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        cat.load(spark, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    supp = cat.load(spark, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    cust = cat.load(spark, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    li = (
        cat.load(spark, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    )
    orders = cat.load(spark, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
    )


@register(
    "market_share",
    oracle="""
SELECT
    CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
    ROUND(
        CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
            THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2))) ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE),
        6) AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN region r ON n2.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
GROUP BY o_year
""",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    revenue per year — conditional-sum ratio, all dims broadcast."""
    cat = Catalog(sf_dir)
    region = cat.load(spark, "region").filter(F.col("r_name") == "AMERICA")
    cust_nation = cat.load(spark, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = cat.load(spark, "customer").join(
        F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    supp_nation = cat.load(spark, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp = cat.load(spark, "supplier").join(
        F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    part = (
        cat.load(spark, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    orders = cat.load(spark, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = cat.load(spark, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = _rev_col()
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "nation_year_profit",
    oracle="""
SELECT
    n.n_name AS nation,
    CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
    CAST(SUM(
        CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
        - CAST(p.p_retailprice AS DECIMAL(12,2))
            * CAST(0.1 AS DECIMAL(2,1))
            * CAST(l.l_quantity AS DECIMAL(12,2))
    ) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY nation, o_year
""",
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for one part
    family. The schema has no partsupp, so supply cost is modeled as
    10% of part retail price per unit — exact decimal arithmetic so the
    total is partition-order-independent."""
    cat = Catalog(sf_dir)
    part = (
        cat.load(spark, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    nation = cat.load(spark, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    supp = cat.load(spark, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "nation")
    orders = cat.load(spark, "orders").select("o_orderkey", "o_orderdate")
    li = cat.load(spark, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = _rev_col() - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit("0.1").cast("decimal(2,1)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "customer_order_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count histogram including zero-order
    customers — the LEFT join keeps them, COUNT(col) ignores the null
    probe side. Two-level aggregation; the second level is tiny."""
    cat = Catalog(sf_dir)
    cust = cat.load(spark, "customer").select("c_custkey")
    orders = (
        cat.load(spark, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "top_revenue_supplier",
    oracle=f"""
WITH rev AS (
    SELECT l_suppkey, {_REV_DEC} AS total_revenue
    FROM lineitem l
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) hitting the quarter's max revenue.
    The max is taken over the ALREADY AGGREGATED supplier-grain frame
    (|suppliers| rows) and joined back as a broadcast 1-row frame —
    the raw fact table never sees a single-partition pass."""
    cat = Catalog(sf_dir)
    rev = (
        cat.load(spark, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_col()).alias("rev_dec"))
    )
    mx = rev.agg(F.max("rev_dec").alias("mx"))
    supp = cat.load(spark, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("rev_dec") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


@register(
    "supplier_part_concentration",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (5, 15, 25, 35, 45)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def supplier_part_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part bucket with a
    NOT IN exclusion — expressed as a broadcast LEFT ANTI join (the
    excluded set is tiny), then countDistinct. Supplier-part pairs come
    from lineitem since the schema has no partsupp."""
    cat = Catalog(sf_dir)
    part = (
        cat.load(spark, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(5, 15, 25, 35, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        cat.load(spark, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = cat.load(spark, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "small_quantity_revenue",
    oracle="""
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_sum,
           COUNT(*) AS qty_cnt
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) / 7.0 AS DOUBLE)
           AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN per_part pp ON pp.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND CAST(l.l_quantity AS DECIMAL(12,2)) * 5 * pp.qty_cnt < pp.qty_sum
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20% of the part's average quantity.
    The correlated AVG subquery is decorrelated into a per-part
    aggregate joined back to the fact; the threshold test is restated
    exactly (qty*5*cnt < sum, all decimal/integer) so Spark and the
    oracle keep identical rows — no float-average boundary flips."""
    cat = Catalog(sf_dir)
    li = cat.load(spark, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_cnt"),
    )
    brand_parts = (
        cat.load(spark, "part")
        .filter(F.col("p_brand") == "Brand#5")
        .select("p_partkey")
    )
    return (
        li.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pp_partkey"))
        .filter(
            F.col("l_quantity").cast("decimal(12,2)") * 5 * F.col("qty_cnt")
            < F.col("qty_sum")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "lonely_late_suppliers",
    oracle="""
WITH per_order AS (
    SELECT l.l_orderkey,
           COUNT(DISTINCT l.l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate
                                    + INTERVAL 60 DAY
                               THEN l.l_suppkey END) AS n_late,
           MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN l.l_suppkey END) AS late_supp
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_orderkey
)
SELECT s.s_name, COUNT(*) AS numwait
FROM per_order po
JOIN supplier s ON s.s_suppkey = po.late_supp
WHERE po.n_supp > 1 AND po.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
)
def lonely_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier finished order. The reference Q21 spells this as
    EXISTS + NOT EXISTS self-joins on lineitem; one grouped pass per
    order (distinct suppliers, distinct late suppliers, the unique late
    supplier when n_late=1) gets the same answer with a single shuffle
    instead of three fact-fact joins."""
    cat = Catalog(sf_dir)
    orders = (
        cat.load(spark, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = cat.load(spark, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = cat.load(spark, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(supp, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@register(
    "idle_rich_customers",
    oracle="""
WITH stats AS (
    SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_sum,
           COUNT(*) AS bal_cnt
    FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer c, stats
WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * stats.bal_cnt > stats.bal_sum
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
""",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, counted per segment. The global average arrives as a
    broadcast 1-row (sum, cnt) frame and the comparison is exact
    (bal*cnt > sum); the NOT EXISTS is a LEFT ANTI join on the
    filtered orders projection."""
    cat = Catalog(sf_dir)
    cust = cat.load(spark, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    stats = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).alias("bal_sum"),
            F.count(F.lit(1)).alias("bal_cnt"),
        )
    )
    urgent = (
        cat.load(spark, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(stats))
        .filter(
            F.col("c_acctbal").cast("decimal(12,2)") * F.col("bal_cnt")
            > F.col("bal_sum")
        )
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
SELECT p_partkey, p_name, s_suppkey, s_acctbal
FROM (
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_acctbal,
           ROW_NUMBER() OVER (
               PARTITION BY p.p_partkey
               ORDER BY s.s_acctbal ASC, s.s_suppkey ASC) AS rn
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE p.p_size = 15
) ranked
WHERE rn = 1
""",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the supplier with the lowest account
    balance among suppliers that ever shipped it (no partsupp in this
    schema — distinct lineitem pairs stand in). The correlated MIN is a
    per-part window, partitioned by partkey (never global), with
    s_suppkey as the deterministic tiebreak."""
    cat = Catalog(sf_dir)
    pairs = (
        cat.load(spark, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        cat.load(spark, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    supp = cat.load(spark, "supplier").select("s_suppkey", "s_acctbal")
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return (
        pairs.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_acctbal")
    )


@register(
    "revenue_rollup",
    oracle=f"""
SELECT
    CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END AS nation,
    CASE WHEN GROUPING(EXTRACT(YEAR FROM o.o_orderdate)) = 1 THEN 'ALL'
         ELSE CAST(CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS VARCHAR)
    END AS o_year,
    {_REV_DEC} AS revenue,
    COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP(n.n_name, EXTRACT(YEAR FROM o.o_orderdate))
""",
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: (nation, year), (nation), () — subtotal and
    grand-total rows labeled 'ALL' via GROUPING(). Spark computes all
    three grains in one Expand+HashAggregate pass (partial map-side
    aggregation applies at every grain)."""
    cat = Catalog(sf_dir)
    nation = cat.load(spark, "nation").select("n_nationkey", "n_name")
    cust = cat.load(spark, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "n_name")
    orders = cat.load(spark, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = cat.load(spark, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("yr", F.year("o_orderdate").cast("long"))
    )
    # Pre-aggregate to the finest grain FIRST: the rollup's Expand then
    # triples |nations × years| partial rows, not the raw joined fact
    # rows (3× 600k → 3× ~175 at sf0.1). Sums of sums and counts of
    # counts re-aggregate exactly; results are identical to rolling up
    # the raw frame.
    grain = joined.groupBy("n_name", "yr").agg(
        F.sum(_rev_col()).alias("rev_part"),
        F.count(F.lit(1)).alias("cnt_part"),
    )
    return (
        grain.rollup("n_name", "yr")
        .agg(
            F.sum("rev_part").cast("double").alias("revenue"),
            F.sum("cnt_part").alias("n_lines"),
            F.grouping("n_name").alias("g_nation"),
            F.grouping("yr").alias("g_year"),
        )
        .select(
            F.when(F.col("g_nation") == 1, F.lit("ALL"))
            .otherwise(F.col("n_name"))
            .alias("nation"),
            F.when(F.col("g_year") == 1, F.lit("ALL"))
            .otherwise(F.col("yr").cast("string"))
            .alias("o_year"),
            "revenue",
            "n_lines",
        )
    )


@register(
    "segment_balance_quartiles",
    oracle="""
SELECT c_mktsegment, quartile, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM (
    SELECT c_mktsegment, c_acctbal,
           NTILE(4) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
    FROM customer
) t
GROUP BY c_mktsegment, quartile
""",
)
def segment_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) within each market segment, computed WITHOUT a
    segment-partitioned window: five segments would mean five tasks
    holding every customer. grouped_row_number (operators/ranks.py)
    range-spreads each segment across partitions with an O(partitions +
    groups) offset collect, and NTILE is then a closed-form function of
    (per-group rank, group count) — identical tiling to the window,
    c_custkey pinning tie order."""
    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_row_number,
        ntile_from_rank,
    )

    cust = Catalog(sf_dir).load(spark, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    ranked = grouped_row_number(
        cust,
        ["c_mktsegment"],
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        out_col="rn",
        count_col="n_seg",
    )
    return (
        ranked.withColumn(
            "quartile", ntile_from_rank(F.col("rn"), F.col("n_seg"), 4)
        )
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )
