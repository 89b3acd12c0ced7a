"""TPC-H-style composite queries — multi-join, multi-filter plans that
exercise the operator library at realistic query shapes (the reference's
marts are the ETL shapes; these are the analyst shapes a warehouse engine
must also serve)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

_REV_DEC = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"
)


def _revenue() -> F.Column:
    return (
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "shipping_priority",
    oracle=f"""
SELECT
    l.l_orderkey,
    {_REV_DEC} AS revenue,
    strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
    o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter on the customer dimension, date
    filters pushed to both fact scans, top-10 via TakeOrdered."""
    cat = Catalog(sf_dir)
    cust = (
        cat.load(spark, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        cat.load(spark, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        cat.load(spark, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(_revenue())
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@register(
    "local_supplier_volume",
    oracle=f"""
SELECT
    n.n_name AS nation,
    {_REV_DEC} AS revenue,
    COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND o.o_orderstatus <> 'F'
GROUP BY n.n_name
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five joins, one on a composite condition (customer
    and supplier in the SAME nation), region filter pruning the dimension
    chain before it touches facts."""
    cat = Catalog(sf_dir)
    region = cat.load(spark, "region").filter(F.col("r_name") == "ASIA")
    nation = cat.load(spark, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supplier = cat.load(spark, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = (
        cat.load(spark, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .select("o_orderkey", "o_custkey")
    )
    customer = cat.load(spark, "customer").select("c_custkey", "c_nationkey")
    li = cat.load(spark, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(customer),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_revenue(), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "returned_item_customers",
    oracle=f"""
SELECT
    c.c_custkey,
    c.c_name,
    {_REV_DEC} AS revenue,
    any_value(n.n_name) AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-lineitem revenue per customer, top 20."""
    cat = Catalog(sf_dir)
    li = (
        cat.load(spark, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = cat.load(spark, "orders").select("o_orderkey", "o_custkey")
    cust = cat.load(spark, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = cat.load(spark, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name")
        .agg(_revenue(), F.any_value(F.col("n_name")).alias("nation"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
