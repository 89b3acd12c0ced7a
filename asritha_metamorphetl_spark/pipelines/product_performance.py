"""Product-performance mart.

Re-expresses ETL_Airflow/dags/tasks/m_product_performance_task.py:13-118 on
the TPC-H-ish tables (FIXTURES.md §B):

    products ← part      (SELLING_PRICE ← p_retailprice; COST_PRICE,
                          STOCK_QUANTITY, REORDER_LEVEL synthesized
                          deterministically from part columns)
    sales    ← lineitem  (QUANTITY ← l_quantity; no status filter — the
                          reference's product mart reads raw sales)

Reference semantics preserved:
- products LEFT JOIN sales keeps zero-sale products (task:34-39); their
  sum-aggregates stay NULL (the reference does not fillna here),
- AVG_SALE_PRICE is avg(SELLING_PRICE) over join-duplicated rows, not
  distinct products (task:60-65 — documented quirk, SURVEY §7.3),
- STOCK_LEVEL_STATUS: 'Below Reorder Level' when stock ≤ reorder else
  'Sufficient Stock' (task:86-88).

Scale notes: part→lineitem is a fact/dimension join — dimension side
broadcast; single hash aggregate keyed by product (map-side partials); the
re-join of aggregates back to products is dimension-sized on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions.numeric import exact_sum, money
from asritha_metamorphetl_spark.operators.nodes import agg_node, jnr_node, sq_node
from asritha_metamorphetl_spark.sources.files import Catalog


def _products(spark: SparkSession, cat: Catalog) -> DataFrame:
    """Part → products entity with deterministic synthesized columns."""
    return sq_node(
        cat.load(spark, "part"), "SQ_products", None
    ).select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("product_name"),
        F.col("p_type").alias("category"),
        F.col("p_retailprice").alias("selling_price"),
        F.round(F.col("p_retailprice") * 0.8, 2).alias("cost_price"),
        (F.col("p_size") * F.lit(10)).alias("stock_quantity"),
        ((F.col("p_partkey") % 40) + F.lit(10)).alias("reorder_level"),
    )


def product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(sf_dir)
    products = _products(spark, cat)
    sales = sq_node(
        cat.load(spark, "lineitem"), "SQ_sales", ["l_partkey", "l_quantity"]
    ).select(
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").alias("quantity"),
    )

    joined = jnr_node(
        products, sales, "JNR_sales_products", on="product_id", how="left"
    ).withColumns(
        {
            "sales_amount": F.col("quantity") * F.col("selling_price"),
            "profit_amount": F.col("quantity")
            * (F.col("selling_price") - F.col("cost_price")),
        }
    )

    agg = agg_node(
        joined,
        "AGG_product_performance",
        ["product_id", "product_name", "category"],
        [
            F.sum("quantity").alias("total_quantity_sold"),
            exact_sum(F.col("sales_amount"), "total_sales_amount"),
            # avg over join-duplicated rows (reference quirk); exact decimal
            # sum / count keeps it engine-deterministic.
            (
                F.sum(money(F.col("selling_price"))).cast("double")
                / F.count("selling_price")
            ).alias("avg_sale_price"),
            exact_sum(F.col("profit_amount"), "profit"),
        ],
    )

    # Re-join aggregates to the product dimension (reference task:69-85).
    out = jnr_node(
        agg.alias("AGG"),
        products.select("product_id", "stock_quantity", "reorder_level").alias("PROD"),
        "JNR_product_agg_performance",
        on="product_id",
        how="inner",
    )

    return out.select(
        "product_id",
        "product_name",
        "total_sales_amount",
        "total_quantity_sold",
        "avg_sale_price",
        "stock_quantity",
        "reorder_level",
        F.when(
            F.col("stock_quantity") <= F.col("reorder_level"), "Below Reorder Level"
        )
        .otherwise("Sufficient Stock")
        .alias("stock_level_status"),
        "profit",
        "category",
    )


ORACLE_SQL = """
WITH products AS (
    SELECT
        p_partkey AS product_id,
        p_name AS product_name,
        p_type AS category,
        p_retailprice AS selling_price,
        ROUND(p_retailprice * 0.8, 2) AS cost_price,
        p_size * 10 AS stock_quantity,
        (p_partkey % 40) + 10 AS reorder_level
    FROM part
),
joined AS (
    SELECT
        pr.product_id, pr.product_name, pr.category, pr.selling_price,
        pr.cost_price,
        l.l_quantity AS quantity,
        l.l_quantity * pr.selling_price AS sales_amount,
        l.l_quantity * (pr.selling_price - pr.cost_price) AS profit_amount
    FROM products pr
    LEFT JOIN lineitem l ON l.l_partkey = pr.product_id
),
agg AS (
    SELECT
        product_id, product_name, category,
        SUM(quantity) AS total_quantity_sold,
        CAST(SUM(CAST(sales_amount AS DECIMAL(18,2))) AS DOUBLE) AS total_sales_amount,
        CAST(SUM(CAST(selling_price AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(selling_price) AS avg_sale_price,
        CAST(SUM(CAST(profit_amount AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM joined
    GROUP BY product_id, product_name, category
)
SELECT
    a.product_id,
    a.product_name,
    a.total_sales_amount,
    a.total_quantity_sold,
    a.avg_sale_price,
    p.stock_quantity,
    p.reorder_level,
    CASE WHEN p.stock_quantity <= p.reorder_level
         THEN 'Below Reorder Level' ELSE 'Sufficient Stock'
    END AS stock_level_status,
    a.profit,
    a.category
FROM agg a
JOIN products p ON a.product_id = p.product_id
"""
