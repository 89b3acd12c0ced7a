"""Commerce analytics, second wave: exact percentile bands, growth
series (YoY / MoM / WoW / YTD), basket-size and discount-band
distributions, trade balances, per-group outliers, rank-tie semantics,
and backlog timelines over the TPC-H-shaped tables.

Shared discipline (same as plans/stats_queries.py): every SUM is exact
integer arithmetic (money as cents bigints, decimal(38,0) Spark-side /
HUGEINT DuckDB-side where products can exceed int64), floats appear
only in final bounded expressions computed with the identical operation
tree in both engines, then rounded. Global order statistics route
through the two-pass machinery (``operators/ranks.global_cumsum`` /
``global_row_number``) — never a whole-frame window; windows that
remain are per-group or over calendar-bounded series and say so.

Reference scope: the reference's analytics stop at plain mart
aggregates (ETL_Airflow/dags/tasks/m_*.py); this is the analyst
surface a warehouse team layers on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: Percentile bands for the order-value distribution.
PCTL_BANDS = (25, 50, 75, 90, 99)

#: Quantization grid for entropy / variance terms (1e-6 → exact sums).
Q6 = 1000000

_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
_NET_CENTS = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _net_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")


def _o_cents() -> F.Column:
    return F.round(F.col("o_totalprice") * 100).cast("bigint")


# ---------------------------------------------------------------------------
# Exact percentile bands via two-pass cumulative counting
# ---------------------------------------------------------------------------

_BANDS_SQL = ", ".join(str(b) for b in PCTL_BANDS)


@register(
    "order_value_percentile_bands",
    oracle=f"""
WITH counts AS (
    SELECT {_CENTS} AS cents, COUNT(*) AS c FROM orders GROUP BY 1
),
cum AS (
    SELECT cents, SUM(c) OVER (ORDER BY cents ASC) AS cum FROM counts
),
tot AS (SELECT COUNT(*) AS n FROM orders),
qs AS (SELECT unnest([{_BANDS_SQL}]) AS q_pct)
SELECT q_pct, (SELECT n FROM tot) AS n_orders,
       MIN(cents) AS value_cents
FROM qs JOIN cum ON cum.cum >= (q_pct * (SELECT n FROM tot) + 99) // 100
GROUP BY q_pct
""",
)
def order_value_percentile_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact P25/P50/P75/P90/P99 of order value, found by cumulative
    counting with the two-pass ``global_cumsum`` — order totalprice in
    cents is near-unique, so the per-value count table is ~O(rows) and
    the oracle's window spelling would single-partition it at corpus
    scale; the two-pass spelling stays partition-parallel (its only
    collect is O(partitions)). Each percentile is the least value
    whose cumulative count reaches ⌈q·n/100⌉ — the definition an SLA
    dashboard wants, with no interpolation to disagree about."""
    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    counts = (
        orders.select(_o_cents().alias("cents"))
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum, n = global_cumsum_with_total(
        counts, [F.col("cents").asc()], "c", out_col="cum"
    )
    qs = spark.createDataFrame([(q,) for q in PCTL_BANDS], "q_pct int")
    thr = F.floor((F.col("q_pct") * int(n) + 99) / 100)
    return (
        qs.join(cum, cum["cum"] >= thr)
        .groupBy("q_pct")
        .agg(
            F.lit(int(n)).cast("bigint").alias("n_orders"),
            F.min("cents").alias("value_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Growth series
# ---------------------------------------------------------------------------


@register(
    "yoy_revenue_growth_by_region",
    oracle=f"""
WITH rev AS (
    SELECT r.r_name AS region, EXTRACT(year FROM o.o_orderdate) AS yr,
           CAST(SUM({_CENTS.replace('o_totalprice', 'o.o_totalprice')})
                AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
)
SELECT cur.region, CAST(cur.yr AS BIGINT) AS yr, cur.revenue_cents,
       prev.revenue_cents AS prev_cents,
       ROUND((CAST(cur.revenue_cents AS DOUBLE)
              - CAST(prev.revenue_cents AS DOUBLE))
             / CAST(prev.revenue_cents AS DOUBLE), 6) AS yoy_growth
FROM rev cur
LEFT JOIN rev prev
  ON prev.region = cur.region AND prev.yr = cur.yr - 1
""",
)
def yoy_revenue_growth_by_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Year-over-year revenue growth per region: the board-deck query.
    Nation/region broadcast (bounded); the customer join is AQE-sized
    (customer grows with the corpus); the fact scan
    shuffles once into the (region, year) aggregate — O(regions×years)
    rows — and the YoY pairing is a self-join on that bounded frame,
    not a window over facts. First year emits null growth (nothing to
    compare), exactly like the SQL LEFT JOIN."""
    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders")
    customer = cat.load(spark, "customer")
    nation = cat.load(spark, "nation")
    region = cat.load(spark, "region")
    rev = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(_o_cents()).cast("bigint").alias("revenue_cents")
        )
    )
    prev = rev.select(
        F.col("region").alias("p_region"),
        (F.col("yr") + 1).alias("p_yr"),
        F.col("revenue_cents").alias("prev_cents"),
    )
    return (
        rev.join(
            prev,
            (rev["region"] == prev["p_region"]) & (rev["yr"] == prev["p_yr"]),
            "left",
        )
        .select(
            "region",
            "yr",
            "revenue_cents",
            "prev_cents",
            F.round(
                (
                    F.col("revenue_cents").cast("double")
                    - F.col("prev_cents").cast("double")
                )
                / F.col("prev_cents").cast("double"),
                6,
            ).alias("yoy_growth"),
        )
    )


@register(
    "running_ytd_revenue_by_nation",
    oracle=f"""
WITH monthly AS (
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS mon,
           CAST(SUM({_CENTS.replace('o_totalprice', 'o.o_totalprice')})
                AS BIGINT) AS month_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2, 3
)
SELECT nation, yr, mon, month_cents,
       CAST(SUM(month_cents) OVER (
           PARTITION BY nation, yr ORDER BY mon ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS ytd_cents
FROM monthly
""",
)
def running_ytd_revenue_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Year-to-date running revenue per nation: monthly aggregate first
    (one fact shuffle to O(nations×months) rows), then a cumulative
    window PARTITIONED BY (nation, year) — each partition is ≤12 rows,
    the textbook safe window (hash exchange on the partition keys,
    never a global sort)."""
    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders")
    customer = cat.load(spark, "customer")
    nation = cat.load(spark, "nation")
    monthly = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mon"),
        )
        .agg(F.sum(_o_cents()).cast("bigint").alias("month_cents"))
    )
    w = (
        Window.partitionBy("nation", "yr")
        .orderBy(F.col("mon").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.withColumn(
        "ytd_cents", F.sum("month_cents").over(w).cast("bigint")
    )


@register(
    "order_priority_escalation",
    oracle="""
WITH monthly AS (
    SELECT o_orderpriority AS priority,
           CAST(EXTRACT(year FROM o_orderdate) * 100
                + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2
)
SELECT priority, ym, n,
       LAG(n) OVER (PARTITION BY priority ORDER BY ym ASC) AS prev_n,
       ROUND((CAST(n AS DOUBLE)
              - CAST(LAG(n) OVER (PARTITION BY priority ORDER BY ym ASC)
                     AS DOUBLE))
             / CAST(LAG(n) OVER (PARTITION BY priority ORDER BY ym ASC)
                    AS DOUBLE), 6) AS mom_change
FROM monthly
""",
)
def order_priority_escalation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Month-over-month volume change per order priority — the mix-
    shift monitor (a rising URGENT share is an ops problem before it
    is a revenue one). LAG windows partition by priority over the
    calendar-bounded monthly series (≤ a few hundred rows per
    priority); the fact table only ever feeds the monthly aggregate."""
    orders = Catalog(sf_dir).load(spark, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("ym"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("priority").orderBy(F.col("ym").asc())
    prev = F.lag("n").over(w)
    return monthly.select(
        "priority",
        "ym",
        "n",
        prev.alias("prev_n"),
        F.round(
            (F.col("n").cast("double") - prev.cast("double"))
            / prev.cast("double"),
            6,
        ).alias("mom_change"),
    )


@register(
    "week_over_week_volume_change",
    oracle="""
WITH weekly AS (
    SELECT CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7
               AS BIGINT) AS wk,
           COUNT(*) AS n
    FROM orders GROUP BY 1
)
SELECT wk, n,
       LAG(n) OVER (ORDER BY wk ASC) AS prev_n,
       ROUND((CAST(n AS DOUBLE)
              - CAST(LAG(n) OVER (ORDER BY wk ASC) AS DOUBLE))
             / CAST(LAG(n) OVER (ORDER BY wk ASC) AS DOUBLE), 6)
           AS wow_change
FROM weekly
""",
)
def week_over_week_volume_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Week-over-week order volume deltas. The epoch-week key
    (epoch_days // 7) is engine-portable (weekday conventions differ,
    integer division never does). The only global window runs over the
    weekly aggregate — CALENDAR-BOUNDED (52 rows/year however large
    the corpus), the same defense as ``autocorrelation_daily_orders``;
    facts feed one map-side-combining count."""
    orders = Catalog(sf_dir).load(spark, "orders")
    weekly = orders.select(
        F.floor(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            / 7
        )
        .cast("bigint")
        .alias("wk")
    ).groupBy("wk").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("wk").asc())
    prev = F.lag("n").over(w)
    return weekly.select(
        "wk",
        "n",
        prev.alias("prev_n"),
        F.round(
            (F.col("n").cast("double") - prev.cast("double"))
            / prev.cast("double"),
            6,
        ).alias("wow_change"),
    )


# ---------------------------------------------------------------------------
# Distribution shapes
# ---------------------------------------------------------------------------


@register(
    "order_lines_histogram",
    oracle="""
WITH per_order AS (
    SELECT l_orderkey, COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines, COUNT(*) AS n_orders
FROM per_order GROUP BY n_lines
""",
)
def order_lines_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: lines per order, then orders per
    basket size — two map-side-combining aggregates, the second over
    the already-small per-order frame; output is O(max basket) rows.
    The capacity-planning histogram behind every batch-size choice."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    return per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "discount_band_lift",
    oracle=f"""
WITH enc AS (
    SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS band,
           CAST(l_quantity AS BIGINT) AS qty,
           {_NET_CENTS} AS net
    FROM lineitem
),
per_band AS (
    SELECT band, COUNT(*) AS n_lines,
           CAST(SUM(qty) AS BIGINT) AS total_qty,
           CAST(SUM(net) AS BIGINT) AS net_cents
    FROM enc GROUP BY band
),
tot AS (
    SELECT CAST(SUM(n_lines) AS BIGINT) AS n_all,
           CAST(SUM(net_cents) AS BIGINT) AS net_all
    FROM per_band
)
SELECT band, n_lines, total_qty, net_cents,
       ROUND(CAST(net_cents AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
           AS avg_net_cents,
       ROUND((CAST(net_cents AS DOUBLE) / CAST(n_lines AS DOUBLE))
             / (CAST(net_all AS DOUBLE) / CAST(n_all AS DOUBLE)), 6)
           AS lift
FROM per_band CROSS JOIN tot
""",
)
def discount_band_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average net line value per discount band relative to the
    overall average — does discounting correlate with bigger tickets?
    One scan into an O(11-band) aggregate; the grand total re-derives
    from the band frame (no second scan) and joins back as a 1-row
    cross join. All sums exact cents."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    enc = li.select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("band"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        _net_cents().alias("net"),
    )
    per_band = enc.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.sum("net").cast("bigint").alias("net_cents"),
    )
    tot = per_band.agg(
        F.sum("n_lines").cast("bigint").alias("n_all"),
        F.sum("net_cents").cast("bigint").alias("net_all"),
    )
    avg = F.col("net_cents").cast("double") / F.col("n_lines").cast("double")
    avg_all = F.col("net_all").cast("double") / F.col("n_all").cast("double")
    return per_band.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_lines",
        "total_qty",
        "net_cents",
        F.round(avg, 6).alias("avg_net_cents"),
        F.round(avg / avg_all, 6).alias("lift"),
    )


@register(
    "returns_rate_by_brand",
    oracle=f"""
SELECT p.p_brand AS brand, COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned,
       ROUND(CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS return_rate,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                THEN {_NET_CENTS.replace('l_', 'l.l_')} ELSE 0 END)
            AS BIGINT) AS returned_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
""",
)
def returns_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate and returned revenue per brand — the supplier-
    quality scorecard. One fact⋈part equi-join (the part side is the
    smaller dimension; AQE picks broadcast vs shuffle on runtime
    sizes) into an O(brands) aggregate with exact conditional sums."""
    cat = Catalog(sf_dir)
    li = cat.load(spark, "lineitem")
    part = cat.load(spark, "part")
    joined = li.join(
        part.select("p_partkey", "p_brand"),
        li["l_partkey"] == part["p_partkey"],
    )
    is_r = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(is_r).cast("bigint").alias("n_returned"),
        F.round(
            F.sum(is_r).cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("return_rate"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", _net_cents()).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("returned_cents"),
    )


@register(
    "price_precision_profile",
    oracle=f"""
WITH enc AS (SELECT {_CENTS} % 100 AS frac FROM orders),
tot AS (SELECT COUNT(*) AS n FROM enc)
SELECT frac, COUNT(*) AS n_orders,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST((SELECT n FROM tot) AS DOUBLE), 6) AS share
FROM enc GROUP BY frac
""",
)
def price_precision_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of the cents fraction (price mod 1 dollar) — the
    fabricated-data detector: human-set prices pile up on .00/.99,
    synthetic ones are uniform, and a generator bug shows as missing
    residues. One scan, 100-row output, exact counts."""
    orders = Catalog(sf_dir).load(spark, "orders")
    enc = orders.select((_o_cents() % 100).alias("frac"))
    per = enc.groupBy("frac").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = per.agg(F.sum("n_orders").cast("bigint").alias("n"))
    return per.crossJoin(F.broadcast(tot)).select(
        "frac",
        "n_orders",
        F.round(
            F.col("n_orders").cast("double") / F.col("n").cast("double"), 6
        ).alias("share"),
    )


@register(
    "customer_tenure_histogram",
    oracle="""
WITH per_cust AS (
    SELECT o_custkey, COUNT(*) AS n_orders,
           (CAST(MAX(o_orderdate) AS DATE)
            - CAST(MIN(o_orderdate) AS DATE)) AS span_days
    FROM orders GROUP BY o_custkey
)
SELECT CAST(span_days // 180 AS BIGINT) AS bucket_halfyears,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(n_orders) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS mean_orders
FROM per_cust GROUP BY 1
""",
)
def customer_tenure_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer tenure (first-to-last order span) in half-year buckets
    with mean order count per bucket — the engagement-lifetime curve a
    retention model trains against. One shuffle to per-customer
    min/max/count, then an O(buckets) rollup."""
    orders = Catalog(sf_dir).load(spark, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.datediff(
            F.to_date(F.max("o_orderdate")), F.to_date(F.min("o_orderdate"))
        ).alias("span_days"),
    )
    return (
        per_cust.withColumn(
            "bucket_halfyears",
            F.floor(F.col("span_days") / 180).cast("bigint"),
        )
        .groupBy("bucket_halfyears")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum("n_orders").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-side balances and per-group screening
# ---------------------------------------------------------------------------


@register(
    "nation_trade_balance",
    oracle=f"""
WITH cust_side AS (
    SELECT c.c_nationkey AS nk,
           CAST(SUM({_CENTS.replace('o_totalprice', 'o.o_totalprice')})
                AS BIGINT) AS cust_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
),
supp_side AS (
    SELECT s.s_nationkey AS nk,
           CAST(SUM({_NET_CENTS.replace('l_', 'l.l_')}) AS BIGINT)
               AS supp_cents
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1
)
SELECT n.n_name AS nation,
       COALESCE(cust_cents, 0) AS cust_cents,
       COALESCE(supp_cents, 0) AS supp_cents,
       COALESCE(cust_cents, 0) - COALESCE(supp_cents, 0)
           AS balance_cents
FROM nation n
LEFT JOIN cust_side ON cust_side.nk = n.n_nationkey
LEFT JOIN supp_side ON supp_side.nk = n.n_nationkey
""",
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation demand (customer-side order revenue) vs supply
    (supplier-side shipped net revenue) and their balance — the
    two-fact reconciliation every finance mart runs. Each fact
    aggregates independently to O(nations) rows; the 25-row nation
    dimension LEFT-joins both (nation broadcast; the customer and
    supplier key joins are AQE-sized — both grow with the corpus), so
    absent sides read as zero instead of vanishing."""
    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders")
    customer = cat.load(spark, "customer")
    li = cat.load(spark, "lineitem")
    supplier = cat.load(spark, "supplier")
    nation = cat.load(spark, "nation")
    cust_side = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum(_o_cents()).cast("bigint").alias("cust_cents"))
    )
    supp_side = (
        li.join(
            supplier.select("s_suppkey", "s_nationkey"),
            li["l_suppkey"] == supplier["s_suppkey"],
        )
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.sum(_net_cents()).cast("bigint").alias("supp_cents"))
    )
    return (
        nation.join(
            cust_side, nation["n_nationkey"] == cust_side["nk"], "left"
        )
        .drop("nk")
        .join(supp_side, nation["n_nationkey"] == supp_side["nk"], "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce(F.col("cust_cents"), F.lit(0))
            .cast("bigint")
            .alias("cust_cents"),
            F.coalesce(F.col("supp_cents"), F.lit(0))
            .cast("bigint")
            .alias("supp_cents"),
            (
                F.coalesce(F.col("cust_cents"), F.lit(0))
                - F.coalesce(F.col("supp_cents"), F.lit(0))
            )
            .cast("bigint")
            .alias("balance_cents"),
        )
    )


@register(
    "supplier_balance_outliers",
    oracle="""
WITH enc AS (
    SELECT s_suppkey, s_nationkey,
           CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal
    FROM supplier
),
stats AS (
    SELECT s_nationkey, COUNT(*) AS n,
           CAST(SUM(bal) AS HUGEINT) AS s,
           CAST(SUM(CAST(bal AS HUGEINT) * bal) AS HUGEINT) AS ss
    FROM enc GROUP BY s_nationkey
)
SELECT e.s_suppkey, n.n_name AS nation, e.bal AS bal_cents,
       ROUND((CAST(st.n AS DOUBLE) * CAST(e.bal AS DOUBLE)
              - CAST(st.s AS DOUBLE))
             / SQRT(CAST(st.n AS DOUBLE) * CAST(st.ss AS DOUBLE)
                    - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)), 4)
           AS z
FROM enc e
JOIN stats st ON st.s_nationkey = e.s_nationkey
JOIN nation n ON n.n_nationkey = e.s_nationkey
WHERE CAST(st.n AS HUGEINT) * st.ss - st.s * st.s > 0
  AND ABS(ROUND((CAST(st.n AS DOUBLE) * CAST(e.bal AS DOUBLE)
                 - CAST(st.s AS DOUBLE))
                / SQRT(CAST(st.n AS DOUBLE) * CAST(st.ss AS DOUBLE)
                       - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)), 4))
      > 2
""",
)
def supplier_balance_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Suppliers whose account balance sits beyond 2σ of their
    nation's distribution — the finance-screening query. Per-nation
    sufficient statistics (exact cents sums in decimal(38,0) /
    HUGEINT — bal² sums overflow int64 at scale) broadcast back onto
    the supplier frame; z is one IEEE expression over exact inputs,
    rounded to 4 dp on BOTH sides of the comparison so the filter can
    never flip between engines."""
    cat = Catalog(sf_dir)
    supplier = cat.load(spark, "supplier")
    nation = cat.load(spark, "nation")
    enc = supplier.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("bal"),
    )
    stats = enc.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("bal").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("bal").cast("decimal(38,0)") * F.col("bal"))
        ).alias("ss"),
    ).withColumnRenamed("s_nationkey", "st_nk")
    z = F.round(
        (
            F.col("n").cast("double") * F.col("bal").cast("double")
            - F.col("s").cast("double")
        )
        / F.sqrt(
            F.col("n").cast("double") * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        ),
        4,
    )
    return (
        enc.join(
            F.broadcast(stats), enc["s_nationkey"] == stats["st_nk"]
        )
        .join(
            F.broadcast(nation),
            enc["s_nationkey"] == nation["n_nationkey"],
        )
        # variance-zero groups (one supplier, or all-equal balances)
        # have no outliers and would divide by zero under ANSI mode;
        # the guard is an exact integer predicate on both sides
        .filter(
            F.col("n").cast("decimal(38,0)") * F.col("ss")
            - F.col("s") * F.col("s")
            > 0
        )
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2)
        .select(
            "s_suppkey",
            F.col("n_name").alias("nation"),
            F.col("bal").alias("bal_cents"),
            "z",
        )
    )


@register(
    "part_brand_share_entropy",
    oracle=f"""
WITH rev AS (
    SELECT p.p_type AS ptype, p.p_brand AS brand,
           CAST(SUM({_NET_CENTS.replace('l_', 'l.l_')}) AS BIGINT)
               AS brand_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
),
typed AS (
    SELECT ptype, brand, brand_cents,
           CAST(SUM(brand_cents) OVER (PARTITION BY ptype) AS BIGINT)
               AS type_cents
    FROM rev
),
terms AS (
    SELECT ptype, type_cents,
           CAST(ROUND((CAST(brand_cents AS DOUBLE)
                       / CAST(type_cents AS DOUBLE))
                      * LN(CAST(brand_cents AS DOUBLE)
                           / CAST(type_cents AS DOUBLE))
                      * {Q6}) AS BIGINT) AS term_q
    FROM typed WHERE brand_cents > 0
)
SELECT ptype, COUNT(*) AS n_brands,
       CAST(MAX(type_cents) AS BIGINT) AS type_cents,
       ROUND(-CAST(SUM(term_q) AS DOUBLE) / {Q6}, 6) AS entropy
FROM terms GROUP BY ptype
""",
)
def part_brand_share_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shannon entropy of brand revenue shares within each part type —
    low entropy = a type owned by one brand (concentration risk), the
    assortment-diversity metric. Each share·ln(share) term is computed
    from exact integer revenues and QUANTIZED to a 1e-6 grid before
    summation (the zipf-fit float discipline: the only float sum in
    sight becomes an exact integer sum; per-type brand counts are
    bounded, but partition order still must not perturb the hash).
    Windows partition by p_type — bounded groups."""
    cat = Catalog(sf_dir)
    li = cat.load(spark, "lineitem")
    part = cat.load(spark, "part")
    rev = (
        li.join(
            part.select("p_partkey", "p_type", "p_brand"),
            li["l_partkey"] == part["p_partkey"],
        )
        .groupBy(
            F.col("p_type").alias("ptype"), F.col("p_brand").alias("brand")
        )
        .agg(F.sum(_net_cents()).cast("bigint").alias("brand_cents"))
    )
    w = Window.partitionBy("ptype")
    typed = rev.withColumn(
        "type_cents", F.sum("brand_cents").over(w).cast("bigint")
    )
    share = F.col("brand_cents").cast("double") / F.col("type_cents").cast(
        "double"
    )
    terms = typed.filter(F.col("brand_cents") > 0).select(
        "ptype",
        "type_cents",
        F.round(share * F.log(share) * Q6).cast("bigint").alias("term_q"),
    )
    return terms.groupBy("ptype").agg(
        F.count(F.lit(1)).alias("n_brands"),
        F.max("type_cents").cast("bigint").alias("type_cents"),
        F.round(-F.sum("term_q").cast("double") / Q6, 6).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# Backlog timeline and rank-tie semantics
# ---------------------------------------------------------------------------


@register(
    "order_fulfillment_backlog",
    oracle="""
WITH opens AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
                + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
           COUNT(*) AS opened
    FROM orders GROUP BY 1
),
closes AS (
    SELECT ym, COUNT(*) AS closed FROM (
        SELECT l_orderkey,
               CAST(EXTRACT(year FROM MAX(l_shipdate)) * 100
                    + EXTRACT(month FROM MAX(l_shipdate)) AS BIGINT) AS ym
        FROM lineitem GROUP BY l_orderkey
    ) GROUP BY ym
),
spine AS (
    SELECT ym FROM opens UNION SELECT ym FROM closes
),
merged AS (
    SELECT s.ym, COALESCE(o.opened, 0) AS opened,
           COALESCE(c.closed, 0) AS closed
    FROM spine s
    LEFT JOIN opens o ON o.ym = s.ym
    LEFT JOIN closes c ON c.ym = s.ym
)
SELECT ym, opened, closed,
       CAST(SUM(opened - closed) OVER (
           ORDER BY ym ASC ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS backlog
FROM merged
""",
)
def order_fulfillment_backlog(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly order backlog: orders opened (orderdate month) minus
    orders fully shipped (month of the LAST lineitem shipdate),
    accumulated — the operations chart that shows demand outrunning
    fulfilment. Facts reduce to two O(months) series; the running
    balance windows over the calendar-bounded month spine only. The
    per-order close date is a max over the order's own lines (hash
    aggregate, no window)."""
    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders")
    li = cat.load(spark, "lineitem")
    ym_o = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast(
        "bigint"
    )
    opens = orders.groupBy(ym_o.alias("ym")).agg(
        F.count(F.lit(1)).alias("opened")
    )
    per_order_close = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    closes = per_order_close.groupBy(
        (F.year("last_ship") * 100 + F.month("last_ship"))
        .cast("bigint")
        .alias("ym")
    ).agg(F.count(F.lit(1)).alias("closed"))
    spine = opens.select("ym").union(closes.select("ym")).distinct()
    merged = (
        spine.join(opens, "ym", "left")
        .join(closes, "ym", "left")
        .select(
            "ym",
            F.coalesce("opened", F.lit(0)).alias("opened"),
            F.coalesce("closed", F.lit(0)).alias("closed"),
        )
    )
    w = Window.orderBy(F.col("ym").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return merged.withColumn(
        "backlog",
        F.sum(F.col("opened") - F.col("closed")).over(w).cast("bigint"),
    )


@register(
    "supplier_rank_tie_semantics",
    oracle="""
WITH enc AS (
    SELECT s_nationkey, CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal
    FROM supplier
),
ranked AS (
    SELECT s_nationkey, bal,
           RANK() OVER (PARTITION BY s_nationkey ORDER BY bal DESC)
               AS rnk,
           DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY bal DESC)
               AS drnk
    FROM enc
)
SELECT n.n_name AS nation, COUNT(*) AS n_suppliers,
       COUNT(DISTINCT bal) AS n_distinct_bal,
       CAST(MAX(rnk - drnk) AS BIGINT) AS max_rank_gap
FROM ranked r JOIN nation n ON n.n_nationkey = r.s_nationkey
GROUP BY n.n_name
""",
)
def supplier_rank_tie_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RANK vs DENSE_RANK divergence under ties, per nation: the
    max_rank_gap column is exactly how many tied rows precede the
    worst-gapped supplier — zero everywhere means the ordering key is
    tie-free and row_number would be deterministic without a
    tie-break. Windows partition by nation (bounded groups, hash
    exchange); this is the W-surface semantics audit for the two rank
    spellings the marts rely on."""
    cat = Catalog(sf_dir)
    supplier = cat.load(spark, "supplier")
    nation = cat.load(spark, "nation")
    enc = supplier.select(
        "s_nationkey",
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("bal"),
    )
    w = Window.partitionBy("s_nationkey").orderBy(F.col("bal").desc())
    ranked = enc.withColumn("rnk", F.rank().over(w)).withColumn(
        "drnk", F.dense_rank().over(w)
    )
    return (
        ranked.join(
            F.broadcast(nation),
            ranked["s_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.countDistinct("bal").alias("n_distinct_bal"),
            F.max(F.col("rnk") - F.col("drnk"))
            .cast("bigint")
            .alias("max_rank_gap"),
        )
    )
