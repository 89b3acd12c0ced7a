"""Operator-coverage queries: one registered query per SURVEY.md §2 operator
family, each with an exact DuckDB oracle.

These are deliberately small, single-purpose plans — the operator inventory
made checkable. Mart-sized compositions live in ``pipelines/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions.numeric import exact_sum
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

# ---------------------------------------------------------------------------
# A2/E3/O1 — multi-measure hash aggregate (TPC-H Q1-style pricing summary)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
SELECT
    l_returnflag,
    l_linestatus,
    SUM(l_quantity) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side-combinable hash aggregate over the fact table; the filter
    reaches the parquet scan as a pushed predicate."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            exact_sum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# W1/O4 — top-k per group via ranking window
# ---------------------------------------------------------------------------


@register(
    "top3_parts_per_brand",
    oracle="""
WITH rev AS (
    SELECT
        p.p_brand,
        p.p_partkey,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand, p.p_partkey
)
SELECT p_brand, p_partkey, revenue, rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS rnk
    FROM rev
)
WHERE rnk <= 3
""",
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(sf_dir)
    li = cat.load(spark, "lineitem")
    part = cat.load(spark, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )
    # Two-phase top-k (operators/ranks.py): p_brand has bounded
    # cardinality while parts-per-brand scales with the data, so a
    # brand-partitioned window would funnel each brand into one task.
    from asritha_metamorphetl_spark.operators.ranks import top_k_per_group

    return top_k_per_group(
        rev,
        ["p_brand"],
        [F.col("revenue").desc(), F.col("p_partkey").asc()],
        k=3,
        out_col="rnk",
    ).select("p_brand", "p_partkey", "revenue", "rnk")


# ---------------------------------------------------------------------------
# J6 — anti join (idiomatic form of the reference's outer+null-filter)
# ---------------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti — the idiomatic Spark spelling of the reference's
    outer-join + 'Target_Record is null' pattern (Raptor/Raptor.py:281-290)."""
    cat = Catalog(sf_dir)
    cust = cat.load(spark, "customer").select("c_custkey", "c_name")
    orders = cat.load(spark, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


# ---------------------------------------------------------------------------
# J7 — semi join
# ---------------------------------------------------------------------------


@register(
    "customers_with_open_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(sf_dir)
    cust = cat.load(spark, "customer").select("c_custkey", "c_name")
    open_orders = (
        cat.load(spark, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    return cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")


# ---------------------------------------------------------------------------
# A1/F3 — duplicate detection (group-count-having), the D1 building block
# ---------------------------------------------------------------------------


@register(
    "repeat_customers",
    oracle="""
SELECT o_custkey, COUNT(*) AS order_cnt
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 1
""",
)
def repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(sf_dir).load(spark, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .filter(F.col("order_cnt") > 1)
    )


# ---------------------------------------------------------------------------
# Rollup + grouping id (beyond reference: multi-level aggregation in one pass)
# ---------------------------------------------------------------------------


@register(
    "lineitem_rollup",
    oracle="""
SELECT
    COALESCE(l_returnflag, '<all>') AS returnflag,
    COALESCE(l_linestatus, '<all>') AS linestatus,
    GROUPING_ID(l_returnflag, l_linestatus) AS gid,
    SUM(l_quantity) AS sum_qty,
    COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(sf_dir).load(spark, "lineitem")
    # Pre-aggregate to the finest grain so the rollup's Expand triples
    # |flag × status| partial rows (≤6), not the raw fact rows; sums of
    # sums re-aggregate exactly (same rewrite as revenue_rollup).
    grain = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("q_part"),
        F.count(F.lit(1)).alias("n_part"),
    )
    return (
        grain.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("q_part").alias("sum_qty"),
            F.sum("n_part").alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Pivot (beyond reference) — counts by status cross orderpriority
# ---------------------------------------------------------------------------


@register(
    "orders_status_pivot",
    oracle="""
SELECT
    o_orderpriority,
    COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
    COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
    COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
""",
)
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(sf_dir).load(spark, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves missing cells NULL; the FILTER oracle yields 0.
    return out.na.fill(0, ["F", "O", "P"])


# ---------------------------------------------------------------------------
# Set operations (§2.9 — absent from the reference, first-class here)
# ---------------------------------------------------------------------------


@register(
    "open_minus_fulfilled_customers",
    oracle="""
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def open_minus_fulfilled_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(sf_dir).load(spark, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    full_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract == SQL EXCEPT (distinct) — exceptAll would be multiset minus.
    return open_c.subtract(full_c)


@register(
    "open_and_pending_customers",
    oracle="""
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def open_and_pending_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(sf_dir).load(spark, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    pend_c = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return open_c.intersect(pend_c)


# ---------------------------------------------------------------------------
# Windowed aggregate with explicit frame (beyond reference: running total)
# ---------------------------------------------------------------------------


@register(
    "running_customer_spend",
    oracle="""
SELECT
    o_custkey,
    o_orderkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_spend
FROM orders
""",
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(sf_dir).load(spark, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# lag/lead (§2.12 gap — inter-event deltas per user)
# ---------------------------------------------------------------------------


@register(
    "event_gaps",
    oracle="""
SELECT
    user_id,
    event_id,
    CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT)
        - LAG(CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_sec
FROM events
""",
)
def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    epoch = F.unix_timestamp("ts")
    return ev.select(
        "user_id",
        "event_id",
        (epoch - F.lag(epoch).over(w)).alias("gap_sec"),
    )


# ---------------------------------------------------------------------------
# Tumbling time-window aggregation (batch equivalent of the streaming op)
# ---------------------------------------------------------------------------


@register(
    "events_hourly",
    oracle="""
SELECT
    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
    event_type,
    COUNT(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window — the exact shape streaming/windows.py uses
    under readStream; here over the batch events table."""
    ev = Catalog(sf_dir).load(spark, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value"), "total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Sessionization (gaps-and-islands; batch twin of streaming session windows)
# ---------------------------------------------------------------------------

SESSION_GAP_SEC = 1800


@register(
    "event_sessions",
    oracle=f"""
WITH ordered AS (
    SELECT
        user_id,
        event_id,
        value,
        CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS ts_sec
    FROM events
),
flagged AS (
    SELECT *,
        CASE WHEN ts_sec - LAG(ts_sec) OVER (
                 PARTITION BY user_id ORDER BY ts_sec ASC, event_id ASC)
             > {SESSION_GAP_SEC}
             OR LAG(ts_sec) OVER (
                 PARTITION BY user_id ORDER BY ts_sec ASC, event_id ASC) IS NULL
             THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
numbered AS (
    SELECT *,
        CAST(SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts_sec ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
    FROM flagged
)
SELECT
    user_id,
    session_id,
    MIN(ts_sec) AS session_start_sec,
    MAX(ts_sec) AS session_end_sec,
    COUNT(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_id
""",
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization via gaps-and-islands. All windows are
    partitioned by user — fully parallel; the streaming twin is
    session_window() in streaming/windows.py."""
    ev = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_sec").asc(), F.col("event_id").asc()
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_sec").over(w)
    return (
        ev.select(
            "user_id", "event_id", "value", F.unix_timestamp("ts").alias("ts_sec")
        )
        .withColumn(
            "new_session",
            F.when(
                (F.col("ts_sec") - prev > SESSION_GAP_SEC) | prev.isNull(), 1
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_sec").alias("session_start_sec"),
            F.max("ts_sec").alias("session_end_sec"),
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value"), "total_value"),
        )
    )


# ---------------------------------------------------------------------------
# JSON extraction (events.props is a JSON string column)
# ---------------------------------------------------------------------------


@register(
    "event_props_stats",
    oracle="""
SELECT
    event_type,
    CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
    COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)
def event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(sf_dir).load(spark, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "user_journeys",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type, ts,
        FIRST_VALUE(event_type) OVER w AS first_type,
        LAST_VALUE(event_type) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS last_type,
        date_diff('microsecond', ts,
                  LEAD(ts) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       COUNT(*) AS n_events,
       MAX(first_type) AS first_type,
       MAX(last_type) AS last_type,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1000000.0, 3)
           AS avg_gap_sec
FROM seq
GROUP BY user_id
HAVING COUNT(*) > 1
""",
)
def user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user journey profile: first/last event type and mean
    inter-event gap. Exercises LEAD plus FIRST_VALUE (default running
    frame) and LAST_VALUE with an explicit unbounded frame — the default
    frame would return the CURRENT row's type, the classic last_value
    trap. Gaps are summed as exact integer microseconds; the double
    division is spelled identically in both engines so the rounding
    agrees. Windows partition by user — no global ordering pass."""
    ev = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gap_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    seq = ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_all).alias("last_type"),
        gap_us.alias("gap_us"),
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("first_type").alias("first_type"),
            F.max("last_type").alias("last_type"),
            F.round(
                F.sum("gap_us").cast("double")
                / F.count("gap_us")
                / F.lit(1000000.0),
                3,
            ).alias("avg_gap_sec"),
        )
        .filter(F.col("n_events") > 1)
    )


@register(
    "priority_price_profile",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price,
       ROUND(MEDIAN(o_totalprice), 2) AS median_price
FROM orders
GROUP BY o_orderpriority
""",
)
def priority_price_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median via the sort-based percentile aggregate —
    grouped by priority, so the sort happens per group partition (never a
    global single-partition pass). Both engines interpolate the even-count
    median as (a+b)/2 on the same doubles, so the rounded values agree."""
    orders = Catalog(sf_dir).load(spark, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.median("o_totalprice"), 2).alias("median_price"),
    )


@register(
    "props_kv_totals",
    oracle="""
SELECT k AS prop_key,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.' || k) AS BIGINT)) AS BIGINT)
           AS total
FROM events, UNNEST(json_keys(props)) AS t(k)
GROUP BY k
""",
)
def props_kv_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over semi-structured props: parse the JSON payload
    into a MapType and explode key/value pairs — totals per key without
    declaring the key set anywhere (new keys appear as new rows, not
    schema migrations). The parse+explode is row-local, inside the scan
    stage; only the per-key rollup shuffles."""
    ev = Catalog(sf_dir).load(spark, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias(
            "prop_key", "v"
        )
    )
    return kv.groupBy("prop_key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").alias("total"),
    )


@register(
    "party_directory",
    oracle="""
SELECT kind, COUNT(*) AS n_parties, COUNT(DISTINCT nation_key) AS n_nations
FROM (
    SELECT 'customer' AS kind, c_nationkey AS nation_key FROM customer
    UNION ALL
    SELECT 'supplier' AS kind, s_nationkey AS nation_key FROM supplier
) parties
GROUP BY kind
""",
)
def party_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation coverage: a unioned directory of both party entities
    (unionByName so column order can never silently misalign — the
    positional-union trap), rolled up per kind."""
    cat = Catalog(sf_dir)
    cust = cat.load(spark, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_nationkey").alias("nation_key")
    )
    supp = cat.load(spark, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("nation_key")
    )
    return (
        cust.unionByName(supp)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_parties"),
            F.countDistinct("nation_key").alias("n_nations"),
        )
    )


@register(
    "events_sliding_stats",
    oracle="""
WITH assigned AS (
    SELECT event_type, value,
           time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
               AS window_start
    FROM events, UNNEST(range(4)) AS t(k)
    WHERE time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
          > ts - INTERVAL 1 HOUR
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(MIN(value), 2) AS min_value,
       ROUND(MAX(value), 2) AS max_value
FROM assigned
GROUP BY 1, 2
""",
)
def events_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/15m windows — the batch twin of
    streaming/windows.sliding_event_stats, so the overlapping-window
    assignment itself is oracle-checked (each event lands in exactly 4
    windows; the SQL twin materializes the k-offset expansion Spark's
    window() does internally)."""
    ev = Catalog(sf_dir).load(spark, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "min_value",
            "max_value",
        )
    )


@register(
    "daily_revenue_spine",
    oracle="""
WITH bounds AS (
    SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
           CAST(MAX(o_orderdate) AS DATE) AS d1
    FROM orders
),
spine AS (
    SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        AS day
    FROM bounds
),
daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
       COALESCE(d.revenue, 0.0) AS revenue,
       CAST(COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders
FROM spine s LEFT JOIN daily d USING (day)
""",
)
def daily_revenue_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine pattern: a generated day dimension LEFT-joined to
    daily revenue so zero-order days appear as explicit 0.0 rows — the
    gap-free time series every reporting layer needs. The spine derives
    lazily from the data's own min/max (a 1-row aggregate exploded by
    sequence()); no driver collect, no hardcoded range."""
    orders = Catalog(sf_dir).load(spark, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        exact_sum(F.col("o_totalprice"), "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return spine.join(daily, "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
    )


#: Edit-distance threshold for similar_part_names; the length-band
#: blocking below is complete for exactly this radius.
_LEV_MAX = 3


@register(
    "similar_part_names",
    oracle=f"""
WITH names AS (SELECT DISTINCT p_name FROM part),
a AS (
    SELECT p_name AS name_a,
           UNNEST(generate_series(length(p_name) - {_LEV_MAX},
                                  length(p_name) + {_LEV_MAX})) AS blk
    FROM names
),
b AS (SELECT p_name AS name_b, length(p_name) AS blk FROM names)
SELECT name_a, name_b, levenshtein(name_a, name_b) AS distance
FROM a JOIN b USING (blk)
WHERE name_a < name_b AND levenshtein(name_a, name_b) <= {_LEV_MAX}
""",
)
def similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: near-identical catalog names by edit
    distance, over the DISTINCT-name frame.

    Blocking: levenshtein(a,b) <= 3 implies |len(a)-len(b)| <= 3, so the
    left side emits its name under the 7 candidate lengths and the right
    side under its own length — a plain hash EQUI-join on the length key
    (the naive ``name_a < name_b`` theta join planned as a
    BroadcastNestedLoopJoin, O(n^2) in distinct names). The blocking is
    COMPLETE (no recall loss — every qualifying pair shares exactly one
    key), each unordered pair meets exactly once (the ``<`` filter keeps
    the single orientation), and levenshtein runs only within length
    bands. Residual cost is quadratic within a band, bounded by the name
    domain's length distribution; tighter radii shrink the band."""
    part = Catalog(sf_dir).load(spark, "part")
    names = part.select("p_name").distinct()
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.explode(
            F.sequence(
                F.length("p_name") - _LEV_MAX, F.length("p_name") + _LEV_MAX
            )
        ).alias("blk"),
    )
    b = names.select(F.col("p_name").alias("name_b"), F.length("p_name").alias("blk"))
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= _LEV_MAX)
        .select("name_a", "name_b", "distance")
    )


# ---------------------------------------------------------------------------
# Skew-mitigated hot-key join (operators/skew.py), registered with the
# plain-join oracle: salting must be output-invariant.
# ---------------------------------------------------------------------------


@register(
    "salted_hot_user_events",
    oracle="""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
)
def salted_hot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim join with TARGETED salting of the hottest keys
    (operators/skew.py): a first pass ranks keys by frequency and
    collects the top 20 — a bounded O(hot-key-budget) driver list, never
    data-proportional — then only those keys scatter across salts while
    the dim replicates per (hot key × salt). The oracle is the plain
    unsalted join: identical output is the proof that salting changed
    the partitioning, not the semantics. At 100 TB the hot-key pass is
    one map-side-combined agg + a LIMIT, and AQE's skew handling covers
    the long tail the static salt list misses."""
    from asritha_metamorphetl_spark.operators.skew import salted_join

    cat = Catalog(sf_dir)
    ev = cat.load(spark, "events")
    cust = cat.load(spark, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    hot = [
        r["user_id"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("user_id"))
        .limit(20)
        .collect()
    ]
    joined = salted_join(ev, cust, on="user_id", n_salts=8, hot_keys=hot)
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value"), "total_value"),
    )


# ---------------------------------------------------------------------------
# Ordered funnel: view → click → purchase, each stage strictly after the
# previous user-level milestone. Three conditional-min aggregations — no
# window over raw events, no self-join explosion; state per user is three
# timestamps.
# ---------------------------------------------------------------------------


@register(
    "event_funnel",
    oracle="""
WITH e AS (
    SELECT user_id, event_type,
           CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS ts_sec
    FROM events
),
v AS (
    SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts_sec END) AS v_sec
    FROM e GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts_sec) AS c_sec
    FROM e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts_sec > v.v_sec
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts_sec) AS p_sec
    FROM e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts_sec > c.c_sec
    GROUP BY e.user_id
)
SELECT
    CAST((SELECT COUNT(*) FROM v WHERE v_sec IS NOT NULL) AS BIGINT)
        AS n_viewed,
    CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
    CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click
""",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-stage funnel. Each stage is a conditional
    MIN over (user, stage-gate) — one narrow shuffle per stage on
    user_id, which AQE co-partitions across the chained joins; the
    events table is scanned once per stage with the type filter pushed
    to the parquet scan."""
    ev = (
        Catalog(sf_dir)
        .load(spark, "events")
        .select(
            "user_id", "event_type", F.unix_timestamp("ts").alias("ts_sec")
        )
    )
    # Each stage frame is pinned (round 13): v feeds its own count AND
    # c's gate join, c feeds its count AND p's gate join — unpinned,
    # the chain nests (p replays c which replays v) and the plan
    # scanned events SIX times for three stages. Pinned, each stage's
    # O(users) milestone frame computes once and events is scanned
    # exactly once per stage with the type filter pushed down.
    v = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts_sec"))
            ).alias("v_sec")
        )
        .filter(F.col("v_sec").isNotNull())
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_sec") > F.col("v_sec"))
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("c_sec"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_sec") > F.col("c_sec"))
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("p_sec"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed"))
        .crossJoin(
            c.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_clicked_after_view")
            )
        )
        .crossJoin(
            p.agg(
                F.count(F.lit(1))
                .cast("bigint")
                .alias("n_purchased_after_click")
            )
        )
    )


# ---------------------------------------------------------------------------
# Unpivot (wide measures → long form) — the melt shape reporting layers
# need; Spark's native unpivot, oracled as a portable UNION ALL.
# ---------------------------------------------------------------------------


@register(
    "lineitem_measures_long",
    oracle="""
WITH long AS (
    SELECT l_returnflag, 'quantity' AS measure,
           CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'extendedprice',
           CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'discount',
           CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
)
SELECT l_returnflag, measure,
       CAST(SUM(v) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM long
GROUP BY 1, 2
""",
)
def lineitem_measures_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of three lineitem measures, then a per-measure
    rollup. unpivot expands 3× inside the scan stage (no shuffle until
    the bounded (flag, measure) agg); sums are decimal-quantized per row
    so the cross-engine totals are exact."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    long = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("quantity"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("extendedprice"),
        F.col("l_discount").cast("decimal(18,2)").alias("discount"),
    ).unpivot(
        ["l_returnflag"],
        ["quantity", "extendedprice", "discount"],
        "measure",
        "v",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.sum("v").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Retention cohort matrix — the activation/retention analytic every event
# warehouse serves. Week arithmetic is integer epoch math (engine-exact).
# ---------------------------------------------------------------------------


@register(
    "user_retention_cohorts",
    oracle="""
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 604800) AS BIGINT) AS wk
    FROM events
),
c AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY user_id)
SELECT c.cohort_week,
       uw.wk - c.cohort_week AS week_offset,
       COUNT(*) AS n_active_users
FROM uw JOIN c ON uw.user_id = c.user_id
GROUP BY 1, 2
""",
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort (first-active epoch week) × week-offset active-user counts.
    Two keyed aggregations on user_id — the distinct (user, week) frame
    is the only shuffle of data-proportional size; the cohort frame is
    one row per user and AQE co-partitions the join with the aggregate
    that produced it (no extra exchange)."""
    ev = Catalog(sf_dir).load(spark, "events")
    uw = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("wk"),
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


# ---------------------------------------------------------------------------
# Per-customer order cadence: exact median over integer day gaps
# (integer inputs → interpolated medians land on .0/.5 — engine-exact).
# ---------------------------------------------------------------------------


@register(
    "customer_order_gaps",
    oracle="""
WITH o AS (
    SELECT o_custkey,
           CAST(FLOOR(EXTRACT(EPOCH FROM o_orderdate) / 86400) AS BIGINT)
               AS day
    FROM orders
),
gaps AS (
    SELECT o_custkey,
           day - LAG(day) OVER (PARTITION BY o_custkey ORDER BY day) AS gap
    FROM (SELECT DISTINCT o_custkey, day FROM o)
)
SELECT o_custkey,
       COUNT(*) AS n_gaps,
       CAST(MEDIAN(gap) AS DOUBLE) AS median_gap_days,
       CAST(MAX(gap) AS BIGINT) AS max_gap_days
FROM gaps
WHERE gap IS NOT NULL
GROUP BY o_custkey
""",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap profile per customer: distinct order days, LAG
    within the per-customer window (fully partitioned), exact median
    over integer day gaps. Median interpolation on integers yields only
    .0/.5 values — deterministic across engines, unlike medians over
    accumulated doubles."""
    orders = Catalog(sf_dir).load(spark, "orders")
    days = (
        orders.select(
            "o_custkey",
            # unix_date is timezone-free days-since-epoch — exactly the
            # oracle's EXTRACT(EPOCH FROM date)/86400. unix_timestamp would
            # route through the session timezone and shift by a day across
            # DST transitions when the driver session isn't UTC. The column
            # is TIMESTAMP_NTZ in the parquet; NTZ→date is also tz-free.
            F.unix_date(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("day")
    gaps = days.withColumn("gap", F.col("day") - F.lag("day").over(w)).filter(
        F.col("gap").isNotNull()
    )
    return gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.median("gap").cast("double").alias("median_gap_days"),
        F.max("gap").cast("bigint").alias("max_gap_days"),
    )


# ---------------------------------------------------------------------------
# SCD2 version bracketing (operators/scd.py) — the reference's daily
# snapshot append (ingestion_task.py:48-69) re-expressed as true slowly-
# changing-dimension history, driver-checked end-to-end.
# ---------------------------------------------------------------------------

#: Cutoff dates doubling as batch dates: the customer dimension is
#: reconstructed as of each cutoff and merged with scd2_apply, so a
#: customer gets a new version exactly when a tracked attribute changed
#: between cutoffs.
SCD2_CUTOFFS = ("1994-01-01", "1995-06-01", "1996-12-01")


def _scd2_dim_sql() -> str:
    """SQL subquery reconstructing the SCD2 customer dimension (DATE-
    typed brackets) — shared by the scd2_order_history oracle and the
    point-in-time join oracle."""
    snaps = "\nUNION ALL\n".join(
        f"""SELECT o_custkey AS custkey, DATE '{c}' AS cutoff,
       (SELECT o.o_orderstatus FROM orders o
        WHERE o.o_custkey = g.o_custkey
          AND CAST(o.o_orderdate AS DATE) <= DATE '{c}'
        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
           AS last_status,
       COUNT(*) AS n_orders
FROM orders g
WHERE CAST(o_orderdate AS DATE) <= DATE '{c}'
GROUP BY o_custkey"""
        for c in SCD2_CUTOFFS
    )
    return f"""
SELECT custkey, last_status, CAST(n_orders AS BIGINT) AS n_orders,
       cutoff AS effective_from,
       LEAD(cutoff) OVER w AS effective_to,
       LEAD(cutoff) OVER w IS NULL AS is_current
FROM (
    SELECT custkey, cutoff, last_status, n_orders
    FROM (
        SELECT *,
               LAG(last_status) OVER v AS p_status,
               LAG(n_orders) OVER v AS p_n
        FROM (
{snaps}
        )
        WINDOW v AS (PARTITION BY custkey ORDER BY cutoff)
    )
    WHERE p_n IS NULL OR p_status IS DISTINCT FROM last_status
       OR p_n IS DISTINCT FROM n_orders
)
WINDOW w AS (PARTITION BY custkey ORDER BY cutoff)
"""


def _scd2_oracle() -> str:
    return f"""
SELECT custkey, last_status, n_orders,
       strftime(effective_from, '%Y-%m-%d') AS effective_from,
       strftime(effective_to, '%Y-%m-%d') AS effective_to,
       is_current
FROM ({_scd2_dim_sql()})
"""


def _orders_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the SCD2 customer dimension by folding three cutoff
    snapshots through scd2_init + scd2_apply (DATE-typed brackets) —
    shared by scd2_order_history and the point-in-time join query."""
    import datetime as dt

    from asritha_metamorphetl_spark.operators.scd import scd2_apply, scd2_init

    orders = Catalog(sf_dir).load(spark, "orders")

    def snapshot(cutoff: str) -> DataFrame:
        upto = orders.filter(
            F.col("o_orderdate").cast("date") <= F.lit(cutoff).cast("date")
        )
        return upto.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.max_by(
                "o_orderstatus", F.struct("o_orderdate", "o_orderkey")
            ).alias("last_status"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    dates = [dt.date.fromisoformat(c) for c in SCD2_CUTOFFS]
    dim = scd2_init(snapshot(SCD2_CUTOFFS[0]), dates[0])
    for cutoff, batch_date in zip(SCD2_CUTOFFS[1:], dates[1:]):
        dim = scd2_apply(
            dim,
            snapshot(cutoff),
            keys=["custkey"],
            tracked=["last_status", "n_orders"],
            batch_date=batch_date,
        )
    return dim


@register("scd2_order_history", oracle=_scd2_oracle())
def scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge exercised end-to-end: a per-customer dimension
    (last order status by (date, orderkey), cumulative order count) is
    snapshotted at three cutoffs and folded through scd2_init +
    scd2_apply. A customer gets a new version row exactly at the cutoffs
    where a tracked attribute changed; the closed version's effective_to
    is the closing batch's date. The oracle reconstructs the identical
    bracketing declaratively with LAG/LEAD over the change rows.

    Scale shape: each merge is one key-shuffled (or broadcast) join plus
    disjoint unions — no windows over the dimension, no driver state
    (operators/scd.py docstring)."""
    dim = _orders_scd2_dim(spark, sf_dir)
    # Dates out as ISO strings: both comparison harnesses (driver and
    # pytest) stringify pandas frames, and DuckDB DATE arrives in pandas
    # as Timestamp while Spark's arrives as date — strings compare
    # identically everywhere.
    return dim.select(
        "custkey",
        "last_status",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.date_format("effective_from", "yyyy-MM-dd").alias("effective_from"),
        F.date_format("effective_to", "yyyy-MM-dd").alias("effective_to"),
        "is_current",
    )


@register(
    "scd2_pointintime_totals",
    oracle=f"""
WITH dim AS ({_scd2_dim_sql()}),
facts AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT strftime(dim.effective_from, '%Y-%m-%d') AS version_from,
       dim.last_status AS version_status,
       COUNT(*) AS n_facts,
       COUNT(DISTINCT facts.custkey) AS n_cust,
       CAST(SUM(facts.cents) AS BIGINT) AS total_cents
FROM facts
JOIN dim
  ON facts.custkey = dim.custkey
 AND dim.effective_from <= facts.d
 AND (dim.effective_to IS NULL OR facts.d < dim.effective_to)
GROUP BY 1, 2
""",
)
def scd2_pointintime_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (operators/scd.scd2_asof_join): every order
    joins the dimension VERSION valid on its own order date — not
    today's is_current row — then rolls up per (version start, version
    status). Joining time-correct versions is what keeps a rebuilt
    report (or a training-data snapshot) reproducible after the
    dimension moves on; the oracle replays the identical bracket join
    declaratively.

    Scale shape: hash equi-join on custkey with the bracket as a
    residual filter — per-key fan-out is the version count (≤3 here),
    bounded by update cadence, never O(rows)."""
    from asritha_metamorphetl_spark.operators.scd import scd2_asof_join

    dim = _orders_scd2_dim(spark, sf_dir)
    facts = Catalog(sf_dir).load(spark, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    joined = scd2_asof_join(facts, dim, keys=["custkey"], ts_col="d")
    return joined.groupBy(
        F.date_format("effective_from", "yyyy-MM-dd").alias("version_from"),
        F.col("last_status").alias("version_status"),
    ).agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.countDistinct("custkey").alias("n_cust"),
        F.sum("cents").alias("total_cents"),
    )


@register(
    "merged_event_intervals",
    oracle="""
WITH iv AS (
    SELECT user_id, event_id,
        CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS start_sec,
        CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT)
          + 60 + (CAST(ROUND(value * 100) AS BIGINT) % 3600) AS end_sec
    FROM events
),
flagged AS (
    SELECT *,
        CASE WHEN start_sec > COALESCE(MAX(end_sec) OVER (
                 PARTITION BY user_id ORDER BY start_sec ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 -9223372036854775808)
             THEN 1 ELSE 0 END AS new_island
    FROM iv
),
islands AS (
    SELECT user_id, start_sec, end_sec,
        CAST(SUM(new_island) OVER (
            PARTITION BY user_id ORDER BY start_sec ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS island_id
    FROM flagged
),
merged AS (
    SELECT user_id, island_id,
           MIN(start_sec) AS m_start, MAX(end_sec) AS m_end,
           COUNT(*) AS n_events
    FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(m_end - m_start) AS BIGINT) AS covered_sec,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM merged GROUP BY user_id
""",
)
def merged_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping VARIABLE-length intervals per user — the
    general interval-union problem (billing/availability/coverage),
    strictly harder than gap sessionization: with heterogeneous
    durations an early long interval can swallow several later short
    ones, so the island break needs the RUNNING MAX of interval ends
    (rows-preceding window), not a lag against the previous row.
    Durations derive from the value column as exact integer seconds so
    the oracle replays them; per-user windows over narrow rows keep it
    fully parallel. Returns per user: merged interval count, total
    covered seconds, event count."""
    ev = Catalog(sf_dir).load(spark, "events")
    start = F.unix_timestamp("ts")
    dur = F.lit(60) + F.round(F.col("value") * 100).cast("long") % 3600
    iv = ev.select(
        "user_id",
        "event_id",
        start.alias("start_sec"),
        (start + dur).alias("end_sec"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("start_sec").asc(), F.col("event_id").asc()
    )
    prev_max_end = F.max("end_sec").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        iv.withColumn(
            "new_island",
            F.when(
                F.col("start_sec")
                > F.coalesce(prev_max_end, F.lit(-(2**63))),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island_id",
            F.sum("new_island").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "island_id")
        .agg(
            F.min("start_sec").alias("m_start"),
            F.max("end_sec").alias("m_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("m_end") - F.col("m_start"))
        .cast("bigint")
        .alias("covered_sec"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )
