"""Warehouse-analytics queries: exact medians, revenue concentration,
RFM segmentation, ROLLUP hierarchies, item-item similarity, key-space
gap (islands) audits, and incremental aggregate-view maintenance.

Exact-arithmetic discipline throughout: medians and deciles are order
statistics at integer-computed ranks, money is integer cents, ratios
are single mirrored divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog


@register(
    "median_order_value_by_priority",
    oracle="""
WITH enc AS (
    SELECT o_orderpriority AS priority,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
ranked AS (
    SELECT priority, cents,
           ROW_NUMBER() OVER (
               PARTITION BY priority ORDER BY cents ASC
           ) AS rn,
           COUNT(*) OVER (PARTITION BY priority) AS n
    FROM enc
)
SELECT priority, MAX(n) AS n,
       ROUND((MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
              + MAX(CASE WHEN rn = (n + 2) // 2 THEN cents END))
             / 2.0, 2) AS median_cents
FROM ranked GROUP BY priority
""",
)
def median_order_value_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median order value per priority via explicit order
    statistics: the value at rank ⌈n/2⌉ averaged with rank ⌊n/2⌋+1 —
    the textbook even/odd definition spelled out so both engines
    compute the identical number (``percentile_cont`` interpolation
    rules are an engine-semantics minefield; ``approx_percentile`` is
    sketch-approximate — ``quantile_sketch_audit`` covers that trade).
    Per-group windows only; the aggregate collapses each group to one
    row with two conditional MAXes."""
    orders = Catalog(sf_dir).load(spark, "orders")
    enc = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_row_number,
    )

    # scale-safe per-group rank: range-partitioned within each priority
    # (two-phase w/ broadcast offsets) — a plain per-group window would
    # sort each priority's billions of rows in ONE task at 100 TB
    ranked = grouped_row_number(
        enc, ["priority"], [F.col("cents").asc()], out_col="rn",
        count_col="n",
    )
    lo = F.max(
        F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("cents"))
    )
    hi = F.max(
        F.when(F.col("rn") == F.floor((F.col("n") + 2) / 2), F.col("cents"))
    )
    return ranked.groupBy("priority").agg(
        F.max("n").alias("n"),
        F.round((lo + hi) / 2.0, 2).alias("median_cents"),
    )


@register(
    "top_decile_revenue_share",
    oracle="""
WITH rev AS (
    SELECT c.c_nationkey AS nation, c.c_custkey,
           SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
),
ranked AS (
    SELECT nation, cents,
           ROW_NUMBER() OVER (
               PARTITION BY nation ORDER BY cents DESC, c_custkey ASC
           ) AS rn,
           COUNT(*) OVER (PARTITION BY nation) AS n
    FROM rev
)
SELECT nation, MAX(n) AS n_customers,
       CAST(SUM(CASE WHEN rn <= (n + 9) // 10 THEN cents ELSE 0 END)
            AS BIGINT) AS top_decile_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       ROUND(CAST(SUM(CASE WHEN rn <= (n + 9) // 10 THEN cents
                           ELSE 0 END) AS DOUBLE)
             / CAST(SUM(cents) AS DOUBLE), 6) AS top_decile_share
FROM ranked GROUP BY nation
""",
)
def top_decile_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share of each nation's top-decile customers (decile
    size = ⌈n/10⌉, pure integer) — the concentration headline that
    pairs with ``gini_revenue_concentration``'s distribution-wide
    coefficient. One join + per-nation window + one rollup; ranking
    ties break by custkey so both engines pick the identical decile."""
    cust = Catalog(sf_dir).load(spark, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nation")
    )
    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("nation", "c_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_row_number,
    )

    ranked = grouped_row_number(
        rev,
        ["nation"],
        [F.col("cents").desc(), F.col("c_custkey").asc()],
        out_col="rn",
        count_col="n",
    )
    in_top = F.col("rn") <= F.floor((F.col("n") + 9) / 10)
    top_sum = F.sum(F.when(in_top, F.col("cents")).otherwise(0)).cast(
        "bigint"
    )
    return ranked.groupBy("nation").agg(
        F.max("n").alias("n_customers"),
        top_sum.alias("top_decile_cents"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.round(
            top_sum.cast("double") / F.sum("cents").cast("double"), 6
        ).alias("top_decile_share"),
    )


#: RFM quintile count (1 = best for each dimension).
RFM_Q = 5


@register(
    "customer_rfm_segments",
    oracle=f"""
WITH base AS (
    SELECT o_custkey,
           MAX(o_orderdate) AS last_order,
           COUNT(*) AS freq,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT o_custkey,
           (ROW_NUMBER() OVER (ORDER BY last_order DESC, o_custkey ASC)
            - 1) * {RFM_Q} // (COUNT(*) OVER ()) + 1 AS r_score,
           (ROW_NUMBER() OVER (ORDER BY freq DESC, o_custkey ASC)
            - 1) * {RFM_Q} // (COUNT(*) OVER ()) + 1 AS f_score,
           (ROW_NUMBER() OVER (ORDER BY monetary DESC, o_custkey ASC)
            - 1) * {RFM_Q} // (COUNT(*) OVER ()) + 1 AS m_score
    FROM base
)
SELECT r_score, f_score, m_score, COUNT(*) AS n_customers
FROM scored GROUP BY 1, 2, 3
""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency/frequency/monetary quintiles (1 =
    best) per customer, aggregated to segment-cell counts. Quintile =
    ⌊(rank−1)·{RFM_Q}/n⌋+1 over deterministic tie-broken orderings —
    the same integer equi-depth rule as ``equidepth_chars_histogram``,
    NOT ntile() (whose remainder-distribution rules differ subtly
    between engines). One scan to per-customer stats, three windows
    over the O(customers) frame, O({RFM_Q}³) output."""
    orders = Catalog(sf_dir).load(spark, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary"),
    )
    from asritha_metamorphetl_spark.operators.ranks import (
        _global_row_number_with_total,
        global_row_number,
    )

    # three scale-safe GLOBAL ranks (two-pass range partitioning — a
    # plain Window.orderBy would funnel every customer through one
    # task); each rank converts to its quintile by integer equi-depth.
    # base is pinned: it feeds the first rank walk AND (via the
    # machinery's partition-size pass) supplies n_cust — the old
    # spelling ran a separate count() that re-aggregated orders, so the
    # fact scan + groupBy ran twice (guide §1.2).
    base = base.localCheckpoint(eager=False)
    ranked1, n_cust = _global_row_number_with_total(
        base,
        [F.col("last_order").desc(), F.col("o_custkey").asc()],
        "_rn",
    )

    def quintile(col):
        return (
            F.floor((F.col(col) - 1) * RFM_Q / F.lit(n_cust)) + 1
        ).cast("bigint")

    def with_quintile(df, order_cols, out):
        ranked = global_row_number(df, order_cols, out_col="_rn")
        return ranked.withColumn(out, quintile("_rn")).drop("_rn")

    scored = ranked1.withColumn("r_score", quintile("_rn")).drop("_rn")
    scored = with_quintile(
        scored, [F.col("freq").desc(), F.col("o_custkey").asc()],
        "f_score",
    )
    scored = with_quintile(
        scored, [F.col("monetary").desc(), F.col("o_custkey").asc()],
        "m_score",
    ).select("o_custkey", "r_score", "f_score", "m_score")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "rollup_region_nation_revenue",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def rollup_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geographic ROLLUP (region → nation → grand total): the
    hierarchy spelling of multi-granularity aggregation — 3 levels
    from ONE scan/shuffle through Expand, with grouping-id separating
    a rolled-up level from a genuine NULL. The dimension joins
    broadcast (nation/region are tiny); the fact table never shuffles
    except for the single grouped exchange. Completes the lattice
    family: GROUPING SETS (explicit), CUBE (full), ROLLUP
    (hierarchical)."""
    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cust = cat.load(spark, "customer").select("c_custkey", "c_nationkey")
    nation = cat.load(spark, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    region = cat.load(spark, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    joined = (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey
        )
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
    )
    return (
        joined.rollup("region", "nation")
        .agg(
            (F.grouping("region") * 2 + F.grouping("nation")).alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .select("region", "nation", "gid", "n_orders", "revenue_cents")
    )


#: Co-purchase similarity knobs (shared with the oracle).
COPURCHASE_MIN_SUPPORT = 3
COPURCHASE_TOP = 50


@register(
    "copurchase_jaccard_parts",
    oracle=f"""
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
sizes AS (
    SELECT l_partkey, COUNT(*) AS n_orders FROM op GROUP BY l_partkey
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_common
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {COPURCHASE_MIN_SUPPORT}
),
scored AS (
    SELECT part_a, part_b, n_common,
           ROUND(CAST(n_common AS DOUBLE)
                 / CAST(sa.n_orders + sb.n_orders - n_common AS DOUBLE),
                 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.l_partkey = part_a
    JOIN sizes sb ON sb.l_partkey = part_b
)
SELECT part_a, part_b, n_common, jaccard, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY jaccard DESC, n_common DESC, part_a ASC, part_b ASC
    ) AS rnk
    FROM scored
) WHERE rnk <= {COPURCHASE_TOP}
""",
)
def copurchase_jaccard_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative similarity: Jaccard of order sets for
    part pairs co-purchased in ≥{COPURCHASE_MIN_SUPPORT} orders, top
    {COPURCHASE_TOP} — the co-occurrence kernel of a recommender.
    Pair generation is ORDER-LOCAL (self-join on the order key — each
    order contributes its own bounded pair set; baskets are ≤7 parts,
    so the blow-up is Σ basket² ≈ linear, the same shape as
    ``market_basket_rules``, never part×part). The final top-N is
    ``orderBy().limit()`` → TakeOrderedAndProject, so the scored-pair
    table (itself O(orders × basket²) at corpus scale) is never
    funnelled through one partition; only the {COPURCHASE_TOP}-row
    survivor frame sees a window. Plan-gated in test_round9_plans."""
    from asritha_metamorphetl_spark.plans.linalg_queries import (
        copurchase_pairs_weighted,
    )

    li = Catalog(sf_dir).load(spark, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sizes = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    # the (u < v, distinct-order count) pair table IS the shared
    # co-purchase materialization (basket-local expansion — identical
    # counts to the order-key self-join, proven by the oracle which
    # keeps the self-join spelling); only the support filter and the
    # Jaccard scoring are this query's own
    pairs = (
        copurchase_pairs_weighted(spark, sf_dir)
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.col("w").alias("n_common"),
        )
        .filter(F.col("n_common") >= COPURCHASE_MIN_SUPPORT)
    )
    sa = sizes.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("na")
    )
    sb = sizes.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("nb")
    )
    scored = (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    # Scored pairs are O(orders × basket²) — billions of rows at
    # 100 TB — so the global top-N must NOT be a global window.
    # orderBy().limit() compiles to TakeOrderedAndProject
    # (per-partition top-N + driver merge of 32×N rows); the
    # tie-break chain is total so the result is hash-identical. Only
    # the 50-row survivor frame gets the trivial rank window.
    order_keys = [
        F.col("jaccard").desc(),
        F.col("n_common").desc(),
        F.col("part_a").asc(),
        F.col("part_b").asc(),
    ]
    top = scored.orderBy(*order_keys).limit(COPURCHASE_TOP)
    w = Window.orderBy(*order_keys)
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("part_a", "part_b", "n_common", "jaccard", "rnk")
    )


@register(
    "orderkey_islands",
    oracle="""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
marked AS (
    SELECT k, k - ROW_NUMBER() OVER (ORDER BY k ASC) AS grp
    FROM keys
),
islands AS (
    SELECT grp, MIN(k) AS island_start, MAX(k) AS island_end,
           COUNT(*) AS island_len
    FROM marked GROUP BY grp
)
SELECT COUNT(*) AS n_islands,
       CAST(SUM(island_len) AS BIGINT) AS n_keys,
       MIN(island_start) AS min_key, MAX(island_end) AS max_key,
       MAX(island_end) - MIN(island_start) + 1
           - CAST(SUM(island_len) AS BIGINT) AS n_missing,
       MAX(island_len) AS longest_island
FROM islands
""",
)
def orderkey_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-space continuity audit via the classic gaps-and-islands
    idiom: consecutive key runs share ``k − row_number(k)``, so one
    window pass + one rollup yields island count, covered keys, and
    the missing-key total — the completeness check an ingestion
    pipeline runs against a supposedly-dense surrogate key (a gap
    burst = a lost extract). The global window here is the bounded
    spelling for a single series; at 100 TB the same idiom runs
    per-partition-key (partitionBy) exactly like the per-group ranks
    elsewhere in this repo."""
    orders = Catalog(sf_dir).load(spark, "orders")
    from asritha_metamorphetl_spark.operators.ranks import (
        global_row_number,
    )

    keys = orders.select(F.col("o_orderkey").alias("k")).distinct()
    # scale-safe global rank (two-pass range partitioning) — the gaps
    # arithmetic only needs SOME total rank, and at 100 TB the key set
    # is billions of rows no single task should sort
    marked = global_row_number(
        keys, [F.col("k").asc()], out_col="_rn"
    ).select("k", (F.col("k") - F.col("_rn")).alias("grp"))
    islands = marked.groupBy("grp").agg(
        F.min("k").alias("island_start"),
        F.max("k").alias("island_end"),
        F.count(F.lit(1)).alias("island_len"),
    )
    return islands.agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("island_len").cast("bigint").alias("n_keys"),
        F.min("island_start").alias("min_key"),
        F.max("island_end").alias("max_key"),
        (
            F.max("island_end")
            - F.min("island_start")
            + 1
            - F.sum("island_len").cast("bigint")
        ).alias("n_missing"),
        F.max("island_len").alias("longest_island"),
    )


@register(
    "incremental_agg_view",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders GROUP BY o_custkey
""",
)
def incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an AGGREGATE view: orders split into
    a materialized OLD part and an arriving DELTA (deterministic hash
    split), the delta is aggregated ALONE, and the refreshed view is
    the per-key MERGE of old and delta partials (counts add, sums add)
    — proved row-identical to the full recompute by the split-agnostic
    oracle. Completes the IVM story next to ``incremental_join_view``:
    for distributive aggregates the refresh cost is O(delta) + an
    O(affected keys) merge, never a fact-table rescan — at 100 TB the
    difference between seconds and hours per refresh cycle."""
    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    split = F.col("o_orderkey") % 10
    old = orders.filter(split <= 7)
    delta = orders.filter(split >= 8)

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )

    v_old = agg(old)  # the stored view (never recomputed at refresh)
    v_delta = agg(delta)
    merged = (
        v_old.unionByName(v_delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
    )
    return merged
