"""Time-series, OLAP-cube, and market-basket analytics queries.

Three analytics shapes a warehouse user of the reference would reach for
that the registry didn't yet evidence first-class:

- ``ewma_daily_orders`` — exponentially-weighted moving average over a
  per-group daily series. EWMA is recursively defined (state_t depends
  on state_{t-1}), which naively forces a sequential scan; the
  distributed spelling here truncates the weight tail (2^-j decays below
  any practical signal after 16 steps) and becomes a BANDED self-join —
  re-expressed as an equi-join through ``bucketed_range_join`` so there
  is no per-key quadratic pairing and no theta-join nested loop.
- ``revenue_grouping_sets`` — multi-granularity aggregates via
  ``GROUPING SETS`` + ``GROUPING()``: ONE shuffle feeding every
  granularity through Spark's Expand operator, where four separate
  GROUP BYs would scan and shuffle the fact table four times.
- ``market_basket_rules`` — association rules (support / confidence /
  lift). Pair generation is ORDER-LOCAL: one groupBy collects each
  order's bounded part set, a higher-order function expands the pairs
  map-side — the same local-pair-expansion shape as the triangle
  counter, never a lineitem×lineitem self-join shuffle.

Cross-engine float discipline: every ranking or emitted float is either
exact integer arithmetic until a single final division (EWMA uses
power-of-two integer weights; confidence/lift divide exact bigint
products) or rounded at the same decimals in both engines.

Reference scope: the reference has no time-series, cube, or basket
surface; these extend the analytics envelope the build brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.temporal import ewma_banded
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: EWMA truncation window: weights are 2^-j for lag j in [0, 16);
#: beyond 16 steps a half-life decay contributes < 0.002% — below the
#: 6-decimal rounding floor. Integer weights shiftleft(1, 15-j) keep
#: the whole numerator/denominator EXACT bigints; the one final double
#: division is IEEE-deterministic in both engines.
EWMA_W = 16
EWMA_DECIMALS = 6

#: Market-basket knobs (shared with the SQL oracle verbatim).
BASKET_MIN_SUPPORT = 2
BASKET_TOPN = 100
BASKET_DECIMALS = 6


# ---------------------------------------------------------------------------
# EWMA over a per-group daily series (banded self-join, no theta-join)
# ---------------------------------------------------------------------------


@register(
    "ewma_daily_orders",
    oracle=f"""
WITH daily AS (
    SELECT o_orderpriority, o_orderdate AS order_day,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1, 2
),
spine AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority ORDER BY order_day) AS rn
    FROM daily
)
SELECT p.o_orderpriority, p.order_day, p.n_orders,
       ROUND(
           CAST(SUM(c.n_orders * (CAST(1 AS BIGINT)
                << CAST({EWMA_W - 1} - (p.rn - c.rn) AS INT))) AS DOUBLE)
           / CAST(SUM(CAST(1 AS BIGINT)
                << CAST({EWMA_W - 1} - (p.rn - c.rn) AS INT)) AS DOUBLE),
           {EWMA_DECIMALS}) AS ewma
FROM spine p
JOIN spine c
  ON c.o_orderpriority = p.o_orderpriority
 AND c.rn BETWEEN p.rn - {EWMA_W - 1} AND p.rn
GROUP BY 1, 2, 3
""",
)
def ewma_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life EWMA of daily order volume per order priority.

    The spine is the per-(priority, day) count — its cardinality is
    bounded by the CALENDAR (≈2.4k days × 5 priorities at every SF), not
    by data volume, so the row_number window partitions are inherently
    bounded. The recursive EWMA is truncated at ``EWMA_W`` lags and the
    contributor band becomes an interval: contributor rn ∈
    (point rn − W, point rn], handed to ``bucketed_range_join`` — an
    EQUI-join on (priority, rn-bucket) with the exact band as a
    post-filter, so Catalyst never falls back to a BroadcastNestedLoop
    theta-join and the pairing cost is W rows per point, linear overall.

    Weights are integer ``shiftleft(1, 15−lag)`` — numerator and
    denominator stay exact bigints under ANY summation order, making the
    value hash engine-independent by construction rather than by rounding
    luck; only the final ratio is a (deterministic) double division."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.col("o_orderdate").alias("order_day")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return ewma_banded(
        daily,
        keys=["o_orderpriority"],
        order_col="order_day",
        value_col="n_orders",
        window=EWMA_W,
        decimals=EWMA_DECIMALS,
    )


# ---------------------------------------------------------------------------
# GROUPING SETS: every granularity from one shuffle (Expand)
# ---------------------------------------------------------------------------

#: The decimal money product is hoisted into a pre-projection BELOW the
#: grouping sets: Expand replicates each input row once per set (4x),
#: and aggregate expressions evaluate after Expand — an inline product
#: would run the decimal multiply 4x per source row. Same arithmetic,
#: same hash, one multiply.
_GROUPING_SETS_SQL = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
    CAST(GROUPING(l_linestatus) AS INT) AS g_status,
    CAST(SUM(rev_d) AS DOUBLE) AS revenue,
    CAST(SUM(qty_d) AS DOUBLE) AS sum_qty,
    COUNT(*) AS n_lines
FROM (
    SELECT l_returnflag, l_linestatus,
           CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev_d,
           CAST(l_quantity AS DECIMAL(18,2)) AS qty_d
    FROM lineitem
)
GROUP BY GROUPING SETS (
    (l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ()
)
"""


@register("revenue_grouping_sets", oracle=_GROUPING_SETS_SQL)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four aggregation granularities — (flag, status), each alone, and
    the grand total — in ONE pass via ``GROUP BY GROUPING SETS``.

    At 100 TB the naive spelling is four GROUP BY queries = four fact
    scans and four shuffles; GROUPING SETS feeds Spark's Expand operator
    (each input row fans out once per set, tagged with its grouping id)
    into a single hash aggregate — one scan, one shuffle, and the
    partial-aggregate combine still applies per set. ``GROUPING()``
    columns disambiguate "NULL because subtotal" from "NULL in data",
    exactly as the SQL standard intends.

    Money stays in DECIMAL through the sum (exact, order-independent —
    the same discipline as ``sql_api_revenue_by_region``) and converts
    to DOUBLE only at the edge, so the value hash cannot wobble with
    summation order in either engine."""
    Catalog(sf_dir).register_views(spark, tables=["lineitem"])
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# Market-basket association rules (order-local pair expansion)
# ---------------------------------------------------------------------------


@register(
    "market_basket_rules",
    oracle=f"""
WITH op AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
pairs AS (
    SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_ab
    FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
),
items AS (SELECT p, COUNT(*) AS n FROM op GROUP BY 1),
tot AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
dir AS (
    SELECT pa AS antecedent, pb AS consequent, n_ab FROM pairs
    UNION ALL
    SELECT pb AS antecedent, pa AS consequent, n_ab FROM pairs
),
rules AS (
    SELECT d.antecedent, d.consequent, d.n_ab AS support_n,
           ROUND(CAST(d.n_ab AS DOUBLE) / CAST(ia.n AS DOUBLE),
                 {BASKET_DECIMALS}) AS confidence,
           ROUND(CAST(d.n_ab * t.n_orders AS DOUBLE)
                 / CAST(ia.n * ic.n AS DOUBLE),
                 {BASKET_DECIMALS}) AS lift
    FROM dir d
    JOIN items ia ON ia.p = d.antecedent
    JOIN items ic ON ic.p = d.consequent
    CROSS JOIN tot t
    WHERE d.n_ab >= {BASKET_MIN_SUPPORT}
)
SELECT antecedent, consequent, support_n, confidence, lift,
       CAST(rnk AS INT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY lift DESC, confidence DESC, antecedent, consequent) AS rnk
    FROM rules
)
WHERE rnk <= {BASKET_TOPN}
""",
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top association rules over parts co-ordered in the same order:
    support (co-order count), confidence P(consequent|antecedent), and
    lift vs independence.

    Pair generation never self-joins the fact table: one groupBy
    collects each order's DISTINCT part set (bounded — TPC-H orders
    carry ≤ 7 lines; real baskets are similarly capped), and a
    higher-order ``transform``/``slice`` lambda expands the i<j pairs
    map-side inside the aggregated row — the local-pair-expansion shape
    the triangle counter uses, O(Σ basket²) work with basket a small
    constant, vs the shuffle-amplified op×op equi-join the oracle is
    free to use at sf0.01. Confidence and lift divide exact bigint
    products once, then round — engine-independent doubles.

    The final top-N is a single bounded TakeOrdered (rank by rounded
    lift with full key tiebreaks, so the cut is deterministic)."""
    from asritha_metamorphetl_spark.plans.linalg_queries import (
        copurchase_pairs_weighted,
    )

    li = Catalog(sf_dir).load(spark, "lineitem")
    # op feeds TWO consumers (item counts, order total); a lazy
    # localCheckpoint shares one scan+distinct instead of paying the
    # corpus scan twice — the bm25 single-scan lesson.
    op = (
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # the per-pair distinct-order count IS the shared co-purchase
    # materialization (same basket-local expansion this query used to
    # run inline); only the support filter onward is query-specific
    pairs = (
        copurchase_pairs_weighted(spark, sf_dir)
        .select(
            F.col("u").alias("pa"),
            F.col("v").alias("pb"),
            F.col("w").alias("n_ab"),
        )
        .filter(F.col("n_ab") >= BASKET_MIN_SUPPORT)
    )
    items = op.groupBy(F.col("p")).agg(F.count(F.lit(1)).alias("n"))
    tot = op.agg(F.countDistinct("o").alias("n_orders"))
    direct = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "n_ab",
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "n_ab",
        )
    )
    ia = items.select(F.col("p").alias("antecedent"), F.col("n").alias("n_a"))
    ic = items.select(F.col("p").alias("consequent"), F.col("n").alias("n_c"))
    rules = (
        direct.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(tot))
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").alias("support_n"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_a").cast("double"),
                BASKET_DECIMALS,
            ).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_c")).cast("double"),
                BASKET_DECIMALS,
            ).alias("lift"),
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject — each task keeps a
    # local top-N heap and only N rows ever single-partition, vs a global
    # row_number window that funnels EVERY surviving rule through one
    # task. The rank is then re-derived over the bounded N-row result.
    top = rules.orderBy(
        F.col("lift").desc(),
        F.col("confidence").desc(),
        "antecedent",
        "consequent",
    ).limit(BASKET_TOPN)
    wr = Window.orderBy(
        F.col("lift").desc(),
        F.col("confidence").desc(),
        "antecedent",
        "consequent",
    )
    return top.select(
        "antecedent",
        "consequent",
        "support_n",
        "confidence",
        "lift",
        F.row_number().over(wr).cast("int").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# BPE merge learning: the iterative tokenizer-training loop, unrolled
# ---------------------------------------------------------------------------

#: Merge steps learned (and unrolled in the oracle).
BPE_STEPS = 3

_BPE_WORDS_CTE = """
words AS (
    SELECT token AS w, COUNT(*) AS freq FROM (
        SELECT UNNEST(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
        FROM documents
    ) WHERE regexp_full_match(token, '[a-z]+')
    GROUP BY token
),
seqs1 AS (
    SELECT freq,
           '||' || array_to_string(regexp_extract_all(w, '.'), '||') || '||'
               AS seq
    FROM words
)"""


def _bpe_step_ctes(i: int) -> str:
    top = f"(SELECT pair FROM top{i})"
    return f""",
pairs{i} AS (
    SELECT pair, SUM(freq) AS cnt FROM (
        SELECT freq,
               UNNEST(list_transform(range(1, len(syms)),
                      j -> syms[j] || ' ' || syms[j + 1])) AS pair
        FROM (
            SELECT freq,
                   list_filter(string_split(seq, '||'), x -> x <> '') AS syms
            FROM seqs{i}
        )
        WHERE len(syms) >= 2
    ) GROUP BY pair
),
top{i} AS (SELECT pair, cnt FROM pairs{i} ORDER BY cnt DESC, pair LIMIT 1),
seqs{i + 1} AS (
    SELECT freq,
           replace(seq,
                   '|' || split_part({top}, ' ', 1)
                       || '||' || split_part({top}, ' ', 2) || '|',
                   '|' || replace({top}, ' ', '') || '|') AS seq
    FROM seqs{i}
)"""


def _bpe_oracle() -> str:
    ctes = _BPE_WORDS_CTE + "".join(
        _bpe_step_ctes(i) for i in range(1, BPE_STEPS + 1)
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, (SELECT pair FROM top{i}) AS merged_pair,"
        f" CAST((SELECT cnt FROM top{i}) AS BIGINT) AS pair_count"
        for i in range(1, BPE_STEPS + 1)
    )
    return f"WITH {ctes}\n{rows}"


@register("bpe_merge_steps", oracle=_bpe_oracle())
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first ``BPE_STEPS`` byte-pair-encoding merges over the
    corpus vocabulary (Sennrich et al. 2016) — the iterative half of
    tokenizer training that ``bpe_token_stats`` (the fixed pre-tokenizer
    cost estimate) deliberately leaves out.

    Scale shape: the corpus collapses ONCE into a word-frequency table
    (Zipf-bounded), and every iteration touches only that table — a
    row-local adjacent-pair expansion, one SUM aggregate, a
    TakeOrdered(1) argmax (count desc, pair asc: deterministic and
    SQL-replayable), then a map-side string ``replace`` in the canonical
    ``||``-delimited sequence encoding whose leftmost-non-overlapping
    semantics are identical in both engines (see
    ``operators/lm.bpe_initial_sequences``). One (pair, count) row
    drives each step through the driver, exactly like the k-means and
    PCA decision points. The DuckDB oracle unrolls the same three
    iterations as chained CTEs."""
    from asritha_metamorphetl_spark.functions.text import tokens
    from asritha_metamorphetl_spark.operators.lm import bpe_learn_merges

    docs = Catalog(sf_dir).load(spark, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = bpe_learn_merges(words, steps=BPE_STEPS)
    return spark.createDataFrame(
        merges, "step int, merged_pair string, pair_count long"
    )


# ---------------------------------------------------------------------------
# EWMA-residual anomaly flags (forecast from PRIOR days only)
# ---------------------------------------------------------------------------


@register(
    "order_volume_anomalies",
    oracle=f"""
WITH daily AS (
    SELECT o_orderpriority, o_orderdate AS order_day,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1, 2
),
spine AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority ORDER BY order_day) AS rn
    FROM daily
)
SELECT p.o_orderpriority, p.order_day, p.n_orders,
       ROUND(CAST(SUM(c.n_orders * (CAST(1 AS BIGINT)
                 << CAST({EWMA_W} - (p.rn - c.rn) AS INT))) AS DOUBLE)
             / CAST(SUM(CAST(1 AS BIGINT)
                 << CAST({EWMA_W} - (p.rn - c.rn) AS INT)) AS DOUBLE),
             {EWMA_DECIMALS}) AS ewma_prev,
       2 * ABS(p.n_orders * SUM(CAST(1 AS BIGINT)
                   << CAST({EWMA_W} - (p.rn - c.rn) AS INT))
               - SUM(c.n_orders * (CAST(1 AS BIGINT)
                   << CAST({EWMA_W} - (p.rn - c.rn) AS INT))))
           > SUM(c.n_orders * (CAST(1 AS BIGINT)
                   << CAST({EWMA_W} - (p.rn - c.rn) AS INT))) AS is_spike
FROM spine p
JOIN spine c
  ON c.o_orderpriority = p.o_orderpriority
 AND c.rn BETWEEN p.rn - {EWMA_W} AND p.rn - 1
GROUP BY p.o_orderpriority, p.order_day, p.n_orders
""",
)
def order_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-spike detection against an EWMA forecast built from PRIOR
    days only: a day is flagged when it deviates more than 50% from the
    half-life-weighted history (|x − ewma_prev| > ewma_prev/2).

    The anomaly DECISION never touches a float: with integer
    power-of-two weights the comparison cross-multiplies to
    ``2·|x·Σw − Σwx| > Σwx`` — exact bigints, so the boolean cannot
    wobble across engines no matter the summation order. The band is
    the same ``bucketed_range_join`` equi-join as ``ewma_daily_orders``
    shifted to exclude the current day (contributor lag ∈ [1, W]);
    each priority's first day has no history and is absent by inner-join
    semantics in both engines. ``ewma_prev`` is surfaced (rounded) for
    report context only."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.col("o_orderdate").alias("order_day")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.partitionBy("o_orderpriority").orderBy("order_day")
    spine = daily.withColumn("rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    points = spine.select(
        "o_orderpriority",
        "order_day",
        "n_orders",
        F.col("rn").alias("rn_p"),
    )
    contrib = spine.select(
        "o_orderpriority",
        F.col("n_orders").alias("x_c"),
        F.col("rn").alias("rn_c"),
        (F.col("rn") + F.lit(1)).alias("rn_start"),
        (F.col("rn") + F.lit(EWMA_W + 1)).alias("rn_end"),
    )
    from asritha_metamorphetl_spark.operators.ranges import (
        bucketed_range_join,
    )

    banded = bucketed_range_join(
        points,
        contrib,
        on=["o_orderpriority"],
        point_col="rn_p",
        start_col="rn_start",
        end_col="rn_end",
        bucket_width=EWMA_W,
    )
    wint = F.expr(
        f"shiftleft(1L, CAST({EWMA_W} - (rn_p - rn_c) AS INT))"
    )
    agg = banded.groupBy("o_orderpriority", "order_day", "n_orders").agg(
        F.sum(F.col("x_c") * wint).alias("_num"),
        F.sum(wint).alias("_den"),
    )
    return agg.select(
        "o_orderpriority",
        "order_day",
        "n_orders",
        F.round(
            F.col("_num").cast("double") / F.col("_den").cast("double"),
            EWMA_DECIMALS,
        ).alias("ewma_prev"),
        (
            2 * F.abs(F.col("n_orders") * F.col("_den") - F.col("_num"))
            > F.col("_num")
        ).alias("is_spike"),
    )
