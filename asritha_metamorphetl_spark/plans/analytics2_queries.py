"""Analytics second wave (post-window, seeded for the round-10
rotation): scale-safe cume_dist, weighted medians, MAD, join-key skew
audits, blocked fuzzy matching, session affinity, year-over-year
decile transitions, and equi-width histograms.

Shared disciplines from the rest of the plan surface: exact integer
arithmetic up to final mirrored doubles; global order statistics
through the two-pass machinery (``operators/ranks``); pairwise work
blocked (length buckets, session-local expansion); per-group windows
only over bounded groups.

Reference scope: the reference's analytics stop at mart aggregates;
these are the profiling and robust-statistics queries a warehouse team
runs on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: Equi-width histogram bin count.
EQW_BINS = 20

#: Years compared by the decile transition matrix.
DECILE_YEAR_A = 1996
DECILE_YEAR_B = 1997

_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@register(
    "cume_dist_scalable",
    oracle=f"""
WITH counts AS (
    SELECT {_CENTS} AS cents, COUNT(*) AS n FROM orders GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT cents, n,
       ROUND(CAST(SUM(n) OVER (ORDER BY cents ASC) AS DOUBLE)
             / CAST((SELECT total FROM tot) AS DOUBLE), 6) AS cume_dist
FROM counts
""",
)
def cume_dist_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``CUME_DIST()`` without the whole-frame window: cume_dist
    is a function of the VALUE alone (rows ≤ v / N), so it collapses
    to the per-value count table walked by the two-pass
    ``global_cumsum`` — the same argument ``global_percent_rank`` makes
    for percent_rank, extended to the cumulative-distribution spelling.
    The oracle's ``SUM() OVER (ORDER BY ...)`` is exactly the
    single-partition plan this query must not produce; output is one
    row per distinct value with its exact empirical CDF position."""
    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    counts = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
                "cents"
            )
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cum, total = global_cumsum_with_total(
        counts, [F.col("cents").asc()], "n", out_col="cum"
    )
    return cum.select(
        "cents",
        "n",
        F.round(
            F.col("cum").cast("double") / F.lit(float(total)), 6
        ).alias("cume_dist"),
    )


@register(
    "weighted_median_price",
    oracle="""
WITH enc AS (
    SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(l_quantity AS BIGINT) AS w
    FROM lineitem
),
counts AS (
    SELECT cents, CAST(SUM(w) AS BIGINT) AS w FROM enc GROUP BY cents
),
cum AS (
    SELECT cents, SUM(w) OVER (ORDER BY cents ASC) AS cum,
           (SELECT CAST(SUM(w) AS BIGINT) FROM counts) AS tw
    FROM counts
)
SELECT MAX(tw) AS total_weight,
       MIN(CASE WHEN cum >= (tw + 1) // 2 THEN cents END) AS wmedian_lo,
       MIN(CASE WHEN cum >= (tw + 2) // 2 THEN cents END) AS wmedian_hi,
       ROUND((CAST(MIN(CASE WHEN cum >= (tw + 1) // 2 THEN cents END)
                   AS DOUBLE)
              + CAST(MIN(CASE WHEN cum >= (tw + 2) // 2 THEN cents END)
                     AS DOUBLE)) / 2, 1) AS wmedian_cents
FROM cum
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-weighted median unit price — "the price the median
    shipped unit paid", which an unweighted median misstates whenever
    cheap items ship in bulk. The weighted CDF is the two-pass
    ``global_cumsum`` over per-value WEIGHT sums (the machinery's
    sum_col is a genuine weight here, not a count); the median is the
    least value whose cumulative weight reaches ⌈W/2⌉, averaged with
    the ⌊W/2⌋+1 rank for the even case — integer-exact to the final
    halving."""
    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )

    li = Catalog(sf_dir).load(spark, "lineitem")
    counts = (
        li.select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("cents")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    cum, tw = global_cumsum_with_total(
        counts, [F.col("cents").asc()], "w", out_col="cum"
    )
    r_lo = (int(tw) + 1) // 2
    r_hi = (int(tw) + 2) // 2
    lo = F.min(F.when(F.col("cum") >= r_lo, F.col("cents")))
    hi = F.min(F.when(F.col("cum") >= r_hi, F.col("cents")))
    return cum.agg(
        F.lit(int(tw)).cast("bigint").alias("total_weight"),
        lo.alias("wmedian_lo"),
        hi.alias("wmedian_hi"),
        F.round((lo.cast("double") + hi.cast("double")) / 2, 1).alias(
            "wmedian_cents"
        ),
    )


@register(
    "order_value_mad",
    oracle=f"""
WITH enc AS (SELECT {_CENTS} AS cents FROM orders),
counts AS (SELECT cents, COUNT(*) AS c FROM enc GROUP BY cents),
cum AS (
    SELECT cents, SUM(c) OVER (ORDER BY cents ASC) AS cum,
           (SELECT COUNT(*) FROM enc) AS n
    FROM counts
),
med AS (
    SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END) AS m,
           MAX(n) AS n
    FROM cum
),
dev AS (
    SELECT ABS(cents - (SELECT m FROM med)) AS d FROM enc
),
dcounts AS (SELECT d, COUNT(*) AS c FROM dev GROUP BY d),
dcum AS (
    SELECT d, SUM(c) OVER (ORDER BY d ASC) AS cum,
           (SELECT n FROM med) AS n
    FROM dcounts
)
SELECT (SELECT n FROM med) AS n_orders,
       (SELECT m FROM med) AS median_cents,
       MIN(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS mad_cents
FROM dcum
""",
)
def order_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of order value — the robust scale
    estimate (50% of orders sit within ±MAD of the median; one whale
    order cannot move it, unlike the σ in every z-score). TWO chained
    two-pass cumulative passes: the median from the first, deviations
    re-counted and the MAD from the second; the only driver fetch is
    the 1-row median scalar (bounded by construction). This is the
    composition test for ``global_cumsum`` — order statistics OF order
    statistics, still with no single-partition pass."""
    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    enc = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    ).localCheckpoint(eager=False)
    counts = enc.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    cum, n = global_cumsum_with_total(
        counts, [F.col("cents").asc()], "c", out_col="cum"
    )
    r = (int(n) + 1) // 2
    med = (
        cum.filter(F.col("cum") >= r)
        .agg(F.min("cents").alias("m"))
        .collect()[0]["m"]
    )
    dev = enc.select(F.abs(F.col("cents") - int(med)).alias("d"))
    dcounts = dev.groupBy("d").agg(F.count(F.lit(1)).alias("c"))
    dcum, _ = global_cumsum_with_total(
        dcounts, [F.col("d").asc()], "c", out_col="cum"
    )
    return dcum.filter(F.col("cum") >= r).agg(
        F.lit(int(n)).cast("bigint").alias("n_orders"),
        F.lit(int(med)).cast("bigint").alias("median_cents"),
        F.min("d").alias("mad_cents"),
    )


#: (audit name, table, key sql/col)
_SKEW_KEYS = (
    ("orders_custkey", "orders", "o_custkey"),
    ("lineitem_orderkey", "lineitem", "l_orderkey"),
    ("lineitem_partkey", "lineitem", "l_partkey"),
    ("events_user_id", "events", "user_id"),
)


def _skew_oracle() -> str:
    rows = []
    for name, table, key in _SKEW_KEYS:
        rows.append(f"""
SELECT '{name}' AS key_name, n_rows, n_keys, max_rows,
       ROUND(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE), 6)
           AS mean_rows,
       ROUND(CAST(max_rows AS DOUBLE)
             / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 6)
           AS skew_factor
FROM (
    SELECT CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_rows
    FROM (SELECT {key}, COUNT(*) AS c FROM {table} GROUP BY {key})
)""")
    return "\nUNION ALL\n".join(rows)


@register("join_key_skew_audit", oracle=_skew_oracle())
def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit for the joins this engine actually runs:
    per key, the heaviest key's row count against the mean
    (skew_factor = max/mean). This is the table that DECIDES salting —
    a factor near 1 means hash partitioning balances; a factor of
    thousands means the hot key serializes one task and
    ``operators/skew``'s salted spelling is warranted. One
    map-side-combining count per key column, then a 1-row rollup; the
    audit itself never shuffles more than the per-key count table."""
    cat = Catalog(sf_dir)
    out = None
    for name, table, key in _SKEW_KEYS:
        per = cat.load(spark, table).groupBy(key).agg(
            F.count(F.lit(1)).alias("c")
        )
        mean = F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
        row = per.agg(
            F.lit(name).alias("key_name"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").cast("bigint").alias("max_rows"),
            F.round(mean, 6).alias("mean_rows"),
            F.round(F.max("c").cast("double") / mean, 6).alias(
                "skew_factor"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "fuzzy_part_name_pairs",
    oracle="""
WITH names AS (SELECT DISTINCT p_name AS nm FROM part),
blocked AS (
    SELECT a.nm AS nm_a, b.nm AS nm_b,
           levenshtein(a.nm, b.nm) AS lev
    FROM names a JOIN names b
      ON length(a.nm) = length(b.nm) AND a.nm < b.nm
)
SELECT lev, COUNT(*) AS n_pairs
FROM blocked WHERE lev <= 2
GROUP BY lev
""",
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-distance pairing of part names: distinct names block on
    LENGTH (equi-join — a name and its ≤2-edit neighbor rarely differ
    in length by more, and the blocking key is free), then exact
    Levenshtein ≤ 2 inside each block — the classic
    blocked-edit-distance shape of product-catalog reconciliation.
    Both engines implement standard edit distance, so the distance
    histogram hash-matches. At catalog scale the block join replaces
    the all-pairs product exactly like the LSH bands replace all-pairs
    Jaccard (a production matcher adds a same-prefix block for recall
    on substitutions near the head — same machinery, more keys)."""
    part = Catalog(sf_dir).load(spark, "part")
    names = part.select(F.col("p_name").alias("nm")).distinct()
    a = names.select(
        F.col("nm").alias("nm_a"), F.length("nm").alias("len")
    )
    b = names.select(
        F.col("nm").alias("nm_b"), F.length("nm").alias("len")
    )
    blocked = (
        a.join(b, "len")
        .filter(F.col("nm_a") < F.col("nm_b"))
        .select(F.levenshtein("nm_a", "nm_b").alias("lev"))
        .filter(F.col("lev") <= 2)
    )
    return blocked.groupBy("lev").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "session_type_affinity",
    oracle="""
WITH marked AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN LAG(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                        > CAST(30 AS BIGINT) * 60 * 1000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
    SELECT user_id, event_type,
           SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sid
    FROM marked
),
st AS (SELECT DISTINCT user_id, sid, event_type FROM sess),
n_sess AS (SELECT COUNT(DISTINCT (user_id, sid)) AS ns FROM sess),
singles AS (
    SELECT event_type, COUNT(*) AS n FROM st GROUP BY event_type
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both
    FROM st a JOIN st b
      ON a.user_id = b.user_id AND a.sid = b.sid
     AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b, n_both,
       ROUND((CAST(n_both AS DOUBLE) * CAST(ns AS DOUBLE))
             / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)), 6)
           AS lift
FROM pairs
JOIN singles sa ON sa.event_type = type_a
JOIN singles sb ON sb.event_type = type_b
CROSS JOIN n_sess
""",
)
def session_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types co-occur within the same 30-minute session,
    scored as lift — P(a,b together) / (P(a)·P(b)) — the market-basket
    analysis of behavior (``market_basket_rules`` over sessions
    instead of orders). Session ids come from per-user
    gaps-and-islands windows; pair expansion is SESSION-LOCAL (the
    self-join keys on (user, session) — bounded by the distinct types
    a session touches, ≤5 here, never type×type across the corpus);
    lift's numerator and denominators are exact counts with one final
    mirrored double expression."""
    from pyspark.sql import Window

    events = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = 30 * 60 * 1000000
    prev = F.unix_micros(F.lag("ts").over(w))
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            prev.isNull()
            | (F.unix_micros(F.col("ts")) - prev > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    st = sess.select("user_id", "sid", "event_type").distinct()
    st = st.localCheckpoint(eager=False)
    ns = sess.select("user_id", "sid").distinct().count()
    singles = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = st.select(
        "user_id", "sid", F.col("event_type").alias("type_a")
    )
    b = st.select(
        "user_id", "sid", F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(b, ["user_id", "sid"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                (F.col("n_both").cast("double") * F.lit(float(ns)))
                / (F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "customer_decile_transitions",
    oracle=f"""
WITH rev AS (
    SELECT o_custkey, EXTRACT(year FROM o_orderdate) AS yr,
           CAST(SUM({_CENTS}) AS BIGINT) AS cents
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate)
          IN ({DECILE_YEAR_A}, {DECILE_YEAR_B})
    GROUP BY 1, 2
),
ranked AS (
    SELECT o_custkey, yr,
           ROW_NUMBER() OVER (
               PARTITION BY yr ORDER BY cents DESC, o_custkey ASC
           ) AS rn,
           COUNT(*) OVER (PARTITION BY yr) AS n
    FROM rev
),
deciled AS (
    SELECT o_custkey, yr, (rn - 1) * 10 // n + 1 AS dec
    FROM ranked
)
SELECT a.dec AS decile_{DECILE_YEAR_A}, b.dec AS decile_{DECILE_YEAR_B},
       COUNT(*) AS n_customers
FROM deciled a JOIN deciled b
  ON a.o_custkey = b.o_custkey
 AND a.yr = {DECILE_YEAR_A} AND b.yr = {DECILE_YEAR_B}
GROUP BY 1, 2
""",
)
def customer_decile_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue-decile migration matrix {DECILE_YEAR_A}→{DECILE_YEAR_B}:
    for customers active in both years, which decile they moved to —
    the churn-risk heatmap (mass below the diagonal = a cohort sliding
    downmarket). Per-year deciles come from the grouped two-pass rank
    (``grouped_row_number`` with the year as the bounded group — the
    oracle's per-year window is the single-task-per-year spelling this
    avoids); the transition join is a self-equi-join on customer over
    the O(customers) decile frame."""
    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_row_number,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    rev = (
        orders.filter(
            F.year("o_orderdate").isin(DECILE_YEAR_A, DECILE_YEAR_B)
        )
        .groupBy(
            "o_custkey", F.year("o_orderdate").alias("yr")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    ranked = grouped_row_number(
        rev,
        ["yr"],
        [F.col("cents").desc(), F.col("o_custkey").asc()],
        out_col="rn",
        count_col="n",
    )
    deciled = ranked.select(
        "o_custkey",
        "yr",
        (F.floor((F.col("rn") - 1) * 10 / F.col("n")) + 1).alias("dec"),
    )
    a = deciled.filter(F.col("yr") == DECILE_YEAR_A).select(
        "o_custkey", F.col("dec").alias(f"decile_{DECILE_YEAR_A}")
    )
    b = deciled.filter(F.col("yr") == DECILE_YEAR_B).select(
        "o_custkey", F.col("dec").alias(f"decile_{DECILE_YEAR_B}")
    )
    return (
        a.join(b, "o_custkey")
        .groupBy(f"decile_{DECILE_YEAR_A}", f"decile_{DECILE_YEAR_B}")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "price_equiwidth_histogram",
    oracle=f"""
WITH enc AS (SELECT {_CENTS} AS cents FROM orders),
bounds AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM enc),
binned AS (
    SELECT LEAST((cents - b.lo) * {EQW_BINS} // (b.hi - b.lo + 1),
                 {EQW_BINS} - 1) AS bin
    FROM enc CROSS JOIN bounds b
),
tot AS (SELECT COUNT(*) AS n FROM binned)
SELECT bin, COUNT(*) AS n_orders,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST((SELECT n FROM tot) AS DOUBLE), 6) AS share
FROM binned GROUP BY bin
""",
)
def price_equiwidth_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """{EQW_BINS}-bin equi-width histogram of order value — the
    at-a-glance shape check (multimodality, truncation, a generator's
    hard cap all show here first), complementing the equi-DEPTH decile
    spellings elsewhere. Bin edges come from a 1-row min/max broadcast
    (the ``heaps_law_fit`` bucketing discipline); bin assignment is
    pure integer arithmetic, identical in both engines; one scan, one
    bounded aggregate."""
    orders = Catalog(sf_dir).load(spark, "orders")
    enc = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    bounds = enc.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    binned = enc.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("cents") - F.col("lo"))
                * EQW_BINS
                / (F.col("hi") - F.col("lo") + 1)
            ),
            F.lit(EQW_BINS - 1),
        )
        .cast("bigint")
        .alias("bin")
    )
    per = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = per.agg(F.sum("n_orders").cast("bigint").alias("n"))
    return per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_orders",
        F.round(
            F.col("n_orders").cast("double") / F.col("n").cast("double"),
            6,
        ).alias("share"),
    )
