"""Round-11 analytics wave — depth over breadth (VERDICT r10 #6):
new OPERATOR SHAPES rather than more of the same aggregates. CUSUM
change detection via the reflected-cumsum identity; Lorenz curve
points on the two-pass global-rank machinery; a distributed SKYLINE
(Pareto frontier) via bounded-domain cummax; rank-based k-sample
(Kruskal–Wallis) and robust variance (Brown–Forsythe) tests from
exact count tables; higher-moment normality (Jarque–Bera) from exact
integer power sums; a skew-safe two-phase distinct over a synthetic
30%-hot key; interval-concurrency counting without a range join;
char-bigram entropy as a compressibility proxy; exact gap medians;
Brown's double-exponential trend; and a time-travel version diff over
the snapshot table format.

Shared disciplines (same contracts as the rest of the plan surface):
exact integer arithmetic (cents, day counts, doubled medians/ranks)
up to final mirrored double expressions; windows run only over
per-key frames or BOUNDED tables (calendar days, price-cent domain,
gap-day domain, bin tables); global order statistics ride the
two-pass ``operators/ranks`` machinery; transcendentals are
1e-6-quantized before any comparison or binning.

Reference scope: the reference's analytics stop at mart aggregates
(``Raptor/Raptor.py`` pipelines); these are warehouse-profiling and
robust-statistics queries run on the same engine. The round-12
seed block at the end (two-way ANOVA, QQ points, Weibull shape, Hill
tail index, cold streaks, lift matrix, cluster power law, simhash
cross-calibration) is post-window: never driver-checked this round,
selfcheck-pinned, first in line for the next window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

_O_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
_P_CENTS = "CAST(ROUND(p_retailprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------
# CUSUM change detection over the bounded daily-revenue series
# ---------------------------------------------------------------------


@register(
    "cusum_daily_revenue",
    oracle=f"""
WITH daily AS (
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
           CAST(SUM({_O_CENTS}) AS HUGEINT) AS r
    FROM orders GROUP BY 1
),
tot AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(r) AS HUGEINT) AS t
    FROM daily
),
c AS (
    SELECT day,
           SUM(n * r - t) OVER (ORDER BY day) AS c
    FROM daily, tot
),
s AS (
    SELECT day, c,
           MIN(c) OVER (ORDER BY day) AS lo,
           MAX(c) OVER (ORDER BY day) AS hi
    FROM c
)
SELECT day,
       CAST(c - lo AS BIGINT) AS s_pos,
       CAST(hi - c AS BIGINT) AS s_neg
FROM s
""",
)
def cusum_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift statistics over daily order revenue — the classic
    change-point monitor, computed EXACTLY and without recursion via
    the reflected-cumsum identity: with d_t = n·x_t − T (revenue
    deviations scaled by the day count so the mean subtraction stays
    integer), S⁺_t = C_t − min_{i≤t} C_i and S⁻_t = max_{i≤t} C_i − C_t
    where C is the plain cumulative sum of d. A sustained upward shift
    makes S⁺ climb; the recursion max(0, S+d) never appears, so three
    window passes over the BOUNDED calendar-day table (≈2.4k rows at
    any scale factor) replace an unparallelizable scan. INTERNAL
    arithmetic is decimal(38,0)/HUGEINT (n·r reaches ~2.4e19 at
    100 TB, past int64); the reported spans cast to bigint — if a
    catalog's deviation spans themselves exceed ~9e18, shift the unit
    to dollars before the scale-up (a stated rescale, not an
    algorithm change). No floats anywhere in the output."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("r")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("r").cast("decimal(38,0)").alias("t"),
    )
    w = Window.orderBy("day")  # bounded: calendar days
    c = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn(
            "c",
            F.sum(
                (F.col("n") * F.col("r") - F.col("t")).cast("decimal(38,0)")
            ).over(w),
        )
    )
    return c.select(
        "day",
        (F.col("c") - F.min("c").over(w)).cast("bigint").alias("s_pos"),
        (F.max("c").over(w) - F.col("c")).cast("bigint").alias("s_neg"),
    )


# ---------------------------------------------------------------------
# Lorenz curve points on the two-pass global machinery
# ---------------------------------------------------------------------

#: Number of Lorenz curve points (population ventiles).
LORENZ_BUCKETS = 20


@register(
    "lorenz_curve_points",
    oracle=f"""
WITH rev AS (
    SELECT o_custkey, CAST(SUM({_O_CENTS}) AS BIGINT) AS r
    FROM orders GROUP BY 1
),
rk AS (
    SELECT r,
           ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS rn,
           SUM(r) OVER (ORDER BY r, o_custkey) AS cum
    FROM rev
),
tot AS (SELECT COUNT(*) AS n, CAST(SUM(r) AS BIGINT) AS t FROM rev)
SELECT CAST(((rn - 1) * {LORENZ_BUCKETS}) // n + 1 AS BIGINT) AS ventile,
       COUNT(*) AS n_customers,
       ROUND(CAST(MAX(cum) AS DOUBLE) / CAST(MAX(t) AS DOUBLE), 6)
           AS cum_rev_share
FROM rk, tot
GROUP BY 1
""",
)
def lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue concentration at population
    ventiles — the curve behind the Gini summary
    (``gini_revenue_concentration`` reports the area; this reports the
    plottable points). Customers are ordered poorest-first by exact
    integer revenue; the global position and the running revenue total
    BOTH come from the two-pass range-partitioned machinery
    (``global_row_number`` / ``global_cumsum`` — no single-partition
    window over the unbounded customer table), and the only window-free
    reduction left is a {LORENZ_BUCKETS}-row bucket aggregate. Only
    customers WITH orders appear (revenue-share of the buying
    population). Integer div (`div`/`//`) keeps the bucket assignment
    exact at any magnitude; the share is the final mirrored double."""
    from asritha_metamorphetl_spark.operators.ranks import global_cumsums

    orders = Catalog(sf_dir).load(spark, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("r")
    ).withColumn("one", F.lit(1).cast("bigint"))
    order_by = [F.col("r").asc(), F.col("o_custkey").asc()]
    # ONE range-partitioned pass yields both running measures: the
    # revenue cumsum and (via the lit(1) column) the global position
    cum, totals = global_cumsums(
        rev, order_by, [("r", "cum"), ("one", "rn")]
    )
    n, total = totals["rn"], totals["cum"]
    return (
        cum.withColumn(
            "ventile",
            F.expr(f"(rn - 1) * {LORENZ_BUCKETS} div {n} + 1").cast("bigint"),
        )
        .groupBy("ventile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.max("cum").cast("double") / F.lit(float(total)), 6
            ).alias("cum_rev_share"),
        )
    )


# ---------------------------------------------------------------------
# Distributed skyline (Pareto frontier) via bounded-domain cummax
# ---------------------------------------------------------------------


@register(
    "price_size_skyline",
    oracle=f"""
WITH pairs AS (
    SELECT {_P_CENTS} AS c, p_size AS s, COUNT(*) AS n
    FROM part GROUP BY 1, 2
),
pm AS (
    SELECT c, s, n
    FROM (
        SELECT c, s, n,
               ROW_NUMBER() OVER (PARTITION BY c ORDER BY s DESC) AS rk
        FROM pairs
    ) WHERE rk = 1
),
sk AS (
    SELECT c, s, n,
           MAX(s) OVER (ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS m
    FROM pm
)
SELECT c AS price_cents, CAST(s AS BIGINT) AS max_size,
       CAST(n AS BIGINT) AS n_parts
FROM sk WHERE m IS NULL OR s > m
""",
)
def price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto frontier) of parts minimizing price while
    maximizing size — the multi-objective shortlist operator ("no
    other part is both cheaper and at least as large"). The classic
    spelling is a quadratic dominance anti-join; this plan exploits
    that after projecting to the decision attributes the domain is
    BOUNDED (distinct price cents ≲ 1e5 regardless of row count): one
    hash aggregate collapses parts onto (price, size) with counts, a
    per-price argmax keeps each price's tallest size, and one cummax
    window over the bounded per-price table marks the frontier (keep a
    price iff its max size strictly exceeds every strictly-cheaper
    price's). Equal-price-equal-size parts share a frontier point
    (n_parts); dominance work is O(distinct prices), never O(n²)."""
    part = Catalog(sf_dir).load(spark, "part")
    pairs = part.groupBy(
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("c"),
        F.col("p_size").alias("s"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wk = Window.partitionBy("c").orderBy(F.col("s").desc())
    pm = (
        pairs.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    # bounded: one row per distinct price
    wc = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    sk = pm.withColumn("m", F.max("s").over(wc))
    return sk.filter(F.col("m").isNull() | (F.col("s") > F.col("m"))).select(
        F.col("c").alias("price_cents"),
        F.col("s").cast("bigint").alias("max_size"),
        F.col("n").cast("bigint").alias("n_parts"),
    )


# ---------------------------------------------------------------------
# Interval concurrency without a range join
# ---------------------------------------------------------------------


@register(
    "open_order_concurrency",
    oracle="""
WITH iv AS (
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS d0,
           CAST(MAX(l.l_shipdate) AS DATE) AS d1
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
),
deltas AS (
    SELECT d0 AS day, 1 AS delta FROM iv
    UNION ALL
    SELECT d1 + INTERVAL 1 DAY, -1 FROM iv
),
daily AS (
    SELECT strftime(day, '%Y-%m-%d') AS day, SUM(delta) AS delta
    FROM deltas GROUP BY 1
)
SELECT day,
       CAST(SUM(delta) OVER (ORDER BY day) AS BIGINT) AS n_open
FROM daily
""",
)
def open_order_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are OPEN (placed but not fully shipped) on each
    calendar day — interval-overlap counting done scale-safe: instead
    of a day×order range join (|days|·|orders| candidate pairs), each
    order's [orderdate, last shipdate] interval emits two deltas (+1 at
    open, −1 the day after close), one hash aggregate folds deltas per
    day, and a single cumulative sum over the BOUNDED calendar table
    yields the concurrency curve. The same sweep-line trick handles
    sessions-in-flight, concurrent executions, and inventory holds at
    any scale — the fact table is touched exactly once."""
    orders = Catalog(sf_dir).load(spark, "orders")
    li = Catalog(sf_dir).load(spark, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("d0"))
        .agg(F.max(F.to_date("l_shipdate")).alias("d1"))
    )
    deltas = iv.select(
        F.col("d0").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            F.date_add(F.col("d1"), 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(F.sum("delta").alias("delta"))
    w = Window.orderBy("day")  # bounded: calendar days
    return daily.select(
        "day", F.sum("delta").over(w).cast("bigint").alias("n_open")
    )


# ---------------------------------------------------------------------
# Rank-based k-sample test (Kruskal–Wallis) from exact count tables
# ---------------------------------------------------------------------


@register(
    "kruskal_wallis_brand_price",
    oracle=f"""
WITH px AS (SELECT p_brand, {_P_CENTS} AS c FROM part),
vals AS (
    SELECT c, COUNT(*) AS cnt FROM px GROUP BY c
),
rk AS (
    SELECT c, cnt,
           COALESCE(SUM(cnt) OVER (ORDER BY c
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cumb
    FROM vals
),
avg2 AS (SELECT c, cnt, 2 * cumb + cnt + 1 AS a2 FROM rk),
bv AS (SELECT p_brand, c, COUNT(*) AS nbv FROM px GROUP BY 1, 2),
grp AS (
    SELECT bv.p_brand,
           CAST(SUM(CAST(a2 AS HUGEINT) * nbv) AS DOUBLE) AS r2,
           CAST(SUM(nbv) AS DOUBLE) AS nj
    FROM bv JOIN avg2 USING (c) GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(cnt) AS DOUBLE) AS n,
           CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS DOUBLE)
               AS ties
    FROM vals
)
SELECT CAST(n AS BIGINT) AS n,
       COUNT(*) AS k,
       ROUND(3.0 / (n * (n + 1)) * SUM(r2 * r2 / nj) - 3.0 * (n + 1), 6)
           AS h_stat,
       ROUND((3.0 / (n * (n + 1)) * SUM(r2 * r2 / nj) - 3.0 * (n + 1))
             / (1.0 - ties / (n * n * n - n)), 6) AS h_corrected
FROM grp, tot
GROUP BY n, ties
""",
)
def kruskal_wallis_brand_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis rank test: do the brands' retail-price
    DISTRIBUTIONS differ (the rank-based k-sample complement of the
    parametric ``part_size_price_anova``)? Global mid-ranks are never
    materialized per row: the price-cent DOMAIN is bounded (~1e5
    values regardless of row count), so one count table + one window
    over it yields each value's DOUBLED average rank as an exact
    integer (2·cum_before + cnt + 1 — doubling clears the half-rank),
    per-brand rank sums fold over the bounded (brand, value) table,
    and H = 3/(N(N+1))·Σ R2_j²/n_j − 3(N+1) (the 12/4 constant folds
    into 3 under doubled ranks) with the standard tie correction
    1 − Σ(t³−t)/(N³−N). Everything up to the final H is exact integer
    arithmetic; H itself is the mirrored double."""
    px = Catalog(sf_dir).load(spark, "part").select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("c"),
    )
    vals = px.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    avg2 = vals.select(
        "c",
        "cnt",
        (2 * F.coalesce(F.sum("cnt").over(wv), F.lit(0)) + F.col("cnt") + 1)
        .alias("a2"),
    )
    bv = px.groupBy("p_brand", "c").agg(F.count(F.lit(1)).alias("nbv"))
    grp = (
        bv.join(avg2, "c")
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("a2").cast("decimal(38,0)") * F.col("nbv"))
            .cast("double")
            .alias("r2"),
            F.sum("nbv").cast("double").alias("nj"),
        )
    )
    tot = vals.agg(
        F.sum("cnt").cast("double").alias("n"),
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        )
        .cast("double")
        .alias("ties"),
    )
    n, ties = F.col("n"), F.col("ties")
    h = (
        F.lit(3.0) / (n * (n + 1)) * F.sum(F.col("r2") * F.col("r2") / F.col("nj"))
        - F.lit(3.0) * (n + 1)
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("n", "ties")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.round(h, 6).alias("h_stat"),
            F.round(h / (F.lit(1.0) - ties / (n * n * n - n)), 6).alias(
                "h_corrected"
            ),
        )
        .select(
            F.col("n").cast("bigint").alias("n"),
            "k",
            "h_stat",
            "h_corrected",
        )
    )


# ---------------------------------------------------------------------
# Robust variance homogeneity (Brown–Forsythe) via exact group medians
# ---------------------------------------------------------------------


@register(
    "brown_forsythe_price_variance",
    oracle=f"""
WITH px AS (SELECT p_brand, {_P_CENTS} AS c FROM part),
bv AS (SELECT p_brand, c, COUNT(*) AS cnt FROM px GROUP BY 1, 2),
cum AS (
    SELECT p_brand, c, cnt,
           SUM(cnt) OVER (PARTITION BY p_brand ORDER BY c) AS cum,
           SUM(cnt) OVER (PARTITION BY p_brand) AS nj
    FROM bv
),
med AS (
    SELECT p_brand,
           MIN(CASE WHEN 2 * cum >= nj THEN c END)
           + MIN(CASE WHEN 2 * cum >= nj + 2 THEN c END) AS m2
    FROM cum GROUP BY 1
),
z AS (
    SELECT px.p_brand, ABS(2 * px.c - med.m2) AS z2
    FROM px JOIN med USING (p_brand)
),
g AS (
    SELECT p_brand,
           CAST(COUNT(*) AS DOUBLE) AS nj,
           CAST(SUM(CAST(z2 AS HUGEINT)) AS DOUBLE) AS s,
           CAST(SUM(CAST(z2 AS HUGEINT) * z2) AS DOUBLE) AS q
    FROM z GROUP BY 1
)
SELECT CAST(SUM(nj) AS BIGINT) AS n,
       COUNT(*) AS k,
       ROUND(((SUM(s * s / nj) - SUM(s) * SUM(s) / SUM(nj))
              / (COUNT(*) - 1))
             / ((SUM(q) - SUM(s * s / nj)) / (SUM(nj) - COUNT(*))), 6)
           AS f_stat
FROM g
""",
)
def brown_forsythe_price_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown–Forsythe test: do the brands differ in price SPREAD (not
    level)? Each price's absolute deviation from its brand's MEDIAN
    (the robust centering that makes the test outlier-proof, unlike
    Levene's mean) feeds a one-way ANOVA F. Medians are exact and
    integer: the per-(brand, value) count table is domain-bounded, the
    per-brand cumulative walk finds the lower/upper middle values, and
    their SUM is the doubled median m2 — so the deviations |2c − m2|
    are exact integers whose power sums are decimal-exact. F is the
    one mirrored double at the end. No per-row ranks, no
    percentile_approx: the whole test is two bounded aggregates and
    one broadcast join back to the fact rows."""
    px = Catalog(sf_dir).load(spark, "part").select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("c"),
    )
    bv = px.groupBy("p_brand", "c").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.partitionBy("p_brand").orderBy("c")
    cum = bv.select(
        "p_brand",
        "c",
        F.sum("cnt").over(wb).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("p_brand")).alias("nj"),
    )
    med = cum.groupBy("p_brand").agg(
        (
            F.min(F.when(2 * F.col("cum") >= F.col("nj"), F.col("c")))
            + F.min(F.when(2 * F.col("cum") >= F.col("nj") + 2, F.col("c")))
        ).alias("m2")
    )
    z = px.join(F.broadcast(med), "p_brand").select(
        "p_brand", F.abs(2 * F.col("c") - F.col("m2")).alias("z2")
    )
    g = z.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("nj"),
        F.sum(F.col("z2").cast("decimal(38,0)")).cast("double").alias("s"),
        F.sum(F.col("z2").cast("decimal(38,0)") * F.col("z2"))
        .cast("double")
        .alias("q"),
    )
    ssb = F.sum(F.col("s") * F.col("s") / F.col("nj")) - F.sum("s") * F.sum(
        "s"
    ) / F.sum("nj")
    ssw = F.sum("q") - F.sum(F.col("s") * F.col("s") / F.col("nj"))
    k = F.count(F.lit(1))
    return g.agg(
        F.sum("nj").cast("bigint").alias("n"),
        k.alias("k"),
        F.round((ssb / (k - 1)) / (ssw / (F.sum("nj") - k)), 6).alias(
            "f_stat"
        ),
    )


# ---------------------------------------------------------------------
# Higher-moment normality (Jarque–Bera) from exact integer power sums
# ---------------------------------------------------------------------


@register(
    "jarque_bera_order_values",
    oracle=f"""
WITH c AS (SELECT CAST({_O_CENTS} AS HUGEINT) AS c FROM orders),
s AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(c) AS DOUBLE) AS s1,
           CAST(SUM(c * c) AS DOUBLE) AS s2,
           CAST(SUM(c * c * c) AS DOUBLE) AS s3,
           CAST(SUM(c * c * c * c) AS DOUBLE) AS s4
    FROM c
),
m AS (
    SELECT n,
           s2 / n - (s1 / n) * (s1 / n) AS m2,
           s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * POW(s1 / n, 3) AS m3,
           s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * POW(s1 / n, 2) * (s2 / n)
                  - 3 * POW(s1 / n, 4) AS m4
    FROM s
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(m3 / POW(m2, 1.5), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis,
       ROUND(n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
             + POW(m4 / (m2 * m2) - 3.0, 2) / 4.0), 6) AS jb_stat
FROM m
""",
)
def jarque_bera_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test on order values: skewness and excess
    kurtosis from the first four POWER SUMS of the exact integer cents
    — four mergeable map-side-combinable sums in ONE scan, no centering
    pass, no window. The power sums accumulate as decimal(38,0)/HUGEINT
    (c⁴ ≤ 1.3e31 per row: exact up to ~1e6-row aggregates per the
    decimal width; for 1e9+ row runs shift the unit to dollars before
    the 4th power — a stated rescale, not an algorithm change); central
    moments, skewness, kurtosis, and JB are the final mirrored double
    expressions. JB = n/6·(g1² + g2²/4) flags heavy tails and asymmetry
    that a mean/stddev profile misses."""
    c = Catalog(sf_dir).load(spark, "orders").select(
        F.round(F.col("o_totalprice") * 100)
        .cast("decimal(38,0)")
        .alias("c")
    )
    s = c.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("s2"),
        F.sum(F.col("c") * F.col("c") * F.col("c"))
        .cast("double")
        .alias("s3"),
        F.sum(F.col("c") * F.col("c") * F.col("c") * F.col("c"))
        .cast("double")
        .alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(x) for x in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * F.pow(mu, 3)
    m4 = (
        s4 / n
        - 4 * mu * (s3 / n)
        + 6 * F.pow(mu, 2) * (s2 / n)
        - 3 * F.pow(mu, 4)
    )
    g1 = m3 / F.pow(m2, 1.5)
    g2 = m4 / (m2 * m2) - 3.0
    return s.select(
        n.cast("bigint").alias("n"),
        F.round(g1, 6).alias("skewness"),
        F.round(g2, 6).alias("excess_kurtosis"),
        F.round(n / 6.0 * (F.pow(g1, 2) + F.pow(g2, 2) / 4.0), 6).alias(
            "jb_stat"
        ),
    )


# ---------------------------------------------------------------------
# Skew-safe two-phase distinct over a synthetic 30%-hot key
# ---------------------------------------------------------------------

#: A key is reported as heavy when it owns >= 1/HOT_SUPPORT_DEN of all
#: fact rows — so the output is STRUCTURALLY <= HOT_SUPPORT_DEN rows.
HOT_SUPPORT_DEN = 20


@register(
    "hot_key_skew_safe_distinct",
    oracle=f"""
WITH keyed AS (
    SELECT CASE WHEN l_orderkey % 10 < 3 THEN CAST(-1 AS BIGINT)
                ELSE l_suppkey END AS k,
           l_partkey
    FROM lineitem
),
tot AS (SELECT COUNT(*) AS t FROM keyed)
SELECT k,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_distinct_parts
FROM keyed, tot
GROUP BY k, t
HAVING COUNT(*) * {HOT_SUPPORT_DEN} >= t
""",
)
def hot_key_skew_safe_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter keys with their EXACT distinct-part counts under
    deliberate 30% key skew — the aggregation shape that melts a naive
    plan at 100 TB: ~30% of the fact table is remapped onto one
    synthetic key (-1), and ``COUNT(DISTINCT)`` hashed only by that key
    would funnel a third of the data through one task. The plan is the
    skew-safe TWO-PHASE spelling: phase 1 groups by (key, part) — the
    hot key spreads across its ~full part domain, so no task sees more
    than ~|parts| rows — and phase 2 counts the surviving pairs per
    key. Both phases are plain hash aggregates with map-side partials;
    the only reported keys are those owning ≥ 1/{HOT_SUPPORT_DEN} of
    all rows (one bounded broadcast total), so the output is
    structurally ≤ {HOT_SUPPORT_DEN} rows however many suppliers
    exist. The oracle keeps the direct COUNT(DISTINCT) spelling — the
    hash-match proves the two-phase fold is exact."""
    li = Catalog(sf_dir).load(spark, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 3, F.lit(-1).cast("bigint"))
        .otherwise(F.col("l_suppkey"))
        .alias("k"),
        "l_partkey",
    )
    tot = li.agg(F.count(F.lit(1)).alias("t"))
    pairs = li.groupBy("k", "l_partkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_key = pairs.groupBy("k").agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct_parts"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .filter(F.col("n_rows") * HOT_SUPPORT_DEN >= F.col("t"))
        .select("k", "n_rows", "n_distinct_parts")
    )


# ---------------------------------------------------------------------
# Char-bigram entropy: per-doc compressibility proxy
# ---------------------------------------------------------------------


@register(
    "doc_bigram_entropy_scores",
    oracle="""
WITH bg AS (
    SELECT d.doc_id, substring(d.text, CAST(t.i AS INT), 2) AS b
    FROM documents d, UNNEST(range(1, length(d.text))) AS t(i)
    WHERE length(d.text) >= 2
),
cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       COUNT(*) AS n_distinct_bigrams,
       ROUND((LN(CAST(SUM(c) AS DOUBLE))
              - SUM(c * LN(CAST(c AS DOUBLE))) / SUM(c)) / LN(2.0), 6)
           AS entropy_bits
FROM cnt GROUP BY doc_id
""",
)
def doc_bigram_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram entropy per document — the cheap
    compressibility proxy (gzip-ability tracks bigram entropy closely):
    boilerplate and template spam score low bits/bigram, natural prose
    sits in a band, encrypted/binary junk maxes out. The complement of
    the token-level ``token_entropy_scores`` at sub-word granularity,
    and the signal that catches REPEATED-STRUCTURE spam whose token
    distribution looks normal. Bigrams are emitted JVM-side
    (``transform(sequence(...))`` — one array op per doc, O(total
    chars) rows), folded by two map-side-combinable hash aggregates;
    the only float work is one log per distinct (doc, bigram), same
    discipline as ``operators/lm.token_entropy``. Docs shorter than 2
    chars have no bigram distribution and are excluded in both
    engines."""
    docs = Catalog(sf_dir).load(spark, "documents")
    bg = docs.filter(F.length("text") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1), "
                "i -> substring(text, i, 2))"
            )
        ).alias("b"),
    )
    cnt = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.round(
            (
                F.log(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
                / F.sum("c")
            )
            / F.log(F.lit(2.0)),
            6,
        ).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------
# Exact repeat-purchase gap medians per market segment
# ---------------------------------------------------------------------


@register(
    "repeat_interval_median_by_segment",
    oracle="""
WITH seq AS (
    SELECT c.c_mktsegment AS segment,
           DATEDIFF('day',
                    LAG(o.o_orderdate) OVER (
                        PARTITION BY o.o_custkey
                        ORDER BY o.o_orderdate, o.o_orderkey),
                    o.o_orderdate) AS gap
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
gaps AS (SELECT segment, gap FROM seq WHERE gap IS NOT NULL),
gv AS (SELECT segment, gap, COUNT(*) AS cnt FROM gaps GROUP BY 1, 2),
cum AS (
    SELECT segment, gap, cnt,
           SUM(cnt) OVER (PARTITION BY segment ORDER BY gap) AS cum,
           SUM(cnt) OVER (PARTITION BY segment) AS nj
    FROM gv
)
SELECT segment,
       CAST(MAX(nj) AS BIGINT) AS n_gaps,
       (MIN(CASE WHEN 2 * cum >= nj THEN gap END)
        + MIN(CASE WHEN 2 * cum >= nj + 2 THEN gap END)) / 2.0
           AS median_gap_days
FROM cum GROUP BY segment
""",
)
def repeat_interval_median_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT median days between a customer's consecutive orders, by
    market segment — the repeat-purchase cadence that drives
    replenishment forecasting, computed without percentile_approx: the
    per-customer consecutive gap is one per-key lag window, gaps
    collapse onto the BOUNDED (segment, gap-days) count table (gap
    domain ≤ the calendar span, independent of row count), and the
    median falls out of the cumulative-count walk — lower and upper
    middle values summed as the doubled median, so `/2.0` is exact
    (x.0 or x.5, both representable). No floats before the final
    division, no global windows over fact rows."""
    orders = Catalog(sf_dir).load(spark, "orders")
    cust = Catalog(sf_dir).load(spark, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "segment",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(wc)
        ).alias("gap"),
    )
    gv = (
        seq.filter(F.col("gap").isNotNull())
        .groupBy("segment", "gap")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ws = Window.partitionBy("segment").orderBy("gap")
    cum = gv.select(
        "segment",
        "gap",
        F.sum("cnt").over(ws).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("segment")).alias("nj"),
    )
    return cum.groupBy("segment").agg(
        F.max("nj").cast("bigint").alias("n_gaps"),
        (
            (
                F.min(F.when(2 * F.col("cum") >= F.col("nj"), F.col("gap")))
                + F.min(
                    F.when(2 * F.col("cum") >= F.col("nj") + 2, F.col("gap"))
                )
            )
            / 2.0
        ).alias("median_gap_days"),
    )


# ---------------------------------------------------------------------
# Brown's double-exponential smoothing (level + trend), banded join
# ---------------------------------------------------------------------

#: Truncation width shared with the single-EWMA query's discipline:
#: weights below 2^-16 are under the rounding floor.
DEMA_W = 16


@register(
    "double_ewma_trend",
    oracle=f"""
WITH daily AS (
    SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1, 2
),
spine AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority ORDER BY order_day) AS rn
    FROM daily
),
banded AS (
    SELECT p.o_orderpriority, p.order_day, p.n_orders,
           CAST(SUM(c.n_orders * (CAST(1 AS BIGINT)
                << CAST({DEMA_W - 1} - (p.rn - c.rn) AS INT))) AS DOUBLE)
               AS num1,
           CAST(SUM(CAST(1 AS BIGINT)
                << CAST({DEMA_W - 1} - (p.rn - c.rn) AS INT)) AS DOUBLE)
               AS den1,
           CAST(SUM(c.n_orders * (p.rn - c.rn + 1) * (CAST(1 AS BIGINT)
                << CAST({DEMA_W - 1} - (p.rn - c.rn) AS INT))) AS DOUBLE)
               AS num2,
           CAST(SUM((p.rn - c.rn + 1) * (CAST(1 AS BIGINT)
                << CAST({DEMA_W - 1} - (p.rn - c.rn) AS INT))) AS DOUBLE)
               AS den2
    FROM spine p
    JOIN spine c
      ON c.o_orderpriority = p.o_orderpriority
     AND c.rn BETWEEN p.rn - {DEMA_W - 1} AND p.rn
    GROUP BY 1, 2, 3
)
SELECT o_orderpriority, order_day, n_orders,
       ROUND(2 * (num1 / den1) - (num2 / den2), 6) AS dema_level,
       ROUND((num1 / den1) - (num2 / den2), 6) AS dema_trend
FROM banded
""",
)
def double_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double-exponential smoothing over daily order volume per
    priority — level AND trend from closed-form weights, no recursion:
    EWMA-of-EWMA collapses to weights (k+1)·(1−α)^k, so the doubly
    smoothed series s2 rides the SAME banded equi-join as the single
    EWMA (``ewma_banded``'s bucketed_range_join — W contributor rows
    per point, linear total), just with a second integer weight column
    folded in the same aggregate. With α = 1/2 the level is 2s1 − s2
    and the per-step trend is s1 − s2 exactly. All four numerator/
    denominator sums are exact bigints (shiftleft weights × counts);
    the two smoothed ratios are the final mirrored doubles. The spine
    is calendar-bounded (≈2.4k days × 5 priorities at any SF)."""
    from asritha_metamorphetl_spark.operators.ranges import (
        bucketed_range_join,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.partitionBy("o_orderpriority").orderBy("order_day")
    spine = daily.withColumn("_rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    points = spine.withColumnRenamed("_rn", "_rn_p")
    contrib = spine.select(
        "o_orderpriority",
        F.col("n_orders").alias("_x_c"),
        F.col("_rn").alias("_rn_c"),
        (F.col("_rn") + F.lit(DEMA_W)).alias("_rn_end"),
    )
    banded = bucketed_range_join(
        points,
        contrib,
        on=["o_orderpriority"],
        point_col="_rn_p",
        start_col="_rn_c",
        end_col="_rn_end",
        bucket_width=DEMA_W,
    )
    w1 = F.expr(
        f"shiftleft(1L, CAST({DEMA_W - 1} - (_rn_p - _rn_c) AS INT))"
    )
    w2 = (F.col("_rn_p") - F.col("_rn_c") + 1) * w1
    agg = banded.groupBy("o_orderpriority", "order_day", "n_orders").agg(
        F.sum(F.col("_x_c") * w1).cast("double").alias("num1"),
        F.sum(w1).cast("double").alias("den1"),
        F.sum(F.col("_x_c") * w2).cast("double").alias("num2"),
        F.sum(w2).cast("double").alias("den2"),
    )
    s1 = F.col("num1") / F.col("den1")
    s2 = F.col("num2") / F.col("den2")
    return agg.select(
        "o_orderpriority",
        "order_day",
        "n_orders",
        F.round(2 * s1 - s2, 6).alias("dema_level"),
        F.round(s1 - s2, 6).alias("dema_trend"),
    )


# ---------------------------------------------------------------------
# Time travel: per-version live state over the MoR snapshot history
# ---------------------------------------------------------------------


def _time_travel_oracle() -> str:
    from asritha_metamorphetl_spark.plans.catalog_queries import (
        _MOR_D1,
        _MOR_DELETED,
    )

    base = f"""
    SELECT COUNT(*) AS n_live,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS live_cents
    FROM orders"""
    return f"""
WITH states AS (
    SELECT 1 AS version, * FROM ({base})
    UNION ALL SELECT 2, * FROM ({base} WHERE NOT ({_MOR_D1}))
    UNION ALL SELECT 3, * FROM ({base} WHERE NOT {_MOR_DELETED})
    UNION ALL SELECT 4, * FROM ({base} WHERE NOT {_MOR_DELETED})
)
SELECT version, n_live, live_cents,
       COALESCE(LAG(n_live) OVER (ORDER BY version) - n_live, 0)
           AS n_deleted_vs_prev
FROM states
"""


@register("time_travel_version_diff", oracle=_time_travel_oracle())
def time_travel_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the merge-on-read table's whole commit history:
    read every committed version (v1 base, v2 after delete d1, v3
    after d2, v4 after d1 RE-SENT) and report each snapshot's live
    rowcount/value plus the per-commit delete delta. The oracle derives
    all four states straight from the delete predicates, so the hash
    match proves three properties at once: snapshot ISOLATION (older
    versions stay readable and unchanged after later commits),
    manifest-pinned time travel (``read(version=k)`` resolves exactly
    the files commit k published), and idempotence under at-least-once
    delivery (v4's re-sent delete is a visible commit with ZERO row
    delta). Each version read is one column-pruned scan + broadcast
    anti-join on its pinned delete files; the version list itself is a
    bounded manifest listing, never a data scan."""
    from asritha_metamorphetl_spark.plans.catalog_queries import _mor_table

    t = _mor_table(spark, sf_dir)  # read-only: shared pristine fixture
    per_version = None
    for v in t.versions():
        agg = (
            t.read(version=v)
            .agg(
                F.count(F.lit(1)).alias("n_live"),
                F.sum("cents").cast("bigint").alias("live_cents"),
            )
            .select(F.lit(v).cast("int").alias("version"), "*")
        )
        per_version = agg if per_version is None else per_version.unionByName(agg)
    w = Window.orderBy("version")  # bounded: one row per commit
    return per_version.select(
        "version",
        "n_live",
        "live_cents",
        F.coalesce(
            F.lag("n_live").over(w) - F.col("n_live"), F.lit(0)
        ).cast("bigint").alias("n_deleted_vs_prev"),
    )


# =====================================================================
# Round-12 seeds (post-window: never driver-checked this round,
# selfcheck-pinned, first in line for the next window)
# =====================================================================


#: p_size 1..50 → 5 size bands of 10.
ANOVA2_BAND = 10


@register(
    "two_way_anova_price",
    oracle=f"""
WITH px AS (
    SELECT p_brand AS a, (p_size - 1) // {ANOVA2_BAND} AS b,
           CAST({_P_CENTS} AS HUGEINT) AS c
    FROM part
),
cells AS (
    SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(c) AS DOUBLE) AS s
    FROM px GROUP BY 1, 2
),
tot AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(c) AS DOUBLE) AS s,
           CAST(SUM(c * c) AS DOUBLE) AS q,
           CAST(COUNT(DISTINCT a) AS DOUBLE) AS ka,
           CAST(COUNT(DISTINCT b) AS DOUBLE) AS kb
    FROM px
),
parts AS (
    SELECT
        (SELECT SUM(s * s / n) FROM cells) AS cell_ss,
        (SELECT SUM(s * s / n)
         FROM (SELECT a, SUM(n) AS n, SUM(s) AS s FROM cells GROUP BY a))
            AS a_ss,
        (SELECT SUM(s * s / n)
         FROM (SELECT b, SUM(n) AS n, SUM(s) AS s FROM cells GROUP BY b))
            AS b_ss,
        (SELECT COUNT(*) FROM cells) AS n_cells
)
SELECT CAST(t.n AS BIGINT) AS n,
       CAST(p.n_cells AS BIGINT) AS n_cells,
       ROUND(((p.a_ss - t.s * t.s / t.n) / (t.ka - 1))
             / ((t.q - p.cell_ss) / (t.n - p.n_cells)), 6) AS f_brand,
       ROUND(((p.b_ss - t.s * t.s / t.n) / (t.kb - 1))
             / ((t.q - p.cell_ss) / (t.n - p.n_cells)), 6) AS f_size_band,
       ROUND((((p.cell_ss - t.s * t.s / t.n)
               - (p.a_ss - t.s * t.s / t.n)
               - (p.b_ss - t.s * t.s / t.n))
              / ((t.ka - 1) * (t.kb - 1)))
             / ((t.q - p.cell_ss) / (t.n - p.n_cells)), 6)
           AS f_interaction
FROM tot t, parts p
""",
)
def two_way_anova_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA of retail price on brand × size band — does the
    brand premium DEPEND on the size class (the interaction a one-way
    ANOVA cannot see)? The hierarchical cells decomposition:
    SS_cells = Σ S_ab²/n_ab − S²/N, marginal SS_A/SS_B from the cell
    rollups, SS_AB = SS_cells − SS_A − SS_B, SS_within = SS_total −
    SS_cells. One fact-table aggregate produces the (brand, band) cell
    sums — everything after runs on the ≤ (brands × bands) bounded
    table; power sums are exact HUGEINT/decimal and the F ratios are
    the final mirrored doubles."""
    px = Catalog(sf_dir).load(spark, "part").select(
        F.col("p_brand").alias("a"),
        F.expr(f"(p_size - 1) div {ANOVA2_BAND}").alias("b"),
        F.round(F.col("p_retailprice") * 100)
        .cast("decimal(38,0)")
        .alias("c"),
    )
    cells = px.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s"),
    )
    tot = px.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("q"),
        F.countDistinct("a").cast("double").alias("ka"),
        F.countDistinct("b").cast("double").alias("kb"),
    )
    cell_ss = cells.agg(
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("cell_ss"),
        F.count(F.lit(1)).cast("double").alias("n_cells"),
    )
    a_ss = (
        cells.groupBy("a")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .agg(F.sum(F.col("s") * F.col("s") / F.col("n")).alias("a_ss"))
    )
    b_ss = (
        cells.groupBy("b")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .agg(F.sum(F.col("s") * F.col("s") / F.col("n")).alias("b_ss"))
    )
    j = (
        tot.crossJoin(F.broadcast(cell_ss))
        .crossJoin(F.broadcast(a_ss))
        .crossJoin(F.broadcast(b_ss))
    )
    corr = F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("cell_ss")
    dfw = F.col("n") - F.col("n_cells")
    return j.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_cells").cast("bigint").alias("n_cells"),
        F.round(
            ((F.col("a_ss") - corr) / (F.col("ka") - 1)) / (ssw / dfw), 6
        ).alias("f_brand"),
        F.round(
            ((F.col("b_ss") - corr) / (F.col("kb") - 1)) / (ssw / dfw), 6
        ).alias("f_size_band"),
        F.round(
            (
                (
                    (F.col("cell_ss") - corr)
                    - (F.col("a_ss") - corr)
                    - (F.col("b_ss") - corr)
                )
                / ((F.col("ka") - 1) * (F.col("kb") - 1))
            )
            / (ssw / dfw),
            6,
        ).alias("f_interaction"),
    )


# ---------------------------------------------------------------------
# Empirical QQ points: weekend vs weekday event values
# ---------------------------------------------------------------------


@register(
    "weekend_event_value_qq",
    oracle="""
WITH ev AS (
    SELECT CASE WHEN dayname(ts) IN ('Saturday', 'Sunday')
                THEN 1 ELSE 0 END AS wk,
           CAST(ROUND(value * 100) AS BIGINT) AS c
    FROM events
),
cnt AS (SELECT wk, c, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
cum AS (
    SELECT wk, c, cnt,
           SUM(cnt) OVER (PARTITION BY wk ORDER BY c) AS cum,
           SUM(cnt) OVER (PARTITION BY wk) AS n
    FROM cnt
),
ps AS (SELECT unnest(range(5, 100, 5)) AS p),
qs AS (
    SELECT p.p, cum.wk,
           MIN(CASE WHEN 100 * cum.cum >= p.p * cum.n THEN cum.c END) AS q
    FROM cum CROSS JOIN ps p
    GROUP BY 1, 2
)
SELECT p AS pctile,
       MAX(CASE WHEN wk = 1 THEN q END) AS weekend_cents,
       MAX(CASE WHEN wk = 0 THEN q END) AS weekday_cents
FROM qs GROUP BY p
""",
)
def weekend_event_value_qq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical quantile–quantile points of event value, weekend vs
    weekday — the distribution-level companion to the location
    (Mann–Whitney) and shape (KS) tests: if the two populations differ
    only by scale, the 19 ventile pairs fall on a line; a kink
    localizes WHERE they diverge. Quantiles are EXACT type-1 order
    statistics off the bounded (group, value-cents) count table (the
    value domain caps the table, not row count): the cumulative walk
    is one per-group window over that bounded table, and each ventile
    is min{{c : 100·cum ≥ p·n}} — pure integer comparisons, no
    percentile_approx, no floats anywhere."""
    ev = Catalog(sf_dir).load(spark, "events").select(
        F.when(
            F.date_format("ts", "E").isin("Sat", "Sun"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("wk"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    cnt = ev.groupBy("wk", "c").agg(F.count(F.lit(1)).alias("cnt"))
    wk = Window.partitionBy("wk").orderBy("c")
    cum = cnt.select(
        "wk",
        "c",
        F.sum("cnt").over(wk).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("wk")).alias("n"),
    )
    ps = spark.range(1, 20).select((F.col("id") * 5).alias("p"))
    qs = (
        cum.crossJoin(F.broadcast(ps))
        .groupBy("p", "wk")
        .agg(
            F.min(
                F.when(
                    100 * F.col("cum") >= F.col("p") * F.col("n"),
                    F.col("c"),
                )
            ).alias("q")
        )
    )
    return qs.groupBy(F.col("p").alias("pctile")).agg(
        F.max(F.when(F.col("wk") == 1, F.col("q"))).alias("weekend_cents"),
        F.max(F.when(F.col("wk") == 0, F.col("q"))).alias("weekday_cents"),
    )


# ---------------------------------------------------------------------
# Weibull shape of interarrival times from a geometric survival grid
# ---------------------------------------------------------------------

#: Survival grid: gap thresholds 2^0 .. 2^(WEIB_POINTS-1) seconds.
WEIB_POINTS = 25


@register(
    "weibull_interarrival_shape",
    oracle=f"""
WITH gaps AS (
    -- FLOOR matters: Spark's unix_timestamp truncates fractional
    -- seconds while a bare DuckDB CAST(double AS BIGINT) rounds —
    -- the ±1 s disagreement flipped survival-grid thresholds at
    -- sf0.1 (caught by the round-11 cross-scale sweep)
    SELECT CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT)
           - LAG(CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS g
    FROM events
),
g2 AS (SELECT g FROM gaps WHERE g IS NOT NULL AND g > 0),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g2),
surv AS (
    SELECT gs.j,
           (SELECT COUNT(*) FROM g2
            WHERE g > CAST(POW(2, gs.j) AS BIGINT)) AS n_gt
    FROM generate_series(0, {WEIB_POINTS - 1}) gs(j)
),
pts AS (
    SELECT CAST(ROUND(LN(POW(2.0, j)) * 1000000) AS BIGINT) AS xi,
           CAST(ROUND(LN(-LN(CAST(n_gt AS DOUBLE) / t.n)) * 1000000)
                AS BIGINT) AS yi
    FROM surv, tot t
    WHERE n_gt > 0 AND n_gt < t.n AND j > 0
),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(xi) AS sx, SUM(yi) AS sy,
           SUM(xi * yi) AS sxy, SUM(xi * xi) AS sx2
    FROM pts
)
SELECT (SELECT n FROM tot) AS n_gaps,
       k AS n_points,
       ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(k AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
           AS weibull_shape
FROM sums
""",
)
def weibull_interarrival_shape(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weibull shape parameter of user interarrival times — the
    burstiness law behind the coefficient-of-variation summary
    (``interarrival_burstiness``): shape < 1 means bursty/clustered
    arrivals, 1 is memoryless Poisson, > 1 regular. Fit via the
    Weibull plot identity ln(−ln S(g)) = k·ln g − k·ln λ, evaluated on
    a GEOMETRIC survival grid (gap > 2^j seconds, j = 1..{WEIB_POINTS - 1}):
    the survival counts are {WEIB_POINTS} conditional integer sums in
    ONE pass over the per-user lag gaps — no distinct-gap table, whose
    cardinality would grow with data volume — and the OLS runs over
    ≤ {WEIB_POINTS} points with every transcendental 1e-6-quantized to
    an exact integer before summation (the ``zipf_token_slope``
    discipline). Grid points with S = 0 or 1 drop in both engines."""
    ev = Catalog(sf_dir).load(spark, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            (
                F.unix_timestamp("ts")
                - F.lag(F.unix_timestamp("ts")).over(wu)
            ).alias("g")
        )
        .filter(F.col("g").isNotNull() & (F.col("g") > 0))
    )
    agg = gaps.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col("g") > 2**j).cast("long")).alias(f"gt{j}")
            for j in range(WEIB_POINTS)
        ],
    )
    surv = agg.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"gt{j}").alias("n_gt")
                    )
                    for j in range(WEIB_POINTS)
                ]
            )
        ).alias("s"),
    ).select("n", "s.j", "s.n_gt")
    import math

    pts = surv.filter(
        (F.col("n_gt") > 0) & (F.col("n_gt") < F.col("n")) & (F.col("j") > 0)
    ).select(
        "n",
        F.round(
            F.lit(math.log(2.0)) * F.col("j") * 1000000
        )
        .cast("bigint")
        .alias("xi"),
        F.round(
            F.log(-F.log(F.col("n_gt").cast("double") / F.col("n")))
            * 1000000
        )
        .cast("bigint")
        .alias("yi"),
    )
    k = F.count(F.lit(1)).cast("bigint")
    return pts.groupBy("n").agg(
        k.alias("n_points"),
        F.round(
            (
                k.cast("double") * F.sum(F.col("xi") * F.col("yi")).cast("double")
                - F.sum("xi").cast("double") * F.sum("yi").cast("double")
            )
            / (
                k.cast("double") * F.sum(F.col("xi") * F.col("xi")).cast("double")
                - F.sum("xi").cast("double") * F.sum("xi").cast("double")
            ),
            4,
        ).alias("weibull_shape"),
    ).select(F.col("n").alias("n_gaps"), "n_points", "weibull_shape")


# ---------------------------------------------------------------------
# Hill estimator of the order-value tail index
# ---------------------------------------------------------------------

#: Number of upper order statistics the Hill estimator uses.
HILL_K = 500


@register(
    "hill_tail_index",
    oracle=f"""
WITH top AS (
    SELECT {_O_CENTS} AS c
    FROM orders
    ORDER BY {_O_CENTS} DESC, o_orderkey ASC
    LIMIT {HILL_K}
),
q AS (
    SELECT CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS lnq,
           c
    FROM top
),
s AS (
    SELECT SUM(lnq) AS sln, MIN(lnq) AS lnk, MIN(c) AS xk,
           COUNT(*) AS k
    FROM q
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(xk AS BIGINT) AS xk_cents,
       ROUND(CAST((k - 1) AS DOUBLE) * 1000000.0
             / CAST(sln - k * lnk AS DOUBLE), 6) AS hill_alpha
FROM s
""",
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-value TAIL INDEX α — how heavy the
    revenue tail is (α ≤ 2 means infinite variance: mean-based
    forecasts are meaningless; the Pareto-share and drawdown queries
    assume a finite tail, this measures it). α̂ = (k−1) / Σ(ln x_i −
    ln x_k) over the k = {HILL_K} largest values; the top set is an
    ``orderBy().limit()`` that compiles to TakeOrderedAndProject
    (per-partition top-k, driver merge of 32×{HILL_K} rows — never a
    global sort), ties broken by order key so the set is
    deterministic. Each ln is 1e-6-quantized to an exact integer
    before the sum (zipf discipline); the estimator is one mirrored
    double at the end."""
    orders = Catalog(sf_dir).load(spark, "orders")
    top = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
            "o_orderkey",
        )
        .orderBy(F.col("c").desc(), F.col("o_orderkey").asc())
        .limit(HILL_K)
    )
    q = top.select(
        F.round(F.log(F.col("c").cast("double")) * 1000000)
        .cast("bigint")
        .alias("lnq"),
        "c",
    )
    s = q.agg(
        F.sum("lnq").alias("sln"),
        F.min("lnq").alias("lnk"),
        F.min("c").alias("xk"),
        F.count(F.lit(1)).alias("k"),
    )
    return s.select(
        F.col("k").cast("bigint").alias("k"),
        F.col("xk").cast("bigint").alias("xk_cents"),
        F.round(
            (F.col("k") - 1).cast("double")
            * 1000000.0
            / (F.col("sln") - F.col("k") * F.col("lnk")).cast("double"),
            6,
        ).alias("hill_alpha"),
    )


# ---------------------------------------------------------------------
# Longest below-median streaks (islands over the bounded daily table)
# ---------------------------------------------------------------------


@register(
    "below_median_streaks",
    oracle="""
WITH daily AS (
    SELECT o_orderpriority AS pri, strftime(o_orderdate, '%Y-%m-%d') AS day,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2
),
cc AS (SELECT pri, cnt, COUNT(*) AS ndays FROM daily GROUP BY 1, 2),
cum AS (
    SELECT pri, cnt, ndays,
           SUM(ndays) OVER (PARTITION BY pri ORDER BY cnt) AS cum,
           SUM(ndays) OVER (PARTITION BY pri) AS nj
    FROM cc
),
med AS (
    SELECT pri,
           MIN(CASE WHEN 2 * cum >= nj THEN cnt END)
           + MIN(CASE WHEN 2 * cum >= nj + 2 THEN cnt END) AS m2
    FROM cum GROUP BY 1
),
flagged AS (
    SELECT d.pri, d.day,
           CASE WHEN 2 * d.cnt < m.m2 THEN 1 ELSE 0 END AS below,
           ROW_NUMBER() OVER (PARTITION BY d.pri ORDER BY d.day) AS rn
    FROM daily d JOIN med m ON d.pri = m.pri
),
isl AS (
    SELECT pri, below, rn,
           rn - ROW_NUMBER() OVER (PARTITION BY pri, below ORDER BY rn)
               AS grp
    FROM flagged
),
streaks AS (
    SELECT pri, COUNT(*) AS len
    FROM isl WHERE below = 1 GROUP BY pri, grp
)
SELECT m.pri AS o_orderpriority,
       m.m2 / 2.0 AS median_daily,
       COALESCE(MAX(s.len), 0) AS longest_streak,
       COUNT(s.len) AS n_streaks
FROM med m LEFT JOIN streaks s ON m.pri = s.pri
GROUP BY 1, 2
""",
)
def below_median_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive below-median days per order priority —
    the cold-streak detector (a demand series can keep a healthy median
    while silently developing multi-week slumps; streak length is the
    signal dispersion summaries miss). Everything runs on the BOUNDED
    per-(priority, day) table: the per-priority median of daily counts
    comes from the count-of-counts cumulative walk (doubled median, so
    /2.0 is exact), below-days are grouped into runs with the
    gaps-and-islands rn-difference trick, and the report is one bounded
    aggregate. Streaks are over the PRESENT day sequence (rank-
    consecutive); no window ever touches fact rows."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    cc = daily.groupBy("pri", "cnt").agg(F.count(F.lit(1)).alias("ndays"))
    wp = Window.partitionBy("pri").orderBy("cnt")
    cum = cc.select(
        "pri",
        "cnt",
        F.sum("ndays").over(wp).alias("cum"),
        F.sum("ndays").over(Window.partitionBy("pri")).alias("nj"),
    )
    med = cum.groupBy("pri").agg(
        (
            F.min(F.when(2 * F.col("cum") >= F.col("nj"), F.col("cnt")))
            + F.min(F.when(2 * F.col("cum") >= F.col("nj") + 2, F.col("cnt")))
        ).alias("m2")
    )
    wd = Window.partitionBy("pri").orderBy("day")
    flagged = daily.join(F.broadcast(med), "pri").select(
        "pri",
        "day",
        F.when(2 * F.col("cnt") < F.col("m2"), 1).otherwise(0).alias("below"),
        F.row_number().over(wd).alias("rn"),
    )
    wi = Window.partitionBy("pri", "below").orderBy("rn")
    isl = flagged.withColumn(
        "grp", F.col("rn") - F.row_number().over(wi)
    )
    streaks = (
        isl.filter(F.col("below") == 1)
        .groupBy("pri", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        med.join(streaks, "pri", "left")
        .groupBy(
            F.col("pri").alias("o_orderpriority"),
            (F.col("m2") / 2.0).alias("median_daily"),
        )
        .agg(
            F.coalesce(F.max("len"), F.lit(0)).alias("longest_streak"),
            F.count("len").alias("n_streaks"),
        )
    )


# ---------------------------------------------------------------------
# Event-type co-occurrence lift (bounded type-pair matrix)
# ---------------------------------------------------------------------


@register(
    "event_type_lift_matrix",
    oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
tc AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1),
pairs AS (
    SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_both
    FROM ut a JOIN ut b ON a.user_id = b.user_id
    WHERE a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT p.t1, p.t2, p.n_both,
       ROUND(CAST(p.n_both AS DOUBLE) * n.n_users
             / (CAST(ta.n_t AS DOUBLE) * tb.n_t), 6) AS lift
FROM pairs p
JOIN tc ta ON ta.event_type = p.t1
JOIN tc tb ON tb.event_type = p.t2
CROSS JOIN n
""",
)
def event_type_lift_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence LIFT between event types at the user level — does
    a user who ever does X also do Y more than independence predicts
    (lift > 1) or do the behaviors repel (< 1)? The matrix is bounded
    by the TYPE vocabulary, not data volume: one distinct-pair
    aggregate collapses the fact table onto (user, type) — ≤ |types|
    rows per user — the self-join fans out at most C(|types|, 2) pairs
    per user, and marginals broadcast. Exact integer counts; lift is
    the final mirrored double."""
    ev = Catalog(sf_dir).load(spark, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n = ut.agg(F.countDistinct("user_id").alias("n_users"))
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = tc.select(F.col("event_type").alias("t1"), F.col("n_t").alias("na"))
    tb = tc.select(F.col("event_type").alias("t2"), F.col("n_t").alias("nb"))
    return (
        pairs.join(F.broadcast(ta), "t1")
        .join(F.broadcast(tb), "t2")
        .crossJoin(F.broadcast(n))
        .select(
            "t1",
            "t2",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_users")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------
# Power-law fit of near-dup cluster sizes
# ---------------------------------------------------------------------


def _cluster_powerlaw_oracle() -> str:
    from asritha_metamorphetl_spark.plans.text_queries import (
        MINHASH_PAIRS_ORACLE,
    )

    return f"""
WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
assign AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
           FROM reach GROUP BY src),
sizes AS (SELECT cluster_id, COUNT(*) AS sz FROM assign GROUP BY 1),
freq AS (SELECT sz, COUNT(*) AS nf FROM sizes GROUP BY 1),
pts AS (
    SELECT CAST(ROUND(LN(CAST(sz AS DOUBLE)) * 1000000) AS BIGINT) AS xi,
           CAST(ROUND(LN(CAST(nf AS DOUBLE)) * 1000000) AS BIGINT) AS yi
    FROM freq
),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(xi) AS sx, SUM(yi) AS sy,
           SUM(xi * yi) AS sxy, SUM(xi * xi) AS sx2
    FROM pts
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sizes) AS n_clusters,
       (SELECT CAST(MAX(sz) AS BIGINT) FROM sizes) AS max_cluster,
       k AS n_sizes,
       ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(k AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
           AS powerlaw_slope
FROM sums
"""


def _minhash_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH candidate pairs as a session-cached parquet
    fixture (plans/fixtures.py since round 13 — same label, same
    content; this alias keeps the historical call sites readable).
    Content is deterministic (content hashes, no RNG); consumers treat
    it as read-only."""
    from asritha_metamorphetl_spark.plans.fixtures import minhash_pairs

    return minhash_pairs(spark, sf_dir)


@register("dedup_cluster_size_powerlaw", oracle=_cluster_powerlaw_oracle())
def dedup_cluster_size_powerlaw(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Power-law fit of the near-dup CLUSTER SIZE distribution — the
    number dedup capacity planning runs on: cluster sizes of web-scale
    corpora follow a heavy-tailed law, and the slope says whether
    removal savings come from many small clusters (steep) or a few
    giant ones (shallow — and a giant component is also the classic
    LSH-threshold-too-low symptom this query flags before a full
    dedup pass). Reuses the minhash-LSH pair machinery and the
    min-label connected components (``dup_clusters``); the fit is the
    ``zipf_token_slope`` discipline — OLS of ln(count) on ln(size)
    over the BOUNDED size-frequency table, every ln 1e-6-quantized to
    exact integers before summation."""
    from asritha_metamorphetl_spark.plans.fixtures import (
        minhash_cluster_labels,
    )

    labels = minhash_cluster_labels(spark, sf_dir)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    freq = sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("nf"))
    pts = freq.select(
        F.round(F.log(F.col("sz").cast("double")) * 1000000)
        .cast("bigint")
        .alias("xi"),
        F.round(F.log(F.col("nf").cast("double")) * 1000000)
        .cast("bigint")
        .alias("yi"),
    )
    k = F.count(F.lit(1)).cast("bigint")
    fit = pts.agg(
        k.alias("n_sizes"),
        F.round(
            (
                k.cast("double")
                * F.sum(F.col("xi") * F.col("yi")).cast("double")
                - F.sum("xi").cast("double") * F.sum("yi").cast("double")
            )
            / (
                k.cast("double")
                * F.sum(F.col("xi") * F.col("xi")).cast("double")
                - F.sum("xi").cast("double") * F.sum("xi").cast("double")
            ),
            4,
        ).alias("powerlaw_slope"),
    )
    meta = sizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.max("sz").cast("bigint").alias("max_cluster"),
    )
    return meta.crossJoin(F.broadcast(fit)).select(
        "n_clusters", "max_cluster", "n_sizes", "powerlaw_slope"
    )


# ---------------------------------------------------------------------
# SimHash Hamming histogram over the MinHash candidate pairs
# ---------------------------------------------------------------------


def _simhash_hamming_oracle() -> str:
    from asritha_metamorphetl_spark.plans.text_queries import (
        MINHASH_PAIRS_ORACLE,
        _tok16_sql,
    )

    return f"""
WITH pairs AS ({MINHASH_PAIRS_ORACLE}),
toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
hashed AS (
    SELECT doc_id, list_transform(t, tok -> {_tok16_sql()}) AS vals
    FROM toks
),
bits AS (
    SELECT doc_id, j,
        CASE WHEN list_sum(list_transform(vals,
                 v -> CAST(FLOOR(v / power(2, 15 - j)) AS BIGINT)
                      % 2 * 2 - 1)) > 0
             THEN CAST(power(2, 15 - j) AS BIGINT) ELSE 0 END AS v
    FROM hashed, generate_series(0, 15) gs(j)
),
sh AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS simhash
       FROM bits GROUP BY doc_id)
SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming,
       COUNT(*) AS n_pairs
FROM pairs p
JOIN sh a ON a.doc_id = p.doc_a
JOIN sh b ON b.doc_id = p.doc_b
GROUP BY 1
"""


@register("simhash_hamming_of_candidates", oracle=_simhash_hamming_oracle())
def simhash_hamming_of_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-calibration of the repo's two near-dup fingerprints: the
    SimHash Hamming-distance histogram over exactly the MinHash-LSH
    CANDIDATE pairs. If the two signals agree, candidates concentrate
    at low Hamming distance and a cheap simhash pre-filter can prune
    the verification stage; a flat histogram means the fingerprints
    disagree and pruning would cost recall. Pair generation is the
    banded LSH join (the EXACT-RECALL BLOCKING contract — never
    all-pairs); each side then broadcast-joins its 16-bit simhash and
    the Hamming distance is one JVM-side bit_count(xor) per pair, a
    ≤17-row histogram out."""
    from asritha_metamorphetl_spark.operators import dedup as D

    docs = Catalog(sf_dir).load(spark, "documents")
    pairs = _minhash_pairs_cached(spark, sf_dir)
    sh = D.simhash_keys(docs, "text", "doc_id")
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .groupBy(
            F.bit_count(
                F.col("sh_a").bitwiseXOR(F.col("sh_b"))
            ).alias("hamming")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
