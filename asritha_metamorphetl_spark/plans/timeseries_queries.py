"""Time-series statistics: autocorrelation, robust Theil–Sen trend,
calendar seasonality, and semi-additive (last-value) aggregation.

The daily order series is calendar-bounded (O(days) rows at EVERY
scale factor — aggregation happens before any pairwise work), so the
quadratic-in-days operators here (Theil–Sen) are bounded by the
calendar, not the data. Float discipline as in ``stats_queries``:
exact integer sums / quantized grids, mirrored final expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

AUTOCORR_MAX_LAG = 7


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(sf_dir).load(spark, "orders")
    return orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "autocorrelation_daily_orders",
    oracle=f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
    FROM orders GROUP BY 1
),
lags(lag) AS (
    SELECT unnest(generate_series(1, {AUTOCORR_MAX_LAG}))
),
paired AS (
    SELECT l.lag, a.n AS x, b.n AS y
    FROM daily a
    CROSS JOIN lags l
    JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
),
sums AS (
    SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
    FROM paired GROUP BY lag
)
SELECT lag, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (SQRT(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * SQRT(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS acf
FROM sums
""",
)
def autocorrelation_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily order series at lags
    1..{AUTOCORR_MAX_LAG} — the first diagnostic a forecasting
    pipeline runs (weekly periodicity shows as a lag-7 spike). The
    series aggregates FIRST (one scan → O(days) rows), each lag pairs
    via a single date-shift EQUI-join (the lag frame explodes the tiny
    series 7×, then one join on the shifted day — no per-lag rescans,
    no theta join), and each lag's Pearson r comes from exact integer
    sufficient statistics exactly as ``lineitem_corr_matrix``."""
    daily = _daily(spark, sf_dir)
    lags = spark.range(1, AUTOCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.crossJoin(F.broadcast(lags)).select(
        "lag",
        F.date_add(F.col("day"), F.col("lag")).alias("tday"),
        F.col("n").alias("x"),
    )
    b = daily.select(F.col("day").alias("tday"), F.col("n").alias("y"))
    paired = a.join(b, "tday")
    sums = paired.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sx2"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("sy2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2 = F.col("sx2").cast("double")
    sy2 = F.col("sy2").cast("double")
    return sums.select(
        "lag",
        "n",
        F.round(
            (n * sxy - sx * sy)
            / (
                F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)
            ),
            6,
        ).alias("acf"),
    )


#: Slope quantization grid (1e-6) so the median is an order statistic
#: over exact integers.
TS_SLOPE_Q = 1000000


@register(
    "theil_sen_daily_trend",
    oracle=f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
    FROM orders GROUP BY 1
),
slopes AS (
    SELECT CAST(ROUND(
               {TS_SLOPE_Q}.0 * (CAST(b.n AS DOUBLE) - CAST(a.n AS DOUBLE))
               / CAST(b.day - a.day AS DOUBLE)
           ) AS BIGINT) AS sq
    FROM daily a JOIN daily b ON b.day > a.day
),
counts AS (SELECT sq, COUNT(*) AS c FROM slopes GROUP BY sq),
cum AS (
    SELECT sq,
           SUM(c) OVER (ORDER BY sq ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum,
           SUM(c) OVER () AS m
    FROM counts
)
SELECT CAST(MAX(m) AS BIGINT) AS n_slopes,
       ROUND((MIN(CASE WHEN cum >= (m + 1) // 2 THEN sq END)
              + MIN(CASE WHEN cum >= (m + 2) // 2 THEN sq END))
             / 2.0 / {TS_SLOPE_Q}, 6) AS theil_sen_slope
FROM cum
""",
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily order volume: the MEDIAN of all
    pairwise slopes — up to 29% outlier days cannot move it, where OLS
    (``regr_price_on_qty``'s machinery) breaks at one. Slopes are
    computed over the AGGREGATED daily series (calendar-bounded, so
    the O(days²) pair set is a few million rows at any SF — it would
    be madness on raw rows, and the plan never touches them), each
    slope quantized to a 1e-6 grid so the median is an exact integer
    order statistic — found by CUMULATIVE COUNTING, not a global row
    sort: slopes collapse to per-value counts first (a map-side-
    combining aggregate), and the running sum over the count table is
    the two-pass ``global_cumsum`` — finely-quantized slopes are
    near-unique, so the count table itself is ~O(pairs) and a plain
    global window over it would degrade to the single-partition pass
    the counting was meant to avoid; the two-pass spelling stays
    partition-parallel at any slope cardinality (one O(partitions)
    collect). The median is the least value whose cumulative count
    reaches rank ⌈m/2⌉ (averaged with rank ⌊m/2⌋+1); m comes from the
    same pass's driver-side total, not a whole-frame window."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=False)
    a = daily.select(F.col("day").alias("day_a"), F.col("n").alias("n_a"))
    b = daily.select(F.col("day").alias("day_b"), F.col("n").alias("n_b"))
    slopes = (
        a.join(b, F.col("day_b") > F.col("day_a"))
        .select(
            F.round(
                F.lit(float(TS_SLOPE_Q))
                * (
                    F.col("n_b").cast("double")
                    - F.col("n_a").cast("double")
                )
                / F.datediff(F.col("day_b"), F.col("day_a")).cast("double")
            )
            .cast("bigint")
            .alias("sq")
        )
    )
    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )

    counts = slopes.groupBy("sq").agg(F.count(F.lit(1)).alias("c"))
    cum, m_total = global_cumsum_with_total(
        counts, [F.col("sq").asc()], "c", out_col="cum"
    )
    m = F.lit(int(m_total)).cast("bigint")
    r1 = F.floor((m + 1) / 2)
    r2 = F.floor((m + 2) / 2)
    lo = F.min(F.when(F.col("cum") >= r1, F.col("sq")))
    hi = F.min(F.when(F.col("cum") >= r2, F.col("sq")))
    return cum.agg(
        F.max(m).alias("n_slopes"),
        F.round((lo + hi) / 2.0 / TS_SLOPE_Q, 6).alias("theil_sen_slope"),
    )


@register(
    "weekday_seasonality_profile",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
    FROM orders GROUP BY 1
),
dowed AS (
    SELECT (day - DATE '1970-01-01') % 7 AS dow_idx, n FROM daily
),
per_dow AS (
    SELECT dow_idx, COUNT(*) AS n_days, CAST(SUM(n) AS BIGINT) AS total
    FROM dowed GROUP BY dow_idx
),
tot AS (
    SELECT CAST(SUM(n_days) AS BIGINT) AS d_all,
           CAST(SUM(total) AS BIGINT) AS s_all
    FROM per_dow
)
SELECT dow_idx, n_days, total,
       ROUND(CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
           AS mean_orders,
       ROUND(CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE)
             / (CAST(s_all AS DOUBLE) / CAST(d_all AS DOUBLE)), 6)
           AS seasonality_index
FROM per_dow CROSS JOIN tot
""",
)
def weekday_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index of order volume: each weekday's
    mean daily count relative to the overall mean (index 1.0 = no
    seasonality) — the multiplicative profile a forecaster divides out
    before trend fitting. Weekday is the PORTABLE epoch-day modulo
    ((day − 1970-01-01) % 7 — engines disagree on whether weeks start
    Sunday or Monday, but never on integer arithmetic). One scan,
    7-row output, exact sums with two final divisions."""
    daily = _daily(spark, sf_dir)
    dowed = daily.select(
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7
        ).alias("dow_idx"),
        "n",
    )
    per = dowed.groupBy("dow_idx").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").cast("bigint").alias("total"),
    )
    tot = per.agg(
        F.sum("n_days").cast("bigint").alias("d_all"),
        F.sum("total").cast("bigint").alias("s_all"),
    )
    mean_dow = F.col("total").cast("double") / F.col("n_days").cast("double")
    mean_all = F.col("s_all").cast("double") / F.col("d_all").cast("double")
    return per.crossJoin(tot).select(
        "dow_idx",
        "n_days",
        "total",
        F.round(mean_dow, 6).alias("mean_orders"),
        F.round(mean_dow / mean_all, 6).alias("seasonality_index"),
    )


#: Shared verbatim with the streaming parity twin
#: (``streaming_semi_additive_parity``): the claim is that the
#: micro-batch argmax fold lands on the identical totals.
SEMI_ADDITIVE_ORACLE = """
WITH enc AS (
    SELECT user_id,
           YEAR(ts) * 100 + MONTH(ts) AS ym,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           ts, event_id
    FROM events
),
latest AS (
    SELECT user_id, ym, cents
    FROM (
        SELECT user_id, ym, cents,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, ym
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM enc
    ) WHERE rn = 1
)
SELECT ym, COUNT(*) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS total_last_cents
FROM latest GROUP BY ym
"""


@register("semi_additive_last_balance", oracle=SEMI_ADDITIVE_ORACLE)
def semi_additive_last_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-additive aggregation — the balance/inventory pattern:
    measures that are additive ACROSS users but not across time take
    each user's LAST value per month (deterministic (ts, event_id)
    ordering), then sum across users. A plain SUM over a balance
    column double-counts every restatement; this is the correct
    warehouse spelling. Per-(user, month) windows only — the shuffle
    is the user-hash partition — then an O(months) rollup."""
    ev = Catalog(sf_dir).load(spark, "events")
    enc = ev.select(
        "user_id",
        (F.year("ts") * 100 + F.month("ts")).alias("ym"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "ym").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        enc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ym", "cents")
    )
    return latest.groupBy("ym").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cents").cast("bigint").alias("total_last_cents"),
    )
