"""Round-10 analytics wave: attribution, activity decomposition,
dwell/burstiness profiles, load heatmaps, session conversion, value
deciles (events); latency percentiles, concentration indices, anomaly
flags, contingency grids, seasonality, drawdown (commerce); sign-bias
and centroid-distance hygiene (embeddings).

Shared disciplines (same contracts as the rest of the plan surface):
exact integer arithmetic (cents, microseconds, 1e-6 grids) up to final
mirrored double expressions; per-key or calendar-bounded windows only —
global windows appear solely over bounded count/bucket tables; global
order statistics ride the two-pass ``operators/ranks`` machinery;
pairwise work is blocked or bounded per the SCALING.md "Audit-query
sampling/blocking contracts" section.

Reference scope: the reference's analytics stop at mart aggregates
(``Raptor/Raptor.py`` pipelines); these are the product-analytics and
warehouse-profiling queries run on the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.similarity import (
    finite_vec_where,
    finite_vectors,
)
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: Session gap (minutes) shared with the behavior family.
SESSION_GAP_MIN = 30

#: Minimum per-user gap count for the burstiness profile — fewer gaps
#: make the coefficient meaningless (stated in both engines).
BURST_MIN_GAPS = 5

_O_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
_V_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


# ---------------------------------------------------------------------
# events
# ---------------------------------------------------------------------


@register(
    "first_touch_attribution",
    oracle="""
WITH firsts AS (
    SELECT user_id, event_type AS first_type
    FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS rn
        FROM events
    ) WHERE rn = 1
),
conv AS (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
    FROM events GROUP BY user_id
)
SELECT f.first_type,
       COUNT(*) AS n_users,
       CAST(SUM(c.converted) AS BIGINT) AS n_converted,
       ROUND(CAST(SUM(c.converted) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS conv_rate
FROM firsts f JOIN conv c USING (user_id)
GROUP BY f.first_type
""",
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: which entry event type a user's history
    starts with, and how that cohort converts (ever fires a purchase).
    The per-user "first" is one ``min_by`` over the total order
    (ts, event_id) — a mergeable aggregate, no window over the fact
    table — and conversion is a per-user max flag folded in the same
    shuffle; the report is one bounded aggregate over event types."""
    events = Catalog(sf_dir).load(spark, "events")
    per_user = events.groupBy("user_id").agg(
        F.min_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("first_type"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return per_user.groupBy("first_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("conv_rate"),
    )


@register(
    "daily_new_vs_returning",
    oracle="""
WITH user_days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
firsts AS (
    SELECT user_id, MIN(day) AS first_day FROM user_days GROUP BY user_id
)
SELECT CAST(u.day AS VARCHAR) AS day,
       COUNT(*) AS n_active,
       CAST(SUM(CASE WHEN u.day = f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN u.day = f.first_day THEN 0 ELSE 1 END)
            AS BIGINT) AS n_returning
FROM user_days u JOIN firsts f USING (user_id)
GROUP BY u.day
""",
)
def daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives decomposed into first-ever-seen vs returning users
    — the growth-accounting curve. Two hash aggregates (user-days,
    per-user first day) and one equi-join; the first-day frame is
    user-bounded, so the join shuffles keys, never the fact table
    twice."""
    events = Catalog(sf_dir).load(spark, "events")
    user_days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    firsts = user_days.groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    is_new = F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    return (
        user_days.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(is_new).cast("bigint").alias("n_new"),
            F.sum(1 - is_new).cast("bigint").alias("n_returning"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            "n_new",
            "n_returning",
        )
    )


@register(
    "dwell_time_by_type",
    oracle="""
WITH gaps AS (
    SELECT event_type,
           epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       ROUND(CAST(SUM(gap_us) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 1000000, 6) AS avg_gap_s,
       ROUND(CAST(MAX(gap_us) AS DOUBLE) / 1000000, 6) AS max_gap_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
""",
)
def dwell_time_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell time after each event type: the gap to the same user's
    next event — the direct read of which screens users linger on.
    One per-user LEAD window (hash-partitioned, bounded per key), then
    a bounded aggregate per type; times stay integer microseconds
    until the final mirrored divisions."""
    events = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gaps = events.select(
        "event_type",
        (
            F.unix_micros(F.lead("ts").over(w))
            - F.unix_micros(F.col("ts"))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.sum("gap_us").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 1000000,
            6,
        ).alias("avg_gap_s"),
        F.round(F.max("gap_us").cast("double") / 1000000, 6).alias(
            "max_gap_s"
        ),
    )


@register(
    "hour_dow_load_heatmap",
    oracle="""
WITH cells AS (
    SELECT dayname(ts) AS dow, CAST(hour(ts) AS INT) AS hour,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells)
SELECT dow, hour, n,
       ROUND(CAST(n AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE), 6)
           AS share
FROM cells
""",
)
def hour_dow_load_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (day-of-week x hour) load heatmap — capacity planning's
    first picture. Day names (not engine-specific day NUMBERS: Spark
    counts Sunday=1, DuckDB Sunday=0 — the name string is the
    unambiguous spelling) over one map-side-combining aggregate into
    ≤168 cells; the share denominator is a 1-row broadcast."""
    events = Catalog(sf_dir).load(spark, "events")
    cells = events.groupBy(
        F.date_format("ts", "EEEE").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("t"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("t").cast("double"), 6
        ).alias("share"),
    )


@register(
    "interarrival_burstiness",
    oracle=f"""
WITH gaps AS (
    SELECT user_id,
           epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
per_user AS (
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(gap_us) AS HUGEINT) AS s,
           CAST(SUM(CAST(gap_us AS HUGEINT) * gap_us) AS HUGEINT) AS ss
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(*) >= {BURST_MIN_GAPS}
),
scored AS (
    SELECT user_id,
           CAST(FLOOR(ROUND(
               (SQRT(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               / (SQRT(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                  + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               * 10) AS BIGINT) AS band
    FROM per_user
)
SELECT band, COUNT(*) AS n_users FROM scored GROUP BY band
""",
)
def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of each user's
    inter-event gaps, banded into a histogram: B near −1 is periodic
    automation, near 0 Poisson, near +1 bursty humans. Contract
    (stated, mirrored): users with fewer than {BURST_MIN_GAPS} gaps
    are excluded — the coefficient is noise below that. μ and σ come
    from exact integer gap sums (HUGEINT/decimal(38,0): a day-scale
    gap squared passes int64); the one double expression (B → band)
    is rounded to 6 dp before flooring in both engines so fp edges
    cannot flip a band."""
    events = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gaps = events.select(
        "user_id",
        (
            F.unix_micros(F.lead("ts").over(w))
            - F.unix_micros(F.col("ts"))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("gap_us").cast("decimal(38,0)")).alias("s"),
            F.sum(
                F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us")
            ).alias("ss"),
        )
        .filter(F.col("n") >= BURST_MIN_GAPS)
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    sig = F.sqrt(
        F.col("ss").cast("double") / F.col("n").cast("double") - mu * mu
    )
    band = F.floor(F.round((sig - mu) / (sig + mu), 6) * 10).cast(
        "bigint"
    )
    return (
        per_user.select(band.alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_SESS_SQL = f"""
    SELECT user_id, event_type,
           SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sid
    FROM (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
"""


@register(
    "session_purchase_rate",
    oracle=f"""
WITH sess AS ({_SESS_SQL}),
per_session AS (
    SELECT user_id, sid, COUNT(*) AS n_events,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS has_purchase
    FROM sess GROUP BY user_id, sid
)
SELECT LEAST(n_events, 10) AS size_band,
       COUNT(*) AS n_sessions,
       CAST(SUM(has_purchase) AS BIGINT) AS n_with_purchase,
       ROUND(CAST(SUM(has_purchase) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS purchase_rate
FROM per_session GROUP BY 1
""",
)
def session_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate by session size — does a longer session mean a
    closer customer or a lost one? Sessions come from the shared
    30-minute gaps-and-islands spelling (per-user windows, bounded per
    key); per-session flags fold in the same shuffle; the report is a
    bounded band table (sizes clamp at 10+)."""
    events = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = SESSION_GAP_MIN * 60 * 1000000
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
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
    )
    return per_session.groupBy(
        F.least(F.col("n_events"), F.lit(10)).alias("size_band")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("has_purchase").cast("bigint").alias("n_with_purchase"),
        F.round(
            F.sum("has_purchase").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("purchase_rate"),
    )


@register(
    "user_lifespan_histogram",
    oracle="""
WITH spans AS (
    SELECT user_id,
           date_diff('day', MIN(CAST(ts AS DATE)),
                     MAX(CAST(ts AS DATE))) AS span_days
    FROM events GROUP BY user_id
)
SELECT CAST(FLOOR(span_days / 30) AS BIGINT) AS month_band,
       COUNT(*) AS n_users,
       CAST(MIN(span_days) AS BIGINT) AS min_days,
       CAST(MAX(span_days) AS BIGINT) AS max_days
FROM spans GROUP BY 1
""",
)
def user_lifespan_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed user lifespans (first-seen to last-seen, days) banded
    by 30-day months — the retention envelope. One per-user min/max
    aggregate, one bounded band table; all integer."""
    events = Catalog(sf_dir).load(spark, "events")
    spans = events.groupBy("user_id").agg(
        F.datediff(
            F.max(F.to_date("ts")), F.min(F.to_date("ts"))
        ).alias("span_days")
    )
    return spans.groupBy(
        F.floor(F.col("span_days") / 30).cast("bigint").alias(
            "month_band"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("span_days").cast("bigint").alias("min_days"),
        F.max("span_days").cast("bigint").alias("max_days"),
    )


@register(
    "event_value_deciles_by_type",
    oracle=f"""
WITH counts AS (
    SELECT event_type, {_V_CENTS} AS cents, COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, cents,
           SUM(n) OVER (
               PARTITION BY event_type ORDER BY cents ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS c,
           SUM(n) OVER (PARTITION BY event_type) AS total
    FROM counts
),
marks AS (
    SELECT event_type, d.d AS decile,
           MIN(cents) FILTER (
               WHERE c * 10 >= d.d * total
           ) AS cents
    FROM cum
    CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) d
    GROUP BY event_type, d.d
)
SELECT event_type, CAST(decile AS INT) AS decile, cents FROM marks
""",
)
def event_value_deciles_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact value deciles per event type (type-1 quantiles: smallest
    value whose cumulative count reaches k/10 of the group). The
    cumulative walk runs over the per-type COUNT TABLE — bounded by
    distinct cents per type, never the fact table — the same collapsed
    spelling as the global percentile machinery, partitioned by a
    bounded type set. Values stay integer cents end to end."""
    events = Catalog(sf_dir).load(spark, "events")
    counts = events.groupBy(
        "event_type",
        F.round(F.col("value") * 100)
        .cast("bigint")
        .alias("cents"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("cents").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        "cents",
        F.sum("n").over(wcum).alias("c"),
        F.sum("n").over(wtot).alias("total"),
    )
    deciles = spark.range(1, 10).select(
        F.col("id").cast("int").alias("decile")
    )
    return (
        cum.crossJoin(F.broadcast(deciles))
        .filter(F.col("c") * 10 >= F.col("decile") * F.col("total"))
        .groupBy("event_type", "decile")
        .agg(F.min("cents").alias("cents"))
    )


# ---------------------------------------------------------------------
# commerce
# ---------------------------------------------------------------------

_E_CENTS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
_D_HUND = "CAST(ROUND(l_discount * 100) AS BIGINT)"
_T_HUND = "CAST(ROUND(l_tax * 100) AS BIGINT)"


@register(
    "ship_latency_percentiles_by_priority",
    oracle="""
WITH delays AS (
    SELECT o.o_orderpriority AS priority,
           date_diff('day', CAST(o.o_orderdate AS DATE),
                     CAST(l.l_shipdate AS DATE)) AS delay_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
counts AS (
    SELECT priority, delay_days, COUNT(*) AS n FROM delays GROUP BY 1, 2
),
cum AS (
    SELECT priority, delay_days,
           SUM(n) OVER (
               PARTITION BY priority ORDER BY delay_days ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS c,
           SUM(n) OVER (PARTITION BY priority) AS total
    FROM counts
)
SELECT priority,
       CAST(MIN(delay_days) FILTER (WHERE c * 100 >= 50 * total)
            AS BIGINT) AS p50,
       CAST(MIN(delay_days) FILTER (WHERE c * 100 >= 90 * total)
            AS BIGINT) AS p90,
       CAST(MIN(delay_days) FILTER (WHERE c * 100 >= 99 * total)
            AS BIGINT) AS p99
FROM cum GROUP BY priority
""",
)
def ship_latency_percentiles_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency percentiles per order priority — the SLA
    table (does URGENT actually ship sooner, and what does the tail
    look like?). Exact type-1 percentiles via the collapsed count-table
    walk: the cumulative window runs over (priority, delay_days) —
    bounded by the delay domain, never the joined fact rows."""
    cat = Catalog(sf_dir)
    li = cat.load(spark, "lineitem").select("l_orderkey", "l_shipdate")
    orders = cat.load(spark, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delays = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("delay_days"),
    )
    counts = delays.groupBy("priority", "delay_days").agg(
        F.count(F.lit(1)).alias("n")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy(F.col("delay_days").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("priority")
    cum = counts.select(
        "priority",
        "delay_days",
        F.sum("n").over(wcum).alias("c"),
        F.sum("n").over(wtot).alias("total"),
    )

    def _pct(p: int) -> F.Column:
        return (
            F.min(
                F.when(
                    F.col("c") * 100 >= p * F.col("total"),
                    F.col("delay_days"),
                )
            )
            .cast("bigint")
            .alias(f"p{p}")
        )

    return cum.groupBy("priority").agg(_pct(50), _pct(90), _pct(99))


@register(
    "supplier_nation_herfindahl",
    oracle=f"""
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST({_E_CENTS} AS HUGEINT)
                    * (100 - {_D_HUND})) AS HUGEINT) AS r
    FROM lineitem GROUP BY l_suppkey
),
bynation AS (
    SELECT n.n_name AS nation, r.r
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
)
SELECT nation,
       COUNT(*) AS n_suppliers,
       ROUND(CAST(SUM(r * r) AS DOUBLE)
             / (CAST(SUM(r) AS DOUBLE) * CAST(SUM(r) AS DOUBLE)), 6)
           AS hhi,
       ROUND(CAST(MAX(r) AS DOUBLE) / CAST(SUM(r) AS DOUBLE), 6)
           AS top_share
FROM bynation GROUP BY nation
""",
)
def supplier_nation_herfindahl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation — the antitrust number for supply-chain risk (HHI near
    1/n is competitive, near 1 is a single point of failure). Revenue
    units are exact integers (cents x (100−discount) hundredths), the
    squared sums ride decimal(38,0)/HUGEINT, and HHI's one division is
    a final mirrored double. Nation broadcasts; the supplier join is
    AQE-sized (supplier grows with the corpus); the only fact shuffle
    is the per-supplier revenue aggregate."""
    cat = Catalog(sf_dir)
    li = cat.load(spark, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100)
            .cast("decimal(38,0)")
            * (
                100
                - F.round(F.col("l_discount") * 100).cast("bigint")
            )
        ).alias("r")
    )
    sup = cat.load(spark, "supplier").select("s_suppkey", "s_nationkey")
    nat = cat.load(spark, "nation").select("n_nationkey", "n_name")
    bynation = rev.join(
        sup, rev.l_suppkey == sup.s_suppkey
    ).join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
    return bynation.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            F.sum(F.col("r") * F.col("r")).cast("double")
            / (
                F.sum("r").cast("double") * F.sum("r").cast("double")
            ),
            6,
        ).alias("hhi"),
        F.round(
            F.max("r").cast("double") / F.sum("r").cast("double"), 6
        ).alias("top_share"),
    )


@register(
    "part_type_price_iqr",
    oracle="""
WITH cents AS (
    SELECT p_type,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS c
    FROM part
),
counts AS (
    SELECT p_type, c, COUNT(*) AS n FROM cents GROUP BY 1, 2
),
cum AS (
    SELECT p_type, c,
           SUM(n) OVER (
               PARTITION BY p_type ORDER BY c ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS k,
           SUM(n) OVER (PARTITION BY p_type) AS total
    FROM counts
),
qs AS (
    SELECT p_type,
           MIN(c) FILTER (WHERE k * 4 >= total) AS q1,
           MIN(c) FILTER (WHERE k * 2 >= total) AS median,
           MIN(c) FILTER (WHERE k * 4 >= 3 * total) AS q3
    FROM cum GROUP BY p_type
)
SELECT p_type, q1, median, q3, q3 - q1 AS iqr FROM qs
""",
)
def part_type_price_iqr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retail-price quartiles and IQR per part type — the robust
    spread table a pricing audit reads before flagging outliers
    (variance is useless under catalog price tails). Type-1 quartiles
    over per-type count tables (bounded by distinct cents), all
    integer."""
    part = Catalog(sf_dir).load(spark, "part")
    counts = part.groupBy(
        "p_type",
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("c"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("p_type")
        .orderBy(F.col("c").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("p_type")
    cum = counts.select(
        "p_type",
        "c",
        F.sum("n").over(wcum).alias("k"),
        F.sum("n").over(wtot).alias("total"),
    )
    qs = cum.groupBy("p_type").agg(
        F.min(
            F.when(F.col("k") * 4 >= F.col("total"), F.col("c"))
        ).alias("q1"),
        F.min(
            F.when(F.col("k") * 2 >= F.col("total"), F.col("c"))
        ).alias("median"),
        F.min(
            F.when(F.col("k") * 4 >= 3 * F.col("total"), F.col("c"))
        ).alias("q3"),
    )
    return qs.select(
        "p_type",
        "q1",
        "median",
        "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
    )


@register(
    "order_line_value_concentration",
    oracle=f"""
WITH per_order AS (
    SELECT l_orderkey,
           MAX({_E_CENTS}) AS mx,
           CAST(SUM({_E_CENTS}) AS HUGEINT) AS s
    FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(FLOOR(ROUND(CAST(mx AS DOUBLE) / CAST(s AS DOUBLE), 6)
                  * 10) AS BIGINT) AS share_band,
       COUNT(*) AS n_orders
FROM per_order GROUP BY 1
""",
)
def order_line_value_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How much of each order's value sits in its single largest line —
    band 10 means single-line orders, low bands mean balanced baskets
    (the signal bundling and shipping-split logic read). One
    map-side-combining aggregate per order, one bounded band table;
    the share rounds to 6 dp before banding in both engines."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    per_order = li.groupBy("l_orderkey").agg(
        F.max(cents).alias("mx"),
        F.sum(cents.cast("decimal(38,0)")).alias("s"),
    )
    band = F.floor(
        F.round(
            F.col("mx").cast("double") / F.col("s").cast("double"), 6
        )
        * 10
    ).cast("bigint")
    return per_order.groupBy(band.alias("share_band")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "nation_month_revenue_anomalies",
    oracle=f"""
WITH rev AS (
    SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y-%m') AS month,
           CAST(SUM({_O_CENTS}) AS HUGEINT) AS cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
),
stats AS (
    SELECT nation, COUNT(*) AS m,
           CAST(SUM(cents) AS HUGEINT) AS s,
           CAST(SUM(cents * cents) AS HUGEINT) AS ss
    FROM rev GROUP BY nation
)
SELECT r.nation, r.month, CAST(r.cents AS BIGINT) AS cents,
       ROUND((CAST(m AS DOUBLE) * CAST(r.cents AS DOUBLE)
              - CAST(s AS DOUBLE))
             / SQRT(CAST(m AS DOUBLE) * CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 4) AS z
FROM rev r JOIN stats t ON t.nation = r.nation
WHERE CAST(m AS HUGEINT) * ss - s * s > 0
  AND ABS(ROUND((CAST(m AS DOUBLE) * CAST(r.cents AS DOUBLE)
                 - CAST(s AS DOUBLE))
                / SQRT(CAST(m AS DOUBLE) * CAST(ss AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 4)) > 2
""",
)
def nation_month_revenue_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nation-months whose revenue sits beyond 2σ of that nation's own
    monthly distribution — the regional-anomaly sweep a revenue desk
    runs monthly. Per-nation moments come from exact integer cent sums
    over the bounded (nation, month) table; z rounds to 4 dp on both
    sides of the threshold (the embedding_norm_outliers contract) so
    the filter cannot flip between engines. Nation broadcasts (25
    rows); the customer join is left to AQE — customer is a
    scale-with-corpus dimension, never a forced broadcast."""
    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders")
    cust = cat.load(spark, "customer").select("c_custkey", "c_nationkey")
    nat = cat.load(spark, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100)
                .cast("decimal(38,0)")
            ).alias("cents")
        )
    )
    stats = rev.groupBy("nation").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    z = F.round(
        (
            F.col("m").cast("double") * F.col("cents").cast("double")
            - F.col("s").cast("double")
        )
        / F.sqrt(
            F.col("m").cast("double") * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        ),
        4,
    )
    return (
        rev.join(F.broadcast(stats), "nation")
        .filter(
            F.col("m").cast("decimal(38,0)") * F.col("ss")
            - F.col("s") * F.col("s")
            > 0
        )
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2)
        .select(
            "nation", "month", F.col("cents").cast("bigint").alias("cents"), "z"
        )
    )


@register(
    "customer_order_value_cv",
    oracle=f"""
WITH per_cust AS (
    SELECT o_custkey, COUNT(*) AS n,
           CAST(SUM({_O_CENTS}) AS HUGEINT) AS s,
           CAST(SUM(CAST({_O_CENTS} AS HUGEINT) * {_O_CENTS})
                AS HUGEINT) AS ss
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 3
),
scored AS (
    SELECT CAST(FLOOR(ROUND(
               SQRT(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
               / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               * 10) AS BIGINT) AS cv_band
    FROM per_cust
)
SELECT cv_band, COUNT(*) AS n_customers FROM scored GROUP BY cv_band
""",
)
def customer_order_value_cv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Coefficient of variation of each customer's order values, banded
    — low bands are steady replenishers, high bands one-off whales
    (the volatility axis RFM misses). Contract (stated, mirrored):
    customers with fewer than 3 orders are excluded. Moments are exact
    integer cent sums; the one double expression (cv → band) rounds to
    6 dp before flooring in both engines."""
    orders = Catalog(sf_dir).load(spark, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents.cast("decimal(38,0)")).alias("s"),
            F.sum(cents.cast("decimal(38,0)") * cents).alias("ss"),
        )
        .filter(F.col("n") >= 3)
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    sig = F.sqrt(
        F.col("ss").cast("double") / F.col("n").cast("double") - mu * mu
    )
    band = F.floor(F.round(sig / mu, 6) * 10).cast("bigint")
    return per_cust.select(band.alias("cv_band")).groupBy(
        "cv_band"
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "lineitem_tax_discount_grid",
    oracle=f"""
WITH cells AS (
    SELECT {_T_HUND} AS tax_h, {_D_HUND} AS disc_h,
           COUNT(*) AS n,
           CAST(SUM({_E_CENTS}) AS HUGEINT) AS s
    FROM lineitem GROUP BY 1, 2
),
tot AS (
    SELECT CAST(SUM(n) AS HUGEINT) AS tn, CAST(SUM(s) AS HUGEINT) AS ts
    FROM cells
)
SELECT tax_h, disc_h, n,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS avg_cents,
       ROUND((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST((SELECT ts FROM tot) AS DOUBLE)
                / CAST((SELECT tn FROM tot) AS DOUBLE)), 6) AS lift
FROM cells
""",
)
def lineitem_tax_discount_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The (tax x discount) contingency grid with average line value
    and lift vs the corpus mean — the table that shows whether
    discounts concentrate on high- or low-value lines and how tax
    brackets interact. Tax/discount quantize to exact hundredths, so
    the grid is bounded (~9x11 cells); one map-side-combining
    aggregate, one 1-row broadcast denominator."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    cells = li.groupBy(
        F.round(F.col("l_tax") * 100).cast("bigint").alias("tax_h"),
        F.round(F.col("l_discount") * 100)
        .cast("bigint")
        .alias("disc_h"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100)
            .cast("decimal(38,0)")
        ).alias("s"),
    )
    tot = cells.agg(
        F.sum("n").cast("decimal(38,0)").alias("tn"),
        F.sum("s").alias("ts"),
    )
    avg = F.col("s").cast("double") / F.col("n").cast("double")
    gavg = F.col("ts").cast("double") / F.col("tn").cast("double")
    return cells.crossJoin(F.broadcast(tot)).select(
        "tax_h",
        "disc_h",
        "n",
        F.round(avg, 6).alias("avg_cents"),
        F.round(avg / gavg, 6).alias("lift"),
    )


@register(
    "returns_month_seasonality",
    oracle="""
WITH months AS (
    SELECT strftime(l_shipdate, '%Y-%m') AS month,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned
    FROM lineitem GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS tn,
           CAST(SUM(n_returned) AS BIGINT) AS tr
    FROM months
)
SELECT month, n, n_returned,
       ROUND(CAST(n_returned AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       ROUND((CAST(n_returned AS DOUBLE) / CAST(n AS DOUBLE)
              - CAST((SELECT tr FROM tot) AS DOUBLE)
                / CAST((SELECT tn FROM tot) AS DOUBLE))
             / SQRT(CAST((SELECT tr FROM tot) AS DOUBLE)
                    / CAST((SELECT tn FROM tot) AS DOUBLE)
                    * (1 - CAST((SELECT tr FROM tot) AS DOUBLE)
                           / CAST((SELECT tn FROM tot) AS DOUBLE))
                    / CAST(n AS DOUBLE)), 4) AS z
FROM months
""",
)
def returns_month_seasonality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly return rate with a one-proportion z-score against the
    corpus rate — does February really return more, or is it binomial
    noise at that month's volume? Counts are exact; the rate and z are
    final mirrored doubles (z rounds to 4 dp); the denominator is a
    1-row broadcast."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    months = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_returned"),
    )
    tot = months.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("n_returned").cast("bigint").alias("tr"),
    )
    p = F.col("n_returned").cast("double") / F.col("n").cast("double")
    p0 = F.col("tr").cast("double") / F.col("tn").cast("double")
    z = F.round(
        (p - p0) / F.sqrt(p0 * (1 - p0) / F.col("n").cast("double")), 4
    )
    return months.crossJoin(F.broadcast(tot)).select(
        "month",
        "n",
        "n_returned",
        F.round(p, 6).alias("rate"),
        z.alias("z"),
    )


@register(
    "brand_price_dispersion",
    oracle="""
WITH cents AS (
    SELECT p_brand, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS c
    FROM part
)
SELECT p_brand,
       COUNT(*) AS n_parts,
       ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS mean_cents,
       ROUND(SQRT(CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE)
                  - (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                    * (CAST(SUM(c) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)))
             / (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6)
           AS cv
FROM cents GROUP BY p_brand
""",
)
def brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price dispersion (coefficient of variation) per brand — a brand
    whose catalog spans an order of magnitude prices very differently
    from a one-price-point brand, and the CV is the unit-free way to
    rank that. One aggregate over exact cent moments; CV is the final
    mirrored double."""
    part = Catalog(sf_dir).load(spark, "part")
    c = F.round(F.col("p_retailprice") * 100).cast("bigint")
    agg = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c.cast("decimal(38,0)")).alias("s"),
        F.sum(c.cast("decimal(38,0)") * c).alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    sig = F.sqrt(
        F.col("ss").cast("double") / F.col("n").cast("double") - mu * mu
    )
    return agg.select(
        "p_brand",
        F.col("n").alias("n_parts"),
        F.round(mu, 6).alias("mean_cents"),
        F.round(sig / mu, 6).alias("cv"),
    )


# ---------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------

_EMB_Q = 1000000
_EMB_DIMS = 64

#: Quantized (vec_id, dim, q) expansion for centroid_distance_bands —
#: FINITE-VECTOR-gated: ROUND(NaN/Inf)::BIGINT is an ANSI crash, and a
#: centroid averaged over Inf is meaningless (Spark side mirrors with
#: operators/similarity.finite_vectors).
_A3_DIMS_SQL = f"""
    SELECT vec_id, label, u.i AS dim,
           CAST(ROUND(CAST(embedding[u.i] AS DOUBLE) * {_EMB_Q}) AS BIGINT)
               AS q
    FROM embeddings
    CROSS JOIN (SELECT unnest(generate_series(1, {_EMB_DIMS})) AS i) u
    WHERE {finite_vec_where("embedding")}
"""


@register(
    "embedding_sign_bias_profile",
    oracle=f"""
WITH vals AS (
    SELECT u.i AS dim, CAST(embedding[u.i] AS DOUBLE) AS v
    FROM embeddings
    CROSS JOIN (SELECT unnest(generate_series(1, {_EMB_DIMS})) AS i) u
)
SELECT CAST(dim AS INT) AS dim,
       CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       ROUND(CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS share_pos
FROM vals GROUP BY dim
""",
)
def embedding_sign_bias_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension sign balance of the embedding corpus — a dimension
    that is 90% positive is carrying a bias term, not signal, and every
    symmetric quantizer wastes half its range on it (the check run
    before committing to int8 symmetric quantization). Sign tests on
    the RAW floats are exact (no arithmetic, no epsilon); one
    posexplode scan into a dims-bounded aggregate."""
    emb = Catalog(sf_dir).load(spark, "embeddings")
    vals = emb.select(
        F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    return vals.groupBy("dim").agg(
        F.sum(F.when(F.col("v") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("v") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg"),
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        F.round(
            F.sum(F.when(F.col("v") > 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("share_pos"),
    )


@register(
    "centroid_distance_bands",
    oracle=f"""
WITH dims AS ({_A3_DIMS_SQL}),
cent AS (
    SELECT label, dim, CAST(SUM(q) AS HUGEINT) AS s, COUNT(*) AS n
    FROM dims GROUP BY label, dim
),
dist2 AS (
    SELECT d.vec_id, d.label,
           CAST(SUM((CAST(c.n AS HUGEINT) * d.q - c.s)
                    * (CAST(c.n AS HUGEINT) * d.q - c.s)) AS HUGEINT)
               AS d2_scaled,
           MAX(c.n) AS n
    FROM dims d JOIN cent c ON c.label = d.label AND c.dim = d.dim
    GROUP BY d.vec_id, d.label
)
SELECT label,
       CAST(FLOOR(ROUND(SQRT(CAST(d2_scaled AS DOUBLE))
                        / CAST(n AS DOUBLE) / {_EMB_Q}, 6) * 2)
            AS BIGINT) AS half_unit_band,
       COUNT(*) AS n_vecs
FROM dist2 GROUP BY 1, 2
""",
)
def centroid_distance_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distance-to-own-label-centroid histogram per label (0.5-unit
    bands) — tight bands mean coherent labels, heavy tails mean
    mislabels or multi-modal classes (the triage view before trusting
    label supervision). Exactness trick: the centroid is rational
    (s/n), so distances are computed on n-SCALED integers —
    Σ(n·q_i − s_i)² rides decimal(38,0)/HUGEINT exactly, and the only
    double is the final sqrt/n/grid band expression, rounded to 6 dp
    before banding in both engines. Per-label per-dim sums are a
    labels×dims-bounded table broadcast back onto one posexplode
    scan. FINITE-VECTOR-gated (see _A3_DIMS_SQL; oracle mirrors)."""
    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda v: F.round(v.cast("double") * _EMB_Q).cast(
                    "bigint"
                ),
            )
        ).alias("pos", "q"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        "q",
    )
    cent = dims.groupBy("label", "dim").agg(
        F.sum(F.col("q").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    scaled = (
        F.col("n").cast("decimal(38,0)") * F.col("q") - F.col("s")
    )
    dist2 = (
        dims.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(scaled * scaled).alias("d2_scaled"),
            F.max("n").alias("n"),
        )
    )
    band = F.floor(
        F.round(
            F.sqrt(F.col("d2_scaled").cast("double"))
            / F.col("n").cast("double")
            / _EMB_Q,
            6,
        )
        * 2
    ).cast("bigint")
    return dist2.groupBy(
        "label", band.alias("half_unit_band")
    ).agg(F.count(F.lit(1)).alias("n_vecs"))


# ---------------------------------------------------------------------
# drawdown / drift / rate intervals
# ---------------------------------------------------------------------


@register(
    "daily_revenue_drawdown",
    oracle=f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM({_O_CENTS}) AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
peaks AS (
    SELECT day, cents,
           MAX(cents) OVER (
               ORDER BY day ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS peak
    FROM daily
)
SELECT CAST(day AS VARCHAR) AS day, cents, peak,
       ROUND(1 - CAST(cents AS DOUBLE) / CAST(peak AS DOUBLE), 6)
           AS drawdown
FROM peaks
""",
)
def daily_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown of daily revenue — the finance view of a
    revenue time series (how far below the best day so far each day
    sits). The running max is a window over the DAILY AGGREGATE table
    only — calendar-bounded (~hundreds of rows at any corpus size),
    the documented bounded-spine exception to the no-global-window
    rule; the fact table contributes one map-side-combining sum."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    wpeak = (
        Window.orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peaks = daily.withColumn("peak", F.max("cents").over(wpeak))
    return peaks.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        "peak",
        F.round(
            1
            - F.col("cents").cast("double")
            / F.col("peak").cast("double"),
            6,
        ).alias("drawdown"),
    )


@register(
    "priority_mix_quarter_psi",
    oracle="""
WITH cells AS (
    SELECT strftime(o_orderdate, '%Y') || '-Q'
           || CAST(quarter(o_orderdate) AS VARCHAR) AS qtr,
           o_orderpriority AS priority, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
),
tot AS (SELECT qtr, CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY qtr),
shares AS (
    SELECT c.qtr, c.priority,
           CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS p
    FROM cells c JOIN tot t ON t.qtr = c.qtr
),
base AS (
    SELECT priority, p AS q FROM shares
    WHERE qtr = (SELECT MIN(qtr) FROM shares)
)
SELECT s.qtr,
       ROUND(SUM((s.p - b.q) * LN(s.p / b.q)), 6) AS psi
FROM shares s JOIN base b ON b.priority = s.priority
GROUP BY s.qtr
""",
)
def priority_mix_quarter_psi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Population-stability index of the order-priority mix per quarter
    against the first quarter — the drift monitor a workload forecaster
    keys on (PSI > 0.2 is the classic retrain trigger). Shares come
    from exact counts over a bounded (quarter x priority) grid; ln runs
    on identical share ratios in both engines (the quality_drift_psi
    float contract); the baseline quarter is the MIN quarter string,
    a deterministic pick."""
    orders = Catalog(sf_dir).load(spark, "orders")
    cells = orders.groupBy(
        F.concat(
            F.date_format("o_orderdate", "yyyy"),
            F.lit("-Q"),
            F.quarter("o_orderdate").cast("string"),
        ).alias("qtr"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.groupBy("qtr").agg(
        F.sum("n").cast("bigint").alias("t")
    )
    shares = cells.join(tot, "qtr").select(
        "qtr",
        "priority",
        (F.col("n").cast("double") / F.col("t").cast("double")).alias(
            "p"
        ),
    )
    base_q = shares.agg(F.min("qtr").alias("bq"))
    base = (
        shares.join(
            F.broadcast(base_q), F.col("qtr") == F.col("bq"), "inner"
        )
        .select("priority", F.col("p").alias("q"))
    )
    return (
        shares.join(F.broadcast(base), "priority")
        .groupBy("qtr")
        .agg(
            F.round(
                F.sum(
                    (F.col("p") - F.col("q"))
                    * F.log(F.col("p") / F.col("q"))
                ),
                6,
            ).alias("psi")
        )
    )


@register(
    "hourly_error_rate_wilson",
    oracle="""
WITH hours AS (
    SELECT CAST(hour(ts) AS INT) AS hour, COUNT(*) AS n,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_err
    FROM events GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS tn,
           CAST(SUM(n_err) AS BIGINT) AS te
    FROM hours
),
scored AS (
    SELECT hour, n, n_err,
           CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           CAST((SELECT te FROM tot) AS DOUBLE)
           / CAST((SELECT tn FROM tot) AS DOUBLE) AS p0
    FROM hours
)
SELECT hour, n, n_err, ROUND(p, 6) AS rate,
       ROUND((p + 1.96 * 1.96 / (2 * n)
              - 1.96 * SQRT(p * (1 - p) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_low,
       CASE WHEN ROUND((p + 1.96 * 1.96 / (2 * n)
                        - 1.96 * SQRT(p * (1 - p) / n
                                      + 1.96 * 1.96 / (4.0 * n * n)))
                       / (1 + 1.96 * 1.96 / n), 6) > ROUND(p0, 6)
            THEN 1 ELSE 0 END AS flagged
FROM scored
""",
)
def hourly_error_rate_wilson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Error rate per hour of day with a Wilson-score lower bound —
    an hour is flagged only when even the CONSERVATIVE end of its 95%
    interval clears the corpus rate, the test that doesn't cry wolf on
    low-volume hours the way a raw-rate ranking does. Counts are
    exact; the Wilson expression and the flag comparison run on
    6-dp-rounded values identically in both engines."""
    events = Catalog(sf_dir).load(spark, "events")
    hours = events.groupBy(
        F.hour("ts").cast("int").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_err"),
    )
    tot = hours.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("n_err").cast("bigint").alias("te"),
    )
    p = F.col("n_err").cast("double") / F.col("n").cast("double")
    p0 = F.col("te").cast("double") / F.col("tn").cast("double")
    nn = F.col("n").cast("double")
    z2 = 1.96 * 1.96
    wl = F.round(
        (
            p
            + z2 / (2 * nn)
            - 1.96
            * F.sqrt(p * (1 - p) / nn + z2 / (4.0 * nn * nn))
        )
        / (1 + z2 / nn),
        6,
    )
    return hours.crossJoin(F.broadcast(tot)).select(
        "hour",
        "n",
        "n_err",
        F.round(p, 6).alias("rate"),
        wl.alias("wilson_low"),
        F.when(wl > F.round(p0, 6), 1).otherwise(0).alias("flagged"),
    )


# ---------------------------------------------------------------------
# allocation / grouped regression / decomposition / survival
# ---------------------------------------------------------------------

#: Slots handed out by the largest-remainder allocation.
ALLOC_SLOTS = 10000

#: Years compared by the revenue mix-shift decomposition.
MIX_YEAR_A = 1996
MIX_YEAR_B = 1997

#: Right-censoring horizon (days before the corpus max) for the
#: survival curve: users last seen inside the horizon are censored
#: (still alive), not churned.
SURV_CENSOR_DAYS = 7


@register(
    "largest_remainder_allocation",
    oracle=f"""
WITH counts AS (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
based AS (
    SELECT source, n,
           CAST((n * {ALLOC_SLOTS}) // (SELECT t FROM tot) AS BIGINT)
               AS base,
           CAST(n * {ALLOC_SLOTS}
                - ((n * {ALLOC_SLOTS}) // (SELECT t FROM tot))
                  * (SELECT t FROM tot) AS BIGINT) AS rem
    FROM counts
),
leftover AS (
    SELECT CAST({ALLOC_SLOTS} - SUM(base) AS BIGINT) AS l FROM based
),
ranked AS (
    SELECT source, n, base,
           ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk
    FROM based
)
SELECT source, n AS n_docs,
       CAST(base + CASE WHEN rk <= (SELECT l FROM leftover)
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked
""",
)
def largest_remainder_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a fixed sample
    budget across sources — the allocator behind "give me exactly
    {ALLOC_SLOTS} docs, proportional to source size": floor the exact
    proportional share, then hand the leftover slots to the largest
    remainders (ties broken by source name — deterministic). The whole
    computation is INTEGER (n·slots, integer division, exact
    remainders), so the allocation is reproducible bit-for-bit; the
    only window runs over the bounded source table. Σ alloc = slots
    exactly — the property floor- or round-based allocators break."""
    docs = Catalog(sf_dir).load(spark, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("bigint").alias("t"))
    # `div` is Spark's exact integer division (same as the oracle's
    # `//`); floor(a / b) would route through IEEE double and can
    # diverge once n*slots or t approach 2^53.
    base = F.expr(f"(n * {ALLOC_SLOTS}) div t")
    based = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        base.cast("bigint").alias("base"),
        (F.col("n") * ALLOC_SLOTS - base * F.col("t"))
        .cast("bigint")
        .alias("rem"),
    )
    leftover = based.agg(
        (F.lit(ALLOC_SLOTS) - F.sum("base")).cast("bigint").alias("l")
    )
    wrk = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    ranked = based.withColumn("rk", F.row_number().over(wrk))
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "source",
        F.col("n").alias("n_docs"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("l"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    )


@register(
    "brand_size_price_slopes",
    oracle="""
WITH pts AS (
    SELECT p_brand, CAST(p_size AS BIGINT) AS x,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS y
    FROM part
),
stats AS (
    SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
           CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
    FROM pts GROUP BY p_brand
)
SELECT p_brand, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           AS intercept,
       ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           AS r2
FROM stats
WHERE CAST(n AS HUGEINT) * sxx - sx * sx > 0
  AND CAST(n AS HUGEINT) * syy - sy * sy > 0
""",
)
def brand_size_price_slopes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand OLS of retail price (cents) on part size — GROUPED
    regression from sufficient statistics: one aggregate computes the
    five exact integer sums per brand, and slope/intercept/r² are
    final mirrored doubles, so a thousand-group regression costs
    exactly one map-side-combining shuffle (the grouped extension of
    ``regr_price_on_qty``'s global contract). Degenerate brands
    (constant size or constant price) are excluded by EXACT integer
    determinant tests, never a float epsilon."""
    part = Catalog(sf_dir).load(spark, "part")
    x = F.col("p_size").cast("bigint")
    y = F.round(F.col("p_retailprice") * 100).cast("bigint")
    d38 = "decimal(38,0)"
    stats = part.select(
        "p_brand", x.alias("x"), y.alias("y")
    ).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return (
        stats.filter(
            (
                F.col("n").cast(d38) * F.col("sxx")
                - F.col("sx") * F.col("sx")
                > 0
            )
            & (
                F.col("n").cast(d38) * F.col("syy")
                - F.col("sy") * F.col("sy")
                > 0
            )
        )
        .select(
            "p_brand",
            "n",
            F.round(cov / varx, 6).alias("slope"),
            F.round((sy * sxx - sx * sxy) / varx, 6).alias("intercept"),
            F.round((cov * cov) / (varx * vary), 6).alias("r2"),
        )
    )


@register(
    "revenue_mix_shift_decomposition",
    oracle=f"""
WITH yearly AS (
    SELECT n.n_name AS nation,
           CAST(strftime(o.o_orderdate, '%Y') AS INT) AS yr,
           COUNT(*) AS n,
           CAST(SUM({_O_CENTS}) AS HUGEINT) AS s
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE CAST(strftime(o.o_orderdate, '%Y') AS INT)
          IN ({MIX_YEAR_A}, {MIX_YEAR_B})
    GROUP BY 1, 2
),
wide AS (
    SELECT nation,
           MAX(CASE WHEN yr = {MIX_YEAR_A} THEN n END) AS na,
           MAX(CASE WHEN yr = {MIX_YEAR_A} THEN s END) AS sa,
           MAX(CASE WHEN yr = {MIX_YEAR_B} THEN n END) AS nb,
           MAX(CASE WHEN yr = {MIX_YEAR_B} THEN s END) AS sb
    FROM yearly GROUP BY nation
    HAVING MAX(CASE WHEN yr = {MIX_YEAR_A} THEN n END) IS NOT NULL
       AND MAX(CASE WHEN yr = {MIX_YEAR_B} THEN n END) IS NOT NULL
)
SELECT nation,
       CAST(sa AS BIGINT) AS rev_a_cents,
       CAST(sb AS BIGINT) AS rev_b_cents,
       CAST(sb - sa AS BIGINT) AS delta_cents,
       ROUND((CAST(nb AS DOUBLE) - CAST(na AS DOUBLE))
             * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)), 2)
           AS volume_effect,
       ROUND(CAST(sb AS DOUBLE)
             - CAST(sa AS DOUBLE) * CAST(nb AS DOUBLE)
               / CAST(na AS DOUBLE), 2) AS price_effect
FROM wide
""",
)
def revenue_mix_shift_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Laspeyres/Paasche decomposition of the {MIX_YEAR_A}→{MIX_YEAR_B}
    revenue change per nation: volume effect = Δorders x base-year
    average value, price effect = the remainder — the exact identity
    volume + price = Δrevenue that a revenue review decomposes before
    anyone argues about cause. Year revenues are exact integer cents;
    both effects are final mirrored doubles (2 dp); nations missing
    either year drop (stated in both engines). Nation broadcasts; the
    customer join is AQE-sized; one fact aggregate."""
    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders")
    cust = cat.load(spark, "customer").select("c_custkey", "c_nationkey")
    nat = cat.load(spark, "nation").select("n_nationkey", "n_name")
    yr = F.year("o_orderdate")
    yearly = (
        orders.filter(yr.isin(MIX_YEAR_A, MIX_YEAR_B))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), yr.alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("o_totalprice") * 100)
                .cast("decimal(38,0)")
            ).alias("s"),
        )
    )
    wide = (
        yearly.groupBy("nation")
        .agg(
            F.max(F.when(F.col("yr") == MIX_YEAR_A, F.col("n"))).alias(
                "na"
            ),
            F.max(F.when(F.col("yr") == MIX_YEAR_A, F.col("s"))).alias(
                "sa"
            ),
            F.max(F.when(F.col("yr") == MIX_YEAR_B, F.col("n"))).alias(
                "nb"
            ),
            F.max(F.when(F.col("yr") == MIX_YEAR_B, F.col("s"))).alias(
                "sb"
            ),
        )
        .filter(F.col("na").isNotNull() & F.col("nb").isNotNull())
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    sa = F.col("sa").cast("double")
    sb = F.col("sb").cast("double")
    return wide.select(
        "nation",
        F.col("sa").cast("bigint").alias("rev_a_cents"),
        F.col("sb").cast("bigint").alias("rev_b_cents"),
        (F.col("sb") - F.col("sa")).cast("bigint").alias("delta_cents"),
        F.round((nb - na) * (sa / na), 2).alias("volume_effect"),
        F.round(sb - sa * nb / na, 2).alias("price_effect"),
    )


@register(
    "user_survival_curve",
    oracle=f"""
WITH bounds AS (
    SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events
),
lifes AS (
    SELECT user_id,
           date_diff('day', MIN(CAST(ts AS DATE)),
                     MAX(CAST(ts AS DATE))) AS t,
           CASE WHEN MAX(CAST(ts AS DATE))
                     > (SELECT max_day FROM bounds)
                       - {SURV_CENSOR_DAYS}
                THEN 1 ELSE 0 END AS censored
    FROM events GROUP BY user_id
),
counts AS (
    SELECT t,
           CAST(SUM(1 - censored) AS BIGINT) AS d,
           COUNT(*) AS e
    FROM lifes GROUP BY t
),
risk AS (
    SELECT t, d,
           SUM(e) OVER (
               ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS n_at_risk
    FROM counts
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       d AS n_churned,
       ROUND(EXP(SUM(LN(1 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)))
                 OVER (ORDER BY t ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)), 6) AS survival
FROM risk
""",
)
def user_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of user lifetimes (first-seen to
    last-seen, days) with RIGHT CENSORING: users last seen within
    {SURV_CENSOR_DAYS} days of the corpus end are censored (still
    alive), not churned — the estimator every retention report should
    be using instead of naive churn ratios. Per-user lifetimes are one
    aggregate; deaths/at-risk counts collapse to the bounded lifetime
    table, where a descending cumulative sum gives n_at_risk and the
    KM product Π(1 − d/n) is computed as exp(Σ ln ·) over the same
    bounded spine — both windows run on the day-bounded count table
    only, and the ln/exp doubles are written identically in both
    engines."""
    events = Catalog(sf_dir).load(spark, "events")
    bounds = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    lifes = events.groupBy("user_id").agg(
        F.datediff(
            F.max(F.to_date("ts")), F.min(F.to_date("ts"))
        ).alias("t"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    lifes = lifes.crossJoin(F.broadcast(bounds)).select(
        "t",
        F.when(
            F.col("last_day")
            > F.date_sub(F.col("max_day"), SURV_CENSOR_DAYS),
            1,
        )
        .otherwise(0)
        .alias("censored"),
    )
    counts = lifes.groupBy("t").agg(
        F.sum(1 - F.col("censored")).cast("bigint").alias("d"),
        F.count(F.lit(1)).alias("e"),
    )
    wrisk = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = counts.select(
        "t", "d", F.sum("e").over(wrisk).alias("n_at_risk")
    )
    wsurv = (
        Window.orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    surv = F.round(
        F.exp(
            F.sum(
                F.log(
                    1
                    - F.col("d").cast("double")
                    / F.col("n_at_risk").cast("double")
                )
            ).over(wsurv)
        ),
        6,
    )
    return risk.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").alias("n_churned"),
        surv.alias("survival"),
    )


# ---------------------------------------------------------------------
# itemsets / cohort share / two-sample test
# ---------------------------------------------------------------------

#: Minimum distinct-order support for a reported part triple.
TRIPLE_MIN_SUP = 2

#: TRUNCATION contract (SCALING.md): each basket contributes triples
#: from at most this many distinct parts — the CAP smallest partkeys
#: (array_sort ascending, then slice; deterministic, order-free). The
#: per-order struct bound is therefore STRUCTURAL — C(CAP,3) = 2,024 —
#: not a property of the data generator: a 10k-item mega-basket emits
#: 2,024 structs, not ~1.7e11. At this catalog k ≤ ~7 < CAP, so the
#: cap never truncates and support counts are exact.
TRIPLE_BASKET_CAP = 24


@register(
    "frequent_triples",
    oracle=f"""
WITH di AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
-- TRUNCATION mirror: keep each order's {TRIPLE_BASKET_CAP} smallest
-- partkeys, matching the plan's slice(array_sort(ps), 1, CAP)
capped AS (
    SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_partkey) AS rn
        FROM di
    ) WHERE rn <= {TRIPLE_BASKET_CAP}
),
t AS (
    SELECT a.l_partkey AS x, b.l_partkey AS y, c.l_partkey AS z,
           COUNT(*) AS support
    FROM capped a
    JOIN capped b ON a.l_orderkey = b.l_orderkey
    -- c carries an EQUALITY to both sides: without one the optimizer
    -- may reorder to join b-c first on the partkey inequality alone
    -- (a piecewise-merge range join -- measured 4.1s vs 0.05s at
    -- sf0.01, minutes at sf0.1)
    JOIN capped c ON c.l_orderkey = a.l_orderkey
             AND c.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey AND b.l_partkey < c.l_partkey
    GROUP BY 1, 2, 3
)
SELECT x, y, z, support FROM t WHERE support >= {TRIPLE_MIN_SUP}
""",
)
def frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets of the co-purchase baskets — the next rung
    above ``market_basket_rules``' pairs (a triple that recurs is a
    bundle, not a coincidence of two overlapping pairs). Triple
    expansion is ORDER-LOCAL and STRUCTURALLY BOUNDED: each basket is
    sorted and sliced to its TRIPLE_BASKET_CAP smallest partkeys
    (TRUNCATION contract — deterministic ordering, mirrored in the
    oracle via ROW_NUMBER ≤ CAP), so every order emits ≤ C(CAP,3) =
    2,024 structs JVM-side regardless of basket size — Σ min(k,CAP)³
    work, linear in orders even on real co-purchase data with
    mega-baskets. One hash aggregate then counts distinct-order
    support (collect_set dedupes per order, so COUNT(*) over the
    oracle's per-order DISTINCT pairs is the same number); the oracle
    keeps the 3-way self-join spelling to stay independent. The
    all-pairs (and all-triples) product never appears in the plan."""
    li = Catalog(sf_dir).load(spark, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    triples = capped_basket_triples(li)
    return (
        triples.groupBy("x", "y", "z")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRIPLE_MIN_SUP)
    )


def capped_basket_triples(li: DataFrame) -> DataFrame:
    """Order-local triple expansion with the structural basket cap:
    group (l_orderkey, l_partkey) into sorted distinct baskets, slice
    each to its TRIPLE_BASKET_CAP smallest partkeys, and emit the
    C(min(k, CAP), 3) ascending triples per order JVM-side. Factored
    out so tests/test_round11_plans.py can drive it with a synthetic
    mega-basket and prove the per-order struct bound is the cap's
    C(CAP,3), independent of basket size."""
    grouped = li.groupBy("l_orderkey").agg(
        F.slice(
            F.array_sort(F.collect_set("l_partkey")),
            1,
            TRIPLE_BASKET_CAP,
        ).alias("ps")
    )
    # Chained Generates, not nested flatten(transform(...)): HOF
    # lambdas are CodegenFallback — every emitted struct evaluates
    # interpreted — while explode/posexplode Generate nodes pipeline
    # inside whole-stage codegen (round 13; same fix as the pair
    # expansion in linalg_queries). Indices: posexplode is 0-based,
    # slice 1-based — y ranges over elements after x (start i + 2),
    # z over elements after y (original 0-based index of y is
    # i + 1 + j, so z starts at i + j + 3). Same ascending triples,
    # same C(min(k, CAP), 3) per-order bound.
    e1 = grouped.select(
        "l_orderkey", "ps", F.posexplode("ps").alias("i", "x")
    )
    e2 = e1.select(
        "l_orderkey",
        "ps",
        "i",
        "x",
        F.posexplode(
            F.slice("ps", F.col("i") + 2, F.size("ps"))
        ).alias("j", "y"),
    )
    return e2.select(
        "l_orderkey",
        "x",
        "y",
        F.explode(
            F.slice(
                "ps", F.col("i") + F.col("j") + 3, F.size("ps")
            )
        ).alias("z"),
    )


@register(
    "cold_start_supplier_share",
    oracle="""
WITH li AS (
    SELECT l_suppkey, strftime(l_shipdate, '%Y-%m') AS month,
           CAST(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                AS HUGEINT) AS r
    FROM lineitem
),
firsts AS (
    SELECT l_suppkey, MIN(month) AS first_month FROM li GROUP BY 1
)
SELECT li.month,
       COUNT(DISTINCT CASE WHEN li.month = f.first_month
                           THEN li.l_suppkey END) AS n_new_suppliers,
       ROUND(CAST(SUM(CASE WHEN li.month = f.first_month THEN li.r
                           ELSE 0 END) AS DOUBLE)
             / CAST(SUM(li.r) AS DOUBLE), 6) AS new_supplier_share
FROM li JOIN firsts f USING (l_suppkey)
GROUP BY li.month
""",
)
def cold_start_supplier_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """What fraction of each month's revenue flows through suppliers
    shipping for the FIRST time that month — the supply-side cold-start
    curve (a healthy marketplace onboards revenue steadily; a spike
    says a bulk migration landed). Revenue units are exact integers
    (cents x discount hundredths) summed as decimal(38,0)/HUGEINT; the
    share is the final mirrored double. The first-month frame is
    supplier-bounded, joined back by supplier key — two fact-table
    aggregates total."""
    li = Catalog(sf_dir).load(spark, "lineitem").select(
        "l_suppkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        (
            F.round(F.col("l_extendedprice") * 100)
            .cast("decimal(38,0)")
            * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("r"),
    )
    firsts = li.groupBy("l_suppkey").agg(
        F.min("month").alias("first_month")
    )
    is_new = F.col("month") == F.col("first_month")
    return (
        li.join(firsts, "l_suppkey")
        .groupBy("month")
        .agg(
            F.countDistinct(
                F.when(is_new, F.col("l_suppkey"))
            ).alias("n_new_suppliers"),
            F.round(
                F.sum(F.when(is_new, F.col("r")).otherwise(0))
                .cast("double")
                / F.sum("r").cast("double"),
                6,
            ).alias("new_supplier_share"),
        )
    )


@register(
    "weekend_order_value_ttest",
    oracle=f"""
WITH grouped AS (
    SELECT CASE WHEN dayname(o_orderdate) IN ('Saturday', 'Sunday')
                THEN 1 ELSE 0 END AS is_weekend,
           {_O_CENTS} AS c
    FROM orders
),
stats AS (
    SELECT is_weekend, COUNT(*) AS n,
           CAST(SUM(c) AS HUGEINT) AS s,
           CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
    FROM grouped GROUP BY is_weekend
),
wide AS (
    SELECT MAX(CASE WHEN is_weekend = 0 THEN n END) AS n1,
           MAX(CASE WHEN is_weekend = 0 THEN s END) AS s1,
           MAX(CASE WHEN is_weekend = 0 THEN ss END) AS ss1,
           MAX(CASE WHEN is_weekend = 1 THEN n END) AS n2,
           MAX(CASE WHEN is_weekend = 1 THEN s END) AS s2,
           MAX(CASE WHEN is_weekend = 1 THEN ss END) AS ss2
    FROM stats
)
SELECT CAST(n1 AS BIGINT) AS n_weekday, CAST(n2 AS BIGINT) AS n_weekend,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 4)
           AS mean_diff_cents,
       ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / SQRT((CAST(ss1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                    / (CAST(n1 AS DOUBLE) - 1)
                    + (CAST(ss2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                       - (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                         * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                      / (CAST(n2 AS DOUBLE) - 1)), 4) AS welch_t
FROM wide
""",
)
def weekend_order_value_ttest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Welch two-sample t statistic for weekday vs weekend order value
    — the significance test behind every "weekend shoppers spend more"
    claim. Both groups' moments come from ONE exact-integer aggregate
    (day names, not engine-specific day numbers, split the groups);
    the t expression is a single mirrored double rounded to 4 dp.
    Output is one row — the cheapest query in the registry at any
    corpus size."""
    orders = Catalog(sf_dir).load(spark, "orders")
    c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    is_weekend = F.when(
        F.date_format("o_orderdate", "EEEE").isin("Saturday", "Sunday"),
        1,
    ).otherwise(0)
    stats = orders.select(
        is_weekend.alias("is_weekend"), c.alias("c")
    ).groupBy("is_weekend").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("ss"),
    )
    wide = stats.agg(
        F.max(F.when(F.col("is_weekend") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("is_weekend") == 0, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("is_weekend") == 0, F.col("ss"))).alias(
            "ss1"
        ),
        F.max(F.when(F.col("is_weekend") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("is_weekend") == 1, F.col("s"))).alias("s2"),
        F.max(F.when(F.col("is_weekend") == 1, F.col("ss"))).alias(
            "ss2"
        ),
    )
    m1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    m2 = F.col("s2").cast("double") / F.col("n2").cast("double")
    v1 = (
        F.col("ss1").cast("double") / F.col("n1").cast("double")
        - m1 * m1
    ) / (F.col("n1").cast("double") - 1)
    v2 = (
        F.col("ss2").cast("double") / F.col("n2").cast("double")
        - m2 * m2
    ) / (F.col("n2").cast("double") - 1)
    return wide.select(
        F.col("n1").cast("bigint").alias("n_weekday"),
        F.col("n2").cast("bigint").alias("n_weekend"),
        F.round(m1 - m2, 4).alias("mean_diff_cents"),
        F.round((m1 - m2) / F.sqrt(v1 + v2), 4).alias("welch_t"),
    )


# ---------------------------------------------------------------------
# sequential / nonparametric statistics (round-11 seeds, wave 2)
# ---------------------------------------------------------------------

#: Page-Hinkley alarm threshold, in units of the series stddev.
PH_LAMBDA_SIGMA = 5.0

#: Benjamini-Hochberg false-discovery rate.
BH_Q = 0.1


@register(
    "orders_runs_test",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
counts AS (SELECT cents, COUNT(*) AS n FROM daily GROUP BY cents),
cum AS (
    SELECT cents,
           SUM(n) OVER (ORDER BY cents ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS c,
           SUM(n) OVER () AS total
    FROM counts
),
med AS (SELECT MIN(cents) AS m FROM cum WHERE c * 2 >= total),
signs AS (
    SELECT day, CASE WHEN cents > (SELECT m FROM med) THEN 1 ELSE 0 END
               AS s
    FROM daily WHERE cents <> (SELECT m FROM med)
),
runs AS (
    SELECT s,
           CASE WHEN LAG(s) OVER (ORDER BY day ASC) IS NULL
                     OR LAG(s) OVER (ORDER BY day ASC) <> s
                THEN 1 ELSE 0 END AS brk
    FROM signs
),
agg AS (
    SELECT CAST(SUM(s) AS DOUBLE) AS n1,
           CAST(SUM(1 - s) AS DOUBLE) AS n2,
           CAST(SUM(brk) AS BIGINT) AS r
    FROM runs
)
SELECT CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
       r AS runs,
       ROUND((CAST(r AS DOUBLE) - (2 * n1 * n2 / (n1 + n2) + 1))
             / SQRT(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                    / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 4)
           AS z
FROM agg
""",
)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue: are above-median and
    below-median days randomly interleaved, or does revenue trend/
    cluster (too FEW runs) or oscillate (too MANY)? Contract (stated,
    mirrored): days exactly at the median drop, the classic treatment.
    The exact median comes from a cumulative walk over the day-bounded
    count table; the run count is one LAG over the bounded day spine;
    z is the final mirrored double (4 dp). Output is one row."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    counts = daily.groupBy("cents").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.orderBy(F.col("cents").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        "cents",
        F.sum("n").over(wcum).alias("c"),
        F.sum("n").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    med = cum.filter(F.col("c") * 2 >= F.col("total")).agg(
        F.min("cents").alias("m")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("cents") != F.col("m"))
        .select(
            "day",
            F.when(F.col("cents") > F.col("m"), 1).otherwise(0).alias(
                "s"
            ),
        )
    )
    wday = Window.orderBy(F.col("day").asc())
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(wday).isNull()
            | (F.lag("s").over(wday) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    agg = runs.agg(
        F.sum("s").cast("double").alias("n1"),
        F.sum(1 - F.col("s")).cast("double").alias("n2"),
        F.sum("brk").cast("bigint").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r").cast("double")
    er = 2 * n1 * n2 / (n1 + n2) + 1
    vr = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    return agg.select(
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n2").cast("bigint").alias("n_below"),
        F.col("r").alias("runs"),
        F.round((r - er) / F.sqrt(vr), 4).alias("z"),
    )


@register(
    "page_hinkley_daily_orders",
    oracle=f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS c
    FROM orders GROUP BY 1
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(c) AS DOUBLE) AS s,
           CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS ss
    FROM daily
),
scored AS (
    SELECT day, c,
           SUM(CAST(c AS DOUBLE) - (SELECT s / n FROM stats))
               OVER (ORDER BY day ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_dev
    FROM daily
),
ph AS (
    SELECT day, c, cum_dev,
           cum_dev - MIN(cum_dev) OVER (
               ORDER BY day ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ph_t
    FROM scored
)
SELECT CAST(day AS VARCHAR) AS day, c AS n_orders,
       ROUND(ph_t, 4) AS ph,
       CASE WHEN ROUND(ph_t, 4)
                 > {PH_LAMBDA_SIGMA}
                   * SQRT((SELECT ss / n - (s / n) * (s / n) FROM stats))
            THEN 1 ELSE 0 END AS alarm
FROM ph
""",
)
def page_hinkley_daily_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Page-Hinkley upward-shift detection on daily order volume (the
    offline variant: deviations measured against the full-series mean,
    stated in both engines): PH_t = cumulative deviation minus its
    running minimum — the sequential change-point statistic streaming
    drift monitors keep. Both cumulative windows run over the
    day-bounded spine only; the alarm threshold is {PH_LAMBDA_SIGMA}σ
    with σ from exact integer moments, and PH rounds to 4 dp before
    the comparison so the flag cannot flip between engines."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    stats = daily.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("double")
        .alias("ss"),
    )
    wcum = (
        Window.orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "c",
        F.sum(F.col("c").cast("double") - F.col("s") / F.col("n"))
        .over(wcum)
        .alias("cum_dev"),
        "n",
        "s",
        "ss",
    )
    ph = scored.select(
        "day",
        "c",
        (F.col("cum_dev") - F.min("cum_dev").over(wcum)).alias("ph_t"),
        "n",
        "s",
        "ss",
    )
    sigma = F.sqrt(
        F.col("ss") / F.col("n")
        - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
    )
    return ph.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("c").alias("n_orders"),
        F.round("ph_t", 4).alias("ph"),
        F.when(
            F.round("ph_t", 4) > PH_LAMBDA_SIGMA * sigma, 1
        )
        .otherwise(0)
        .alias("alarm"),
    )


@register(
    "weekend_value_mannwhitney",
    oracle="""
WITH grouped AS (
    SELECT CASE WHEN dayname(o_orderdate) IN ('Saturday', 'Sunday')
                THEN 1 ELSE 0 END AS g,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
    FROM orders
),
counts AS (
    SELECT c,
           CAST(SUM(1 - g) AS HUGEINT) AS na,
           CAST(SUM(g) AS HUGEINT) AS nb,
           COUNT(*) AS n
    FROM grouped GROUP BY c
),
cum AS (
    SELECT c, na, nb, n,
           SUM(n) OVER (ORDER BY c ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS k
    FROM counts
),
agg AS (
    SELECT CAST(SUM(na) AS DOUBLE) AS nna,
           CAST(SUM(nb) AS DOUBLE) AS nnb,
           CAST(SUM(na * (2 * CAST(k AS HUGEINT) - n + 1)) AS DOUBLE)
               AS ra2,
           CAST(SUM(CAST(n AS HUGEINT) * n * n - n) AS DOUBLE) AS ties
    FROM cum
)
SELECT CAST(nna AS BIGINT) AS n_weekday, CAST(nnb AS BIGINT) AS n_weekend,
       ROUND(ra2 / 2 - nna * (nna + 1) / 2, 4) AS u_stat,
       ROUND((ra2 / 2 - nna * (nna + 1) / 2 - nna * nnb / 2)
             / SQRT(nna * nnb / 12
                    * ((nna + nnb + 1)
                       - ties / ((nna + nnb)
                                 * (nna + nnb - 1)))), 4) AS z
FROM agg
""",
)
def weekend_value_mannwhitney(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney U (tie-corrected, normal approximation) for weekday
    vs weekend order values — the nonparametric twin of
    ``weekend_order_value_ttest`` for when nobody believes the value
    distribution is normal. The rank sum never ranks rows: midranks
    collapse to the per-cents COUNT TABLE (2·midrank = 2·cum − n + 1,
    exact integers), walked by the two-pass ``global_cumsum`` — so the
    statistic costs one aggregate plus the collapsed cumulative walk
    at any corpus size, and the tie correction Σ(t³−t) falls out of
    the same table. U and z are final mirrored doubles (4 dp)."""
    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    g = F.when(
        F.date_format("o_orderdate", "EEEE").isin("Saturday", "Sunday"),
        1,
    ).otherwise(0)
    c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    counts = orders.select(g.alias("g"), c.alias("c")).groupBy(
        "c"
    ).agg(
        F.sum(1 - F.col("g")).cast("decimal(38,0)").alias("na"),
        F.sum("g").cast("decimal(38,0)").alias("nb"),
        F.count(F.lit(1)).alias("n"),
    )
    cum, _total = global_cumsum_with_total(
        counts, [F.col("c").asc()], "n", out_col="k"
    )
    agg = cum.agg(
        F.sum("na").cast("double").alias("nna"),
        F.sum("nb").cast("double").alias("nnb"),
        F.sum(
            F.col("na")
            * (
                2 * F.col("k").cast("decimal(38,0)")
                - F.col("n")
                + 1
            )
        )
        .cast("double")
        .alias("ra2"),
        F.sum(
            F.col("n").cast("decimal(38,0)") * F.col("n") * F.col("n")
            - F.col("n")
        )
        .cast("double")
        .alias("ties"),
    )
    nna, nnb = F.col("nna"), F.col("nnb")
    u = F.col("ra2") / 2 - nna * (nna + 1) / 2
    var = (
        nna
        * nnb
        / 12
        * ((nna + nnb + 1) - F.col("ties") / ((nna + nnb) * (nna + nnb - 1)))
    )
    return agg.select(
        nna.cast("bigint").alias("n_weekday"),
        nnb.cast("bigint").alias("n_weekend"),
        F.round(u, 4).alias("u_stat"),
        F.round((u - nna * nnb / 2) / F.sqrt(var), 4).alias("z"),
    )


_NATION_MONTH_Z_SQL = f"""
rev AS (
    SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y-%m') AS month,
           CAST(SUM({_O_CENTS}) AS HUGEINT) AS cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
),
stats AS (
    SELECT nation, COUNT(*) AS m,
           CAST(SUM(cents) AS HUGEINT) AS s,
           CAST(SUM(cents * cents) AS HUGEINT) AS ss
    FROM rev GROUP BY nation
),
zs AS (
    SELECT r.nation, r.month,
           ROUND((CAST(m AS DOUBLE) * CAST(r.cents AS DOUBLE)
                  - CAST(s AS DOUBLE))
                 / SQRT(CAST(m AS DOUBLE) * CAST(ss AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 4)
               AS z
    FROM rev r JOIN stats t ON t.nation = r.nation
    WHERE CAST(m AS HUGEINT) * ss - s * s > 0
)
"""


@register(
    "bh_adjusted_anomalies",
    oracle=f"""
WITH {_NATION_MONTH_Z_SQL},
ps AS (
    SELECT nation, month, z,
           2.0 / (1.0 + EXP(1.702 * ABS(z))) AS p
    FROM zs
),
ranked AS (
    SELECT nation, month, z, p,
           ROW_NUMBER() OVER (
               ORDER BY p ASC, nation ASC, month ASC
           ) AS rk,
           COUNT(*) OVER () AS m
    FROM ps
),
kmax AS (
    SELECT COALESCE(MAX(rk), 0) AS k FROM ranked
    WHERE p * m <= rk * {BH_Q}
)
SELECT nation, month, z, ROUND(p, 6) AS p_approx,
       CAST(rk AS BIGINT) AS rank,
       ROUND(rk * {BH_Q} / m, 6) AS bh_threshold,
       CASE WHEN rk <= (SELECT k FROM kmax) THEN 1 ELSE 0 END
           AS flagged
FROM ranked
WHERE rk <= 20
""",
)
def bh_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the nation-month revenue
    z-scores: the naive |z|>2 sweep (``nation_month_revenue_anomalies``)
    fires ~5% false positives per test, which at nations×months scale
    is a wall of noise — BH sorts the p-values and keeps the largest
    prefix whose p(i) ≤ i·q/m (q={BH_Q}), the multiple-testing
    discipline every anomaly REPORT (as opposed to single test) needs;
    the report shows the 20 smallest p-values with each one's BH
    threshold and flag, so "nothing survives correction" is itself a
    visible, checkable result.
    Two-sided p-values use the logistic approximation of the normal
    tail (2/(1+exp(1.702|z|)) — stated, and written identically in
    both engines over the 4-dp-rounded z, so the ordering and the
    threshold comparison are deterministic). The rank window runs over
    the bounded (nation × month) test table only."""
    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders")
    cust = cat.load(spark, "customer").select("c_custkey", "c_nationkey")
    nat = cat.load(spark, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100)
                .cast("decimal(38,0)")
            ).alias("cents")
        )
    )
    stats = rev.groupBy("nation").agg(
        F.count(F.lit(1)).alias("m_n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    z = F.round(
        (
            F.col("m_n").cast("double") * F.col("cents").cast("double")
            - F.col("s").cast("double")
        )
        / F.sqrt(
            F.col("m_n").cast("double") * F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        ),
        4,
    )
    zs = (
        rev.join(F.broadcast(stats), "nation")
        .filter(
            F.col("m_n").cast("decimal(38,0)") * F.col("ss")
            - F.col("s") * F.col("s")
            > 0
        )
        .select("nation", "month", z.alias("z"))
    )
    p = 2.0 / (1.0 + F.exp(1.702 * F.abs(F.col("z"))))
    wrank = Window.orderBy(
        F.col("p").asc(), F.col("nation").asc(), F.col("month").asc()
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = zs.select("nation", "month", "z", p.alias("p")).select(
        "nation",
        "month",
        "z",
        "p",
        F.row_number().over(wrank).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    kmax = ranked.filter(
        F.col("p") * F.col("m") <= F.col("rk") * BH_Q
    ).agg(F.coalesce(F.max("rk"), F.lit(0)).alias("k"))
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .filter(F.col("rk") <= 20)
        .select(
            "nation",
            "month",
            "z",
            F.round("p", 6).alias("p_approx"),
            F.col("rk").cast("bigint").alias("rank"),
            F.round(F.col("rk") * BH_Q / F.col("m"), 6).alias(
                "bh_threshold"
            ),
            F.when(F.col("rk") <= F.col("k"), 1).otherwise(0).alias(
                "flagged"
            ),
        )
    )
