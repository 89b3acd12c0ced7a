"""Behavioral analytics over the events stream: rolling actives,
session-duration deciles, funnel latency, churn classes, bipartite
degrees, value concentration, load imbalance, transition entropy, and
sessionization-parameter sensitivity.

Scale discipline: windows are PER-USER (hash-partitioned, bounded per
key) or over calendar-bounded spines; global order statistics route
through the two-pass rank machinery (``operators/ranks``); rolling
distinct-actives expand each user-day into its bounded 7-day coverage
set (an equi-join, never a theta join against the fact table). Times
compare in integer microseconds (``unix_micros``) so no float ever
touches a timestamp.

Reference scope: the reference has no event-stream analytics; this is
the product-analytics surface (DAU/WAU, funnels, retention) layered on
the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: Session gap for the decile query (microseconds) and the sweep grid.
SESSION_GAP_MIN = 30
GAP_GRID_MIN = (15, 30, 60)

Q6 = 1000000


@register(
    "rolling_active_users_7d",
    oracle="""
WITH user_days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
spine AS (SELECT DISTINCT day FROM user_days),
actives AS (
    SELECT s.day, COUNT(DISTINCT u.user_id) AS n_active_7d
    FROM spine s
    JOIN user_days u ON u.day BETWEEN s.day - 6 AND s.day
    GROUP BY s.day
),
dau AS (
    SELECT day, COUNT(*) AS n_active_today FROM user_days GROUP BY day
)
SELECT CAST(a.day AS VARCHAR) AS day, a.n_active_7d, d.n_active_today,
       ROUND(CAST(d.n_active_today AS DOUBLE)
             / CAST(a.n_active_7d AS DOUBLE), 6) AS dau_wau_ratio
FROM actives a JOIN dau d ON d.day = a.day
""",
)
def rolling_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (the WAU curve) with same-day actives
    and the DAU/WAU stickiness ratio. The rolling DISTINCT is the
    trap: a windowed count-distinct cannot merge, and a theta join of
    the day spine against facts is a nested loop. Instead each
    (user, day) expands into the ≤7 target days it covers
    (``sequence`` + explode), deduplicates, and a plain count per
    target day gives the exact rolling distinct — equi-joins and
    hash aggregates only, linear in user-days."""
    events = Catalog(sf_dir).load(spark, "events")
    user_days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    spine = user_days.select("day").distinct()
    covered = (
        user_days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("t_day"),
        )
        .distinct()
        .join(spine, F.col("t_day") == spine["day"], "left_semi")
    )
    actives = covered.groupBy(F.col("t_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_active_7d")
    )
    dau = user_days.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active_today")
    )
    return actives.join(dau, "day").select(
        # ISO string, not DATE: engines render date cells differently
        # in crude string hashes; the text form is unambiguous
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_active_7d",
        "n_active_today",
        F.round(
            F.col("n_active_today").cast("double")
            / F.col("n_active_7d").cast("double"),
            6,
        ).alias("dau_wau_ratio"),
    )


_SESS_SQL = f"""
    SELECT user_id, ts, event_id,
           CASE WHEN LAG(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                        > {SESSION_GAP_MIN} * 60 * 1000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


@register(
    "session_duration_deciles",
    oracle=f"""
WITH marked AS ({_SESS_SQL}),
sess AS (
    SELECT user_id, ts, event_id,
           SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sid
    FROM marked
),
durs AS (
    SELECT user_id, sid,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sess GROUP BY user_id, sid
),
ranked AS (
    SELECT duration_us,
           ROW_NUMBER() OVER (
               ORDER BY duration_us ASC, user_id ASC, sid ASC
           ) AS rn,
           COUNT(*) OVER () AS n
    FROM durs
)
SELECT CAST((rn - 1) * 10 // n + 1 AS BIGINT) AS decile,
       COUNT(*) AS n_sessions,
       MIN(duration_us) AS min_us, MAX(duration_us) AS max_us,
       ROUND(CAST(SUM(duration_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
             6) AS mean_us
FROM ranked GROUP BY 1
""",
)
def session_duration_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equi-depth deciles of session duration ({SESSION_GAP_MIN}-min
    gap sessionization) — the engagement-distribution table behind
    every "median session length" claim. Sessions come from per-user
    gaps-and-islands windows (bounded per key); the GLOBAL decile rank
    routes through the two-pass ``global_row_number`` (the oracle's
    ``ROW_NUMBER() OVER (ORDER BY ...)`` spelling would funnel every
    session through one partition at corpus scale). Durations compare
    in integer microseconds."""
    from asritha_metamorphetl_spark.operators.ranks import (
        _global_row_number_with_total,
    )

    events = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = SESSION_GAP_MIN * 60 * 1000000
    prev_us = F.unix_micros(F.lag("ts").over(w))
    marked = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev_us.isNull()
            | (F.unix_micros(F.col("ts")) - prev_us > gap_us),
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
    durs = sess.groupBy("user_id", "sid").agg(
        (
            F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
        ).alias("duration_us")
    )
    ranked, n = _global_row_number_with_total(
        durs,
        [
            F.col("duration_us").asc(),
            F.col("user_id").asc(),
            F.col("sid").asc(),
        ],
        out_col="rn",
    )
    return (
        ranked.withColumn(
            "decile",
            (F.floor((F.col("rn") - 1) * 10 / F.lit(int(n))) + 1).cast(
                "bigint"
            ),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.min("duration_us").alias("min_us"),
            F.max("duration_us").alias("max_us"),
            F.round(
                F.sum("duration_us").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_us"),
        )
    )


@register(
    "funnel_conversion_latency",
    oracle="""
WITH flows AS (
    SELECT user_id, ts, event_id, event_type,
           MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_view_us
    FROM events WHERE event_type IN ('view', 'purchase')
),
lat AS (
    SELECT CASE WHEN last_view_us IS NULL THEN NULL
               ELSE (epoch_us(ts) - last_view_us) // 60000000 END
               AS bucket_min
    FROM flows WHERE event_type = 'purchase'
)
SELECT bucket_min, COUNT(*) AS n_purchases
FROM lat GROUP BY bucket_min
""",
)
def funnel_conversion_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """View→purchase conversion latency histogram (minutes): each
    purchase pairs with the user's most recent prior view via a
    running MAX over the per-user event sequence — the streaming-safe
    as-of spelling (one per-user window, no self-join). Purchases with
    no prior view land in the NULL bucket (the direct-buy cohort, a
    real funnel segment, not noise to drop). Integer microseconds
    throughout."""
    events = Catalog(sf_dir).load(spark, "events")
    flows = events.filter(
        F.col("event_type").isin("view", "purchase")
    ).select("user_id", "ts", "event_id", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view = F.max(
        F.when(
            F.col("event_type") == "view", F.unix_micros(F.col("ts"))
        )
    ).over(w)
    lat = (
        flows.withColumn("last_view_us", last_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("last_view_us").isNull(), F.lit(None).cast("bigint")
            )
            .otherwise(
                F.floor(
                    (F.unix_micros(F.col("ts")) - F.col("last_view_us"))
                    / 60000000
                ).cast("bigint")
            )
            .alias("bucket_min")
        )
    )
    return lat.groupBy("bucket_min").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )


@register(
    "user_churn_classification",
    oracle="""
WITH last_seen AS (
    SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day FROM events
    GROUP BY user_id
),
ref AS (SELECT MAX(CAST(ts AS DATE)) AS ref_day FROM events),
classed AS (
    SELECT CASE
               WHEN ref_day - last_day < 7 THEN 'active'
               WHEN ref_day - last_day <= 30 THEN 'lapsed'
               ELSE 'churned'
           END AS churn_class
    FROM last_seen CROSS JOIN ref
),
tot AS (SELECT COUNT(*) AS n FROM classed)
SELECT churn_class, COUNT(*) AS n_users,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST((SELECT n FROM tot) AS DOUBLE), 6) AS share
FROM classed GROUP BY churn_class
""",
)
def user_churn_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Active / lapsed / churned user segmentation by days since last
    event, anchored to the corpus' own max date (reproducible — no
    wall clock). One shuffle to per-user last-seen; the reference date
    is a 1-row broadcast; output is 3 rows with exact shares."""
    events = Catalog(sf_dir).load(spark, "events")
    last_seen = events.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day")
    )
    ref = events.agg(F.max(F.to_date("ts")).alias("ref_day"))
    age = F.datediff(F.col("ref_day"), F.col("last_day"))
    classed = last_seen.crossJoin(F.broadcast(ref)).select(
        F.when(age < 7, "active")
        .when(age <= 30, "lapsed")
        .otherwise("churned")
        .alias("churn_class")
    )
    per = classed.groupBy("churn_class").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    tot = per.agg(F.sum("n_users").cast("bigint").alias("n"))
    return per.crossJoin(F.broadcast(tot)).select(
        "churn_class",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.col("n").cast("double"), 6
        ).alias("share"),
    )


@register(
    "bipartite_degree_histogram",
    oracle="""
WITH deg AS (
    SELECT user_id, COUNT(DISTINCT event_type) AS degree
    FROM events GROUP BY user_id
)
SELECT degree, COUNT(*) AS n_users FROM deg GROUP BY degree
""",
)
def bipartite_degree_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree distribution of the user↔event-type bipartite graph
    (how many distinct event types each user touches) — the
    engagement-breadth histogram, and the load-model input for any
    per-type state. Distinct-per-key then a bounded histogram; both
    aggregates map-side combine."""
    events = Catalog(sf_dir).load(spark, "events")
    deg = events.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("degree")
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "event_value_pareto",
    oracle="""
WITH per_user AS (
    SELECT user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY user_id
),
ranked AS (
    SELECT cents,
           ROW_NUMBER() OVER (ORDER BY cents DESC, user_id ASC) AS rn,
           COUNT(*) OVER () AS n
    FROM per_user
)
SELECT MAX(n) AS n_users,
       CAST((MAX(n) + 4) // 5 AS BIGINT) AS top_users,
       CAST(SUM(CASE WHEN rn <= (n + 4) // 5 THEN cents ELSE 0 END)
            AS BIGINT) AS top_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       ROUND(CAST(SUM(CASE WHEN rn <= (n + 4) // 5 THEN cents ELSE 0 END)
                  AS DOUBLE) / CAST(SUM(cents) AS DOUBLE), 6)
           AS pareto_share
FROM ranked
""",
)
def event_value_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 check: what share of total event value comes from the
    top 20% of users. The global rank routes through the two-pass
    ``global_row_number`` (total order: value desc, user asc) — the
    oracle's whole-frame window spelling is exactly what this query
    must NOT do at corpus scale. One row out, exact cents."""
    from asritha_metamorphetl_spark.operators.ranks import (
        _global_row_number_with_total,
    )

    events = Catalog(sf_dir).load(spark, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    ranked, n = _global_row_number_with_total(
        per_user,
        [F.col("cents").desc(), F.col("user_id").asc()],
        out_col="rn",
    )
    top_n = (int(n) + 4) // 5
    in_top = F.when(F.col("rn") <= top_n, F.col("cents")).otherwise(0)
    return ranked.agg(
        F.lit(int(n)).cast("bigint").alias("n_users"),
        F.lit(top_n).cast("bigint").alias("top_users"),
        F.sum(in_top).cast("bigint").alias("top_cents"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.round(
            F.sum(in_top).cast("double")
            / F.sum("cents").cast("double"),
            6,
        ).alias("pareto_share"),
    )


@register(
    "hourly_load_imbalance",
    oracle="""
WITH hourly AS (
    SELECT EXTRACT(hour FROM ts) AS hod, COUNT(*) AS n
    FROM events GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS s, COUNT(*) AS k FROM hourly
)
SELECT CAST(hod AS BIGINT) AS hod, n,
       ROUND(CAST(n AS DOUBLE)
             / (CAST(s AS DOUBLE) / CAST(k AS DOUBLE)), 6)
           AS load_ratio
FROM hourly CROSS JOIN tot
""",
)
def hourly_load_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day load profile normalized to the mean hour — the
    autoscaling input (peak load_ratio sizes the fleet; trough sizes
    the batch window). One scan into a 24-row aggregate; the mean
    re-derives from the hourly frame."""
    events = Catalog(sf_dir).load(spark, "events")
    hourly = events.groupBy(
        F.hour("ts").cast("bigint").alias("hod")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = hourly.agg(
        F.sum("n").cast("bigint").alias("s"),
        F.count(F.lit(1)).alias("k"),
    )
    return hourly.crossJoin(F.broadcast(tot)).select(
        "hod",
        "n",
        F.round(
            F.col("n").cast("double")
            / (F.col("s").cast("double") / F.col("k").cast("double")),
            6,
        ).alias("load_ratio"),
    )


@register(
    "transition_entropy_by_type",
    oracle=f"""
WITH seq AS (
    SELECT event_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS next_type
    FROM events
),
counts AS (
    SELECT event_type, next_type, COUNT(*) AS c
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
),
tot AS (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM counts
    GROUP BY 1
),
terms AS (
    SELECT counts.event_type, n,
           CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                      * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                      * {Q6}) AS BIGINT) AS term_q
    FROM counts JOIN tot ON tot.event_type = counts.event_type
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_transitions,
       COUNT(*) AS n_next_types,
       ROUND(-CAST(SUM(term_q) AS DOUBLE) / {Q6}, 6) AS entropy
FROM terms GROUP BY event_type
""",
)
def transition_entropy_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Predictability of what follows each event type: Shannon entropy
    of the next-event distribution per source type (zero = a
    deterministic flow, ln(5) ≈ 1.609 = anything can follow) — the
    summary statistic over ``event_transition_matrix``'s rows a
    journey model thresholds on. LEAD windows per user; entropy terms
    quantized to 1e-6 before the sum (bounded next-type fan-out, but
    partition order must not perturb the hash)."""
    events = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    terms = counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n",
        F.round(p * F.log(p) * Q6).cast("bigint").alias("term_q"),
    )
    return terms.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_transitions"),
        F.count(F.lit(1)).alias("n_next_types"),
        F.round(-F.sum("term_q").cast("double") / Q6, 6).alias("entropy"),
    )


def _gap_sweep_oracle() -> str:
    rows = []
    for gap in GAP_GRID_MIN:
        rows.append(f"""
SELECT {gap} AS gap_min,
       CAST(SUM(CASE WHEN prev_us IS NULL
                     OR us - prev_us > CAST({gap} AS BIGINT) * 60 * {Q6}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(CASE WHEN prev_us IS NULL
                             OR us - prev_us > CAST({gap} AS BIGINT) * 60 * {Q6}
                        THEN 1 ELSE 0 END) AS DOUBLE), 6)
           AS mean_events_per_session
FROM diffs""")
    body = "\nUNION ALL\n".join(rows)
    return f"""
WITH diffs AS (
    SELECT epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS prev_us
    FROM events
)
{body}
"""


@register("session_gap_sensitivity", oracle=_gap_sweep_oracle())
def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization-parameter sweep: session count and mean session
    size at 15/30/60-minute gap thresholds, from ONE per-user lag pass
    (each threshold is just a different predicate over the same
    inter-event diff — the sweep costs one window, not three). The
    table that turns the session-gap constant from folklore into a
    measured choice, the same engineering move as
    ``minhash_band_tuning``."""
    events = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros(F.col("ts"))
    diffs = events.select(
        us.alias("us"), F.lag(us).over(w).alias("prev_us")
    )
    aggs = []
    for gap in GAP_GRID_MIN:
        is_new = F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > gap * 60 * Q6),
            1,
        ).otherwise(0)
        aggs.append(F.sum(is_new).cast("bigint").alias(f"s_{gap}"))
    aggs.append(F.count(F.lit(1)).alias("n_events"))
    sums = diffs.agg(*aggs)
    stack_args = ", ".join(
        f"{gap}, s_{gap}" for gap in GAP_GRID_MIN
    )
    return sums.selectExpr(
        "n_events",
        f"stack({len(GAP_GRID_MIN)}, {stack_args}) AS (gap_min, n_sessions)",
    ).select(
        "gap_min",
        "n_sessions",
        F.round(
            F.col("n_events").cast("double")
            / F.col("n_sessions").cast("double"),
            6,
        ).alias("mean_events_per_session"),
    )
