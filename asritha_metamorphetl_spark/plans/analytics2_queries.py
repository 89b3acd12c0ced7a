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
    """Typo-distance pairing of part names with PassJoin-style segment
    blocking (Li, Deng, Feng: "PassJoin: a partition-based method for
    similarity joins" — the standard partition scheme, here specialized
    to the same-length contract). Recall contract (stated, exact): the
    query reports SAME-LENGTH pairs within edit distance 2 — the
    contract the original length block already had; cross-length typo
    pairs are out of scope by design.

    Within that contract recall is EXACT, not approximate: an edit
    script of ≤2 ops has ≤2 cut points, so splitting each name into 3
    segments leaves (pigeonhole) at least one segment untouched, and an
    untouched segment of one name appears verbatim in the other at a
    position shifted by at most the insertion/deletion imbalance — for
    equal lengths, offset ∈ {-1, 0, +1}. Candidate generation is
    therefore an equi-join of exact segments (3 keys/name) against
    offset-shifted substrings (≤9 keys/name) on
    (length, segment_index, segment_text): block-key cardinality grows
    with the vocabulary (segments are ~len/3 chars of real text), so
    per-block size stays bounded and pair work is linear-ish in the
    candidate count instead of the Θ(n²/L) of a length-only block
    (round-9 verdict directive #1; gate:
    tests/test_round10_plans.py). The DuckDB oracle deliberately keeps
    the naive length-block spelling — because recall is exact the two
    produce identical histograms, so the hash-match PROVES the recall
    claim instead of assuming it. Exact Levenshtein ≤ 2 inside the
    candidate set, then a distance histogram."""
    part = Catalog(sf_dir).load(spark, "part")
    names = part.select(F.col("p_name").alias("nm")).distinct()
    cand = segment_block_candidates(names)
    blocked = cand.select(
        F.levenshtein("nm_a", "nm_b").alias("lev")
    ).filter(F.col("lev") <= 2)
    return blocked.groupBy("lev").agg(F.count(F.lit(1)).alias("n_pairs"))


def segment_block_candidates(names: DataFrame) -> DataFrame:
    """PassJoin-style candidate pairs (nm_a < nm_b, same length) whose
    segment keys collide — a SUPERSET of all same-length pairs within
    edit distance 2 (exact recall; see ``fuzzy_part_name_pairs``).
    ``names`` must have one string column ``nm``; gate:
    tests/test_round10_plans.py asserts both the recall property and
    that block-key cardinality grows with the vocabulary."""
    names = names.withColumn("len", F.length("nm"))
    # 3 deterministic segments: seg i (1-based) covers
    # [floor((i-1)*len/3)+1, floor(i*len/3)] in 1-indexed substring terms.
    seg_idx = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("si")
    segged = names.select("nm", "len", seg_idx).select(
        "nm",
        "len",
        "si",
        (F.floor((F.col("si") - 1) * F.col("len") / 3) + 1)
        .cast("int")
        .alias("st"),
        (
            F.floor(F.col("si") * F.col("len") / 3)
            - F.floor((F.col("si") - 1) * F.col("len") / 3)
        )
        .cast("int")
        .alias("sl"),
    )
    idx = segged.select(
        F.col("nm").alias("nm_a"),
        "len",
        "si",
        F.expr("substring(nm, st, sl)").alias("seg"),
    )
    probe = (
        segged.select(
            "nm", "len", "si", "st", "sl",
            F.explode(
                F.array(F.lit(-1), F.lit(0), F.lit(1))
            ).alias("off"),
        )
        .filter(
            (F.col("st") + F.col("off") >= 1)
            & (F.col("st") + F.col("off") + F.col("sl") - 1 <= F.col("len"))
        )
        .select(
            F.col("nm").alias("nm_b"),
            "len",
            "si",
            F.expr("substring(nm, st + off, sl)").alias("seg"),
        )
    )
    return (
        idx.join(probe, ["len", "si", "seg"])
        .filter(F.col("nm_a") < F.col("nm_b"))
        .select("nm_a", "nm_b")
        .distinct()
    )


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


@register(
    "text_number_extraction_profile",
    oracle="""
WITH per_doc AS (
    SELECT source,
           len(regexp_extract_all(text, '[0-9]+')) AS n_nums
    FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_nums) AS BIGINT) AS total_numbers,
       CAST(SUM(CASE WHEN n_nums > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_numbers,
       CAST(MAX(n_nums) AS BIGINT) AS max_per_doc,
       ROUND(CAST(SUM(n_nums) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS mean_per_doc
FROM per_doc GROUP BY source
""",
)
def text_number_extraction_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Numeric-literal density per source (regex ``[0-9]+`` runs per
    doc, JVM-side) — the structured-content tell: tables, logs, and
    price lists light up here while prose stays near zero, and the
    profile routes documents toward numeracy-aware processing. The
    ASCII-only pattern is engine-portable by construction; one scan
    into an O(sources) aggregate."""
    docs = Catalog(sf_dir).load(spark, "documents")
    per_doc = docs.select(
        "source",
        F.size(
            F.regexp_extract_all("text", F.lit("[0-9]+"), 0)
        ).alias("n_nums"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_nums").cast("bigint").alias("total_numbers"),
        F.sum(F.when(F.col("n_nums") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_numbers"),
        F.max("n_nums").cast("bigint").alias("max_per_doc"),
        F.round(
            F.sum("n_nums").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_per_doc"),
    )


@register(
    "seasonal_adjustment_residuals",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
    FROM orders GROUP BY 1
),
dowed AS (
    SELECT (day - DATE '1970-01-01') % 7 AS dow_idx, n FROM daily
),
dow_means AS (
    SELECT dow_idx, CAST(SUM(n) AS BIGINT) AS s, COUNT(*) AS k
    FROM dowed GROUP BY dow_idx
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS st, COUNT(*) AS kt FROM dowed
),
terms AS (
    SELECT CAST(ROUND((CAST(n AS DOUBLE)
                       - CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                      * (CAST(n AS DOUBLE)
                         - CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                      * 1000000) AS BIGINT) AS ssr_q,
           CAST(ROUND((CAST(n AS DOUBLE)
                       - CAST(st AS DOUBLE) / CAST(kt AS DOUBLE))
                      * (CAST(n AS DOUBLE)
                         - CAST(st AS DOUBLE) / CAST(kt AS DOUBLE))
                      * 1000000) AS BIGINT) AS sst_q
    FROM dowed
    JOIN dow_means USING (dow_idx)
    CROSS JOIN tot
)
SELECT COUNT(*) AS n_days,
       ROUND(CAST(SUM(sst_q) AS DOUBLE) / 1000000, 6) AS sst,
       ROUND(CAST(SUM(ssr_q) AS DOUBLE) / 1000000, 6) AS ssr,
       ROUND(1.0 - CAST(SUM(ssr_q) AS DOUBLE)
             / CAST(SUM(sst_q) AS DOUBLE), 6) AS r2_seasonal
FROM terms
""",
)
def seasonal_adjustment_residuals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How much of daily order-volume variance weekday seasonality
    explains: R² = 1 − SSR/SST, residuals against per-weekday means vs
    the grand mean — the decomposition check run BEFORE fitting any
    trend (de-seasonalize first or the trend fit eats the weekly
    cycle; composes ``weekday_seasonality_profile`` with
    ``theil_sen_daily_trend``). Facts reduce to the calendar-bounded
    daily series; every squared residual is computed from exact
    integer sums via one mirrored double expression and QUANTIZED to
    1e-6 before summation (bounded terms, but partition order must not
    perturb the hash)."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dowed = daily.select(
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7
        ).alias("dow_idx"),
        "n",
    )
    dow_means = dowed.groupBy("dow_idx").agg(
        F.sum("n").cast("bigint").alias("s"),
        F.count(F.lit(1)).alias("k"),
    )
    tot = dowed.agg(
        F.sum("n").cast("bigint").alias("st"),
        F.count(F.lit(1)).alias("kt"),
    )
    rd = F.col("n").cast("double") - F.col("s").cast("double") / F.col(
        "k"
    ).cast("double")
    rt = F.col("n").cast("double") - F.col("st").cast("double") / F.col(
        "kt"
    ).cast("double")
    terms = (
        dowed.join(F.broadcast(dow_means), "dow_idx")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(rd * rd * 1000000).cast("bigint").alias("ssr_q"),
            F.round(rt * rt * 1000000).cast("bigint").alias("sst_q"),
        )
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.sum("sst_q").cast("double") / 1000000, 6).alias("sst"),
        F.round(F.sum("ssr_q").cast("double") / 1000000, 6).alias("ssr"),
        F.round(
            1.0
            - F.sum("ssr_q").cast("double")
            / F.sum("sst_q").cast("double"),
            6,
        ).alias("r2_seasonal"),
    )


@register(
    "median_ci_binomial",
    oracle=f"""
WITH enc AS (SELECT {_CENTS} AS cents FROM orders),
counts AS (SELECT cents, COUNT(*) AS c FROM enc GROUP BY cents),
cum AS (
    SELECT cents, SUM(c) OVER (ORDER BY cents ASC) AS cum,
           (SELECT COUNT(*) FROM enc) AS n
    FROM counts
),
ranks AS (
    SELECT n,
           (n + 1) // 2 AS r_med,
           CAST(FLOOR((CAST(n AS DOUBLE)
                       - 1.96 * SQRT(CAST(n AS DOUBLE))) / 2) AS BIGINT)
               AS r_lo,
           CAST(CEIL(1 + (CAST(n AS DOUBLE)
                          + 1.96 * SQRT(CAST(n AS DOUBLE))) / 2)
                AS BIGINT) AS r_hi
    FROM (SELECT DISTINCT n FROM cum)
)
SELECT r.n AS n_orders,
       MIN(CASE WHEN cum >= r_med THEN cents END) AS median_cents,
       MIN(CASE WHEN cum >= r_lo THEN cents END) AS ci_lo_cents,
       MIN(CASE WHEN cum >= r_hi THEN cents END) AS ci_hi_cents
FROM cum CROSS JOIN ranks r
GROUP BY r.n
""",
)
def median_ci_binomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median of
    order value, by the binomial order-statistic bound: the CI
    endpoints are the values at ranks (n ∓ 1.96√n)/2 — no normality
    assumption anywhere, which is the point for money amounts. Ranks
    are scalars derived from n with one mirrored IEEE expression; the
    three rank lookups walk the two-pass cumulative table
    (``global_cumsum`` — the oracle's window is the single-partition
    spelling this avoids). The lower-median convention ((n+1)//2)
    keeps odd/even cases deterministic."""
    import math

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
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum, n = global_cumsum_with_total(
        counts, [F.col("cents").asc()], "c", out_col="cum"
    )
    n = int(n)
    r_med = (n + 1) // 2
    r_lo = int(math.floor((float(n) - 1.96 * math.sqrt(float(n))) / 2))
    r_hi = int(math.ceil(1 + (float(n) + 1.96 * math.sqrt(float(n))) / 2))
    return cum.agg(
        F.lit(n).cast("bigint").alias("n_orders"),
        F.min(F.when(F.col("cum") >= r_med, F.col("cents"))).alias(
            "median_cents"
        ),
        F.min(F.when(F.col("cum") >= r_lo, F.col("cents"))).alias(
            "ci_lo_cents"
        ),
        F.min(F.when(F.col("cum") >= r_hi, F.col("cents"))).alias(
            "ci_hi_cents"
        ),
    )


@register(
    "part_size_price_anova",
    oracle="""
WITH enc AS (
    SELECT p_size AS grp,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS x
    FROM part
),
per_grp AS (
    SELECT grp, COUNT(*) AS ng,
           CAST(SUM(x) AS HUGEINT) AS sg,
           CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS ssg
    FROM enc GROUP BY grp
),
terms AS (
    SELECT ng, sg, ssg,
           CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                      / CAST(ng AS DOUBLE) * 1000000) AS BIGINT)
               AS bterm_q
    FROM per_grp
),
sums AS (
    SELECT COUNT(*) AS k, CAST(SUM(ng) AS BIGINT) AS n,
           CAST(SUM(sg) AS HUGEINT) AS s,
           CAST(SUM(ssg) AS HUGEINT) AS ss,
           CAST(SUM(bterm_q) AS HUGEINT) AS b_q
    FROM terms
)
SELECT k AS k_groups, n,
       ROUND((CAST(b_q AS DOUBLE) / 1000000
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1)
             / ((CAST(ss AS DOUBLE) - CAST(b_q AS DOUBLE) / 1000000)
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
           AS f_stat
FROM sums
""",
)
def part_size_price_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic: does part size explain retail price?
    F = (SSB/(k−1)) / (SSW/(n−k)) computed entirely from per-group
    sufficient statistics — one scan, O(sizes) shuffled rows, the
    distributed closed form (no residual pass, no per-row second
    visit). The only non-integer intermediates are the per-group
    s²/n terms, each QUANTIZED to 1e-6 before the cross-group sum;
    squared cent sums ride in decimal(38,0)/HUGEINT since they pass
    int64 at catalog scale."""
    part = Catalog(sf_dir).load(spark, "part")
    enc = part.select(
        F.col("p_size").alias("grp"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("x"),
    )
    per_grp = enc.groupBy("grp").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sg"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("ssg"),
    )
    bterm = F.round(
        F.col("sg").cast("double")
        * F.col("sg").cast("double")
        / F.col("ng").cast("double")
        * 1000000
    ).cast("bigint")
    terms = per_grp.select("ng", "sg", "ssg", bterm.alias("bterm_q"))
    sums = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("ssg").alias("ss"),
        F.sum(F.col("bterm_q").cast("decimal(38,0)")).alias("b_q"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    bd = F.col("b_q").cast("double") / 1000000
    return sums.select(
        F.col("k").alias("k_groups"),
        "n",
        F.round(
            (bd - sd * sd / nd) / (kd - 1) / ((ssd - bd) / (nd - kd)),
            6,
        ).alias("f_stat"),
    )
