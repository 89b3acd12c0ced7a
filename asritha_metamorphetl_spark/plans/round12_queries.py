"""Round-12 contract-pinning queries (VERDICT r11 directive #7: few,
deep — each pins a cross-engine or scale contract no existing query
exercises).

Contracts pinned here:

- ``systematic_sample_global_rank``: the MULTI-measure two-pass global
  cumsum (``operators/ranks.global_cumsums``) under the driver hash at
  sampled positions — including the r11-ADVICE integral-type guard path
  (both measures aggregate to bigint by construction).
- ``null_safe_join_audit``: Spark ``<=>`` vs SQL ``IS NOT DISTINCT
  FROM`` — the null-safe equi-join semantics no mart exercises (all
  catalog keys are non-null, so nulls are DERIVED deterministically).
- ``cube_margins_audit``: CUBE margin-row multiplicity plus per-column
  ``GROUPING()`` flags (flags, not grouping_id bitmasks, are the
  portable cross-engine surface).
- ``price_mad_robust_scale``: nested exact order statistics — a median
  OF deviations FROM a median — via two cumulative-count passes over
  bounded distinct-value frames (never a single-partition sort).
- ``regex_token_profile``: regex dialect agreement on a stated
  conservative subset (character classes + ``+``), per-source token
  totals.
- ``first_last_nonnull_window_audit``: ``FIRST/LAST ... IGNORE NULLS``
  over ordered frames — the sparse last-observation-carried-forward
  shape; nulls derived deterministically.

No reference counterpart (the reference has no sampling/statistics
surface — SURVEY.md §2 maps its operator inventory; these extend the
engine's first-class analytics per the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: Every SAMPLE_EVERY-th row of the global price order is kept.
SAMPLE_EVERY = 50


@register(
    "systematic_sample_global_rank",
    oracle=f"""
WITH ranked AS (
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           ROW_NUMBER() OVER (
               ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                        o_orderkey ASC) AS rn,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
               ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                        o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_cents
    FROM orders
)
SELECT o_orderkey, rn, cum_cents
FROM ranked WHERE rn % {SAMPLE_EVERY} = 1
""",
)
def systematic_sample_global_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Systematic (every k-th) sampling of the GLOBAL price order — the
    deterministic audit-sample shape (pick row 1, 51, 101, ... of the
    ranked population) — computed by the one-pass multi-measure
    ``global_cumsums``: the lit(1) measure IS the exact global row
    number and the cents measure carries the running revenue, so one
    repartitionByRange + one O(partitions) driver prefix-sum replaces a
    single-partition ROW_NUMBER that would funnel every row through one
    task at 100 TB. The oracle replays the naive window spelling; the
    hash-match at sampled positions pins both the rank and the prefix
    sum EXACTLY (any off-by-one in the partition offsets shifts every
    sampled row). Both measures aggregate to bigint — the integral
    contract the r11-ADVICE runtime guard enforces."""
    from asritha_metamorphetl_spark.operators.ranks import global_cumsums

    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.lit(1).cast("bigint").alias("one"),
    )
    order_by = [F.col("cents").desc(), F.col("o_orderkey").asc()]
    out, _ = global_cumsums(
        orders, order_by, [("one", "rn"), ("cents", "cum_cents")]
    )
    return out.filter((F.col("rn") % SAMPLE_EVERY) == 1).select(
        "o_orderkey", "rn", "cum_cents"
    )


@register(
    "null_safe_join_audit",
    oracle="""
WITH keyed AS (
    SELECT o_orderkey, NULLIF(o_orderkey % 100, 0) AS k,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
a AS (SELECT * FROM keyed WHERE o_orderkey % 2 = 0),
b AS (SELECT * FROM keyed WHERE o_orderkey % 2 = 1)
SELECT COALESCE(CAST(a.k AS VARCHAR), '<null>') AS join_key,
       COUNT(*) AS n_pairs,
       CAST(SUM(a.cents + b.cents) AS BIGINT) AS pair_cents
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1
""",
)
def null_safe_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join semantics under the driver hash: keys are
    deterministically NULLed (``NULLIF(o_orderkey % 100, 0)``) and the
    even/odd halves of orders join on Spark's ``<=>`` — which must
    match null-to-null exactly like SQL's IS NOT DISTINCT FROM,
    including the null-key GROUP's pair count (a plain ``=`` join
    silently drops those rows; the difference is invisible on the
    all-non-null catalog keys every other join uses). Scale shape: the
    null key is ONE hot key by construction — Spark hash-partitions
    ``<=>`` keys like any equi-join key, so the audit's null group is
    also a worked example of why production null-safe joins coalesce
    nulls to salted sentinels; the oracle mirrors the exact pair
    arithmetic."""
    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_orderkey",
        F.nullif((F.col("o_orderkey") % 100), F.lit(0)).alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    a = orders.filter(F.col("o_orderkey") % 2 == 0).alias("a")
    b = orders.filter(F.col("o_orderkey") % 2 == 1).alias("b")
    joined = a.join(b, F.col("a.k").eqNullSafe(F.col("b.k")))
    return joined.groupBy(
        F.coalesce(F.col("a.k").cast("string"), F.lit("<null>")).alias(
            "join_key"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("a.cents") + F.col("b.cents")).alias("pair_cents"),
    )


@register(
    "cube_margins_audit",
    oracle="""
SELECT COALESCE(o_orderpriority, '<all>') AS priority,
       COALESCE(o_orderstatus, '<all>') AS status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
)
def cube_margins_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with explicit per-column GROUPING() flags: all four margin
    classes (detail, per-priority, per-status, grand total) in one
    pass, each row carrying which dimensions are aggregated away. The
    flags — not grouping_id bitmasks, whose bit order is an engine
    choice — are the portable surface, and they also disambiguate a
    REAL null dimension value from a rolled-up one (the classic CUBE
    trap; COALESCE alone cannot tell them apart). Spark evaluates CUBE
    as one expand+aggregate (rows × 4 before the map-side combine),
    identical in shape to the oracle's; complements
    revenue_grouping_sets, which pins explicit GROUPING SETS but never
    the flags."""
    orders = Catalog(sf_dir).load(spark, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        orders.select("o_orderpriority", "o_orderstatus", cents.alias("c"))
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("cents"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias(
                "priority"
            ),
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias(
                "status"
            ),
            "g_priority",
            "g_status",
            "n",
            "cents",
        )
    )


def _lower_median_sql(src: str, col: str) -> str:
    """DuckDB CTE body: exact LOWER median of ``col`` in ``src`` via
    cumulative counts over the distinct-value frame (the engine-side
    derivation mirrored; never a value interpolation, so the result is
    a member of the data and hash-exact)."""
    return f"""
    SELECT MIN(v) FROM (
        SELECT {col} AS v,
               SUM(COUNT(*)) OVER (ORDER BY {col} ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               (SELECT COUNT(*) FROM {src}) AS n
        FROM {src} GROUP BY {col}
    ) WHERE cum * 2 >= n
"""


@register(
    "price_mad_robust_scale",
    oracle=f"""
WITH med AS ({_lower_median_sql("(SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders)", "c")}),
devs AS (
    SELECT ABS(CAST(ROUND(o_totalprice * 100) AS BIGINT)
               - (SELECT * FROM med)) AS d
    FROM orders
),
mad AS ({_lower_median_sql("devs", "d")})
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       (SELECT * FROM med) AS median_cents,
       (SELECT * FROM mad) AS mad_cents
FROM orders
""",
)
def price_mad_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of order value — the robust scale
    estimate outlier gates use where stddev is poisoned by the tail —
    as NESTED exact order statistics: the lower median of |cents −
    lower-median(cents)|. Each median comes from a cumulative count
    over the grouped distinct-value frame (two narrow shuffles with
    map-side combine; the cumulative window runs over |distinct
    values| rows, never the raw table — the same no-single-partition
    discipline as the weighted-median family, here pinned through TWO
    composed passes where an off-by-one in either median shifts the
    other). Lower median (not interpolated) keeps both engines on
    integer arithmetic. The row count ``n`` rides along INSIDE the
    first median pass (an unbounded-frame sum over the same sorted
    distinct-value window — same exchange, same sort, no extra job),
    so the whole query is exactly two actions over orders, not three
    (VERDICT r12 finding #1: the standalone ``orders.count()`` was one
    avoidable full scan at 100 TB)."""
    orders = Catalog(sf_dir).load(spark, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )

    def lower_median(df: DataFrame, col: str):
        """(lower median, total row count) in ONE action: both windows
        share the ordering, so Catalyst evaluates them in a single
        window stage over the distinct-value frame."""
        counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w_cum = Window.orderBy(F.col(col).asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = Window.orderBy(F.col(col).asc()).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        # the windows run over the DISTINCT-value frame (bounded);
        # cum*2 >= n picks the lower median without float division
        staged = counts.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
            "n", F.sum("cnt").over(w_all)
        )
        row = (
            staged.filter(F.col("cum") * 2 >= F.col("n"))
            .agg(F.min(col).alias("m"), F.max("n").alias("n"))
            .collect()[0]
        )
        return row["m"], row["n"]

    med, n = lower_median(orders, "c")
    devs = orders.select((F.abs(F.col("c") - F.lit(med))).alias("d"))
    mad, _ = lower_median(devs, "d")
    return spark.createDataFrame(
        [(int(n), int(med), int(mad))],
        "n bigint, median_cents bigint, mad_cents bigint",
    )


@register(
    "regex_token_profile",
    oracle="""
WITH toks AS (
    SELECT source, unnest(regexp_extract_all(text, '[A-Za-z]+')) AS tok
    FROM documents
)
SELECT source,
       COUNT(*) AS n_tokens,
       COUNT(DISTINCT tok) AS n_distinct,
       CAST(SUM(LENGTH(tok)) AS BIGINT) AS total_len
FROM toks GROUP BY source
""",
)
def regex_token_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenization profile per source over a STATED conservative
    dialect subset — character classes plus ``+``, which Spark (Java
    regex) and the oracle (RE2-style) interpret identically; the
    contract is that tokenizer counts agree cross-engine as long as
    pipelines stay inside that subset (lookarounds and \\\\p classes are
    exactly where they silently diverge). The extract runs row-local
    inside the scan stage; only the per-source rollup and the distinct
    shuffle move data."""
    docs = Catalog(sf_dir).load(spark, "documents")
    toks = docs.select(
        "source",
        # idx=0 = the whole match (Spark defaults to capture group 1;
        # the oracle's regexp_extract_all extracts whole matches)
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+"), 0)
        ).alias("tok"),
    )
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.sum(F.length("tok")).alias("total_len"),
    )


@register(
    "first_last_nonnull_window_audit",
    oracle="""
WITH staged AS (
    SELECT o_custkey, o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS v
    FROM orders
),
spans AS (
    SELECT o_custkey,
           FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS first_nn,
           LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_nn,
           COUNT(v) OVER (PARTITION BY o_custkey) AS n_nonnull,
           COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM staged
)
SELECT DISTINCT o_custkey, first_nn, last_nn, n_nonnull, n_orders
FROM spans
""",
)
def first_last_nonnull_window_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIRST/LAST ... IGNORE NULLS over an ordered per-customer frame —
    the sparse-observation carry shape (last known non-null reading per
    entity) that silently breaks when an engine's last_value defaults
    to RESPECT NULLS. A third of the values are deterministically
    NULLed; per customer the audit emits the first and last non-null
    under the full-partition frame plus null/total counts (customers
    whose every value is NULL must emit NULL spans, not vanish). One
    hash-partitioned window, one distinct — both on the bounded
    per-customer frame."""
    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .alias("v"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wp = Window.partitionBy("o_custkey")
    staged = orders.select(
        "o_custkey",
        F.first("v", ignorenulls=True).over(w).alias("first_nn"),
        F.last("v", ignorenulls=True).over(w).alias("last_nn"),
        F.count("v").over(wp).alias("n_nonnull"),
        F.count(F.lit(1)).over(wp).alias("n_orders"),
    )
    return staged.distinct()
