"""Quality/reconciliation queries + remaining operator-family coverage
(scalable ranking, exact median, regexp/string ops, array HOFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

# ---------------------------------------------------------------------------
# D2–D5: full reconciliation summary, driven through quality.reconcile
# against a deterministically perturbed copy of orders
# ---------------------------------------------------------------------------

_PERTURB_MOD = 101  # every 101st order gets its totalprice shifted
_DELETE_MOD = 97  # every 97th (offset 3) order is dropped from the target


@register(
    "reconcile_orders_summary",
    oracle=f"""
WITH source AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
),
target AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % {_PERTURB_MOD} = 0
                THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey % {_DELETE_MOD} != 3
),
joined AS (
    SELECT
        s.o_orderkey AS sk, t.o_orderkey AS tk,
        CASE WHEN s.o_custkey = t.o_custkey
              AND s.o_orderstatus = t.o_orderstatus
              AND s.o_totalprice = t.o_totalprice
             THEN 1 ELSE 0 END AS is_match
    FROM source s
    FULL OUTER JOIN target t ON s.o_orderkey = t.o_orderkey
)
SELECT
    CAST(COUNT(sk) AS BIGINT) AS source_rows,
    CAST(COUNT(tk) AS BIGINT) AS target_rows,
    CAST(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS common_rows,
    CAST(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL AND is_match = 1
             THEN 1 ELSE 0 END) AS BIGINT) AS matched_rows,
    CAST(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL AND is_match = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS mismatched_rows,
    CAST(SUM(CASE WHEN tk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS source_only_rows,
    CAST(SUM(CASE WHEN sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS target_only_rows,
    ROUND(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL AND is_match = 0
              THEN 1 ELSE 0 END)
          / SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL THEN 1 ELSE 0 END)
          * 100, 2) AS mismatch_pct
FROM joined
""",
)
def reconcile_orders_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reconcile operator (quality/reconcile.py) over a perturbed copy
    of orders: cell changes + deleted rows, detected in one pass."""
    from asritha_metamorphetl_spark.quality import reconcile

    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    target = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % _PERTURB_MOD == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    ).filter(F.col("o_orderkey") % _DELETE_MOD != 3)
    result = reconcile(orders, target, ["o_orderkey"], persist=False)
    return result.summary


# ---------------------------------------------------------------------------
# W3 at scale: the ranks operator vs SQL PERCENT_RANK (exact same numbers,
# partition-parallel plan — no SinglePartition stage)
# ---------------------------------------------------------------------------


@register(
    "order_value_tiers_scalable",
    oracle="""
WITH ranked AS (
    SELECT o_orderkey,
           PERCENT_RANK() OVER (ORDER BY o_totalprice DESC) AS pr
    FROM orders
)
SELECT
    o_orderkey,
    ROUND(pr, 9) AS pr,
    CASE WHEN pr <= 0.2 THEN 'Gold'
         WHEN pr <= 0.5 THEN 'Silver'
         ELSE 'Bronze' END AS tier
FROM ranked
""",
)
def order_value_tiers_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from asritha_metamorphetl_spark.operators.ranks import global_percent_rank

    orders = Catalog(sf_dir).load(spark, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_percent_rank(
        orders,
        F.col("o_totalprice"),
        descending=True,
        tiebreak=[F.col("o_orderkey")],
        out_col="pr",
    )
    return ranked.select(
        "o_orderkey",
        F.round(F.col("pr"), 9).alias("pr"),
        F.when(F.col("pr") <= 0.2, "Gold")
        .when(F.col("pr") <= 0.5, "Silver")
        .otherwise("Bronze")
        .alias("tier"),
    )


# ---------------------------------------------------------------------------
# Exact median (interpolated) per group — beyond the reference's agg set
# ---------------------------------------------------------------------------


@register(
    "order_price_stats",
    oracle="""
SELECT
    o_orderpriority,
    MEDIAN(o_totalprice) AS median_price,
    MIN(o_totalprice) AS min_price,
    MAX(o_totalprice) AS max_price,
    COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def order_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(sf_dir).load(spark, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("median_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# E6/E7: regexp + string functions + casts
# ---------------------------------------------------------------------------


@register(
    "priority_parse",
    oracle=r"""
SELECT
    o_orderpriority,
    CAST(regexp_extract(o_orderpriority, '(\d+)-', 1) AS INTEGER) AS priority_num,
    regexp_extract(o_orderpriority, '\d+-(.+)', 1) AS priority_word,
    replace(lower(o_orderpriority), '-', '_') AS norm,
    COUNT(*) AS n
FROM orders
GROUP BY 1, 2, 3, 4
""",
)
def priority_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(sf_dir).load(spark, "orders")
    return (
        orders.select(
            "o_orderpriority",
            F.regexp_extract("o_orderpriority", r"(\d+)-", 1)
            .cast("int")
            .alias("priority_num"),
            F.regexp_extract("o_orderpriority", r"\d+-(.+)", 1).alias(
                "priority_word"
            ),
            F.replace(
                F.lower(F.col("o_orderpriority")), F.lit("-"), F.lit("_")
            ).alias("norm"),
        )
        .groupBy("o_orderpriority", "priority_num", "priority_word", "norm")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# E8: array HOFs — transform/filter/explode with positions (the Raptor
# column-diff idiom, wheel Raptor/Raptor.py:581-606, as a checkable query)
# ---------------------------------------------------------------------------


@register(
    "token_frequencies",
    oracle="""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
exploded AS (
    SELECT doc_id, unnest(t) AS token FROM toks
)
SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
FROM exploded
WHERE length(token) > 2
GROUP BY token
HAVING COUNT(*) >= 10
""",
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from asritha_metamorphetl_spark.functions.text import tokens

    docs = Catalog(sf_dir).load(spark, "documents")
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 2)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("freq") >= 10)
    )


# ---------------------------------------------------------------------------
# D3 as a checkable query: per-cell mismatch expansion (arrays_zip/explode
# + struct access — the Raptor column-diff idiom end-to-end)
# ---------------------------------------------------------------------------


@register(
    "reconcile_orders_cells",
    oracle=f"""
WITH target AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % {_PERTURB_MOD} = 0
                THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey % {_DELETE_MOD} != 3
)
SELECT
    s.o_orderkey,
    'o_totalprice' AS column_name,
    CAST(s.o_totalprice AS VARCHAR) AS source_value,
    CAST(t.o_totalprice AS VARCHAR) AS target_value
FROM orders s
JOIN target t ON s.o_orderkey = t.o_orderkey
WHERE s.o_totalprice != t.o_totalprice
""",
)
def reconcile_orders_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from asritha_metamorphetl_spark.quality import reconcile

    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    target = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % _PERTURB_MOD == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    ).filter(F.col("o_orderkey") % _DELETE_MOD != 3)
    return reconcile(orders, target, ["o_orderkey"], persist=False).column_mismatches


# ---------------------------------------------------------------------------
# J5/D2 on a COMPOSITE key: the reference's Raptor parses multi-column
# primary keys (Raptor/Raptor.py:548) — reconcile keyed on
# (l_orderkey, l_linenumber), the natural two-part lineitem key.
# ---------------------------------------------------------------------------


@register(
    "reconcile_lineitem_composite",
    oracle="""
WITH source AS (
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
),
target AS (
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (l_orderkey + l_linenumber) % 53 = 0
                THEN l_quantity + 1.0 ELSE l_quantity END AS l_quantity,
           l_returnflag
    FROM lineitem
    WHERE NOT (l_orderkey % 89 = 7 AND l_linenumber = 1)
),
joined AS (
    SELECT
        s.l_orderkey AS sk, t.l_orderkey AS tk,
        CASE WHEN s.l_quantity = t.l_quantity
              AND s.l_returnflag = t.l_returnflag
             THEN 1 ELSE 0 END AS is_match
    FROM source s
    FULL OUTER JOIN target t
      ON s.l_orderkey = t.l_orderkey AND s.l_linenumber = t.l_linenumber
)
SELECT
    CAST(COUNT(sk) AS BIGINT) AS source_rows,
    CAST(COUNT(tk) AS BIGINT) AS target_rows,
    CAST(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS common_rows,
    CAST(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL AND is_match = 1
             THEN 1 ELSE 0 END) AS BIGINT) AS matched_rows,
    CAST(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL AND is_match = 0
             THEN 1 ELSE 0 END) AS BIGINT) AS mismatched_rows,
    CAST(SUM(CASE WHEN tk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS source_only_rows,
    CAST(SUM(CASE WHEN sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS target_only_rows,
    ROUND(SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL AND is_match = 0
              THEN 1 ELSE 0 END)
          / SUM(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL THEN 1 ELSE 0 END)
          * 100, 2) AS mismatch_pct
FROM joined
""",
)
def reconcile_lineitem_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile on a two-column primary key: the full-outer diff joins
    on (l_orderkey, l_linenumber) — the shuffle hashes the composite
    key, so the plan is identical in shape to the single-key path (one
    exchange per side, no extra stage). Perturbations hit both a
    measure (quantity bump on a composite-derived predicate, so neither
    key column alone determines it) and row presence (line 1 of every
    89th order deleted)."""
    from asritha_metamorphetl_spark.quality import reconcile

    li = Catalog(sf_dir).load(spark, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    target = li.withColumn(
        "l_quantity",
        F.when(
            (F.col("l_orderkey") + F.col("l_linenumber")) % 53 == 0,
            F.col("l_quantity") + 1.0,
        ).otherwise(F.col("l_quantity")),
    ).filter(
        ~((F.col("l_orderkey") % 89 == 7) & (F.col("l_linenumber") == 1))
    )
    return reconcile(
        li, target, ["l_orderkey", "l_linenumber"], persist=False
    ).summary


# ---------------------------------------------------------------------------
# S7/A6: temp-view + spark.sql API path, GROUP BY ordinal
# ---------------------------------------------------------------------------


@register(
    "sql_api_revenue_by_region",
    oracle="""
SELECT
    r.r_name AS region,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
    COUNT(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
""",
)
def sql_api_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's parquet→temp-view→spark.sql flow (Raptor wheel
    Raptor/Raptor.py:89-100) with a GROUP BY ordinal (its `group by 1`
    idiom, Raptor.py:446-454)."""
    Catalog(sf_dir).register_views(
        spark, tables=["lineitem", "supplier", "nation", "region"]
    )
    return spark.sql(
        """
        SELECT
            r.r_name AS region,
            CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                AS revenue,
            COUNT(*) AS n_lines
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# O1/O3: global sort + limit (deterministic via tiebreak)
# ---------------------------------------------------------------------------


@register(
    "top5_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 5
""",
)
def top5_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans this as TakeOrderedAndProject — per
    partition top-k then a k-row driver merge, no full sort, no single
    partition."""
    orders = Catalog(sf_dir).load(spark, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# D7: the full orchestrated reconciliation run (dispatcher-fed sides,
# single-shuffle reconcile, per-column rollup) — report/artifact side
# effects are covered in tests/test_quality.py
# ---------------------------------------------------------------------------


@register(
    "reconcile_orchestrated",
    oracle=f"""
WITH target AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % {_PERTURB_MOD} = 0
                THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey % {_DELETE_MOD} != 3
),
common AS (
    SELECT s.o_orderkey,
           CASE WHEN s.o_totalprice != t.o_totalprice THEN 1 ELSE 0 END AS pm
    FROM orders s JOIN target t ON s.o_orderkey = t.o_orderkey
),
tot AS (SELECT COUNT(*) AS n, SUM(pm) AS mp FROM common)
SELECT 'o_totalprice' AS column_name,
       CAST(mp AS BIGINT) AS mismatch_count,
       ROUND(mp / n * 100, 2) AS mismatch_pct
FROM tot WHERE mp > 0
""",
)
def reconcile_orchestrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """submit_reconciliation end-to-end: both sides arrive through the
    source dispatcher's sql connector, reconcile runs as one full-outer
    shuffle, and the per-column rollup is returned."""
    from asritha_metamorphetl_spark.quality.orchestrate import (
        ReconcileRequest,
        submit_reconciliation,
    )

    run = submit_reconciliation(
        spark,
        ReconcileRequest(
            source={
                "type": "sql",
                "query": "SELECT o_orderkey, o_custkey, o_orderstatus, "
                         "o_totalprice FROM orders",
                "catalog_root": sf_dir,
                "tables": ["orders"],
            },
            target={
                "type": "sql",
                "query": f"""
                    SELECT o_orderkey, o_custkey, o_orderstatus,
                           CASE WHEN o_orderkey % {_PERTURB_MOD} = 0
                                THEN o_totalprice + 1.0 ELSE o_totalprice
                           END AS o_totalprice
                    FROM orders WHERE o_orderkey % {_DELETE_MOD} != 3
                """,
                "catalog_root": sf_dir,
                "tables": ["orders"],
            },
            keys=["o_orderkey"],
        ),
    )
    return run.column_summary


@register(
    "dq_violations",
    oracle="""
SELECT 'not_null_o_custkey' AS rule,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS violations FROM orders
UNION ALL
SELECT 'accepted_values_o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus IS NULL
                     OR o_orderstatus NOT IN ('O','F','P')
                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'between_o_totalprice',
       CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                     OR o_totalprice > 300000
                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'regex_o_orderpriority',
       CAST(SUM(CASE WHEN o_orderpriority IS NULL
                     OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'unique_o_orderkey',
       CAST(COUNT(*) - COUNT(DISTINCT ROW(o_orderkey)) AS BIGINT) FROM orders
""",
)
def dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative expectation suite over orders — five rules
    (null/domain/range/shape/uniqueness) evaluated in ONE aggregate pass
    (quality/expectations.py); the oracle recomputes each rule as an
    independent SQL scan."""
    from asritha_metamorphetl_spark.quality.expectations import (
        expect_accepted_values,
        expect_between,
        expect_not_null,
        expect_regex,
        expect_unique,
        validate,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    return validate(
        orders,
        [
            expect_not_null("o_custkey"),
            expect_accepted_values("o_orderstatus", ["O", "F", "P"]),
            expect_between("o_totalprice", 0, 300000),
            expect_regex("o_orderpriority", "^[1-5]-"),
            expect_unique(["o_orderkey"]),
        ],
    )


@register(
    "orders_table_profile",
    oracle="""
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(FLOOR(EXTRACT(EPOCH FROM o_orderdate)) AS BIGINT)
               AS date_sec
    FROM orders
)
SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_repr,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_repr
FROM base
UNION ALL
SELECT 'o_custkey', COUNT(*),
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM base
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM base
UNION ALL
SELECT 'o_totalprice', COUNT(*),
       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(price_cents) AS VARCHAR), CAST(MAX(price_cents) AS VARCHAR)
FROM base
UNION ALL
SELECT 'o_orderdate', COUNT(*),
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT o_orderdate),
       CAST(MIN(date_sec) AS VARCHAR), CAST(MAX(date_sec) AS VARCHAR)
FROM base
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM base
""",
)
def orders_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic one-pass column profiler (operators/profile.py) run over
    the orders table: per column, null count, exact distinct count,
    and canonical min/max (money as integer cents, timestamps as unix
    seconds — representations every engine formats identically). ONE
    scan computes all six columns' aggregates; the long format is an
    explode of the single collapsed row."""
    from asritha_metamorphetl_spark.operators.profile import profile_table

    orders = Catalog(sf_dir).load(spark, "orders")
    return profile_table(
        orders,
        [
            ("o_orderkey", "int"),
            ("o_custkey", "int"),
            ("o_orderstatus", "str"),
            ("o_totalprice", "cents"),
            ("o_orderdate", "ts_sec"),
            ("o_orderpriority", "str"),
        ],
    )


def _bootstrap_oracle() -> str:
    from asritha_metamorphetl_spark.operators.sampling import (
        BOOT_B,
        BOOT_PERM_A,
        BOOT_PERM_C,
        BOOT_THRESHOLDS,
    )
    from asritha_metamorphetl_spark.functions.hashing import MERSENNE61
    from asritha_metamorphetl_spark.plans.text_queries import _hex48_sql

    h = _hex48_sql("md5(id)")
    a_list = "[" + ", ".join(str(v) for v in BOOT_PERM_A) + "]"
    c_list = "[" + ", ".join(str(v) for v in BOOT_PERM_C) + "]"
    u = (
        f"((list_extract({a_list}, b + 1) * h"
        f" + list_extract({c_list}, b + 1))"
        f" % {MERSENNE61}) % {1 << 48}"
    )
    c = " + ".join(
        f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in BOOT_THRESHOLDS
    )
    return f"""
WITH base AS (
    SELECT CAST(o_orderkey AS VARCHAR) AS id,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
hashed AS (SELECT id, cents, {h} AS h FROM base),
expanded AS (
    SELECT id, cents, b, {u} AS u
    FROM hashed CROSS JOIN range({BOOT_B}) t(b)
),
cnt AS (SELECT b, cents, ({c}) AS c FROM expanded),
reps AS (
    SELECT b, SUM(c * cents) / (100.0 * SUM(c)) AS mean_b
    FROM cnt GROUP BY b
),
rk AS (
    SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rk FROM reps
),
pm AS (SELECT SUM(cents) / (100.0 * COUNT(*)) AS pm FROM base)
SELECT CAST({BOOT_B} AS BIGINT) AS n_replicates,
       ROUND(pm.pm, 4) AS point_mean,
       ROUND((SELECT mean_b FROM rk WHERE rk = 2), 4) AS ci_lo,
       ROUND((SELECT mean_b FROM rk WHERE rk = {BOOT_B - 1}), 4) AS ci_hi
FROM pm
"""


@register("bootstrap_mean_ci", oracle=_bootstrap_oracle())
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for mean order value in ONE scan —
    the Poisson bootstrap (the large-scale form: per-row Poisson(1)
    multiplicities stand in for with-replacement resampling, exact as
    n → ∞ and independent of knowing n up front). Every row carries
    {BOOT_B} deterministic integer weights derived from ONE content
    hash (``operators/sampling.poisson_bootstrap_counts_mixed`` —
    MinHash-style integer permutations of a single 48-bit md5, then
    inverse-CDF integer comparisons; the previous md5-per-(row,
    replicate) spelling WAS the query's hot path — measured 9.1 s →
    see BENCH_FULL), so each replicate mean is a weighted aggregate:
    the scan fans out ×B rows that map-side-combine to B partials per
    task, and the shuffle carries B rows total. No RNG state, no
    per-replicate pass, no data resample shuffle — and the whole
    computation (hash, permutations, weights, replicate means,
    rank-2/rank-31 CI, point estimate) replays exactly in the oracle
    because everything up to the final divisions is exact BIGINT
    arithmetic."""
    from asritha_metamorphetl_spark.functions.hashing import shingle_hash
    from asritha_metamorphetl_spark.operators.sampling import (
        BOOT_B,
        poisson_bootstrap_counts_mixed,
    )
    from pyspark.sql import Window

    orders = Catalog(sf_dir).load(spark, "orders").select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    hashed = orders.select(
        "id", "cents", shingle_hash(F.col("id")).alias("h")
    )
    expanded = hashed.select(
        "h",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    c = poisson_bootstrap_counts_mixed(F.col("h"), F.col("b"))
    reps = (
        expanded.select("b", "cents", c.alias("c"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("c") * F.col("cents"))
                / (F.lit(100.0) * F.sum("c"))
            ).alias("mean_b")
        )
    )
    rk = reps.select(
        "mean_b",
        F.row_number()
        .over(Window.orderBy(F.col("mean_b"), F.col("b")))
        .alias("rk"),
    )
    point = orders.agg(
        (F.sum("cents") / (F.lit(100.0) * F.count(F.lit(1)))).alias("pm")
    )
    lo = rk.filter(F.col("rk") == 2).select(F.col("mean_b").alias("ci_lo"))
    hi = rk.filter(F.col("rk") == BOOT_B - 1).select(
        F.col("mean_b").alias("ci_hi")
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.lit(BOOT_B).cast("bigint").alias("n_replicates"),
            F.round("pm", 4).alias("point_mean"),
            F.round("ci_lo", 4).alias("ci_lo"),
            F.round("ci_hi", 4).alias("ci_hi"),
        )
    )
