"""Statistical-analysis queries: correlation, regression, distribution
audits (Benford, Gini, chi-square, mutual information), Zipf fits, and
robust (winsorized) summaries.

The shared discipline that makes every float here hash-comparable
across Spark and DuckDB: all SUMS are exact integer arithmetic
(measures encoded as cents/hundredths bigints, accumulated in
decimal(38,0) on the Spark side and HUGEINT on the DuckDB side), and
floats appear only in a FINAL bounded expression — one or two IEEE
divisions/sqrts over the exact sums, written with the identical
operation tree in both engines, then rounded. IEEE ops on identical
inputs are engine-identical (÷, ×, −, sqrt are correctly rounded), so
the hash compare is stable; what is NOT stable — and therefore never
appears — is a float SUM whose partition order varies.

Why these shapes scale: every query is one or two scans feeding
map-side-combining aggregates whose shuffled state is O(groups) or
O(cells), never O(rows) — correlation matrices, contingency tables,
and OLS fits are all "sufficient statistics" computations, the classic
single-pass distributed-statistics design.

Reference scope: the reference has no statistics surface beyond plain
aggregates; this extends the analytics envelope (SURVEY.md §2 E/A
families) the way a warehouse analyst would use it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: Decimals for final statistic rounding (shared with oracles).
STAT_DECIMALS = 6

#: lineitem measures as exact integers: name -> (spark builder, sql).
_MEASURES = {
    "qty": (
        lambda: F.col("l_quantity").cast("bigint"),
        "CAST(l_quantity AS BIGINT)",
    ),
    "price": (
        lambda: F.round(F.col("l_extendedprice") * 100).cast("bigint"),
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT)",
    ),
    "disc": (
        lambda: F.round(F.col("l_discount") * 100).cast("bigint"),
        "CAST(ROUND(l_discount * 100) AS BIGINT)",
    ),
    "tax": (
        lambda: F.round(F.col("l_tax") * 100).cast("bigint"),
        "CAST(ROUND(l_tax * 100) AS BIGINT)",
    ),
}

_CORR_PAIRS = (
    ("qty", "price"),
    ("qty", "disc"),
    ("qty", "tax"),
    ("price", "disc"),
    ("price", "tax"),
    ("disc", "tax"),
)


def _corr_oracle() -> str:
    cols = ", ".join(f"{sql} AS {n}" for n, (_, sql) in _MEASURES.items())
    rows = []
    for x, y in _CORR_PAIRS:
        rows.append(f"""
SELECT '{x}_{y}' AS pair,
       ROUND((CAST(n AS DOUBLE) * CAST(s_{x}{y} AS DOUBLE)
              - CAST(s_{x} AS DOUBLE) * CAST(s_{y} AS DOUBLE))
             / (SQRT(CAST(n AS DOUBLE) * CAST(s_{x}2 AS DOUBLE)
                     - CAST(s_{x} AS DOUBLE) * CAST(s_{x} AS DOUBLE))
                * SQRT(CAST(n AS DOUBLE) * CAST(s_{y}2 AS DOUBLE)
                       - CAST(s_{y} AS DOUBLE) * CAST(s_{y} AS DOUBLE))),
             {STAT_DECIMALS}) AS r
FROM sums""")
    sums = ", ".join(
        [f"COUNT(*) AS n"]
        + [f"SUM({n}) AS s_{n}" for n in _MEASURES]
        + [f"SUM({n} * {n}) AS s_{n}2" for n in _MEASURES]
        + [f"SUM({x} * {y}) AS s_{x}{y}" for x, y in _CORR_PAIRS]
    )
    body = "\nUNION ALL".join(rows)
    return f"""
WITH enc AS (SELECT {cols} FROM lineitem),
sums AS (SELECT {sums} FROM enc)
{body}
"""


@register("lineitem_corr_matrix", oracle=_corr_oracle())
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation for all 6 lineitem measure pairs from ONE
    scan of sufficient statistics (n, Σx, Σx², Σxy — 15 exact-integer
    aggregates), instead of 6 ``corr()`` passes whose float summation
    order would differ run-to-run. The shuffle carries one partial-sum
    row per task; the 6 divisions happen on a single driver-sized row.
    This is the textbook single-pass distributed correlation — at
    100 TB the cost is exactly one scan regardless of how many pairs
    are requested."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    enc = li.select(
        *[b().alias(n) for n, (b, _) in _MEASURES.items()]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for n in _MEASURES:
        aggs.append(
            F.sum(F.col(n).cast("decimal(38,0)")).alias(f"s_{n}")
        )
        aggs.append(
            F.sum((F.col(n) * F.col(n)).cast("decimal(38,0)")).alias(
                f"s_{n}2"
            )
        )
    for x, y in _CORR_PAIRS:
        aggs.append(
            F.sum((F.col(x) * F.col(y)).cast("decimal(38,0)")).alias(
                f"s_{x}{y}"
            )
        )
    sums = enc.agg(*aggs)

    def corr_col(x: str, y: str):
        n = F.col("n").cast("double")
        sx = F.col(f"s_{x}").cast("double")
        sy = F.col(f"s_{y}").cast("double")
        sxy = F.col(f"s_{x}{y}").cast("double")
        sx2 = F.col(f"s_{x}2").cast("double")
        sy2 = F.col(f"s_{y}2").cast("double")
        return F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)),
            STAT_DECIMALS,
        )

    # one row of 6 correlations, unpivoted with stack — a UNION of six
    # selects over `sums` would re-execute the aggregate (6 scans)
    rcols = sums.select(
        *[corr_col(x, y).alias(f"r_{x}_{y}") for x, y in _CORR_PAIRS]
    )
    pairs_expr = ", ".join(
        f"'{x}_{y}', r_{x}_{y}" for x, y in _CORR_PAIRS
    )
    return rcols.selectExpr(
        f"stack({len(_CORR_PAIRS)}, {pairs_expr}) AS (pair, r)"
    )


@register(
    "regr_price_on_qty",
    oracle=f"""
WITH enc AS (
    SELECT l_returnflag AS flag,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem
),
sums AS (
    SELECT flag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sx2
    FROM enc GROUP BY flag
)
SELECT flag, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             {STAT_DECIMALS}) AS slope_cents_per_unit,
       ROUND((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), {STAT_DECIMALS}) AS intercept_cents
FROM sums
""",
)
def regr_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS (extended price on quantity) via the normal
    equations over exact integer sufficient statistics — the
    distributed closed-form regression: one scan, one O(groups)
    shuffle, slope/intercept from 5 sums per group. The float division
    tree is written identically in the oracle so the rounded results
    hash-match bit-for-bit."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    enc = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    sums = enc.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sx2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2 = F.col("sx2").cast("double")
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    return sums.select(
        "flag",
        "n",
        F.round(slope, STAT_DECIMALS).alias("slope_cents_per_unit"),
        F.round((sy - slope * sx) / n, STAT_DECIMALS).alias(
            "intercept_cents"
        ),
    )


#: Zipf fit: top-N tokens by (freq desc, token asc) — the cap bounds
#: the ln() evaluations (libm log differs across engines only in the
#: last ulp; over 500 values the 6-decimal rounding absorbs it).
ZIPF_TOP_N = 500


@register(
    "zipf_token_slope",
    oracle=f"""
WITH toks AS (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x != ''))
        AS token
    FROM documents
),
freqs AS (
    SELECT token, COUNT(*) AS freq FROM toks
    WHERE length(token) > 2 GROUP BY token
),
ranked AS (
    SELECT freq,
           ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rnk
    FROM freqs
    ORDER BY freq DESC, token ASC LIMIT {ZIPF_TOP_N}
),
pts AS (
    SELECT LN(CAST(rnk AS DOUBLE)) AS x, LN(CAST(freq AS DOUBLE)) AS y,
           CAST(ROUND(LN(CAST(rnk AS DOUBLE)) * 1000000) AS BIGINT) AS xi,
           CAST(ROUND(LN(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS yi
    FROM ranked
),
sums AS (
    SELECT COUNT(*) AS n, SUM(xi) AS sx, SUM(yi) AS sy,
           SUM(xi * yi) AS sxy, SUM(xi * xi) AS sx2
    FROM pts
)
SELECT n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
             4) AS zipf_slope
FROM sums
""",
)
def zipf_token_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    ln(freq) on ln(rank) for the top-{ZIPF_TOP_N} tokens (a natural
    corpus should sit near −1; a synthetic or template-heavy corpus
    drifts). The float-discipline trick: each ln() value is QUANTIZED
    to a 1e-6 grid (bigint) before summation, so the OLS sums are
    exact integers and partition order cannot perturb the fit — only
    the 500 pointwise ln() calls touch libm, each absorbed by its own
    rounding. One corpus scan + an O(vocab) aggregate; the top-N is an
    ``orderBy().limit()`` that compiles to TakeOrderedAndProject —
    per-partition top-N then a driver merge of 32×{ZIPF_TOP_N} rows —
    so a billion-token web-scale vocabulary never passes through a
    single partition (the only global window runs AFTER the limit, on
    exactly {ZIPF_TOP_N} rows). Plan-gated in test_round9_plans."""
    from asritha_metamorphetl_spark.functions.text import tokens

    docs = Catalog(sf_dir).load(spark, "documents")
    freqs = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 2)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # TakeOrderedAndProject: per-partition top-N + driver merge. The
    # tie-break (freq desc, token asc) is total, so this is
    # hash-identical to the old global row_number() <= N spelling
    # while never single-partitioning the vocabulary table.
    top = freqs.orderBy(
        F.col("freq").desc(), F.col("token").asc()
    ).limit(ZIPF_TOP_N)
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    ranked = top.withColumn("rnk", F.row_number().over(w))
    pts = ranked.select(
        F.round(F.log(F.col("rnk").cast("double")) * 1000000)
        .cast("bigint")
        .alias("xi"),
        F.round(F.log(F.col("freq").cast("double")) * 1000000)
        .cast("bigint")
        .alias("yi"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xi").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("yi").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("xi") * F.col("yi")).cast("decimal(38,0)")).alias(
            "sxy"
        ),
        F.sum((F.col("xi") * F.col("xi")).cast("decimal(38,0)")).alias(
            "sx2"
        ),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2 = F.col("sx2").cast("double")
    return sums.select(
        "n",
        F.round(
            (n * sxy - sx * sy) / (n * sx2 - sx * sx), 4
        ).alias("zipf_slope"),
    )


#: Benford first-digit expectation, precomputed in Python and injected
#: as literals on BOTH sides (keeps libm log10 out of the compare).
_BENFORD = {d: round(math.log10(1 + 1 / d), STAT_DECIMALS) for d in range(1, 10)}


def _benford_oracle() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {_BENFORD[d]!r}" for d in range(1, 10)
    )
    return f"""
WITH cents AS (
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
digits AS (
    SELECT c // CAST(POWER(10, LENGTH(CAST(c AS VARCHAR)) - 1) AS BIGINT)
        AS digit
    FROM cents
),
counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
tot AS (SELECT SUM(n) AS total FROM counts)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE),
             {STAT_DECIMALS}) AS observed_share,
       CASE digit {cases} END AS benford_share
FROM counts, tot
"""


@register("benford_price_digits", oracle=_benford_oracle())
def benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: leading-digit distribution
    vs the log10(1+1/d) expectation — the classic fabricated-data /
    unit-mix-bug detector for financial columns. The leading digit is
    extracted ARITHMETICALLY from the exact cents integer (value //
    10^(decimal-length−1)) — never from float formatting, which the
    two engines render differently. Expected shares are Python-
    precomputed literals injected into both plans, so no runtime
    transcendental enters the hash. One scan, 9-row result."""
    orders = Catalog(sf_dir).load(spark, "orders")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    digit = F.floor(
        F.col("c")
        / F.pow(F.lit(10.0), F.length(F.col("c").cast("string")) - 1)
    ).cast("bigint")
    counts = cents.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("total"))
    bf = F.create_map(
        *[x for d in range(1, 10) for x in (F.lit(d), F.lit(_BENFORD[d]))]
    )
    return counts.crossJoin(tot).select(
        "digit",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("total").cast("double"),
            STAT_DECIMALS,
        ).alias("observed_share"),
        bf[F.col("digit")].alias("benford_share"),
    )


@register(
    "gini_revenue_concentration",
    oracle=f"""
WITH rev AS (
    SELECT c.c_mktsegment AS segment, c.c_custkey,
           SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
),
ranked AS (
    SELECT segment, cents,
           ROW_NUMBER() OVER (
               PARTITION BY segment ORDER BY cents ASC, c_custkey ASC
           ) AS i
    FROM rev
),
sums AS (
    SELECT segment, COUNT(*) AS n, SUM(cents) AS s,
           SUM(i * cents) AS si
    FROM ranked GROUP BY segment
)
SELECT segment, n,
       CAST(s AS BIGINT) AS total_cents,
       ROUND((2.0 * CAST(si AS DOUBLE)
              - (CAST(n AS DOUBLE) + 1.0) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)),
             {STAT_DECIMALS}) AS gini
FROM sums
""",
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Gini coefficient of customer revenue — the
    concentration metric a curation pipeline uses on source/domain
    contribution skew. Exact form: with per-customer cents ranked
    ascending, G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) — every sum an
    exact integer (decimal(38,0)/HUGEINT), one rounded division per
    segment. The rank window is PER-SEGMENT (partitionBy, never a
    global sort), and ties rank deterministically by custkey so both
    engines assign identical i."""
    cust = Catalog(sf_dir).load(spark, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("segment", "c_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_row_number,
    )

    ranked = grouped_row_number(
        rev,
        ["segment"],
        [F.col("cents").asc(), F.col("c_custkey").asc()],
        out_col="i",
    )
    sums = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)")).alias(
            "si"
        ),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    si = F.col("si").cast("double")
    return sums.select(
        "segment",
        "n",
        F.col("s").cast("bigint").alias("total_cents"),
        F.round(
            (F.lit(2.0) * si - (n + F.lit(1.0)) * s) / (n * s),
            STAT_DECIMALS,
        ).alias("gini"),
    )


@register(
    "chi2_priority_segment_cells",
    oracle=f"""
WITH joined AS (
    SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
    SELECT segment, priority, COUNT(*) AS n_obs
    FROM joined GROUP BY 1, 2
),
margins AS (
    SELECT segment, priority, n_obs,
           SUM(n_obs) OVER (PARTITION BY segment) AS row_tot,
           SUM(n_obs) OVER (PARTITION BY priority) AS col_tot,
           SUM(n_obs) OVER () AS grand
    FROM cells
)
SELECT segment, priority, n_obs,
       ROUND(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
             / CAST(grand AS DOUBLE), {STAT_DECIMALS}) AS expected,
       ROUND((CAST(n_obs AS DOUBLE)
              - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                / CAST(grand AS DOUBLE))
             * (CAST(n_obs AS DOUBLE)
                - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                  / CAST(grand AS DOUBLE))
             / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                / CAST(grand AS DOUBLE)),
             {STAT_DECIMALS}) AS chi2_term
FROM margins
""",
)
def chi2_priority_segment_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit (order priority × market segment)
    emitted at CELL level: observed count, expected count under
    independence, and the cell's χ² contribution — cell-level output
    keeps every float a bounded expression over exact counts (a global
    χ² would sum 25 doubles in nondeterministic order). Margins come
    from window sums over the 25-row cell table, so the fact scan
    happens once and everything after is O(cells)."""
    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_custkey", F.col("o_orderpriority").alias("priority")
    )
    cust = Catalog(sf_dir).load(spark, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("segment", "priority")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    margins = (
        cells.withColumn(
            "row_tot", F.sum("n_obs").over(Window.partitionBy("segment"))
        )
        .withColumn(
            "col_tot", F.sum("n_obs").over(Window.partitionBy("priority"))
        )
        .withColumn(
            "grand",
            F.sum("n_obs").over(
                Window.partitionBy()
            ),
        )
    )
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("grand").cast("double")
    )
    return margins.select(
        "segment",
        "priority",
        "n_obs",
        F.round(expected, STAT_DECIMALS).alias("expected"),
        F.round(
            (F.col("n_obs").cast("double") - expected)
            * (F.col("n_obs").cast("double") - expected)
            / expected,
            STAT_DECIMALS,
        ).alias("chi2_term"),
    )


@register(
    "mutual_info_status_priority",
    oracle=f"""
WITH cells AS (
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           COUNT(*) AS n_obs
    FROM orders GROUP BY 1, 2
),
margins AS (
    SELECT status, priority, n_obs,
           SUM(n_obs) OVER (PARTITION BY status) AS row_tot,
           SUM(n_obs) OVER (PARTITION BY priority) AS col_tot,
           SUM(n_obs) OVER () AS grand
    FROM cells
)
SELECT status, priority, n_obs,
       ROUND((CAST(n_obs AS DOUBLE) / CAST(grand AS DOUBLE))
             * LN(CAST(n_obs AS DOUBLE) * CAST(grand AS DOUBLE)
                  / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE))),
             {STAT_DECIMALS}) AS mi_term
FROM margins
""",
)
def mutual_info_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual-information cells between order status and
    priority — the dependence scan feature pipelines run between
    metadata columns before trusting one as a stratification key. Same
    cell-margin shape as the χ² audit: one scan to a 15-row cell
    table, window margins, one ln() per cell over exact counts (each
    absorbed by its own rounding — never summed)."""
    orders = Catalog(sf_dir).load(spark, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    margins = (
        cells.withColumn(
            "row_tot", F.sum("n_obs").over(Window.partitionBy("status"))
        )
        .withColumn(
            "col_tot", F.sum("n_obs").over(Window.partitionBy("priority"))
        )
        .withColumn("grand", F.sum("n_obs").over(Window.partitionBy()))
    )
    return margins.select(
        "status",
        "priority",
        "n_obs",
        F.round(
            (F.col("n_obs").cast("double") / F.col("grand").cast("double"))
            * F.log(
                F.col("n_obs").cast("double")
                * F.col("grand").cast("double")
                / (
                    F.col("row_tot").cast("double")
                    * F.col("col_tot").cast("double")
                )
            ),
            STAT_DECIMALS,
        ).alias("mi_term"),
    )


#: Winsorization clip points as integer-exact rank positions:
#: k = ceil(p·n) computed as (p_num·n + 99) // 100 — no float.
WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


@register(
    "winsorized_price_stats",
    oracle=f"""
WITH enc AS (
    SELECT l_returnflag AS flag,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
),
ranked AS (
    SELECT flag, cents,
           ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cents ASC) AS rn,
           COUNT(*) OVER (PARTITION BY flag) AS n
    FROM enc
),
clips AS (
    SELECT flag,
           MAX(CASE WHEN rn = ({WINSOR_LO_PCT} * n + 99) // 100
                    THEN cents END) AS lo,
           MAX(CASE WHEN rn = ({WINSOR_HI_PCT} * n + 99) // 100
                    THEN cents END) AS hi
    FROM ranked GROUP BY flag
)
SELECT e.flag, c.lo AS lo_cents, c.hi AS hi_cents,
       COUNT(*) AS n,
       CAST(SUM(LEAST(GREATEST(e.cents, c.lo), c.hi)) AS BIGINT)
           AS winsorized_sum_cents,
       ROUND(CAST(SUM(LEAST(GREATEST(e.cents, c.lo), c.hi)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 4) AS winsorized_mean_cents
FROM enc e JOIN clips c ON e.flag = c.flag
GROUP BY e.flag, c.lo, c.hi
""",
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clipped) price statistics per return flag —
    the robust-mean building block quality pipelines use so a handful
    of outlier documents can't move a threshold. Clip points are EXACT
    order statistics at integer-computed ranks (k = ⌈p·n⌉ via
    (p·n+99)//100 — no float percentile, no interpolation ambiguity
    between engines), found with one per-group window pass; the
    clipped sum is exact integers. Two scans of the encoded column,
    per-group windows only."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    enc = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_row_number,
    )

    # scale-safe per-group rank (two-phase range partitioning within
    # each flag): a plain per-group window would sort one flag's
    # billions of rows in a single task at 100 TB
    ranked = grouped_row_number(
        enc, ["flag"], [F.col("cents").asc()], out_col="rn",
        count_col="n",
    )
    k_lo = F.floor((F.lit(WINSOR_LO_PCT) * F.col("n") + 99) / 100)
    k_hi = F.floor((F.lit(WINSOR_HI_PCT) * F.col("n") + 99) / 100)
    clips = ranked.groupBy("flag").agg(
        F.max(F.when(F.col("rn") == k_lo, F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rn") == k_hi, F.col("cents"))).alias("hi"),
    )
    clipped = enc.join(clips, "flag").select(
        "flag",
        "lo",
        "hi",
        F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi")).alias(
            "wc"
        ),
    )
    return clipped.groupBy("flag", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wc").cast("bigint").alias("winsorized_sum_cents"),
        F.round(
            F.sum("wc").cast("double") / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("winsorized_mean_cents"),
    ).select(
        "flag",
        F.col("lo").alias("lo_cents"),
        F.col("hi").alias("hi_cents"),
        "n",
        "winsorized_sum_cents",
        "winsorized_mean_cents",
    )


# ---------------------------------------------------------------------------
# Round 9: two-sample tests, rank correlations, dispersion, association
# ---------------------------------------------------------------------------

#: The two order-priority populations the KS test compares.
KS_GROUP_A = "1-URGENT"
KS_GROUP_B = "5-LOW"


@register(
    "ks_two_sample_price",
    oracle=f"""
WITH enc AS (
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           CASE WHEN o_orderpriority = '{KS_GROUP_A}' THEN 1 ELSE 0 END
               AS in_a
    FROM orders
    WHERE o_orderpriority IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
),
counts AS (
    SELECT cents, CAST(SUM(in_a) AS BIGINT) AS c1,
           CAST(SUM(1 - in_a) AS BIGINT) AS c2
    FROM enc GROUP BY cents
),
cum AS (
    SELECT cents,
           SUM(c1) OVER (ORDER BY cents ASC) AS cum1,
           SUM(c2) OVER (ORDER BY cents ASC) AS cum2
    FROM counts
),
tot AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
    FROM counts
),
d AS (
    SELECT cents,
           ABS(CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1)
               AS diff
    FROM cum CROSS JOIN tot
),
mx AS (SELECT MAX(diff) AS m FROM d)
SELECT t.n1 AS n_a, t.n2 AS n_b,
       ROUND(CAST(mx.m AS DOUBLE)
             / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)),
             {STAT_DECIMALS}) AS ks_stat,
       MIN(d.cents) AS at_cents
FROM d CROSS JOIN mx CROSS JOIN tot t
WHERE d.diff = mx.m
GROUP BY t.n1, t.n2, mx.m
""",
)
def ks_two_sample_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the order-value
    distributions of {KS_GROUP_A} and {KS_GROUP_B} orders — the
    distribution-shift test a data-quality gate runs between cohorts.
    ENTIRELY integer-exact: both empirical CDFs come from the two-pass
    ``global_cumsum`` (order value in cents is near-unique, so the
    per-value count table is ~O(rows) — a window spelling would
    single-partition it at scale), and the sup-distance is maximized
    over |cum1·n2 − cum2·n1| in decimal(38,0)/HUGEINT, with ONE double
    division at the very end. Also reports the value where the gap
    peaks (the place to look when the test fires)."""
    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    enc = orders.filter(
        F.col("o_orderpriority").isin(KS_GROUP_A, KS_GROUP_B)
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderpriority") == KS_GROUP_A, 1)
        .otherwise(0)
        .alias("in_a"),
    )
    counts = enc.groupBy("cents").agg(
        F.sum("in_a").cast("bigint").alias("c1"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("c2"),
    )
    cum1, n1 = global_cumsum_with_total(
        counts, [F.col("cents").asc()], "c1", out_col="cum1"
    )
    cum12, n2 = global_cumsum_with_total(
        cum1, [F.col("cents").asc()], "c2", out_col="cum2"
    )
    diff = F.abs(
        F.col("cum1").cast("decimal(38,0)") * F.lit(int(n2))
        - F.col("cum2").cast("decimal(38,0)") * F.lit(int(n1))
    )
    d = cum12.select("cents", diff.alias("diff"))
    mx = d.agg(F.max("diff").alias("m"))
    return (
        d.crossJoin(F.broadcast(mx))
        .filter(F.col("diff") == F.col("m"))
        .agg(
            F.lit(int(n1)).cast("bigint").alias("n_a"),
            F.lit(int(n2)).cast("bigint").alias("n_b"),
            F.round(
                F.max("m").cast("double")
                / F.lit(float(n1) * float(n2)),
                STAT_DECIMALS,
            ).alias("ks_stat"),
            F.min("cents").alias("at_cents"),
        )
    )


@register(
    "spearman_price_qty",
    oracle="""
WITH enc AS (
    SELECT CAST(l_quantity AS BIGINT) AS qty,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
),
qc AS (SELECT qty, COUNT(*) AS c FROM enc GROUP BY qty),
qr AS (
    SELECT qty,
           2 * SUM(c) OVER (ORDER BY qty ASC) - c + 1 AS rq2
    FROM qc
),
pc AS (SELECT cents, COUNT(*) AS c FROM enc GROUP BY cents),
pr AS (
    SELECT cents,
           2 * SUM(c) OVER (ORDER BY cents ASC) - c + 1 AS rp2
    FROM pc
),
ranked AS (
    SELECT CAST(qr.rq2 AS HUGEINT) AS x, CAST(pr.rp2 AS HUGEINT) AS y
    FROM enc JOIN qr ON qr.qty = enc.qty JOIN pr ON pr.cents = enc.cents
),
sums AS (
    SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
    FROM ranked
)
SELECT n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (SQRT(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * SQRT(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           AS spearman_rho
FROM sums
""",
)
def spearman_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price —
    the monotone-association twin of ``regr_price_on_qty`` (Pearson
    on raw values breaks under outliers and nonlinearity; ranks do
    not). Tie-corrected average ranks come from cumulative counting
    with NO per-row window: rank2(v) = 2·cum(v) − c(v) + 1 (doubled to
    stay integer). The quantity domain is bounded (~50 values — its
    cum runs on a 50-row table); the PRICE domain is near-unique, so
    its running count routes through the two-pass ``global_cumsum``.
    Rank maps join back by value (equi-joins), and Pearson over the
    doubled ranks uses decimal(38,0)/HUGEINT sums — rank products
    reach 4n² per row and overflow int64 at corpus scale."""
    from asritha_metamorphetl_spark.operators.ranks import (
        check_partition_bound,
    )
    from pyspark.sql import Window

    li = Catalog(sf_dir).load(spark, "lineitem")
    enc = li.select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias(
            "cents"
        ),
    )
    # ONE fact aggregate (round 13): the distinct (qty, cents) pair
    # frame with multiplicities carries everything — both rank maps AND
    # the Pearson sums over ranks (Σ f(row) = Σ cnt·f(pair) exactly,
    # integer weights). The old spelling scanned lineitem twice and
    # re-attached the near-unique price rank with a corpus-sized
    # equi-join (2 extra Exchanges); here the cents rank is computed
    # IN PLACE on the range-partitioned pair frame — per-partition
    # range-frame cumulative + O(partitions) driver offsets, the same
    # two-pass discipline as global_cumsum (equal cents never span
    # range partitions, so the per-value total is partition-local).
    pairs = enc.groupBy("qty", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    parts = check_partition_bound(
        spark.conf.get("spark.sql.shuffle.partitions", "200"),
        "spearman_price_qty",
    )
    ranged = (
        pairs.repartitionByRange(int(parts), F.col("cents").asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = {
        r["__pid"]: r["s"] or 0
        for r in ranged.groupBy("__pid")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    offsets, running = [], 0
    for pid in sorted(totals):
        offsets.append((pid, running))
        running += totals[pid]
    offset_df = spark.createDataFrame(
        offsets, "__pid int, __offset long"
    )
    # qty ranks off the SAME pinned frame (bounded domain ~50 values —
    # plain window above the collapsed aggregate, the gate-allowed
    # bounded-frame shape)
    qc = ranged.groupBy("qty").agg(F.sum("cnt").alias("c"))
    wq = Window.orderBy(F.col("qty").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qr = qc.select(
        "qty",
        (2 * F.sum("c").over(wq) - F.col("c") + 1).alias("rq2"),
    )
    # inclusive cumulative count at CENTS granularity: the range frame
    # (≤ current cents) includes all ties; the per-cents total is the
    # (__pid, cents) window — partition-local by the range invariant
    w_cum = (
        Window.partitionBy("__pid")
        .orderBy(F.col("cents").asc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_val = Window.partitionBy("__pid", "cents")
    scored = (
        ranged.join(F.broadcast(offset_df), "__pid")
        .join(F.broadcast(qr), "qty")
        .select(
            F.col("cnt").cast("decimal(38,0)").alias("w"),
            F.col("rq2").cast("decimal(38,0)").alias("x"),
            (
                2 * (F.col("__offset") + F.sum("cnt").over(w_cum))
                - F.sum("cnt").over(w_val)
                + 1
            )
            .cast("decimal(38,0)")
            .alias("y"),
        )
    )
    sums = scored.agg(
        F.sum("w").cast("bigint").alias("n"),
        F.sum(F.col("w") * F.col("x")).alias("sx"),
        F.sum(F.col("w") * F.col("y")).alias("sy"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("w") * F.col("y") * F.col("y")).alias("sy2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return sums.select(
        "n",
        F.round(
            (n * F.col("sxy").cast("double") - sx * sy)
            / (
                F.sqrt(n * F.col("sx2").cast("double") - sx * sx)
                * F.sqrt(n * F.col("sy2").cast("double") - sy * sy)
            ),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "kendall_tau_daily",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
    FROM orders GROUP BY 1
),
pairs AS (
    SELECT CASE WHEN b.n > a.n THEN 1 ELSE 0 END AS conc,
           CASE WHEN b.n < a.n THEN 1 ELSE 0 END AS disc
    FROM daily a JOIN daily b ON b.day > a.day
),
agg AS (
    SELECT COUNT(*) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(SUM(disc) AS BIGINT) AS discordant
    FROM pairs
)
SELECT (SELECT COUNT(*) FROM daily) AS n_days,
       n_pairs, concordant, discordant,
       n_pairs - concordant - discordant AS ties,
       ROUND((CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))
             / CAST(n_pairs AS DOUBLE), 6) AS tau_a
FROM agg
""",
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-a trend test on daily order volume: the share of
    concordant minus discordant day pairs — the nonparametric
    monotone-trend companion to ``theil_sen_daily_trend`` (same pair
    set, counting signs instead of fitting slopes). The O(days²) pair
    join runs over the AGGREGATED calendar-bounded daily series (the
    raw facts only feed the daily count), the same defense as the
    Theil–Sen and autocorrelation queries. All counts exact; one final
    division."""
    orders = Catalog(sf_dir).load(spark, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    a = daily.select(F.col("day").alias("day_a"), F.col("n").alias("n_a"))
    b = daily.select(F.col("day").alias("day_b"), F.col("n").alias("n_b"))
    pairs = a.join(b, F.col("day_b") > F.col("day_a")).select(
        F.when(F.col("n_b") > F.col("n_a"), 1).otherwise(0).alias("conc"),
        F.when(F.col("n_b") < F.col("n_a"), 1).otherwise(0).alias("disc"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("conc").cast("bigint").alias("concordant"),
        F.sum("disc").cast("bigint").alias("discordant"),
    )
    n_days = daily.count()
    return agg.select(
        F.lit(int(n_days)).cast("bigint").alias("n_days"),
        "n_pairs",
        "concordant",
        "discordant",
        (
            F.col("n_pairs") - F.col("concordant") - F.col("discordant")
        ).alias("ties"),
        F.round(
            (
                F.col("concordant").cast("double")
                - F.col("discordant").cast("double")
            )
            / F.col("n_pairs").cast("double"),
            6,
        ).alias("tau_a"),
    )


@register(
    "daily_count_dispersion",
    oracle="""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
    FROM orders GROUP BY 1
),
dowed AS (
    SELECT (day - DATE '1970-01-01') % 7 AS dow_idx, n FROM daily
)
SELECT dow_idx, COUNT(*) AS n_days,
       ROUND(CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS mean_orders,
       ROUND((CAST(COUNT(*) AS DOUBLE)
              * CAST(SUM(CAST(n AS HUGEINT) * n) AS DOUBLE)
              - CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)), 6)
           AS dispersion
FROM dowed GROUP BY dow_idx
""",
)
def daily_count_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio (index of dispersion) of daily order
    counts per weekday — a Poisson arrival process sits at 1.0;
    meaningfully above means bursty demand (overdispersion), the
    check run before anyone fits a Poisson capacity model. Portable
    epoch-day weekday; exact integer sufficient statistics (n² sums in
    decimal/HUGEINT); dispersion = (k·Σn² − (Σn)²)/(k·Σn) with one
    final division. Facts feed a daily count only — O(days) rows."""
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
    k = F.count(F.lit(1)).cast("double")
    s = F.sum("n").cast("double")
    ss = F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).cast(
        "double"
    )
    return dowed.groupBy("dow_idx").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(s / k, 6).alias("mean_orders"),
        F.round((k * ss - s * s) / (k * s), 6).alias("dispersion"),
    )


@register(
    "entropy_categorical_columns",
    oracle=f"""
WITH s AS (
    SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
    UNION ALL
    SELECT 'o_orderpriority', o_orderpriority FROM orders
),
counts AS (
    SELECT col_name, val, COUNT(*) AS c FROM s GROUP BY 1, 2
),
tot AS (
    SELECT col_name, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY 1
),
terms AS (
    SELECT counts.col_name,
           CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                      * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                      * 1000000) AS BIGINT) AS term_q,
           n
    FROM counts JOIN tot ON tot.col_name = counts.col_name
)
SELECT col_name, CAST(MAX(n) AS BIGINT) AS n_rows,
       COUNT(*) AS n_values,
       ROUND(-CAST(SUM(term_q) AS DOUBLE) / 1000000, {STAT_DECIMALS})
           AS entropy
FROM terms GROUP BY col_name
""",
)
def entropy_categorical_columns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shannon entropy (nats) of each categorical order column — the
    information-content profile a feature selector reads first (an
    entropy near zero is a constant column wearing a category's
    clothes). Each p·ln(p) term is computed from exact counts and
    quantized to a 1e-6 grid before the sum, so partition order cannot
    perturb the hash; value domains are bounded, counts map-side
    combine."""
    orders = Catalog(sf_dir).load(spark, "orders")
    stacked = orders.select(
        F.lit("o_orderstatus").alias("col_name"),
        F.col("o_orderstatus").alias("val"),
    ).unionByName(
        orders.select(
            F.lit("o_orderpriority").alias("col_name"),
            F.col("o_orderpriority").alias("val"),
        )
    )
    counts = stacked.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("col_name").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    terms = counts.join(F.broadcast(tot), "col_name").select(
        "col_name",
        "n",
        F.round(p * F.log(p) * 1000000).cast("bigint").alias("term_q"),
    )
    return terms.groupBy("col_name").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_values"),
        F.round(
            -F.sum("term_q").cast("double") / 1000000, STAT_DECIMALS
        ).alias("entropy"),
    )


def _cramers_oracle_for(
    pair: str, table: str, col_a: str, col_b: str
) -> str:
    return f"""
SELECT '{pair}' AS pair, n_rows, n_cells, chi2, cramers_v FROM (
WITH cells AS (
    SELECT {col_a} AS a, {col_b} AS b, COUNT(*) AS o
    FROM {table} GROUP BY 1, 2
),
rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY a),
ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY b),
tot AS (
    SELECT CAST(SUM(o) AS BIGINT) AS n,
           COUNT(DISTINCT a) AS nr, COUNT(DISTINCT b) AS nc
    FROM cells
),
terms AS (
    SELECT CAST(ROUND(
               ((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                 - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))
                * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))
               / (CAST(n AS DOUBLE) * CAST(ra AS DOUBLE)
                  * CAST(cb AS DOUBLE)) * 1000000) AS BIGINT) AS term_q,
           n, nr, nc
    FROM cells
    JOIN rt ON rt.a = cells.a JOIN ct ON ct.b = cells.b
    CROSS JOIN tot
)
SELECT MAX(n) AS n_rows, COUNT(*) AS n_cells,
       ROUND(CAST(SUM(term_q) AS DOUBLE) / 1000000, 6) AS chi2,
       ROUND(SQRT((CAST(SUM(term_q) AS DOUBLE) / 1000000)
                  / (CAST(MAX(n) AS DOUBLE)
                     * (LEAST(MAX(nr), MAX(nc)) - 1))), 6) AS cramers_v
FROM terms
)
"""


@register(
    "cramers_v_categorical_pairs",
    oracle=(
        _cramers_oracle_for(
            "status_priority", "orders", "o_orderstatus", "o_orderpriority"
        )
        + "\nUNION ALL\n"
        + _cramers_oracle_for(
            "returnflag_linestatus",
            "lineitem",
            "l_returnflag",
            "l_linestatus",
        )
    ),
)
def cramers_v_categorical_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cramér's V association strength for two categorical pairs
    (order status×priority; returnflag×linestatus) — the normalized
    chi-square [0, 1] a feature-redundancy screen compares across
    pairs of ANY cardinality, extending ``chi2_priority_segment_cells``
    from one table's cells to a cross-table scorecard. Each cell's
    chi-square term is computed from exact marginals as
    (o·n − r·c)²/(n·r·c), quantized to 1e-6, and summed as integers;
    contingency cells are bounded, so every aggregate is O(cells)."""

    def one(df: DataFrame, pair: str, a: str, b: str) -> DataFrame:
        # pin: the contingency cells feed FOUR subtrees (row marginals,
        # column marginals, totals, the term join) — unpinned, each
        # replays the fact-table scan + groupBy, so every pair scanned
        # its table 4x. The cells frame is bounded (|a|·|b| rows), so
        # one lazy localCheckpoint collapses the fact work to one pass
        # per pair (guide §1.2; the scd2/cdc multi-subtree discipline).
        cells = (
            df.groupBy(F.col(a).alias("a"), F.col(b).alias("b"))
            .agg(F.count(F.lit(1)).alias("o"))
            .localCheckpoint(eager=False)
        )
        rt = cells.groupBy("a").agg(F.sum("o").cast("bigint").alias("ra"))
        ct = cells.groupBy("b").agg(F.sum("o").cast("bigint").alias("cb"))
        tot = cells.agg(
            F.sum("o").cast("bigint").alias("n"),
            F.countDistinct("a").alias("nr"),
            F.countDistinct("b").alias("nc"),
        )
        od = F.col("o").cast("double")
        nd = F.col("n").cast("double")
        rd = F.col("ra").cast("double")
        cd = F.col("cb").cast("double")
        num = od * nd - rd * cd
        terms = (
            cells.join(F.broadcast(rt), "a")
            .join(F.broadcast(ct), "b")
            .crossJoin(F.broadcast(tot))
            .select(
                F.round(num * num / (nd * rd * cd) * 1000000)
                .cast("bigint")
                .alias("term_q"),
                "n",
                "nr",
                "nc",
            )
        )
        chi2 = F.sum("term_q").cast("double") / 1000000
        return terms.agg(
            F.lit(pair).alias("pair"),
            F.max("n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_cells"),
            F.round(chi2, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    chi2
                    / (
                        F.max("n").cast("double")
                        * (F.least(F.max("nr"), F.max("nc")) - 1)
                    )
                ),
                6,
            ).alias("cramers_v"),
        )

    cat = Catalog(sf_dir)
    orders = cat.load(spark, "orders")
    li = cat.load(spark, "lineitem")
    return one(
        orders, "status_priority", "o_orderstatus", "o_orderpriority"
    ).unionByName(
        one(li, "returnflag_linestatus", "l_returnflag", "l_linestatus")
    )
