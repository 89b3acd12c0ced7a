"""Round-13 contract-pinning queries (VERDICT r12 directive #7: few,
deep — each pins a cross-engine contract no existing query exercises;
the first two are the hostile-embedding fixture's designed-robust
counterparts, VERDICT r12 directive #6).

Contracts pinned here:

- ``embedding_degenerate_audit``: the degenerate-vector census —
  NaN / ±Inf / zero / subnormally-tiny / exact-duplicate detection
  over the raw (UNGATED) embeddings. The gated similarity families
  exclude these rows (operators/similarity.finite_vectors); this
  audit is the query that QUANTIFIES the excluded residue, so the
  exclusion is observable, not silent — and its math is NaN-safe by
  construction (no quantize-to-bigint on a possibly-NaN value).
- ``nan_total_order_audit``: IEEE-754 total-order semantics both
  engines promise but nothing exercised: NaN groups as ONE key,
  compares GREATER than +Inf, and sorts first under DESC — plus
  finite-extrema extraction through the isnan/isinf filters.
- ``pmod_negative_keys_audit``: ``%`` (truncated, sign of dividend)
  vs ``pmod`` (always non-negative) on DERIVED negative keys — the
  semantics every hash partitioner and bucket router depends on; a
  silent flooring-vs-truncation disagreement would re-route keys
  between engines.
- ``explode_outer_empty_audit``: ``explode_outer`` row preservation on
  empty and NULL arrays vs the oracle's padded-unnest spelling — the
  LEFT-JOIN-shaped lateral contract (plain ``explode``/``unnest``
  silently DROPS such rows, skewing any per-document rollup).
- ``interpolated_quartiles_audit``: exact linear-interpolation
  percentiles (Spark ``percentile`` vs DuckDB ``quantile_cont``) —
  the h = (n−1)·q index arithmetic and the a + frac·(b−a) blend,
  quantized at 1e-6 to absorb last-ulp blend differences.

No reference counterpart (the reference has no vector/statistics
surface — SURVEY.md §2 maps its operator inventory; these extend the
engine's first-class analytics per the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: Norm² threshold (double) below which a finite nonzero vector is
#: counted "tiny" by the degenerate audit — the float32-subnormal
#: territory where naive float32 kernels underflow (the bug class the
#: _NORM_FLOOR fix in operators/similarity.py removed).
TINY_NORM2 = 1e-12


@register(
    "embedding_degenerate_audit",
    oracle=f"""
WITH v AS (
    SELECT vec_id,
        list_aggregate(list_transform(embedding,
            x -> CASE WHEN isnan(CAST(x AS DOUBLE)) THEN 1 ELSE 0 END),
            'sum') > 0 AS has_nan,
        list_aggregate(list_transform(embedding,
            x -> CASE WHEN CAST(x AS DOUBLE) = 'Infinity'::DOUBLE
                 THEN 1 ELSE 0 END), 'sum') > 0 AS has_posinf,
        list_aggregate(list_transform(embedding,
            x -> CASE WHEN CAST(x AS DOUBLE) = '-Infinity'::DOUBLE
                 THEN 1 ELSE 0 END), 'sum') > 0 AS has_neginf,
        list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])
            AS norm2
    FROM embeddings
),
cls AS (
    SELECT vec_id, has_nan, has_posinf, has_neginf,
           (has_nan OR has_posinf OR has_neginf) AS nonfinite,
           NOT (has_nan OR has_posinf OR has_neginf) AND norm2 = 0
               AS is_zero,
           NOT (has_nan OR has_posinf OR has_neginf)
               AND norm2 > 0 AND norm2 < {TINY_NORM2} AS is_tiny,
           NOT (has_nan OR has_posinf OR has_neginf) AND norm2 > 0
               AS queryable
    FROM v
),
dups AS (
    SELECT COUNT(*) AS c FROM embeddings e JOIN cls USING (vec_id)
    WHERE cls.queryable
    GROUP BY e.embedding HAVING COUNT(*) > 1
)
SELECT COUNT(*) AS n_total,
       COUNT(*) FILTER (nonfinite) AS n_nonfinite,
       COUNT(*) FILTER (has_nan) AS n_nan,
       COUNT(*) FILTER (has_posinf) AS n_posinf,
       COUNT(*) FILTER (has_neginf) AS n_neginf,
       COUNT(*) FILTER (is_zero) AS n_zero,
       COUNT(*) FILTER (is_tiny) AS n_tiny,
       COUNT(*) FILTER (queryable) AS n_queryable,
       (SELECT COALESCE(CAST(COUNT(*) AS BIGINT), 0) FROM dups)
           AS n_dup_groups,
       (SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0) FROM dups)
           AS n_dup_members
FROM cls
""",
)
def embedding_degenerate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-vector census over the RAW embeddings (no gate): how
    many vectors carry NaN / +Inf / -Inf components, are exactly zero,
    are subnormally tiny (norm² < 1e-12 — where float32 kernels
    underflow), survive the FINITE-VECTOR gate, and how much exact
    duplication the queryable corpus carries (groups of byte-identical
    vectors — grouped only over FINITE vectors, since NaN equality
    inside arrays is the one grouping surface the engines do not
    promise to agree on). Every output is a count — no possibly-NaN
    value is ever quantized to an integer, which is exactly why this
    audit stays green on the hostile fixture while the pre-gate
    profile queries crashed (Spark ANSI CAST_OVERFLOW on NaN→BIGINT).
    On a clean catalog the census is all-zeros + n_total queryable
    rows. One scan, row-local O(dim) folds, one bounded aggregate;
    the dup check groups by the vector value itself — at 100 TB you'd
    group by a vector hash instead, same shuffle shape."""
    emb = Catalog(sf_dir).load(spark, "embeddings")
    x = F.col("embedding")
    as_d = F.transform(x, lambda c: c.cast("double"))
    has_nan = F.exists(as_d, lambda c: F.isnan(c))
    has_pos = F.exists(as_d, lambda c: c == F.lit(float("inf")))
    has_neg = F.exists(as_d, lambda c: c == F.lit(float("-inf")))
    norm2 = F.aggregate(
        as_d, F.lit(0.0), lambda acc, c: acc + c * c
    )
    cls = emb.select(
        "vec_id",
        "embedding",
        has_nan.alias("has_nan"),
        has_pos.alias("has_posinf"),
        has_neg.alias("has_neginf"),
        norm2.alias("norm2"),
    ).withColumn(
        "nonfinite",
        F.col("has_nan") | F.col("has_posinf") | F.col("has_neginf"),
    )
    cls = (
        cls.withColumn(
            "is_zero", ~F.col("nonfinite") & (F.col("norm2") == 0)
        )
        .withColumn(
            "is_tiny",
            ~F.col("nonfinite")
            & (F.col("norm2") > 0)
            & (F.col("norm2") < F.lit(TINY_NORM2)),
        )
        .withColumn("queryable", ~F.col("nonfinite") & (F.col("norm2") > 0))
        .localCheckpoint(eager=False)  # feeds census + dup rollup
    )
    dups = (
        cls.filter("queryable")
        .groupBy("embedding")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_dup_groups"),
            F.coalesce(F.sum("c"), F.lit(0)).alias("n_dup_members"),
        )
    )
    census = cls.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("nonfinite").cast("bigint")).alias("n_nonfinite"),
        F.sum(F.col("has_nan").cast("bigint")).alias("n_nan"),
        F.sum(F.col("has_posinf").cast("bigint")).alias("n_posinf"),
        F.sum(F.col("has_neginf").cast("bigint")).alias("n_neginf"),
        F.sum(F.col("is_zero").cast("bigint")).alias("n_zero"),
        F.sum(F.col("is_tiny").cast("bigint")).alias("n_tiny"),
        F.sum(F.col("queryable").cast("bigint")).alias("n_queryable"),
    )
    return census.crossJoin(dups)


@register(
    "nan_total_order_audit",
    oracle="""
WITH c AS (
    SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS c0 FROM embeddings
),
top5 AS (
    SELECT c0 FROM c ORDER BY c0 DESC, vec_id ASC LIMIT 5
)
SELECT COUNT(*) AS n_rows,
       COUNT(*) FILTER (isnan(c0)) AS n_nan,
       COUNT(*) FILTER (c0 > 'Infinity'::DOUBLE) AS n_gt_posinf,
       (SELECT CAST(COUNT(DISTINCT c0) AS BIGINT) FROM c
        WHERE isnan(c0)) AS n_nan_distinct,
       (SELECT COUNT(*) FILTER (isnan(c0)) FROM top5) AS n_top5_nan,
       CAST(ROUND(MAX(CASE WHEN isfinite(c0) THEN c0 END) * 1000000)
            AS BIGINT) AS max_finite_q6,
       CAST(ROUND(MIN(CASE WHEN isfinite(c0) THEN c0 END) * 1000000)
            AS BIGINT) AS min_finite_q6
FROM c
""",
)
def nan_total_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE-754 total-order contract on the first embedding component:
    both engines promise NaN == NaN under grouping (n_nan_distinct is
    1 when NaN rows exist, never the row count), NaN > +Inf under
    comparison (n_gt_posinf must EQUAL n_nan), and NaN-first under
    DESC ordering (all of a hostile corpus's top-5 are NaN rows) —
    the semantics every max_by/top-k over possibly-poisoned floats
    silently leans on. Finite extrema quantize AFTER the isfinite
    filter, so the bigint cast can never see a non-finite value. On a
    clean catalog the NaN counts are zero and the extrema pin the
    ordinary path. One scan + one bounded sort of 5 rows."""
    emb = Catalog(sf_dir).load(spark, "embeddings")
    c = emb.select(
        "vec_id", F.element_at("embedding", 1).cast("double").alias("c0")
    ).localCheckpoint(eager=False)  # feeds census + top5
    posinf = F.lit(float("inf"))
    finite = ~F.isnan(F.col("c0")) & (F.abs(F.col("c0")) != posinf)
    top5 = c.orderBy(F.col("c0").desc(), F.col("vec_id").asc()).limit(5)
    top5_nan = top5.agg(
        F.sum(F.isnan(F.col("c0")).cast("bigint")).alias("n_top5_nan")
    )
    nan_distinct = (
        c.filter(F.isnan(F.col("c0")))
        .agg(F.countDistinct("c0").cast("bigint").alias("n_nan_distinct"))
    )
    census = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.isnan(F.col("c0")).cast("bigint")).alias("n_nan"),
        F.sum((F.col("c0") > posinf).cast("bigint")).alias("n_gt_posinf"),
        F.round(F.max(F.when(finite, F.col("c0"))) * 1000000)
        .cast("bigint")
        .alias("max_finite_q6"),
        F.round(F.min(F.when(finite, F.col("c0"))) * 1000000)
        .cast("bigint")
        .alias("min_finite_q6"),
    )
    return census.crossJoin(nan_distinct).crossJoin(top5_nan).select(
        "n_rows",
        "n_nan",
        "n_gt_posinf",
        "n_nan_distinct",
        "n_top5_nan",
        "max_finite_q6",
        "min_finite_q6",
    )


@register(
    "pmod_negative_keys_audit",
    oracle="""
WITH keyed AS (
    SELECT CAST(50 - o_orderkey % 100 AS BIGINT) AS k,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
)
SELECT k % 7 AS trunc_mod,
       ((k % 7) + 7) % 7 AS pmod7,
       COUNT(*) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM keyed
GROUP BY 1, 2
""",
)
def pmod_negative_keys_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modulo semantics on NEGATIVE keys — the contract every hash
    partitioner, bucket router, and salting scheme leans on: both
    engines' ``%`` truncates toward zero (result takes the DIVIDEND's
    sign, so -3 % 7 = -3, never 4), and Spark's ``pmod`` equals the
    oracle's ((k%7)+7)%7 non-negative spelling. Keys are derived
    (50 - key%100 spans -49..50) so both signs and zero are exercised;
    a flooring-vs-truncation disagreement would re-route every
    negative key's bucket between engines and show as moved group
    masses. One scan, one bounded rollup (≤13 trunc_mod groups)."""
    orders = Catalog(sf_dir).load(spark, "orders")
    keyed = orders.select(
        (F.lit(50) - F.col("o_orderkey") % 100).cast("bigint").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return (
        keyed.groupBy(
            (F.col("k") % 7).alias("trunc_mod"),
            F.pmod(F.col("k"), F.lit(7)).alias("pmod7"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
        )
    )


@register(
    "explode_outer_empty_audit",
    oracle="""
WITH toks AS (
    SELECT source, regexp_extract_all(text, '[0-9]+') AS l
    FROM documents
),
padded AS (
    SELECT source,
           CASE WHEN l IS NULL OR len(l) = 0
                THEN [NULL] ELSE l END AS l2
    FROM toks
),
ex AS (SELECT source, unnest(l2) AS tok FROM padded)
SELECT source,
       COUNT(*) AS n_rows_out,
       COUNT(*) FILTER (tok IS NULL) AS n_empty_docs,
       COUNT(tok) AS n_tokens
FROM ex GROUP BY source
""",
)
def explode_outer_empty_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer`` row preservation: documents whose token array
    is EMPTY or NULL (no digit runs in the text — or no text at all on
    a hostile catalog) must still emit exactly one row with a NULL
    token, mirrored by the oracle's padded-unnest spelling (plain
    unnest/explode silently drops them — per-source rollups then
    under-count their documents, invisibly on corpora where every doc
    tokenizes). Digit runs are the extraction target precisely so the
    empty case is COMMON on clean data, not a hostile-only path. The
    extract runs row-local in the scan stage; one bounded per-source
    rollup."""
    docs = Catalog(sf_dir).load(spark, "documents")
    toks = docs.select(
        "source",
        F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0).alias("l"),
    )
    ex = toks.select(
        "source", F.explode_outer("l").alias("tok")
    )
    return ex.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows_out"),
        F.sum(F.col("tok").isNull().cast("bigint")).alias("n_empty_docs"),
        F.count("tok").alias("n_tokens"),
    )


@register(
    "interpolated_quartiles_audit",
    oracle="""
WITH cents AS (
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(c, 0.25), 6) AS q25,
       ROUND(quantile_cont(c, 0.50), 6) AS q50,
       ROUND(quantile_cont(c, 0.75), 6) AS q75,
       ROUND(quantile_cont(c, 0.75) - quantile_cont(c, 0.25), 6) AS iqr
FROM cents
""",
)
def interpolated_quartiles_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles: Spark's ``percentile``
    and DuckDB's ``quantile_cont`` both promise the h = (n−1)·q index
    with an a + (h−⌊h⌋)·(b−a) blend — the OTHER percentile definition
    from the engine's cumulative-count lower-median family (which
    returns members of the data; this one interpolates BETWEEN
    members, so the float blend itself is under test). Inputs are
    exact integer cents; outputs round at 1e-6 to absorb last-ulp
    blend differences. Spark evaluates ``percentile`` as a single
    aggregate (no global sort in the plan); at 100 TB the
    cumulative-count spelling stays the scale path — this query pins
    the ENGINE primitive's arithmetic against an independent
    implementation."""
    orders = Catalog(sf_dir).load(spark, "orders")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    q = cents.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(F.col("c"), F.lit(0.25)).alias("p25"),
        F.percentile(F.col("c"), F.lit(0.50)).alias("p50"),
        F.percentile(F.col("c"), F.lit(0.75)).alias("p75"),
    )
    return q.select(
        "n",
        F.round(F.col("p25"), 6).alias("q25"),
        F.round(F.col("p50"), 6).alias("q50"),
        F.round(F.col("p75"), 6).alias("q75"),
        F.round(F.col("p75") - F.col("p25"), 6).alias("iqr"),
    )
