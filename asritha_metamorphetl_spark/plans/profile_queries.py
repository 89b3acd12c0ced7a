"""Profiling and partitioning queries: equi-depth histograms, CUBE
rollups, leave-one-out influence, per-dimension embedding profiles,
behavioral transition matrices, and stratified k-fold assignment.

Same float discipline as ``stats_queries``: exact integer sums (floats
quantized to a fixed grid BEFORE aggregation where needed), final
bounded float expressions mirrored verbatim in the oracles.
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

# ---------------------------------------------------------------------------
# Equi-depth histogram per source (exact order-statistic boundaries)
# ---------------------------------------------------------------------------

EDH_BUCKETS = 10


@register(
    "equidepth_chars_histogram",
    oracle=f"""
WITH ranked AS (
    SELECT source, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars ASC, doc_id ASC
           ) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM documents
),
bucketed AS (
    SELECT source, n_chars,
           ((rn - 1) * {EDH_BUCKETS}) // n AS bucket
    FROM ranked
)
SELECT source, bucket, COUNT(*) AS n_docs,
       MIN(n_chars) AS lo_chars, MAX(n_chars) AS hi_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM bucketed GROUP BY source, bucket
""",
)
def equidepth_chars_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of document length per source: each bucket
    holds (as near as integer division allows) the same number of docs,
    with exact value boundaries — the histogram an optimizer or
    sampler wants when the distribution is skewed (equi-WIDTH buckets
    collapse onto the head; ``doc_length_histogram`` shows that
    spelling). Bucket id is the pure-integer ⌊(rank−1)·B/n⌋ — no float
    percentile, no interpolation — so both engines agree bucket-for-
    bucket. One scan, per-source windows only."""
    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_row_number,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    # scale-safe per-source rank: tiny scan-backed inputs take the
    # plain-window fast path automatically; big ones range-partition
    # WITHIN each source (two-phase + broadcast offsets)
    ranked = grouped_row_number(
        docs.select("source", "n_chars", "doc_id"),
        ["source"],
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        out_col="rn",
        count_col="n",
    )
    bucketed = ranked.select(
        "source",
        "n_chars",
        F.floor(((F.col("rn") - 1) * EDH_BUCKETS) / F.col("n")).alias(
            "bucket"
        ),
    )
    return bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("lo_chars"),
        F.max("n_chars").alias("hi_chars"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# CUBE rollup (all four granularities in one Expand pass)
# ---------------------------------------------------------------------------


@register(
    "cube_returnflag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (returnflag, linestatus): all four granularities
    — cell, each single-column rollup, grand total — from ONE scan and
    ONE shuffle through Spark's Expand operator (each input row fans to
    4 grouping-set rows map-side, partial aggregation keeps the shuffle
    O(cells)). ``grouping()`` disambiguates a real NULL from a rolled-up
    level, encoded as the standard grouping-id bitmask. Complements
    ``revenue_grouping_sets`` (explicit set list) with the full-lattice
    spelling."""
    li = Catalog(sf_dir).load(spark, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    enc = li.select("l_returnflag", "l_linestatus", cents.alias("cents"))
    return enc.cube("l_returnflag", "l_linestatus").agg(
        (
            F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
        ).alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    ).select(
        "l_returnflag", "l_linestatus", "gid", "n", "revenue_cents"
    )


# ---------------------------------------------------------------------------
# Leave-one-source-out influence
# ---------------------------------------------------------------------------


@register(
    "loo_source_influence",
    oracle="""
WITH per_source AS (
    SELECT source, COUNT(*) AS n_src,
           CAST(SUM(n_chars) AS BIGINT) AS s_src
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_src) AS BIGINT) AS n_all,
           CAST(SUM(s_src) AS BIGINT) AS s_all
    FROM per_source
)
SELECT source, n_src,
       ROUND(CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
           AS mean_all,
       ROUND(CAST(s_all - s_src AS DOUBLE)
             / CAST(n_all - n_src AS DOUBLE), 6) AS mean_without,
       ROUND(CAST(s_all - s_src AS DOUBLE)
             / CAST(n_all - n_src AS DOUBLE)
             - CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
           AS influence
FROM per_source CROSS JOIN tot
""",
)
def loo_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out influence on the corpus mean document
    length: for each source, what the global mean becomes WITHOUT it —
    the cheapest data-valuation signal (a source whose removal moves a
    corpus statistic sharply is either load-bearing or contaminating).
    The trick: every leave-one-out mean is algebra over the per-group
    sufficient statistics ((S−s)/(N−n)) — ONE scan and an O(sources)
    rollup answers all |sources| counterfactuals; no per-source
    recomputation, which at 100 TB is the difference between one pass
    and |sources| passes."""
    docs = Catalog(sf_dir).load(spark, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum("n_chars").cast("bigint").alias("s_src"),
    )
    tot = per.agg(
        F.sum("n_src").cast("bigint").alias("n_all"),
        F.sum("s_src").cast("bigint").alias("s_all"),
    )
    j = per.crossJoin(tot)
    mean_all = F.col("s_all").cast("double") / F.col("n_all").cast("double")
    mean_wo = (F.col("s_all") - F.col("s_src")).cast("double") / (
        F.col("n_all") - F.col("n_src")
    ).cast("double")
    return j.select(
        "source",
        "n_src",
        F.round(mean_all, 6).alias("mean_all"),
        F.round(mean_wo, 6).alias("mean_without"),
        F.round(mean_wo - mean_all, 6).alias("influence"),
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding profile (quantized exact sums)
# ---------------------------------------------------------------------------

#: Quantization grid for embedding values (1e-6): sums become exact
#: bigints, immune to partition-order float drift.
EMB_Q = 1000000


@register(
    "embedding_dim_profile",
    oracle=f"""
WITH vals AS (
    SELECT u.i AS dim,
           CAST(ROUND(CAST(embedding[u.i] AS DOUBLE) * {EMB_Q}) AS BIGINT)
               AS q
    FROM embeddings
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) u
    WHERE {finite_vec_where("embedding")}
)
SELECT dim, COUNT(*) AS n,
       MIN(q) AS min_q, MAX(q) AS max_q,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       ROUND(CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / {EMB_Q}, 6) AS mean_val
FROM vals GROUP BY dim
""",
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding matrix (n, min, max,
    mean) — the drift/collapse monitor for an embedding pipeline (a
    dead dimension or a scale shift between model versions shows up
    here first). Values are quantized to a 1e-6 grid BEFORE summation,
    so every aggregate is an exact integer regardless of partition
    order — the same discipline the covariance operator uses. One
    posexplode scan, O(dims) output; at 100 TB this shape map-side
    combines to dims×partials. FINITE-VECTOR-gated: ROUND(NaN/Inf)
    cast to BIGINT is an ANSI crash, and a drift monitor averaged over
    Inf is noise (oracle mirrors the gate)."""
    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    vals = emb.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * EMB_Q).cast("bigint").alias("q"),
    )
    return vals.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("q").alias("min_q"),
        F.max("q").alias("max_q"),
        F.sum("q").cast("bigint").alias("sum_q"),
        F.round(
            F.sum("q").cast("double")
            / F.count(F.lit(1)).cast("double")
            / EMB_Q,
            6,
        ).alias("mean_val"),
    )


# ---------------------------------------------------------------------------
# Behavioral transition matrix (lead window per user)
# ---------------------------------------------------------------------------


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
    SELECT event_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS next_type
    FROM events
),
pairs AS (
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE), 6)
           AS p_next
FROM pairs
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    P(next event type | current), from a per-user LEAD window
    (deterministic (ts, event_id) ordering) and one O(types²) rollup.
    The behavioral fingerprint recommendation/abuse systems monitor;
    ``user_journeys`` shows the path-string spelling, this is the
    probabilistic one. Windows are per-user only — the shuffle is the
    user-hash partition the session operators already use, never a
    global sort."""
    ev = Catalog(sf_dir).load(spark, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"),
            6,
        ).alias("p_next"),
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment (hash-ordered, label-balanced)
# ---------------------------------------------------------------------------

KFOLD_K = 5


def _kfold_oracle() -> str:
    from asritha_metamorphetl_spark.plans.text_queries import _hex48_sql

    hv = _hex48_sql("md5('fold:' || CAST(vec_id AS VARCHAR))")
    return f"""
WITH hashed AS (
    SELECT label, vec_id, {hv} AS hv FROM embeddings
),
folded AS (
    SELECT label,
           (ROW_NUMBER() OVER (
                PARTITION BY label ORDER BY hv ASC, vec_id ASC
            ) - 1) % {KFOLD_K} AS fold
    FROM hashed
)
SELECT label, fold, COUNT(*) AS n
FROM folded GROUP BY label, fold
"""


@register("stratified_kfold_assignment", oracle=_kfold_oracle())
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold assignment over the labeled embedding set:
    within each label, rows are ordered by a salted content hash
    (deterministic, uncorrelated with ingestion order) and dealt
    round-robin into {KFOLD_K} folds — per-label fold sizes differ by
    at most 1, the exact-balance guarantee round-robin gives and
    random assignment doesn't. The audit emits per-(label, fold)
    counts; cross-validation tooling consumes the same assignment
    expression. Per-label windows only; the hash replays in SQL via
    the shared md5-based 48-bit construction."""
    from asritha_metamorphetl_spark.functions.hashing import _hex48

    emb = Catalog(sf_dir).load(spark, "embeddings")
    # staged digest -> 48-bit value (one md5 per row; inlining _hex48
    # around md5 would re-run the digest per nibble)
    digests = emb.select(
        "label",
        "vec_id",
        F.md5(
            F.concat(F.lit("fold:"), F.col("vec_id").cast("string"))
        ).alias("_dg"),
    )
    hashed = digests.select(
        "label", "vec_id", _hex48(F.col("_dg")).alias("hv")
    )
    w = Window.partitionBy("label").orderBy(
        F.col("hv").asc(), F.col("vec_id").asc()
    )
    folded = hashed.select(
        "label",
        ((F.row_number().over(w) - 1) % KFOLD_K).alias("fold"),
    )
    return folded.groupBy("label", "fold").agg(
        F.count(F.lit(1)).alias("n")
    )
