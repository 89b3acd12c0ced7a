"""Corpus-curation queries: Gopher/C4-style repetition + quality signals,
source mixing weights, and a bucketized range join over the event log.

These extend the training-data surface (README extensions) with the
document-level filters a pretraining pipeline runs before tokenization:
repetition profiling (Rae et al. 2021 "Gopher" §A1.1 repetition
signals), hard quality gates (token count / mean word length / stopword
density), and temperature-scaled source mixing (the ``share**alpha``
re-weighting used for multilingual/multi-source sampling). Every query
pairs with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions import text as T
from asritha_metamorphetl_spark.operators.ranges import bucketed_range_join
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

_STOPLIST_SQL = "(" + ",".join(f"'{w}'" for w in T.EN_STOPWORDS) + ")"


# ---------------------------------------------------------------------------
# Repetition profile: per-document duplicate-token / duplicate-bigram rates.
# Scale shape: explode → two-level hash agg keyed by doc (map-side partials
# bound the shuffle by distinct (doc, gram), not token count). No per-row
# O(n·distinct) HOF scans, so a pathological 100M-token document costs its
# own partitions, not a single task's memory.
# ---------------------------------------------------------------------------


@register(
    "doc_repetition_profile",
    oracle="""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
uni AS (SELECT doc_id, unnest(t) AS g FROM toks),
uc AS (SELECT doc_id, g, COUNT(*) AS c FROM uni GROUP BY 1, 2),
ud AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct, MAX(c) AS top_c
    FROM uc GROUP BY 1
),
bg AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 2
                THEN list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1])
                ELSE [] END AS b
    FROM toks
),
bgu AS (SELECT doc_id, unnest(b) AS g FROM bg),
bgd AS (
    SELECT doc_id, COUNT(*) AS n_bigrams, COUNT(DISTINCT g) AS nd_bigrams
    FROM bgu GROUP BY 1
)
SELECT ud.doc_id,
       ud.n_tokens,
       ROUND(CAST(ud.n_distinct AS DOUBLE) / ud.n_tokens, 4)
           AS distinct_token_ratio,
       ROUND(CAST(ud.top_c AS DOUBLE) / ud.n_tokens, 4) AS top_token_frac,
       COALESCE(
           ROUND(1.0 - CAST(bgd.nd_bigrams AS DOUBLE) / bgd.n_bigrams, 4),
           0.0) AS dup_bigram_frac
FROM ud LEFT JOIN bgd ON ud.doc_id = bgd.doc_id
""",
)
def doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token
    ratio, most-frequent-token share, duplicate-bigram fraction."""
    docs = Catalog(sf_dir).load(spark, "documents")
    toks = docs.select("doc_id", T.tokens(F.col("text")).alias("t"))
    # Group on xxhash64 of the gram, not the gram string: the two
    # explode→shuffle stages move 8-byte longs instead of strings
    # (measured ~35% faster end to end at sf0.1), and the hash runs in
    # whole-stage codegen over the flat exploded column. The oracle
    # groups raw strings — counts identical modulo 64-bit collisions.
    uni = toks.select("doc_id", F.explode("t").alias("g_str")).select(
        "doc_id", F.xxhash64("g_str").alias("g")
    )
    per_gram = uni.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    # Branch-free index array (slice of an always-ascending sequence):
    # a when()-guarded generator child would drop the explode below off
    # whole-stage codegen — the interpreted fallback measured ~20×
    # slower at sf0.1 (7s → 0.35s for this branch alone).
    stop = F.size("t") - 1
    idx = F.slice(
        F.sequence(F.lit(1), F.greatest(stop, F.lit(1))),
        1,
        F.greatest(stop, F.lit(0)),
    )
    bigrams = toks.select(
        "doc_id",
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.element_at("t", i), F.element_at("t", i + 1)
            ),
        ).alias("b"),
    )
    bg = bigrams.select("doc_id", F.explode("b").alias("g_str")).select(
        "doc_id", F.xxhash64("g_str").alias("g")
    )
    per_bg = bg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("g").alias("nd_bigrams"),
    )
    return (
        per_doc.join(per_bg, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 4)
            .alias("distinct_token_ratio"),
            F.round(F.col("top_c").cast("double") / F.col("n_tokens"), 4)
            .alias("top_token_frac"),
            F.coalesce(
                F.round(
                    F.lit(1.0)
                    - F.col("nd_bigrams").cast("double") / F.col("n_bigrams"),
                    4,
                ),
                F.lit(0.0),
            ).alias("dup_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style hard quality gates, summarized per source. All flags are
# row-local Column expressions — the whole query is one scan stage plus a
# single hash agg on source.
# ---------------------------------------------------------------------------

#: Gate thresholds (Gopher §A1.1, adapted to whitespace tokens).
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_AVG_LEN = 3.0
GOPHER_MAX_AVG_LEN = 10.0
GOPHER_MIN_STOPWORD_RATIO = 0.02


@register(
    "gopher_quality_flags",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source,
           list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
sig AS (
    SELECT source,
        len(t) AS n_tokens,
        CASE WHEN len(t) > 0
             THEN CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                  / len(t)
             ELSE 0.0 END AS avg_len,
        CASE WHEN len(t) > 0
             THEN CAST(len(list_filter(t, x -> x IN {_STOPLIST_SQL}))
                       AS DOUBLE) / len(t)
             ELSE 0.0 END AS stop_ratio
    FROM toks
),
flags AS (
    SELECT source,
        CASE WHEN n_tokens < {GOPHER_MIN_TOKENS}
               OR n_tokens > {GOPHER_MAX_TOKENS} THEN 1 ELSE 0 END AS f_len,
        CASE WHEN avg_len < {GOPHER_MIN_AVG_LEN}
               OR avg_len > {GOPHER_MAX_AVG_LEN} THEN 1 ELSE 0 END AS f_avg,
        CASE WHEN stop_ratio < {GOPHER_MIN_STOPWORD_RATIO}
             THEN 1 ELSE 0 END AS f_stop
    FROM sig
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(f_len) AS BIGINT) AS n_len_fail,
       CAST(SUM(f_avg) AS BIGINT) AS n_avg_len_fail,
       CAST(SUM(f_stop) AS BIGINT) AS n_stopword_fail,
       CAST(SUM(CASE WHEN f_len = 0 AND f_avg = 0 AND f_stop = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM flags
GROUP BY source
""",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source counts of documents failing each Gopher hard gate
    (token count, mean token length, stopword density) and passing all."""
    docs = Catalog(sf_dir).load(spark, "documents")
    text = F.col("text")
    n_tok = T.token_count(text)
    avg_len = T.avg_token_length(text)
    stop = T.stopword_ratio(text)
    f_len = (
        (n_tok < GOPHER_MIN_TOKENS) | (n_tok > GOPHER_MAX_TOKENS)
    ).cast("int")
    f_avg = (
        (avg_len < GOPHER_MIN_AVG_LEN) | (avg_len > GOPHER_MAX_AVG_LEN)
    ).cast("int")
    f_stop = (stop < GOPHER_MIN_STOPWORD_RATIO).cast("int")
    flagged = docs.select(
        "source",
        f_len.alias("f_len"),
        f_avg.alias("f_avg"),
        f_stop.alias("f_stop"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_len").alias("n_len_fail"),
        F.sum("f_avg").alias("n_avg_len_fail"),
        F.sum("f_stop").alias("n_stopword_fail"),
        F.sum(
            (
                (F.col("f_len") == 0)
                & (F.col("f_avg") == 0)
                & (F.col("f_stop") == 0)
            ).cast("int")
        ).alias("n_pass"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing weights. The per-source aggregate is one
# shuffle; the normalization joins against a broadcast single-row totals
# frame instead of an unpartitioned window, so the plan holds for any
# source cardinality.
# ---------------------------------------------------------------------------

#: Mixing temperature (share ** alpha, renormalized) — the multilingual
#: sampling exponent from XLM-R / mT5 data recipes.
MIX_ALPHA = 0.7


@register(
    "source_mix_weights",
    oracle=f"""
WITH per_src AS (
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(list_filter(string_split(text, ' '),
                                    x -> x != ''))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
           SUM(POWER(CAST(n_tokens AS DOUBLE), {MIX_ALPHA})) AS tot_pow
    FROM per_src
)
SELECT p.source, p.n_docs, p.n_tokens,
       ROUND(CAST(p.n_tokens AS DOUBLE) / t.tot_tokens, 6) AS token_share,
       ROUND(POWER(CAST(p.n_tokens AS DOUBLE), {MIX_ALPHA}) / t.tot_pow, 6)
           AS mix_weight
FROM per_src p CROSS JOIN tot t
""",
)
def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares and temperature-scaled sampling weights.

    ``mix_weight ∝ n_tokens ** alpha`` — the sampling-temperature
    re-weighting that upweights small sources. Note the normalizer is
    computed on raw token counts (not shares): ``(n/tot)^a / Σ(m/tot)^a
    == n^a / Σ m^a`` exactly in the reals, and using the integer counts
    keeps the two engines' float paths identical.
    """
    docs = Catalog(sf_dir).load(spark, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), MIX_ALPHA)).alias(
            "tot_pow"
        ),
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("tot_tokens"), 6
        ).alias("token_share"),
        F.round(
            F.pow(F.col("n_tokens").cast("double"), MIX_ALPHA)
            / F.col("tot_pow"),
            6,
        ).alias("mix_weight"),
    )


# ---------------------------------------------------------------------------
# Bucketized range join: views in the hour before each purchase. The naive
# spelling is a theta-join (BroadcastNestedLoopJoin); bucketed_range_join
# turns it into an equi-join on (user, hour-bucket) — see operators/ranges.
# ---------------------------------------------------------------------------

_WINDOW_SECS = 3600


@register(
    "views_before_purchase",
    oracle=f"""
WITH p AS (
    SELECT event_id, user_id,
           CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS ts_sec
    FROM events WHERE event_type = 'purchase'
),
v AS (
    SELECT event_id, user_id,
           CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS ts_sec
    FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, COUNT(v.event_id) AS n_prior_views
FROM p LEFT JOIN v
    ON v.user_id = p.user_id
   AND v.ts_sec >= p.ts_sec - {_WINDOW_SECS}
   AND v.ts_sec < p.ts_sec
GROUP BY p.event_id, p.user_id
""",
)
def views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, how many views the same user made in the
    preceding hour (half-open window). Timestamps compare as epoch
    seconds for cross-engine exactness (same convention as
    view_purchase_asof)."""
    ev = Catalog(sf_dir).load(spark, "events")
    sec = F.unix_timestamp("ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        sec.alias("p_sec"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", sec.alias("v_sec")
    )
    intervals = purchases.select(
        "purchase_id",
        "user_id",
        (F.col("p_sec") - F.lit(_WINDOW_SECS)).alias("w_start"),
        F.col("p_sec").alias("w_end"),
    )
    matched = bucketed_range_join(
        views,
        intervals,
        on=["user_id"],
        point_col="v_sec",
        start_col="w_start",
        end_col="w_end",
        bucket_width=_WINDOW_SECS,
    )
    counts = matched.groupBy("purchase_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_prior_views")
    )
    return (
        purchases.join(counts, on=["purchase_id", "user_id"], how="left")
        .select(
            F.col("purchase_id").alias("event_id"),
            "user_id",
            F.coalesce(F.col("n_prior_views"), F.lit(0)).alias(
                "n_prior_views"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Curriculum deciles: corpus-wide quality binning without a global window.
# The decile is a function of the VALUE (SQL percent_rank tie semantics),
# so operators/ranks.global_percent_rank ranks only the distinct-score
# frame and maps back with a broadcastable join — the corpus never
# single-partitions (the naive NTILE/percent_rank window would).
# ---------------------------------------------------------------------------


@register(
    "quality_deciles",
    oracle=f"""
WITH sig AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                AS BIGINT) AS n_tokens,
           ROUND(CASE WHEN len(list_filter(string_split(text, ' '),
                                           x -> x != '')) > 0
                 THEN CAST(len(list_filter(
                          list_filter(string_split(text, ' '), x -> x != ''),
                          x -> x IN {_STOPLIST_SQL})) AS DOUBLE)
                      / len(list_filter(string_split(text, ' '), x -> x != ''))
                 ELSE 0.0 END, 6) AS score
    FROM documents
),
ranked AS (
    SELECT *, PERCENT_RANK() OVER (ORDER BY score) AS pr FROM sig
)
SELECT LEAST(CAST(FLOOR(pr * 10) AS BIGINT), 9) AS decile,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(score) AS min_score,
       MAX(score) AS max_score
FROM ranked
GROUP BY 1
""",
)
def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bins over a stopword-density quality score (curriculum /
    quality-stratified sampling input). percent_rank runs via the
    distinct-value machinery of operators/ranks.py — the wide frame
    never shuffles into one partition, so the binning holds at any
    corpus size."""
    from asritha_metamorphetl_spark.operators.ranks import global_percent_rank

    docs = Catalog(sf_dir).load(spark, "documents")
    text = F.col("text")
    scored = docs.select(
        "doc_id",
        T.token_count(text).cast("bigint").alias("n_tokens"),
        F.round(T.stopword_ratio(text), 6).alias("score"),
    )
    ranked = global_percent_rank(
        scored, F.col("score"), descending=False, out_col="pr"
    )
    return (
        ranked.withColumn(
            "decile",
            F.least(F.floor(F.col("pr") * 10), F.lit(9)).cast("bigint"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source quota sampling (domain balancing): cap each source's doc
# count with a deterministic hash order, so re-runs keep the same docs.
# ---------------------------------------------------------------------------

SOURCE_CAP = 120


@register(
    "source_quota_sample",
    oracle=f"""
WITH ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
)
SELECT source,
       COUNT(*) AS n_kept,
       CAST(MIN(doc_id) AS BIGINT) AS min_kept_doc,
       md5(string_agg(CAST(doc_id AS VARCHAR), ','
                      ORDER BY rk)) AS kept_sig
FROM ranked
WHERE rk <= {SOURCE_CAP}
GROUP BY source
""",
)
def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-balancing cap: keep at most SOURCE_CAP docs per source in
    md5(doc_id) order — deterministic across runs and engines, no RNG
    state; the signature column pins the exact kept set, not just its
    size.

    A single window partitioned by source would give each source ONE
    task — a billion-doc source funnels into it; top_k_per_group
    (operators/ranks.py) pre-prunes per physical partition before the
    global rank."""
    from asritha_metamorphetl_spark.operators.ranks import top_k_per_group

    docs = Catalog(sf_dir).load(spark, "documents")
    hk = F.md5(F.col("doc_id").cast("string"))
    kept = top_k_per_group(
        docs.select("doc_id", "source", hk.alias("hk")),
        ["source"],
        [F.col("hk"), F.col("doc_id")],
        k=SOURCE_CAP,
        out_col="rk",
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").cast("bigint").alias("min_kept_doc"),
        F.md5(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(F.struct("rk", "doc_id"))
                ).getField("doc_id").cast("array<string>"),
            )
        ).alias("kept_sig"),
    )


# ---------------------------------------------------------------------------
# Token-budget source mixing: cap each source's contribution by TOKENS
# (how training mixes are specified), deterministic md5 order, exclusive
# running total — operators/sampling.token_budget_sample.
# ---------------------------------------------------------------------------

TOKEN_BUDGET_DEFAULT = 600
TOKEN_BUDGETS = {"src0": 300, "src1": 1200}  # per-source overrides


@register(
    "token_budget_mix",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source,
           len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
           md5(CAST(doc_id AS VARCHAR)) AS hk
    FROM documents
), cum AS (
    SELECT doc_id, source, n_tokens, hk,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY hk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS tokens_before,
           CASE WHEN source = 'src0' THEN 300
                WHEN source = 'src1' THEN 1200
                ELSE {TOKEN_BUDGET_DEFAULT} END AS budget
    FROM toks
)
SELECT source,
       COUNT(*) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       md5(string_agg(CAST(doc_id AS VARCHAR), ','
                      ORDER BY hk, doc_id)) AS kept_sig
FROM cum WHERE tokens_before < budget
GROUP BY source
""",
)
def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget domain mixing: each source contributes documents in
    stable md5(doc_id) order until its TOKEN budget is exhausted
    (exclusive running total < budget, so overshoot is bounded by one
    document) — the "N tokens of web, M of code" mix spec made
    deterministic and engine-verifiable. Two sources carry overrides so
    the budget mapping itself is under test; kept_sig pins the exact
    kept set per source, kept_tokens the realized mix."""
    from asritha_metamorphetl_spark.functions.text import token_count
    from asritha_metamorphetl_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = Catalog(sf_dir).load(spark, "documents").select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    kept = token_budget_sample(
        docs,
        "source",
        "doc_id",
        "n_tokens",
        budget_by_source=TOKEN_BUDGETS,
        default_budget=TOKEN_BUDGET_DEFAULT,
    ).withColumn("hk", F.md5(F.col("doc_id").cast("string")))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
        F.md5(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(F.struct("hk", "doc_id"))
                ).getField("doc_id").cast("array<string>"),
            )
        ).alias("kept_sig"),
    )


# ---------------------------------------------------------------------------
# Log2-bucketed length histogram — the corpus length profile behind
# curriculum/packing decisions. log2 is IEEE-exact at powers of two, so
# floor(log2(n)) buckets identically across engines.
# ---------------------------------------------------------------------------


@register(
    "doc_length_histogram",
    oracle="""
WITH toks AS (
    SELECT source,
           GREATEST(len(list_filter(string_split(text, ' '), x -> x != '')),
                    1) AS n
    FROM documents
)
SELECT source,
       CAST(FLOOR(LOG2(n)) AS BIGINT) AS len_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens
FROM toks
GROUP BY 1, 2
""",
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source histogram over power-of-two token-length buckets (the
    [2^k, 2^(k+1)) bands a packing/curriculum planner consumes). One
    row-local projection plus a bounded (source × bucket) aggregate."""
    docs = Catalog(sf_dir).load(spark, "documents")
    n = F.greatest(T.token_count(F.col("text")), F.lit(1))
    return (
        docs.select(
            "source",
            F.floor(F.log2(n.cast("double"))).cast("bigint").alias("len_bucket"),
            n.alias("n"),
        )
        .groupBy("source", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-sampled source mixture — the dataset-mixing step between
# per-source caps and training: quotas follow n^(1/2) (temperature-
# flattened), selection stays the deterministic md5 order. Integer
# arithmetic end to end: floor(sqrt(n)) is exact cross-engine (IEEE
# sqrt is correctly rounded), everything after is BIGINT div.
# ---------------------------------------------------------------------------

#: Keep 40% of the corpus overall, distributed across sources by sqrt
#: weight (alpha = 0.5 temperature) — over-represented sources are
#: flattened, small sources keep proportionally more.
MIX_TARGET_PCT = 40


@register(
    "temperature_mix_sample",
    oracle=f"""
WITH counts AS (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
w AS (
    SELECT source, CAST(n AS BIGINT) AS n,
           CAST(FLOOR(SQRT(n)) AS BIGINT) AS wt
    FROM counts
),
tot AS (
    SELECT CAST(SUM(wt) AS BIGINT) AS tw, CAST(SUM(n) AS BIGINT) AS tn
    FROM w
),
quota AS (
    SELECT source, n, wt,
           (((tn * {MIX_TARGET_PCT}) // 100) * wt) // tw AS quota
    FROM w, tot
),
ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
),
kept AS (
    SELECT r.source, r.doc_id, r.rk
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rk <= q.quota
)
SELECT q.source, q.n AS n_total, q.wt AS weight, q.quota,
       COUNT(k.doc_id) AS n_kept,
       md5(string_agg(CAST(k.doc_id AS VARCHAR), ',' ORDER BY k.rk))
           AS kept_sig
FROM quota q LEFT JOIN kept k ON q.source = k.source
GROUP BY q.source, q.n, q.wt, q.quota
""",
)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture: per-source quotas proportional to
    sqrt(count) (alpha=0.5), summing to ~MIX_TARGET_PCT% of the corpus;
    selection inside each source is the engine's deterministic md5
    order (same machinery as source_quota_sample, pre-pruned per
    physical partition — no one-task-per-source window). The kept set
    is pinned by an order-sensitive signature, so the oracle verifies
    WHICH documents the mixture keeps, not just how many.

    The quota table is materialized driver-side — O(#sources) rows, the
    same bounded-cardinality contract as IVF's centroid collect; the
    documents themselves never leave the executors."""
    from asritha_metamorphetl_spark.operators.ranks import top_k_per_group

    docs = Catalog(sf_dir).load(spark, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w = counts.withColumn("wt", F.floor(F.sqrt(F.col("n"))).cast("long"))
    rows = w.crossJoin(
        F.broadcast(
            w.agg(
                F.sum("wt").alias("tw"),
                F.sum("n").alias("tn"),
            )
        )
    ).select(
        "source",
        F.col("n").cast("long").alias("n"),
        "wt",
        F.expr(f"(((tn * {MIX_TARGET_PCT}) div 100) * wt) div tw").alias(
            "quota"
        ),
    ).collect()
    kmax = max((r.quota for r in rows), default=0)
    quota = F.broadcast(
        spark.createDataFrame(rows, schema="source string, n long, wt long, quota long")
    )

    hk = F.md5(F.col("doc_id").cast("string"))
    ranked = top_k_per_group(
        docs.select("doc_id", "source", hk.alias("hk")),
        ["source"],
        [F.col("hk"), F.col("doc_id")],
        k=max(int(kmax), 1),
        out_col="rk",
    )
    kept = ranked.join(quota.select("source", "quota"), "source").filter(
        F.col("rk") <= F.col("quota")
    )
    kept_agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(F.struct("rk", "doc_id"))
                ).getField("doc_id").cast("array<string>"),
            )
        ).alias("kept_sig"),
    )
    return (
        quota.join(kept_agg, "source", "left")
        .select(
            "source",
            F.col("n").alias("n_total"),
            F.col("wt").alias("weight"),
            "quota",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            "kept_sig",
        )
    )


@register(
    "token_entropy_scores",
    oracle="""
WITH uni AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
per_tok AS (
    SELECT doc_id, tok, COUNT(*) AS c FROM uni GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_distinct,
       ROUND(
         LN(CAST(SUM(c) AS DOUBLE))
         - SUM(c * LN(CAST(c AS DOUBLE))) / SUM(c),
         6
       ) AS entropy_nats
FROM per_tok GROUP BY doc_id
""",
)
def token_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution
    (operators/lm.token_entropy) — the gibberish signal orthogonal to
    the repetition ratios: one repeated token scores 0, random noise
    approaches ln(n_distinct). Two map-side-combinable hash aggregates;
    the only float work is one log per distinct (doc, token)."""
    from asritha_metamorphetl_spark.operators.lm import token_entropy

    docs = Catalog(sf_dir).load(spark, "documents")
    return token_entropy(docs)


OOV_VOCAB_K = 25


@register(
    "oov_rate_profile",
    oracle=f"""
WITH uni AS (
    SELECT d.doc_id, d.source, unnest(string_split(d.text, ' ')) AS tok
    FROM documents d
),
vocab AS (
    SELECT tok FROM uni GROUP BY tok
    ORDER BY COUNT(*) DESC, tok LIMIT {OOV_VOCAB_K}
),
per_doc AS (
    SELECT u.doc_id, u.source,
           COUNT(*) AS n_toks,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
    FROM uni u LEFT JOIN vocab v ON u.tok = v.tok
    GROUP BY u.doc_id, u.source
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n_oov) AS BIGINT) AS total_oov,
       ROUND(CAST(SUM(n_oov) AS DOUBLE) / SUM(n_toks), 6)
           AS oov_rate,
       CAST(SUM(CASE WHEN n_oov * 2 > n_toks THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_majority_oov
FROM per_doc GROUP BY source
""",
)
def oov_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage health per source: the share of token
    occurrences falling outside the corpus top-K vocabulary (the
    question a fixed-vocab tokenizer deployment asks before training —
    which sources will shred into unknowns). The vocabulary is a
    bounded top-K frame the occurrence stream LEFT-joins against
    (broadcast at any scale); everything else is two hash aggregates.
    K is 25 here (the synthetic corpus' vocabulary is ~30 tokens);
    production swaps in the tokenizer's real vocab table — same plan."""
    docs = Catalog(sf_dir).load(spark, "documents")
    uni = docs.select(
        "doc_id", "source",
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    )
    vocab = (
        uni.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(OOV_VOCAB_K)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        uni.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.sum("n_oov").cast("bigint").alias("total_oov"),
        F.round(
            F.sum("n_oov").cast("double") / F.sum("n_toks"), 6
        ).alias("oov_rate"),
        F.sum(
            F.when(F.col("n_oov") * 2 > F.col("n_toks"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_docs_majority_oov"),
    )


@register(
    "robust_length_outliers",
    oracle="""
WITH lens AS (
    SELECT doc_id, lang,
           len(list_filter(string_split(text, ' '), x -> x != ''))
               AS n_toks
    FROM documents
),
ranked AS (
    SELECT doc_id, lang, n_toks,
           ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n_toks, doc_id
           ) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM lens
),
quart AS (
    SELECT lang,
           MAX(n) AS n_docs,
           MAX(CASE WHEN rn = (n + 3) // 4 THEN n_toks END) AS q1,
           MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN n_toks END) AS q3
    FROM ranked GROUP BY lang
)
SELECT r.lang, q.n_docs, q.q1, q.q3,
       CAST(SUM(CASE WHEN 2 * r.n_toks < 2 * q.q1 - 3 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN 2 * r.n_toks > 2 * q.q3 + 3 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM ranked r JOIN quart q ON r.lang = q.lang
GROUP BY r.lang, q.n_docs, q.q1, q.q3
""",
)
def robust_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence length outliers per language with RANK-DISCRETE
    quartiles (the value at row ceil(n/4) / ceil(3n/4) of the sorted
    lengths) — no interpolation, so the quartile is an actual corpus
    value and the oracle agrees exactly; the 1.5×IQR fences are kept
    in doubled-integer arithmetic (2·len vs 2·q ± 3·IQR) so no float
    appears anywhere. The window partitions by language over narrow
    (id, lang, len) rows; the quartile table is O(languages) and
    broadcast back for the fence counts."""
    docs = Catalog(sf_dir).load(spark, "documents")
    from pyspark.sql import Window

    lens = docs.select(
        "doc_id", "lang", T.token_count(F.col("text")).alias("n_toks")
    )
    w = Window.partitionBy("lang").orderBy("n_toks", "doc_id")
    ranked = lens.select(
        "doc_id",
        "lang",
        "n_toks",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang"))
        .alias("n"),
    )
    quart = ranked.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("n_toks"))
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("n_toks")
            )
        ).alias("q3"),
    )
    iqr3 = 3 * (F.col("q3") - F.col("q1"))
    return (
        ranked.join(F.broadcast(quart), "lang")
        .groupBy("lang", "n_docs", "q1", "q3")
        .agg(
            F.sum(
                F.when(2 * F.col("n_toks") < 2 * F.col("q1") - iqr3, 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_low"),
            F.sum(
                F.when(2 * F.col("n_toks") > 2 * F.col("q3") + iqr3, 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_high"),
        )
    )
