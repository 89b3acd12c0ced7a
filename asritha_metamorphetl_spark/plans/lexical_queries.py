"""Lexical corpus statistics: hapax rates, Heaps'-law vocabulary
growth, SimHash bucket load, sentence and token-length profiles,
prefix-duplicate groups, and character-class composition.

Scale discipline: every query reduces the corpus to bounded frames
(per-source aggregates, per-token counts that map-side combine, a
20-point growth curve) before any window; the only windows run over
those bounded tables. Token semantics reuse ``functions/text.tokens``
(single-space split) so every oracle can replay them with
``list_filter(string_split(...))``.

Reference scope: the reference has no corpus-statistics surface; these
are the profiling tables an LLM-data pipeline prints before anyone
trusts a crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions.text import tokens
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

Q6 = 1000000

#: Heaps'-law growth-curve resolution (corpus split into this many
#: doc_id-range buckets).
HEAPS_BUCKETS = 20

#: Duplicate-prefix key length (characters).
PREFIX_LEN = 32

_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x != '')"


@register(
    "hapax_legomena_rate",
    oracle=f"""
WITH tok AS (
    SELECT source, unnest({_TOKS_SQL}) AS token FROM documents
),
freqs AS (
    SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_rate
FROM freqs GROUP BY source
""",
)
def hapax_legomena_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of each source's vocabulary that occurs exactly once
    (hapax legomena) — a natural corpus sits near 40–60%; a template
    farm or a deduplicated dump drifts far off, making this one of the
    cheapest synthetic-text tells. One explode into a per-(source,
    token) count (map-side combining), then an O(sources) rollup —
    the vocabulary table is Zipf-bounded, never the corpus."""
    docs = Catalog(sf_dir).load(spark, "documents")
    freqs = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return freqs.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        hapax.cast("bigint").alias("hapax"),
        F.round(
            hapax.cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("hapax_rate"),
    )


@register(
    "heaps_law_fit",
    oracle=f"""
WITH bounds AS (
    SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
),
tok AS (
    SELECT (d.doc_id - b.lo) * {HEAPS_BUCKETS} // (b.hi - b.lo + 1)
               AS bucket,
           unnest({_TOKS_SQL}) AS token
    FROM documents d CROSS JOIN bounds b
),
per_bucket_tokens AS (
    SELECT bucket, COUNT(*) AS n_tok FROM tok GROUP BY bucket
),
first_seen AS (
    SELECT token, MIN(bucket) AS fb FROM tok GROUP BY token
),
new_vocab AS (
    SELECT fb AS bucket, COUNT(*) AS n_new FROM first_seen GROUP BY fb
),
curve AS (
    SELECT t.bucket,
           SUM(t.n_tok) OVER (ORDER BY t.bucket ASC) AS tokens_cum,
           SUM(COALESCE(v.n_new, 0)) OVER (ORDER BY t.bucket ASC)
               AS vocab_cum
    FROM per_bucket_tokens t
    LEFT JOIN new_vocab v ON v.bucket = t.bucket
),
pts AS (
    SELECT CAST(ROUND(LN(CAST(tokens_cum AS DOUBLE)) * {Q6}) AS BIGINT)
               AS xi,
           CAST(ROUND(LN(CAST(vocab_cum AS DOUBLE)) * {Q6}) AS BIGINT)
               AS yi
    FROM curve WHERE tokens_cum > 0 AND vocab_cum > 0
),
sums AS (
    SELECT COUNT(*) AS n, SUM(xi) AS sx, SUM(yi) AS sy,
           SUM(xi * yi) AS sxy, SUM(xi * xi) AS sx2
    FROM pts
)
SELECT n AS n_points,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
           AS heaps_beta
FROM sums
""",
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent: OLS slope of ln(vocabulary) on ln(tokens)
    across {HEAPS_BUCKETS} cumulative corpus prefixes (natural text
    sits near β≈0.5–0.8; β→0 means the corpus stopped saying new
    things — the diversity-saturation monitor for a growing crawl).
    Buckets are doc_id RANGES from a 1-row min/max broadcast (no
    global rank over documents); each token's first-seen bucket is a
    MIN aggregate; the cumulative curve and the quantized-ln OLS run
    over the {HEAPS_BUCKETS}-row table only (the ``zipf_token_slope``
    float discipline)."""
    docs = Catalog(sf_dir).load(spark, "documents")
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    tok = docs.crossJoin(F.broadcast(bounds)).select(
        F.floor(
            (F.col("doc_id") - F.col("lo"))
            * HEAPS_BUCKETS
            / (F.col("hi") - F.col("lo") + 1)
        )
        .cast("bigint")
        .alias("bucket"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    # ONE tokenize pass (guide §1.2): the raw token stream used to feed
    # BOTH aggregates below, so the corpus was scanned + tokenized
    # twice. The (bucket, token) count frame carries everything — token
    # totals per bucket (Σ counts) and each token's first-seen bucket
    # (min bucket) — and is far smaller than the token stream, so the
    # two downstream aggregates run over the pinned distinct frame.
    tok_counts = (
        tok.groupBy("bucket", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    per_bucket = tok_counts.groupBy("bucket").agg(
        F.sum("c").alias("n_tok")
    )
    new_vocab = (
        tok_counts.groupBy("token")
        .agg(F.min("bucket").alias("fb"))
        .groupBy(F.col("fb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = Window.orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        per_bucket.join(new_vocab, "bucket", "left")
        .select(
            "bucket",
            "n_tok",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn("tokens_cum", F.sum("n_tok").over(w))
        .withColumn("vocab_cum", F.sum("n_new").over(w))
    )
    pts = curve.filter(
        (F.col("tokens_cum") > 0) & (F.col("vocab_cum") > 0)
    ).select(
        F.round(F.log(F.col("tokens_cum").cast("double")) * Q6)
        .cast("bigint")
        .alias("xi"),
        F.round(F.log(F.col("vocab_cum").cast("double")) * Q6)
        .cast("bigint")
        .alias("yi"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xi").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("yi").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            (F.col("xi").cast("decimal(38,0)") * F.col("yi"))
        ).alias("sxy"),
        F.sum(
            (F.col("xi").cast("decimal(38,0)") * F.col("xi"))
        ).alias("sx2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return sums.select(
        F.col("n").alias("n_points"),
        F.round(
            (n * F.col("sxy").cast("double") - sx * sy)
            / (n * F.col("sx2").cast("double") - sx * sx),
            4,
        ).alias("heaps_beta"),
    )


def _tok16_sql() -> str:
    terms = [
        f"(strpos('0123456789abcdef', substr(md5(tok), {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "simhash_prefix_buckets",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
hashed AS (
    SELECT doc_id, list_transform(t, tok -> {_tok16_sql()}) AS vals
    FROM toks
),
bits AS (
    SELECT doc_id, j,
        CASE WHEN list_sum(list_transform(vals,
                 v -> CAST(FLOOR(v / power(2, 15 - j)) AS BIGINT)
                      % 2 * 2 - 1)) > 0
             THEN CAST(power(2, 15 - j) AS BIGINT) ELSE 0 END AS v
    FROM hashed, generate_series(0, 15) gs(j)
),
sh AS (
    SELECT doc_id, CAST(SUM(v) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
),
buckets AS (
    SELECT simhash // 4096 AS bucket, COUNT(*) AS bucket_size
    FROM sh GROUP BY 1
)
SELECT bucket_size, COUNT(*) AS n_buckets
FROM buckets GROUP BY bucket_size
""",
)
def simhash_prefix_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-balance audit of SimHash prefix blocking: bucket documents
    by the top 4 simhash bits (16 buckets — the blocking key
    ``simhash_docs`` would shard a near-dup pass on) and histogram the
    bucket sizes. A heavily skewed histogram means the blocking key
    concentrates work on one task — the audit to run BEFORE launching
    a banded pass at corpus scale, same engineering move as
    ``minhash_band_tuning``. Reuses ``operators/dedup.simhash_keys``
    (reference: Rest-API has no near-dup surface; this extends it)."""
    from asritha_metamorphetl_spark.operators.dedup import simhash_keys

    docs = Catalog(sf_dir).load(spark, "documents")
    sh = simhash_keys(docs, "text", "doc_id")
    buckets = sh.groupBy(
        F.floor(F.col("simhash") / 4096).cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("bucket_size"))
    return buckets.groupBy("bucket_size").agg(
        F.count(F.lit(1)).alias("n_buckets")
    )


@register(
    "sentence_length_profile",
    oracle="""
WITH sent AS (
    SELECT source, trim(unnest(string_split(text, '.'))) AS s
    FROM documents
),
words AS (
    SELECT source,
           len(list_filter(string_split(s, ' '), x -> x != ''))
               AS n_words
    FROM sent WHERE length(s) > 0
)
SELECT source, COUNT(*) AS n_sentences,
       CAST(MAX(n_words) AS BIGINT) AS max_words,
       ROUND(CAST(SUM(n_words) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS mean_words
FROM words GROUP BY source
""",
)
def sentence_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-length profile per source (period-split sentences,
    single-space words): mean and max words per sentence — the
    readability signal quality filters bucket on, and a fast tell for
    boilerplate (uniform short sentences) vs prose. One explode into
    an O(sources) aggregate; exact integer counts with one final
    division."""
    docs = Catalog(sf_dir).load(spark, "documents")
    sent = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), "\\.")).alias("raw")
        )
        .select("source", F.trim(F.col("raw")).alias("s"))
        .filter(F.length("s") > 0)
    )
    words = sent.select(
        "source", F.size(tokens(F.col("s"))).alias("n_words")
    )
    return words.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.max("n_words").cast("bigint").alias("max_words"),
        F.round(
            F.sum("n_words").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_words"),
    )


@register(
    "doc_prefix_dup_groups",
    oracle=f"""
WITH keys AS (
    SELECT lower(substr(text, 1, {PREFIX_LEN})) AS k FROM documents
),
groups AS (
    SELECT k, COUNT(*) AS c FROM keys GROUP BY k HAVING COUNT(*) > 1
)
SELECT COALESCE(COUNT(*), 0) AS n_groups,
       COALESCE(CAST(SUM(c) AS BIGINT), 0) AS n_docs,
       COALESCE(CAST(MAX(c) AS BIGINT), 0) AS largest_group
FROM groups
""",
)
def doc_prefix_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-prefix duplicate groups (case-folded first {PREFIX_LEN}
    chars) — the cheapest dedup signal there is: boilerplate headers,
    mirrored pages, and template intros collide here long before a
    MinHash pass runs, and the group-size summary says whether the
    expensive pass is worth scheduling. One hash aggregate on a short
    key; summary is a single row (zeros when the corpus is clean)."""
    docs = Catalog(sf_dir).load(spark, "documents")
    groups = (
        docs.select(
            F.lower(F.substring("text", 1, PREFIX_LEN)).alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    return groups.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_groups"),
        F.coalesce(F.sum("c").cast("bigint"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.max("c").cast("bigint"), F.lit(0)).alias(
            "largest_group"
        ),
    )


@register(
    "token_length_histogram",
    oracle=f"""
WITH tok AS (
    SELECT length(unnest({_TOKS_SQL})) AS tok_len FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM tok)
SELECT CAST(tok_len AS BIGINT) AS tok_len, COUNT(*) AS n_tokens,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST((SELECT n FROM tot) AS DOUBLE), 6) AS share
FROM tok GROUP BY tok_len
""",
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution over the corpus — the tokenizer-
    sanity histogram (a spike at extreme lengths means unsplit
    markup/URLs polluting the vocabulary; BPE training reads this
    first). One explode into an O(max-length) aggregate; shares from
    exact counts."""
    docs = Catalog(sf_dir).load(spark, "documents")
    tok = docs.select(
        F.explode(tokens(F.col("text"))).alias("token")
    ).select(F.length("token").cast("bigint").alias("tok_len"))
    per = tok.groupBy("tok_len").agg(F.count(F.lit(1)).alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").cast("bigint").alias("n"))
    return per.crossJoin(F.broadcast(tot)).select(
        "tok_len",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n").cast("double"),
            6,
        ).alias("share"),
    )


_CHAR_CLASSES = (
    ("lower", "[a-z]"),
    ("upper", "[A-Z]"),
    ("digit", "[0-9]"),
    ("space", "[ ]"),
)


def _char_class_oracle() -> str:
    cols = ", ".join(
        f"CAST(SUM(length(text) - length(regexp_replace(text, "
        f"'{pat}', '', 'g'))) AS BIGINT) AS n_{name}"
        for name, pat in _CHAR_CLASSES
    )
    return f"""
SELECT source, CAST(SUM(length(text)) AS BIGINT) AS n_chars, {cols},
       CAST(SUM(length(regexp_replace(text,
            '[a-zA-Z0-9 ]', '', 'g'))) AS BIGINT) AS n_other
FROM documents GROUP BY source
"""


@register("char_class_profile", oracle=_char_class_oracle())
def char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source (lower/upper/digit/
    space/other) — the encoding-and-noise fingerprint: mojibake shows
    as an `other` spike, OCR dumps as digit/upper anomalies, and the
    classes are exact integer counts so drift between crawls is
    bitwise comparable. Counting is length-difference after class
    removal (pure JVM regexp, no explode — one scan, O(sources)
    output)."""
    docs = Catalog(sf_dir).load(spark, "documents")
    aggs = [F.sum(F.length("text")).cast("bigint").alias("n_chars")]
    for name, pat in _CHAR_CLASSES:
        aggs.append(
            F.sum(
                F.length("text")
                - F.length(F.regexp_replace("text", pat, ""))
            )
            .cast("bigint")
            .alias(f"n_{name}")
        )
    aggs.append(
        F.sum(F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")))
        .cast("bigint")
        .alias("n_other")
    )
    return docs.groupBy("source").agg(*aggs)
