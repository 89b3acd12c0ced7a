"""Passage-level dedup, learned quality filtering, and UniMax mixing —
the round-6 widening of the training-data curation surface.

- ``dup_passage_spans``: the distributed analog of exact-substring
  deduplication (Lee et al. 2021, arXiv:2107.06499 — "Deduplicating
  Training Data Makes Language Models Better"): find maximal runs of
  token positions whose every 3-gram also occurs in some OTHER document.
  The suffix-array construction of the paper doesn't distribute; the
  fixed-length-gram approximation does — one inverted-index shuffle on
  the gram key, then a per-document gaps-and-islands merge.
- ``quality_logit_scores``: a fastText-style document quality filter as
  MODEL-AS-DATA — per-language logistic-regression coefficients live in
  a (broadcast) weights table joined by language, never in code. The
  plan is row-local feature extraction + one broadcast join; swapping in
  retrained weights is a data update, not a deploy.
- ``unimax_source_allocation``: UniMax epoch-capped budget allocation
  across sources (operators/sampling.py:unimax_allocation).
- ``incremental_dedup_pairs``: delta-vs-base MinHash dedup that never
  re-joins the base corpus with itself — the O(delta) ingest path
  (operators/dedup.py:minhash_lsh_pairs_incremental).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions import text as T
from asritha_metamorphetl_spark.functions.hashing import SHINGLE_SIZE
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.plans.text_queries import (
    _SHINGLE_CTE,
    _STOPLIST_SQL,
    MINHASH_BANDS_CTE,
    _hex48_sql,
)
from asritha_metamorphetl_spark.sources.files import Catalog


@register(
    "dup_passage_spans",
    oracle=f"""
WITH {_SHINGLE_CTE},
sh AS (
    SELECT doc_id, unnest(s) AS g,
           unnest(generate_series(1, len(s))) AS pos
    FROM shingled WHERE len(s) > 0
),
dupg AS (
    SELECT g FROM sh GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
duppos AS (SELECT doc_id, pos FROM sh JOIN dupg USING (g)),
grp AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM duppos
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {SHINGLE_SIZE - 1} AS BIGINT) AS span_end,
       COUNT(*) AS n_grams
FROM grp GROUP BY doc_id, grp
""",
)
def dup_passage_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-passage spans per document: token ranges
    [span_start, span_end] (1-based, inclusive) where every contiguous
    3-gram occurs in at least one OTHER document. Downstream removal =
    cutting these spans, the passage-level complement of whole-document
    dedup (a boilerplate header shared by a million pages never makes
    any DOCUMENT a near-duplicate, but shows up here).

    Scale shape: grams are keyed by xxhash64 (collision odds ~|G|²/2⁶⁵,
    immaterial — same argument as ngram_jaccard_pairs), the document
    frequency test is one hash aggregate on the gram key, and the
    island merge (pos - row_number) shuffles each document's duplicated
    positions once, partitioned by doc — per-doc state is bounded by
    document length, never corpus size."""
    from asritha_metamorphetl_spark.operators.dedup import duplicated_passage_spans

    docs = Catalog(sf_dir).load(spark, "documents")
    return duplicated_passage_spans(docs, "text", "doc_id")


#: Per-language logistic-regression coefficients (intercept, stopword
#: ratio, average token length, log1p token count). A stand-in for a
#: trained fastText/linear quality model — the engine contract is the
#: scoring PLAN (row-local features, broadcast model join), not these
#: particular numbers. _QL_DEFAULT covers languages absent from the
#: table (COALESCE on the left join).
_QL_WEIGHTS: tuple[tuple[str, float, float, float, float], ...] = (
    ("en", -3.0, 6.0, 0.2, 0.5),
    ("de", -2.8, 5.0, 0.25, 0.45),
    ("es", -2.9, 5.5, 0.2, 0.5),
    ("fr", -2.9, 5.5, 0.2, 0.5),
    ("zh", -2.0, 1.5, 0.6, 0.55),
)
_QL_DEFAULT = (-2.5, 4.0, 0.2, 0.4)

_QL_VALUES = ",\n        ".join(
    f"('{lang}', {b0}, {bs}, {bl}, {bt})"
    for lang, b0, bs, bl, bt in _QL_WEIGHTS
)


QUALITY_LOGIT_ORACLE = f"""
WITH weights(lang, b0, b_stop, b_len, b_tok) AS (
    VALUES
        {_QL_VALUES}
),
feats AS (
    SELECT doc_id, d.lang,
           CASE WHEN len(t) > 0
                THEN CAST(len(list_filter(t, x -> x IN
                     {_STOPLIST_SQL})) AS DOUBLE) / len(t)
                ELSE 0.0 END AS stop_ratio,
           CASE WHEN len(t) > 0
                THEN CAST(list_sum(list_transform(t, x -> length(x)))
                     AS DOUBLE) / len(t)
                ELSE 0.0 END AS avg_len,
           ln(1 + len(t)) AS log_toks
    FROM (SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), x -> x != '') AS t
          FROM documents) d
),
scored AS (
    SELECT doc_id, f.lang,
           ROUND(COALESCE(w.b0, {_QL_DEFAULT[0]})
                 + COALESCE(w.b_stop, {_QL_DEFAULT[1]}) * f.stop_ratio
                 + COALESCE(w.b_len, {_QL_DEFAULT[2]}) * f.avg_len
                 + COALESCE(w.b_tok, {_QL_DEFAULT[3]}) * f.log_toks, 6) AS z
    FROM feats f LEFT JOIN weights w ON f.lang = w.lang
)
SELECT doc_id, lang, ROUND(1.0 / (1.0 + exp(-z)), 6) AS score,
       1.0 / (1.0 + exp(-z)) >= 0.5 AS kept
FROM scored
"""


@register("quality_logit_scores", oracle=QUALITY_LOGIT_ORACLE)
def quality_logit_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filtering with the model as data: row-local
    feature extraction (stopword ratio, mean token length, log token
    count — all JVM expressions in the scan stage), one BROADCAST join
    against the per-language coefficient table, a sigmoid, a threshold.
    Retraining the filter = replacing the weights table; the 100 TB
    plan is a full scan with zero extra shuffles. The linear score is
    rounded before the sigmoid so cross-engine ``ln``/``exp`` last-ulp
    differences cannot move a document across the keep threshold except
    on a measure-zero rounding boundary."""
    docs = Catalog(sf_dir).load(spark, "documents")
    weights = spark.createDataFrame(
        list(_QL_WEIGHTS), "lang string, b0 double, b_stop double, "
        "b_len double, b_tok double"
    )
    c = F.col("text")
    feats = docs.select(
        "doc_id",
        "lang",
        T.stopword_ratio(c).alias("stop_ratio"),
        T.avg_token_length(c).alias("avg_len"),
        F.log(F.lit(1.0) + T.token_count(c)).alias("log_toks"),
    )
    z = F.round(
        F.coalesce(F.col("b0"), F.lit(_QL_DEFAULT[0]))
        + F.coalesce(F.col("b_stop"), F.lit(_QL_DEFAULT[1])) * F.col("stop_ratio")
        + F.coalesce(F.col("b_len"), F.lit(_QL_DEFAULT[2])) * F.col("avg_len")
        + F.coalesce(F.col("b_tok"), F.lit(_QL_DEFAULT[3])) * F.col("log_toks"),
        6,
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    return (
        feats.join(F.broadcast(weights), "lang", "left")
        .withColumn("z", z)
        .select(
            "doc_id",
            "lang",
            F.round(score, 6).alias("score"),
            (score >= 0.5).alias("kept"),
        )
    )


#: UniMax knobs for the registered query: budget = 95% of the corpus'
#: total tokens, every source capped at one epoch. Chosen so the
#: fixture corpus (near-uniform sources) exercises BOTH branches —
#: several sources cap out and the rest share the water level — at
#: sf0.01 and sf0.1 alike.
UNIMAX_BUDGET_FRAC = 0.95
UNIMAX_MAX_EPOCHS = 1.0


@register(
    "unimax_source_allocation",
    oracle=f"""
WITH toks AS (
    SELECT source,
           CAST(SUM(len(list_filter(string_split(text, ' '),
                x -> x != ''))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
base AS (
    SELECT source, n_tokens,
           n_tokens::DOUBLE * {UNIMAX_MAX_EPOCHS} AS capacity,
           (SELECT SUM(n_tokens)::DOUBLE FROM toks)
               * {UNIMAX_BUDGET_FRAC} AS budget
    FROM toks
),
ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (ORDER BY capacity ASC, source ASC) AS i,
           COALESCE(SUM(capacity) OVER (ORDER BY capacity ASC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0.0) AS cum_prev,
           COUNT(*) OVER () AS n
    FROM base
),
flagged AS (
    SELECT *,
           capacity * (n - i + 1) <= budget - cum_prev AS capped
    FROM ranked
),
lvl AS (
    SELECT CASE WHEN SUM(CASE WHEN capped THEN 1 ELSE 0 END) < MAX(n)
                THEN (MAX(budget)
                      - COALESCE(SUM(CASE WHEN capped THEN capacity END),
                                 0.0))
                     / (MAX(n) - SUM(CASE WHEN capped THEN 1 ELSE 0 END))
                ELSE 0.0 END AS level
    FROM flagged
)
SELECT source, n_tokens,
       ROUND(capacity, 6) AS capacity,
       ROUND(CASE WHEN capped THEN capacity ELSE level END, 6)
           AS allocation,
       ROUND(CASE WHEN capped THEN capacity ELSE level END / n_tokens, 6)
           AS epochs,
       capped
FROM flagged CROSS JOIN lvl
""",
)
def unimax_source_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax mixing schedule over the document sources: the third
    mixing strategy beside source_quota_sample (hard quotas) and
    temperature_mix_sample (power-law reweighting) — as-uniform-as-
    possible allocation with a hard per-source epoch cap, computed by
    exact closed-form water-filling. One O(sources) rollup feeds one
    O(sources)-row sort window; nothing here scales with rows."""
    from asritha_metamorphetl_spark.operators.sampling import unimax_allocation

    docs = Catalog(sf_dir).load(spark, "documents")
    stats = (
        docs.groupBy("source")
        .agg(F.sum(T.token_count(F.col("text"))).alias("n_tokens"))
        .withColumn(
            "total",
            F.sum("n_tokens").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    return unimax_allocation(
        stats,
        "source",
        "n_tokens",
        budget=F.col("total").cast("double") * F.lit(UNIMAX_BUDGET_FRAC),
        max_epochs=UNIMAX_MAX_EPOCHS,
    )


@register(
    "incremental_dedup_pairs",
    oracle=f"""
WITH {MINHASH_BANDS_CTE},
flags AS (
    SELECT doc_id,
           {_hex48_sql("md5(CAST(doc_id AS VARCHAR))")} % 10 >= 8 AS is_new
    FROM documents
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CASE WHEN NOT fa.is_new THEN 'base_delta'
            ELSE 'delta_delta' END AS pair_type
FROM bands a
JOIN bands b USING (band_key)
JOIN flags fa ON fa.doc_id = a.doc_id
JOIN flags fb ON fb.doc_id = b.doc_id
WHERE fb.is_new
  AND a.doc_id != b.doc_id
  AND (NOT fa.is_new OR a.doc_id < b.doc_id)
""",
)
def incremental_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: treating hash buckets 0-7 of the corpus
    as the already-ingested BASE and buckets 8-9 as today's DELTA batch,
    emit every near-dup candidate involving a delta document — without
    ever joining base against base (operators/dedup.py:
    minhash_lsh_pairs_incremental). At 100 TB an append-only corpus is
    deduped this way on every batch: the base's banded signatures are a
    persisted artifact and only the delta pays signature compute, so
    batch cost is O(delta · collisions), not O(corpus²). The oracle
    replays the same band join over the full corpus with the base×base
    pairs excluded by flag — construction and filter must agree
    exactly."""
    from asritha_metamorphetl_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )
    from asritha_metamorphetl_spark.operators.sampling import hash_bucket

    docs = Catalog(sf_dir).load(spark, "documents")
    bucket = hash_bucket(F.col("doc_id"), 10)
    base = docs.filter(bucket <= 7)
    delta = docs.filter(bucket >= 8)
    return minhash_lsh_pairs_incremental(base, delta, "text", "doc_id")


@register(
    "dup_span_removal_stats",
    oracle=f"""
WITH {_SHINGLE_CTE},
sh AS (
    SELECT doc_id, unnest(s) AS g,
           unnest(generate_series(1, len(s))) AS pos
    FROM shingled WHERE len(s) > 0
),
dupg AS (
    SELECT g FROM sh GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
),
duppos AS (SELECT doc_id, pos FROM sh JOIN dupg USING (g)),
grp AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM duppos
),
spans AS (
    SELECT doc_id, COUNT(*) AS n FROM grp GROUP BY doc_id, grp
),
covered AS (
    SELECT doc_id, COUNT(DISTINCT tok) AS dup_tokens
    FROM (SELECT doc_id,
                 unnest(generate_series(pos, pos + {SHINGLE_SIZE - 1}))
                     AS tok
          FROM duppos)
    GROUP BY doc_id
),
agg AS (
    SELECT s.doc_id, COUNT(*) AS n_spans, MAX(c.dup_tokens) AS dup_tokens
    FROM spans s JOIN covered c USING (doc_id)
    GROUP BY s.doc_id
),
toklen AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x != ''))
               AS n_tokens
    FROM documents
)
SELECT t.doc_id,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
       CASE WHEN t.n_tokens > 0
            THEN ROUND(COALESCE(a.dup_tokens, 0)::DOUBLE / t.n_tokens, 6)
            ELSE 0.0 END AS pct_dup
FROM toklen t LEFT JOIN agg a USING (doc_id)
""",
)
def dup_span_removal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What passage-level dedup would actually remove, per document:
    the count of DISTINCT tokens covered by any cross-document
    duplicated 3-gram (adjacent spans overlap at token granularity, so
    this is a distinct-count over the gram footprints, not a sum of
    span lengths), the gram-level span count, and the removable
    fraction. Every document gets a row — the zero rows are the signal
    a curation dashboard reads. Same two shuffles as dup_passage_spans
    plus one per-doc aggregate; nothing scales beyond document
    length."""
    from asritha_metamorphetl_spark.functions.hashing import word_shingles

    docs = Catalog(sf_dir).load(spark, "documents")
    sh = docs.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("text"))).alias("pos0", "s"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.xxhash64(F.col("s")).alias("g"),
    )
    dupg = (
        sh.groupBy("g")
        .agg(F.count_distinct(F.col("doc_id")).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    duppos = sh.join(dupg, "g").select("doc_id", "pos").localCheckpoint(
        eager=False
    )  # feeds both the island count and the coverage count
    w = Window.partitionBy("doc_id").orderBy("pos")
    n_spans = (
        duppos.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .count()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )
    covered = (
        duppos.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (SHINGLE_SIZE - 1))
            ).alias("tok"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("tok")).alias("dup_tokens"))
    )
    toklen = docs.select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    return (
        toklen.join(n_spans, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("bigint")
            .alias("dup_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0))
            .cast("bigint")
            .alias("n_spans"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                    / F.col("n_tokens"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_dup"),
        )
    )


def _curation_verdict_oracle() -> str:
    from asritha_metamorphetl_spark.plans.text_queries import (
        MINHASH_PAIRS_ORACLE,
        SEMDEDUP_NLIST,
        SEMDEDUP_TAU,
        _semdedup_asg_sql,
    )

    return f"""
WITH RECURSIVE
npairs AS ({MINHASH_PAIRS_ORACLE}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM npairs
    UNION
    SELECT doc_b, doc_a FROM npairs
),
reach(src, dst) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
assign AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
{_semdedup_asg_sql(SEMDEDUP_NLIST).lstrip()},
semdropped AS (
    SELECT DISTINCT x.vec_id
    FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id != y.vec_id
    JOIN vecs xv ON xv.vec_id = x.vec_id
    JOIN vecs yv ON yv.vec_id = y.vec_id
    WHERE ROUND(list_cosine_similarity(xv.v, yv.v), 4) >= {SEMDEDUP_TAU}
      AND (y.csim < x.csim OR (y.csim = x.csim AND y.vec_id < x.vec_id))
),
sem AS (
    SELECT asg.vec_id, sd.vec_id IS NULL AS kept
    FROM asg LEFT JOIN semdropped sd ON asg.vec_id = sd.vec_id
),
exact AS (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon
    FROM documents
),
qual AS ({QUALITY_LOGIT_ORACLE}),
verdicts AS (
    SELECT d.doc_id,
           e.canon = d.doc_id AS exact_kept,
           (a.doc_id IS NULL OR a.cluster_id = d.doc_id) AS near_kept,
           COALESCE(s.kept, TRUE) AS sem_kept,
           q.kept AS quality_kept
    FROM documents d
    JOIN exact e ON e.doc_id = d.doc_id
    LEFT JOIN assign a ON a.doc_id = d.doc_id
    LEFT JOIN sem s ON s.vec_id = d.doc_id
    JOIN qual q ON q.doc_id = d.doc_id
)
SELECT doc_id, exact_kept, near_kept, sem_kept, quality_kept,
       exact_kept AND near_kept AND sem_kept AND quality_kept
           AS final_kept,
       CASE WHEN NOT exact_kept THEN 'exact_dup'
            WHEN NOT near_kept THEN 'near_dup'
            WHEN NOT sem_kept THEN 'semantic_dup'
            WHEN NOT quality_kept THEN 'low_quality'
            ELSE 'kept' END AS reason
FROM verdicts
"""


@register("curation_verdict", oracle=_curation_verdict_oracle())
def curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE per-document verdict — what a
    user of this engine actually ships: exact dedup (md5 fingerprint
    groups, min-id survivor), near-dedup (MinHash closure, one keeper
    per cluster), semantic dedup (SemDeDup over the embedding table —
    LEFT join, documents without an embedding pass this stage), and the
    learned quality filter, combined into final_kept with a
    deterministic first-failing-stage reason. The near/semantic/quality
    stages call the SAME operators their standalone queries register
    (pinning composability); the exact stage applies the same min-id
    keep RULE over md5 fingerprint groups directly (the standalone
    ``exact_dup_groups`` reports capped group membership, which a
    per-document verdict doesn't need). The oracle re-assembles the
    verified SQL fragments under one WITH RECURSIVE.

    Scale: the union of the stages' own shapes — nothing new joins at
    row-pair granularity; the four verdict joins are id-keyed.

    The semantic stage reads FINITE-VECTOR-gated embeddings — the
    oracle's ``_semdedup_asg_sql`` fragment has carried the gate since
    the standalone ``semdedup_survivors`` gained it, and a document
    whose vector is degenerate simply passes the semantic stage (LEFT
    join → sem_kept TRUE), exactly like a document with no embedding
    at all."""
    from asritha_metamorphetl_spark.functions.text import fingerprint
    from asritha_metamorphetl_spark.plans.pipeline_queries import (
        near_dup_survivors,
    )

    docs = Catalog(sf_dir).load(spark, "documents")

    w = Window.partitionBy("fp")
    exact = docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("exact_kept"),
    )
    near = near_dup_survivors(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("near_kept")
    )
    from asritha_metamorphetl_spark.plans.fixtures import (
        semdedup_assignment,
    )

    sem = semdedup_assignment(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("kept").alias("sem_raw")
    )
    qual = quality_logit_scores(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("quality_kept")
    )
    out = (
        exact.join(near, "doc_id")
        .join(sem, "doc_id", "left")
        .join(qual, "doc_id")
        .select(
            "doc_id",
            "exact_kept",
            "near_kept",
            F.coalesce(F.col("sem_raw"), F.lit(True)).alias("sem_kept"),
            "quality_kept",
        )
    )
    return out.select(
        "doc_id",
        "exact_kept",
        "near_kept",
        "sem_kept",
        "quality_kept",
        (
            F.col("exact_kept")
            & F.col("near_kept")
            & F.col("sem_kept")
            & F.col("quality_kept")
        ).alias("final_kept"),
        F.when(~F.col("exact_kept"), F.lit("exact_dup"))
        .when(~F.col("near_kept"), F.lit("near_dup"))
        .when(~F.col("sem_kept"), F.lit("semantic_dup"))
        .when(~F.col("quality_kept"), F.lit("low_quality"))
        .otherwise(F.lit("kept"))
        .alias("reason"),
    )


#: Shard count for the registered manifest query. Production sizing is
#: n_shards ≈ corpus_bytes / target_shard_bytes (hundreds of MB per
#: shard); 8 keeps the fixture manifest readable.
N_TRAINING_SHARDS = 8


def _shard_manifest_oracle() -> str:
    bucket = _hex48_sql("md5(CAST(doc_id AS VARCHAR))")
    sig = _hex48_sql("md5(CAST(doc_id AS VARCHAR) || ':' || md5(text))")
    return f"""
WITH assigned AS (
    SELECT doc_id, text,
           {bucket} % {N_TRAINING_SHARDS} AS shard,
           len(list_filter(string_split(text, ' '), x -> x != ''))
               AS n_tokens,
           {sig} AS row_sig
    FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(row_sig) AS BIGINT) AS content_sig
FROM assigned
GROUP BY shard
"""


@register("training_shard_manifest", oracle=_shard_manifest_oracle())
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last step of the pipeline: deterministic sharding of the
    (curated) corpus into training output files, summarized as a
    manifest the writer and every downstream reader can verify against.
    Shard = content-hash bucket of the document id — reruns, engines,
    and cluster sizes all route a document to the same shard, and
    appends never reshuffle existing ones. ``content_sig`` is an
    order-insensitive 48-bit-sum signature over (doc_id, md5(text)) —
    two independently produced shards with the same manifest row carry
    byte-identical document sets (sums of 48-bit values stay exact in
    a long up to ~2^15 docs per shard at fixture scale; production
    manifests chunk the sum — the verification CONTRACT is what's
    under test). Row-local until one N_TRAINING_SHARDS-row aggregate."""
    from asritha_metamorphetl_spark.functions.hashing import shingle_hash
    from asritha_metamorphetl_spark.operators.sampling import hash_bucket

    docs = Catalog(sf_dir).load(spark, "documents")
    sig = shingle_hash(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.md5(F.col("text"))
        )
    )
    return (
        docs.select(
            hash_bucket(F.col("doc_id"), N_TRAINING_SHARDS).alias("shard"),
            T.token_count(F.col("text")).alias("n_tokens"),
            sig.alias("row_sig"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("row_sig").cast("bigint").alias("content_sig"),
        )
    )


def _curated_shard_oracle() -> str:
    bucket = _hex48_sql("md5(CAST(d.doc_id AS VARCHAR))")
    sig = _hex48_sql("md5(CAST(d.doc_id AS VARCHAR) || ':' || md5(d.text))")
    return f"""
WITH verdict AS ({_curation_verdict_oracle()}),
kept AS (SELECT doc_id FROM verdict WHERE final_kept),
assigned AS (
    SELECT d.doc_id,
           {bucket} % {N_TRAINING_SHARDS} AS shard,
           len(list_filter(string_split(d.text, ' '), x -> x != ''))
               AS n_tokens,
           {sig} AS row_sig
    FROM documents d JOIN kept USING (doc_id)
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(row_sig) AS BIGINT) AS content_sig
FROM assigned
GROUP BY shard
"""


@register("curated_shard_manifest", oracle=_curated_shard_oracle())
def curated_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's LAST MILE as one driver-checked query (r6
    directive #5): ``curation_verdict``'s ``final_kept`` survivors fed
    straight into ``training_shard_manifest``'s deterministic sharding
    — curate → shard → verify signature, end to end. Both halves are
    the registered, individually-verified fragments (this module,
    ``curation_verdict`` above and the shard/signature rules of
    ``training_shard_manifest``); the oracle composes their verified
    SQL the same way. Because shard routing is a content hash of
    doc_id, the curated manifest rows are a pure SUBSET aggregate of
    the full-corpus manifest — dropping a document never reshuffles
    the survivors' shard assignment (the append/rerun stability the
    manifest contract promises).

    Scale: the verdict's own shapes (id-keyed joins) + one
    id-equi-join against the kept set + the bounded
    N_TRAINING_SHARDS-row aggregate."""
    from asritha_metamorphetl_spark.functions.hashing import shingle_hash
    from asritha_metamorphetl_spark.operators.sampling import hash_bucket

    docs = Catalog(sf_dir).load(spark, "documents")
    kept = (
        curation_verdict(spark, sf_dir)
        .filter(F.col("final_kept"))
        .select("doc_id")
    )
    sig = shingle_hash(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.md5(F.col("text"))
        )
    )
    return (
        docs.join(kept, "doc_id")
        .select(
            hash_bucket(F.col("doc_id"), N_TRAINING_SHARDS).alias("shard"),
            T.token_count(F.col("text")).alias("n_tokens"),
            sig.alias("row_sig"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("row_sig").cast("bigint").alias("content_sig"),
        )
    )


def merge_manifests(*manifests: DataFrame) -> DataFrame:
    """Merge shard manifests produced over DISJOINT document sets by
    pure addition — counts, token totals, and the order-insensitive
    content signature are all sums, and content-hash routing guarantees
    a document lands in the same shard in every manifest, so
    ``merge(manifest(base), manifest(delta)) == manifest(base ∪ delta)``
    exactly. This is the append path at 100 TB: manifest the new files
    alone (O(delta)) and fold them in, never re-scan the corpus. The
    equality is driver-checked by ``shard_manifest_incremental``."""
    out = manifests[0]
    for m in manifests[1:]:
        out = out.unionByName(m)
    return out.groupBy("shard").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("content_sig").cast("bigint").alias("content_sig"),
    )


#: Deterministic base/delta split for the registered append-proof:
#: every 10th document (doc_id % 10 == 7) arrives "later".
INCR_DELTA_MOD = 10
INCR_DELTA_REM = 7


def _shard_manifest_incremental_oracle() -> str:
    bucket = _hex48_sql("md5(CAST(doc_id AS VARCHAR))")
    sig = _hex48_sql("md5(CAST(doc_id AS VARCHAR) || ':' || md5(text))")
    return f"""
WITH assigned AS (
    SELECT doc_id,
           {bucket} % {N_TRAINING_SHARDS} AS shard,
           len(list_filter(string_split(text, ' '), x -> x != ''))
               AS n_tokens,
           {sig} AS row_sig,
           doc_id % {INCR_DELTA_MOD} = {INCR_DELTA_REM} AS is_delta
    FROM documents
),
part AS (
    SELECT shard, is_delta,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(row_sig) AS BIGINT) AS content_sig
    FROM assigned GROUP BY 1, 2
),
merged AS (
    SELECT shard,
           CAST(SUM(n_docs) AS BIGINT) AS m_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS m_tokens,
           CAST(SUM(content_sig) AS BIGINT) AS m_sig
    FROM part GROUP BY shard
),
full_m AS (
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(row_sig) AS BIGINT) AS content_sig
    FROM assigned GROUP BY shard
)
SELECT f.shard, f.n_docs, f.n_tokens, f.content_sig,
       m.m_docs, m.m_tokens, m.m_sig,
       f.n_docs = m.m_docs AND f.n_tokens = m.m_tokens
           AND f.content_sig = m.m_sig AS append_consistent
FROM full_m f JOIN merged m USING (shard)
"""


@register(
    "shard_manifest_incremental",
    oracle=_shard_manifest_incremental_oracle(),
)
def shard_manifest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest APPEND contract as a driver-checked equality:
    manifest the base and the late-arriving delta separately, fold them
    with ``merge_manifests`` (pure per-shard addition — the O(delta)
    append path), and compare against the manifest of the full corpus.
    ``append_consistent`` must be TRUE on every shard; the oracle
    recomputes both sides independently, so a regression in routing,
    tokenization, or the signature algebra (e.g. a merge that
    re-hashed instead of summing) goes red in CORRECTNESS."""

    def _manifest(docs: DataFrame) -> DataFrame:
        from asritha_metamorphetl_spark.functions.hashing import shingle_hash
        from asritha_metamorphetl_spark.operators.sampling import hash_bucket

        sig = shingle_hash(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.md5(F.col("text"))
            )
        )
        return (
            docs.select(
                hash_bucket(F.col("doc_id"), N_TRAINING_SHARDS).alias("shard"),
                T.token_count(F.col("text")).alias("n_tokens"),
                sig.alias("row_sig"),
            )
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                F.sum("row_sig").cast("bigint").alias("content_sig"),
            )
        )

    docs = Catalog(sf_dir).load(spark, "documents")
    is_delta = F.col("doc_id") % INCR_DELTA_MOD == INCR_DELTA_REM
    merged = merge_manifests(
        _manifest(docs.filter(~is_delta)), _manifest(docs.filter(is_delta))
    ).select(
        "shard",
        F.col("n_docs").alias("m_docs"),
        F.col("n_tokens").alias("m_tokens"),
        F.col("content_sig").alias("m_sig"),
    )
    full_m = _manifest(docs)
    return full_m.join(merged, "shard").select(
        "shard",
        "n_docs",
        "n_tokens",
        "content_sig",
        "m_docs",
        "m_tokens",
        "m_sig",
        (
            (F.col("n_docs") == F.col("m_docs"))
            & (F.col("n_tokens") == F.col("m_tokens"))
            & (F.col("content_sig") == F.col("m_sig"))
        ).alias("append_consistent"),
    )


#: PSI knobs: 10 equal-width score bins on [0,1) (the quality sigmoid's
#: range — fixed-width bins are scale-free and exactly SQL-replayable,
#: unlike base-distribution deciles which would need exact global
#: quantiles), Laplace-style smoothing so empty bins contribute finite
#: terms, snapshots = even/odd doc ids (a deterministic stand-in for
#: two ingest dates).
PSI_BINS = 10
PSI_SMOOTH = 0.5


@register(
    "quality_drift_psi",
    oracle=f"""
WITH qual AS ({QUALITY_LOGIT_ORACLE}),
slices AS (
    SELECT doc_id, score,
           LEAST(CAST(FLOOR(score * {PSI_BINS}) AS INT), {PSI_BINS - 1})
               AS bin,
           doc_id % 2 = 0 AS in_a
    FROM qual
),
bins AS (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin),
counts AS (
    SELECT b.bin,
           COALESCE(SUM(CASE WHEN s.in_a THEN 1 END), 0) AS n_a,
           COALESCE(SUM(CASE WHEN NOT s.in_a THEN 1 END), 0) AS n_b
    FROM bins b LEFT JOIN slices s ON s.bin = b.bin
    GROUP BY b.bin
),
tot AS (
    SELECT SUM(n_a)::DOUBLE AS ta, SUM(n_b)::DOUBLE AS tb FROM counts
)
SELECT c.bin,
       CAST(c.n_a AS BIGINT) AS n_a,
       CAST(c.n_b AS BIGINT) AS n_b,
       ROUND((c.n_a + {PSI_SMOOTH}) / (t.ta + {PSI_SMOOTH * PSI_BINS}), 6)
           AS p_a,
       ROUND((c.n_b + {PSI_SMOOTH}) / (t.tb + {PSI_SMOOTH * PSI_BINS}), 6)
           AS p_b,
       ROUND(((c.n_a + {PSI_SMOOTH}) / (t.ta + {PSI_SMOOTH * PSI_BINS})
              - (c.n_b + {PSI_SMOOTH}) / (t.tb + {PSI_SMOOTH * PSI_BINS}))
             * ln(((c.n_a + {PSI_SMOOTH}) / (t.ta + {PSI_SMOOTH * PSI_BINS}))
                  / ((c.n_b + {PSI_SMOOTH})
                     / (t.tb + {PSI_SMOOTH * PSI_BINS}))), 6) AS psi_term
FROM counts c CROSS JOIN tot t
""",
)
def quality_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift telemetry for the data-quality ops loop: the
    population stability index of the learned quality score between two
    corpus snapshots (even vs odd doc ids — a deterministic stand-in
    for consecutive ingest dates), per fixed-width score bin. PSI is
    THE monitoring statistic for 'did my corpus quietly change shape':
    Σ (p_a − p_b)·ln(p_a/p_b), > 0.2 conventionally flagging action.
    Smoothed so empty bins stay finite; every arithmetic step rounded
    so the oracle replays it. Scale shape: the quality scorer's own
    scan + one 10-row aggregate — nothing new shuffles."""
    qual = quality_logit_scores(spark, sf_dir).select("doc_id", "score")
    binned = qual.select(
        F.least(
            F.floor(F.col("score") * PSI_BINS).cast("int"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
        (F.col("doc_id") % 2 == 0).alias("in_a"),
    )
    bins = spark.range(PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    counts = (
        bins.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("in_a"), 1)), F.lit(0)
            ).alias("n_a"),
            F.coalesce(
                F.sum(F.when(~F.col("in_a"), 1)), F.lit(0)
            ).alias("n_b"),
        )
    )
    tot = counts.agg(
        F.sum("n_a").cast("double").alias("ta"),
        F.sum("n_b").cast("double").alias("tb"),
    )
    sm = float(PSI_SMOOTH)
    smn = float(PSI_SMOOTH * PSI_BINS)
    pa = (F.col("n_a") + F.lit(sm)) / (F.col("ta") + F.lit(smn))
    pb = (F.col("n_b") + F.lit(sm)) / (F.col("tb") + F.lit(smn))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# Quality-weighted importance sampling: keep each document with
# probability equal to its LEARNED quality score, made deterministic by
# comparing the score against a content-hash uniform variate instead of
# an RNG — the same decision for a given document on every run, every
# engine, every cluster size (the DCLM-style soft quality filter, but
# reproducible and oracle-checkable). Hard thresholding (kept = score
# >= 0.5) throws away the entire mid-quality mass; soft sampling keeps
# it in proportion, which is what a data-constrained pretraining mix
# actually wants.
# ---------------------------------------------------------------------------

#: Salt for the per-document uniform variate — decorrelates the keep
#: decision from every other doc_id-hash use (splits, shard routing).
IMPORTANCE_SALT = "imp:"
#: Resolution of the hash-uniform variate (u = h % 1e6 / 1e6).
IMPORTANCE_RES = 1_000_000


@register(
    "quality_importance_sample",
    oracle=f"""
WITH qscored AS ({QUALITY_LOGIT_ORACLE}),
samp AS (
    SELECT q.doc_id, d.source, q.score,
           ({_hex48_sql(f"md5('{IMPORTANCE_SALT}' || CAST(q.doc_id AS VARCHAR))")}
            % {IMPORTANCE_RES}) / {IMPORTANCE_RES}.0 AS u,
           len(list_filter(string_split(d.text, ' '), x -> x != ''))
               AS toks
    FROM qscored q JOIN documents d ON q.doc_id = d.doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN u < score THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN u < score THEN toks ELSE 0 END) AS BIGINT)
           AS kept_tokens,
       ROUND(SUM(CASE WHEN u < score THEN score ELSE 0 END), 6)
           AS kept_score_mass
FROM samp
GROUP BY source
""",
)
def quality_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft quality filter: P(keep) = quality score, decided by
    ``hash48(salt || doc_id) % 1e6 / 1e6 < score``. The score side is
    the registered quality_logit_scores frame (row-local features + one
    broadcast weights join); the variate is one more row-local hash —
    the whole sample is a full scan with zero added shuffles beyond the
    final O(sources) rollup, and re-running it anywhere reproduces the
    identical kept set. The score is rounded (6 dp) before the
    comparison and the variate is an exact millionth, so the keep
    boundary is engine-stable."""
    from asritha_metamorphetl_spark.functions.hashing import shingle_hash

    docs = Catalog(sf_dir).load(spark, "documents")
    scored = quality_logit_scores(spark, sf_dir).select("doc_id", "score")
    u = (
        shingle_hash(
            F.concat(F.lit(IMPORTANCE_SALT), F.col("doc_id").cast("string"))
        )
        % IMPORTANCE_RES
    ) / F.lit(float(IMPORTANCE_RES))
    samp = (
        docs.select("doc_id", "source", T.token_count(F.col("text")).alias("toks"))
        .join(scored, "doc_id")
        .withColumn("u", u)
    )
    kept = F.col("u") < F.col("score")
    return samp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("toks")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.round(F.sum(F.when(kept, F.col("score")).otherwise(0.0)), 6)
        .alias("kept_score_mass"),
    )


#: deterministic weighted-sample knobs, shared with the oracle SQL
ES_SAMPLE_SALT = "es:"
ES_SAMPLE_K = 200


@register(
    "quality_weighted_sample",
    oracle=f"""
WITH qscored AS ({QUALITY_LOGIT_ORACLE}),
keyed AS (
    SELECT doc_id, lang, score,
           ROUND(
             LN((({_hex48_sql(f"md5('{ES_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR))")}
                  % 1000000) + 1) / 1000000.0) / score,
             6
           ) AS es_key
    FROM qscored
)
SELECT doc_id, lang, score, es_key
FROM keyed
ORDER BY es_key DESC, doc_id
LIMIT {ES_SAMPLE_K}
""",
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement, weights = the
    learned quality score: the Efraimidis–Spirakis key u^(1/w) —
    replayed as ln(u)/w with a content-hash millionth for u — makes
    the k best keys a faithful weighted sample, reproducible on any
    engine at any cluster size (operators/sampling.py). Unlike the
    soft filter (quality_importance_sample), this yields an EXACT
    sample size k: the shape for "give me exactly 10M quality-biased
    documents". The plan is the quality-score fragment (row-local
    features + one broadcast weights join) plus a row-local key and a
    TakeOrderedAndProject top-k — no global sort, O(k) per task."""
    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    scored = quality_logit_scores(spark, sf_dir).select(
        "doc_id", "lang", "score"
    )
    return weighted_sample_without_replacement(
        scored, "score", "doc_id", ES_SAMPLE_K, salt=ES_SAMPLE_SALT
    )


#: per-group quota, shared with the oracle SQL
ES_GROUP_K = 50


@register(
    "per_source_weighted_sample",
    oracle=f"""
WITH qscored AS ({QUALITY_LOGIT_ORACLE}),
keyed AS (
    SELECT d.source, q.doc_id, q.score,
           ROUND(
             LN((({_hex48_sql(f"md5('{ES_SAMPLE_SALT}' || CAST(q.doc_id AS VARCHAR))")}
                  % 1000000) + 1) / 1000000.0) / q.score,
             6
           ) AS es_key
    FROM qscored q JOIN documents d ON q.doc_id = d.doc_id
)
SELECT source, doc_id, score, es_key
FROM keyed
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY es_key DESC, doc_id
) <= {ES_GROUP_K}
""",
)
def per_source_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 50 quality-weighted documents from EVERY source — the
    per-group quota variant of quality_weighted_sample
    (operators/sampling.weighted_sample_per_group). Same
    Efraimidis–Spirakis content-hash key (same salt, so the per-group
    quotas are consistent subsamples of the global ranking); the only
    shuffle is on source over the narrow (source, doc_id, score)
    projection, and the per-group rank is a row_number window — no
    global sort, no cross-group state."""
    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    scored = quality_logit_scores(spark, sf_dir).select("doc_id", "score")
    narrow = docs.select("doc_id", "source").join(scored, "doc_id")
    return weighted_sample_per_group(
        narrow, "source", "score", "doc_id", ES_GROUP_K,
        salt=ES_SAMPLE_SALT,
    ).select("source", "doc_id", "score", "es_key")


@register(
    "quality_score_percentiles",
    oracle=f"""
WITH qscored AS ({QUALITY_LOGIT_ORACLE})
SELECT doc_id, lang, score,
       ROUND(PERCENT_RANK() OVER (
           PARTITION BY lang ORDER BY score ASC), 6) AS score_pct
FROM qscored
""",
)
def quality_score_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document's quality score as a PERCENTILE within its
    language — the per-group normalization that makes one threshold
    mean the same thing across languages with different score
    distributions. Uses operators/ranks.grouped_percent_rank: the
    rank is computed over the collapsed (lang, score, count) frame
    with windows partitioned BY LANGUAGE — no single-partition stage
    for any cardinality (strictly better than the global variant's
    bounded one); the corpus itself never shuffles, meeting the tiny
    rank map in an AQE-broadcast equi-join on (lang, score)."""
    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_percent_rank,
    )

    scored = quality_logit_scores(spark, sf_dir).select(
        "doc_id", "lang", "score"
    )
    ranked = grouped_percent_rank(
        scored, ["lang"], F.col("score"), out_col="__pct"
    )
    return ranked.select(
        "doc_id",
        "lang",
        "score",
        F.round(F.col("__pct"), 6).alias("score_pct"),
    )
