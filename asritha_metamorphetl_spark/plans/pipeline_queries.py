"""Training-data pipeline queries: as-of join, duplicate clusters,
PII scrubbing, split contamination, stratified sampling.

These extend the reference's operator surface with the operations a
large-scale training-data pipeline needs (see README extensions):
temporal point-in-time joins, pair→cluster dedup closure, text
scrubbing, and reproducible curation sampling. Every query pairs with a
DuckDB oracle (the as-of oracle uses DuckDB's native ASOF JOIN, the
cluster oracle a recursive transitive closure — both independent
re-derivations, not re-implementations, of the Spark plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators import dedup as D
from asritha_metamorphetl_spark.operators.graph import connected_components
from asritha_metamorphetl_spark.operators.sampling import stratified_sample
from asritha_metamorphetl_spark.operators.temporal import as_of_join
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.plans.text_queries import (
    MINHASH_PAIRS_ORACLE,
    _hex48_sql,
)
from asritha_metamorphetl_spark.sources.files import Catalog

# ---------------------------------------------------------------------------
# As-of (point-in-time) join: each view event gets the user's most recent
# purchase at or before it. Timestamps are compared as epoch seconds so
# the match is integer-exact across engines (sub-second parquet precision
# differs between Spark's nanos→micros read and DuckDB's native nanos).
# ---------------------------------------------------------------------------


@register(
    "view_purchase_asof",
    oracle="""
WITH views AS (
    SELECT event_id, user_id,
           CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS ts_sec
    FROM events WHERE event_type = 'view'
),
purch AS (
    SELECT user_id,
           CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS ts_sec,
           MAX(event_id) AS purchase_event,
           MAX(value) AS purchase_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1, 2
)
SELECT v.user_id, v.event_id, p.purchase_event,
       v.ts_sec - p.ts_sec AS secs_since_purchase,
       p.purchase_value
FROM views v
ASOF LEFT JOIN purch p
    ON v.user_id = p.user_id AND v.ts_sec >= p.ts_sec
""",
)
def view_purchase_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment (operators/temporal.py): one exchange on
    user_id + one sort — no range explosion. The right side is
    pre-aggregated to one row per (user, second) so ties are a total
    order (see as_of_join's determinism contract)."""
    ev = Catalog(sf_dir).load(spark, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_sec")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_timestamp("ts").alias("ts_sec"))
        .agg(
            F.max("event_id").alias("purchase_event"),
            F.max("value").alias("purchase_value"),
        )
    )
    joined = as_of_join(
        views,
        purch,
        on=["user_id"],
        left_ts="ts_sec",
        value_cols=["purchase_event", "purchase_value"],
        matched_ts_col="_purch_sec",
    )
    return joined.select(
        "user_id",
        "event_id",
        "purchase_event",
        (F.col("ts_sec") - F.col("_purch_sec")).alias("secs_since_purchase"),
        "purchase_value",
    )


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over the MinHash-LSH pair graph.
# The oracle re-derives components as a recursive transitive closure with
# MIN-label aggregation — a completely different algorithm that must land
# on the identical labeling.
# ---------------------------------------------------------------------------


@register(
    "dup_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
assign AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM assign
""",
)
def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair→cluster closure (operators/graph.py): min-label propagation,
    one shuffle join per round, lineage truncated per round. Cluster id =
    minimum doc_id of the component (the canonical keeper in
    keep-one-per-cluster dedup). The closure itself is this query's
    operator demo and stays inline; the pair FRONT END reads the shared
    session materialization (plans/fixtures.py)."""
    from asritha_metamorphetl_spark.plans.fixtures import minhash_pairs

    pairs = minhash_pairs(spark, sf_dir)
    labels = connected_components(pairs, "doc_a", "doc_b")
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    ).withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
    )


# ---------------------------------------------------------------------------
# PII / entity scrubbing profile. Row-local regex work — pure JVM
# expressions, no shuffle at all; the signature column proves the scrub
# output byte-identical across engines without shipping the text.
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_ENTITY_RE = r"\b(customer|supplier|part)\b"


@register(
    "pii_scrub_profile",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{_ENTITY_RE}')) AS BIGINT)
           AS n_entity_terms,
       md5(regexp_replace(
               regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_ENTITY_RE}', '[ENTITY]', 'g')) AS scrub_sig
FROM documents
""",
)
def pii_scrub_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass over the corpus: count email-shaped strings and
    dictionary entity terms, emit the md5 of the scrubbed text. Patterns
    stay in the Java∩RE2 common regex subset so both engines match the
    same spans (DuckDB needs the 'g' flag for global replace; Spark
    replaces all occurrences by default)."""
    docs = Catalog(sf_dir).load(spark, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"),
        _ENTITY_RE,
        "[ENTITY]",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_ENTITY_RE), 0))
        .cast("bigint")
        .alias("n_entity_terms"),
        F.md5(scrubbed).alias("scrub_sig"),
    )


# ---------------------------------------------------------------------------
# Train/test contamination: near-dup pairs that straddle split boundaries.
# The pair frame is tiny relative to the corpus, so both split joins
# shuffle only candidate ids, never text.
# ---------------------------------------------------------------------------

_SPLIT_ASSIGN_SQL = f"""
    SELECT doc_id,
           CASE WHEN bucket <= 7 THEN 'train'
                WHEN bucket = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 {_hex48_sql("md5(CAST(doc_id AS VARCHAR))")} % 10 AS bucket
          FROM documents)
"""


@register(
    "cross_split_contamination",
    oracle=f"""
WITH pairs AS ({MINHASH_PAIRS_ORACLE}),
assigned AS ({_SPLIT_ASSIGN_SQL})
SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b
FROM pairs p
JOIN assigned sa ON p.doc_a = sa.doc_id
JOIN assigned sb ON p.doc_b = sb.doc_id
WHERE sa.split <> sb.split
""",
)
def cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage check: near-duplicate pairs whose members landed
    in different train/val/test splits (same 80/10/10 content-hash split
    as corpus_splits). Any hit means an eval document has a near-twin in
    training data — the canonical contamination audit before a training
    run."""
    from asritha_metamorphetl_spark.operators.sampling import hash_bucket

    docs = Catalog(sf_dir).load(spark, "documents")
    bucket = hash_bucket(F.col("doc_id"), 10)
    splits = docs.select(
        "doc_id",
        F.when(bucket <= 7, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
    from asritha_metamorphetl_spark.plans.fixtures import minhash_pairs

    pairs = minhash_pairs(spark, sf_dir)
    return (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
            ),
            "doc_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
            ),
            "doc_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
    )


# ---------------------------------------------------------------------------
# Stratified sampling: reproducible per-class downsampling.
# ---------------------------------------------------------------------------


@register(
    "stratified_label_sample",
    oracle=f"""
SELECT vec_id, label
FROM embeddings
WHERE {_hex48_sql("md5(CAST(vec_id AS VARCHAR))")} % 100
      < CASE WHEN label <= 4 THEN 20 ELSE 50 END
""",
)
def stratified_label_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class rebalancing (operators/sampling.py): keep 20%
    of labels 0-4 and 50% of the rest, selected by stable id-hash bucket
    — rerunning, repartitioning, or growing the table never changes
    which existing rows are kept."""
    emb = Catalog(sf_dir).load(spark, "embeddings")
    sampled = stratified_sample(
        emb, "label", "vec_id", {lbl: 20 for lbl in range(5)}, default_pct=50
    )
    return sampled.select("vec_id", "label")


# ---------------------------------------------------------------------------
# Cross-source duplication matrix: where near-duplicate mass concentrates
# (intra-source boilerplate vs cross-source scraping overlap) — the
# curation view that decides which source pair gets deduped first.
# ---------------------------------------------------------------------------


@register(
    "source_overlap_matrix",
    oracle=f"""
WITH pairs AS ({MINHASH_PAIRS_ORACLE})
SELECT LEAST(da.source, db.source) AS source_x,
       GREATEST(da.source, db.source) AS source_y,
       COUNT(*) AS n_dup_pairs
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY 1, 2
""",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair counts per unordered source pair. The pair frame is
    the MinHash-LSH candidate set (banded, never all-pairs); the two
    source lookups are broadcastable narrow projections of documents,
    and the unordered (x, y) key makes the matrix triangular."""
    from asritha_metamorphetl_spark.plans.fixtures import minhash_pairs

    docs = Catalog(sf_dir).load(spark, "documents")
    pairs = minhash_pairs(spark, sf_dir)
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    b = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


@register(
    "near_dup_survivors",
    oracle=f"""
WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
assign AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id,
       COALESCE(a.cluster_id, d.doc_id) AS cluster_id,
       a.doc_id IS NULL OR a.cluster_id = d.doc_id AS kept
FROM documents d LEFT JOIN assign a ON a.doc_id = d.doc_id
""",
)
def near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end of the near-dup pipeline: candidates (MinHash-LSH bands)
    → transitive closure (min-label connected components) → ONE
    surviving document per duplicate cluster. Keep rule is fully
    deterministic: the cluster's minimum doc_id survives (it IS the
    min-label cluster id), every other member is dropped, and documents
    in no cluster pass through kept — one left join over the corpus, so
    the output covers EVERY document with a keep/drop verdict, which is
    what a curation job actually consumes downstream."""
    from asritha_metamorphetl_spark.plans.fixtures import (
        minhash_cluster_labels,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    labels = minhash_cluster_labels(spark, sf_dir).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    return docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        (
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col("doc_id"))
        ).alias("kept"),
    )


def _best_keeper_oracle() -> str:
    from asritha_metamorphetl_spark.plans.passage_queries import (
        QUALITY_LOGIT_ORACLE,
    )

    return f"""
WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
assign AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
qual AS ({QUALITY_LOGIT_ORACLE}),
member AS (
    SELECT d.doc_id, COALESCE(a.cluster_id, d.doc_id) AS cluster_id, q.score
    FROM documents d
    LEFT JOIN assign a ON a.doc_id = d.doc_id
    JOIN qual q ON q.doc_id = d.doc_id
)
SELECT doc_id, cluster_id, score,
       ROW_NUMBER() OVER (PARTITION BY cluster_id
           ORDER BY score DESC, doc_id ASC) = 1 AS kept
FROM member
"""


@register("near_dup_best_keeper", oracle=_best_keeper_oracle())
def near_dup_best_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: inside each near-dup cluster,
    keep the member the LEARNED quality filter scores highest (rounded
    score, doc id tiebreak) instead of the arbitrary min-id — the rule
    a production curation pipeline actually wants, since template
    families usually contain one clean original and many degraded
    copies. Composes the two registered, individually-verified stages:
    the MinHash closure (``dup_clusters``'s connected components) and
    ``quality_logit_scores``; singleton documents are their own keeper.
    Shapes: the quality join is id-keyed; the keeper choice is one
    window partitioned by cluster_id (bounded by cluster size, the
    same bound ``dup_clusters`` already carries)."""
    from asritha_metamorphetl_spark.plans.passage_queries import (
        quality_logit_scores,
    )

    from asritha_metamorphetl_spark.plans.fixtures import (
        minhash_cluster_labels,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    labels = minhash_cluster_labels(spark, sf_dir).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    qual = quality_logit_scores(spark, sf_dir).select("doc_id", "score")
    member = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
        )
        .join(qual, "doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return member.select(
        "doc_id",
        "cluster_id",
        "score",
        (F.row_number().over(w) == 1).alias("kept"),
    )


@register(
    "eval_ngram_contamination",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
shingled AS (
    SELECT doc_id,
           list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
    FROM toks
),
split AS (
    SELECT doc_id,
           {_hex48_sql("md5(CAST(doc_id AS VARCHAR))")} % 10 AS bucket
    FROM documents
),
ev AS (
    SELECT sh.doc_id, unnest(sh.s) AS gr
    FROM shingled sh JOIN split sp USING (doc_id)
    WHERE sp.bucket >= 8 AND len(sh.s) > 0
),
tr AS (
    SELECT DISTINCT unnest(sh.s) AS gr
    FROM shingled sh JOIN split sp USING (doc_id)
    WHERE sp.bucket <= 7 AND len(sh.s) > 0
),
evn AS (SELECT doc_id, COUNT(*) AS n_grams FROM ev GROUP BY 1),
hits AS (
    SELECT e.doc_id, COUNT(*) AS n_hit
    FROM ev e JOIN tr t ON e.gr = t.gr GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(n.n_grams, 0) AS n_grams,
       COALESCE(h.n_hit, 0) AS n_contaminated,
       CASE WHEN COALESCE(n.n_grams, 0) > 0
            THEN ROUND(COALESCE(h.n_hit, 0)::DOUBLE / n.n_grams, 6)
            ELSE 0.0 END AS contamination_rate,
       COALESCE(h.n_hit, 0) > 0 AS contaminated
FROM documents d
JOIN split sp ON sp.doc_id = d.doc_id
LEFT JOIN evn n ON n.doc_id = d.doc_id
LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE sp.bucket >= 8
""",
)
def eval_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level benchmark decontamination
    (operators/dedup.py:cross_corpus_contamination): for every document
    in the held-out splits (the val/test buckets of the REGISTERED
    corpus_splits rule), how many of its contiguous 3-grams also occur
    anywhere in the train split — the k-gram overlap audit run before
    trusting eval numbers, catching the partial quote/paraphrase
    leakage that whole-document contamination
    (``cross_split_contamination``) misses. The eval gram set
    broadcasts into the train-side scan, so the train corpus never
    shuffles."""
    from asritha_metamorphetl_spark.functions.hashing import shingle_hash
    from asritha_metamorphetl_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    bucket = shingle_hash(F.col("doc_id").cast("string")) % 10
    train = docs.filter(bucket <= 7)
    eval_df = docs.filter(bucket >= 8)
    return cross_corpus_contamination(train, eval_df, "text", "doc_id")


@register(
    "normalized_dup_gain",
    oracle="""
WITH norm AS (
    SELECT doc_id,
           md5(text) AS raw_fp,
           md5(array_to_string(
               list_filter(
                   string_split(
                       regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                       ' '),
                   x -> x != ''), ' ')) AS norm_fp
    FROM documents
),
raw_g AS (
    SELECT raw_fp FROM norm GROUP BY raw_fp HAVING COUNT(*) >= 2
),
norm_g AS (
    SELECT norm_fp FROM norm GROUP BY norm_fp HAVING COUNT(*) >= 2
)
SELECT
    (SELECT COUNT(*) FROM norm)::BIGINT AS n_docs,
    (SELECT COUNT(*) FROM norm n JOIN raw_g r ON n.raw_fp = r.raw_fp)::BIGINT
        AS raw_dup_docs,
    (SELECT COUNT(*) FROM norm n JOIN norm_g g ON n.norm_fp = g.norm_fp)::BIGINT
        AS norm_dup_docs,
    ((SELECT COUNT(*) FROM norm n JOIN norm_g g ON n.norm_fp = g.norm_fp)
     - (SELECT COUNT(*) FROM norm n JOIN raw_g r ON n.raw_fp = r.raw_fp)
    )::BIGINT AS extra_dup_docs
""",
)
def normalized_dup_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many MORE duplicate documents normalization-aware exact
    dedup finds: fingerprint the raw text and a canonical form
    (lowercase, punctuation stripped, whitespace collapsed) and count
    docs in >=2-member groups under each. Casing/punctuation variants
    of boilerplate are the most common exact-dedup misses in web
    corpora; this query is the audit that says whether the canonical
    pass is worth running. Row-local projections + two fingerprint
    hash aggregates — the same shape as exact dedup itself."""
    docs = Catalog(sf_dir).load(spark, "documents")
    norm_text = F.concat_ws(
        " ",
        F.filter(
            F.split(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
                " ",
            ),
            lambda t: t != "",
        ),
    )
    fps = docs.select(
        F.md5(F.col("text")).alias("raw_fp"),
        F.md5(norm_text).alias("norm_fp"),
    ).localCheckpoint(eager=False)  # three consumers below, one scan
    raw_dups = (
        fps.groupBy("raw_fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("raw_dup_docs"))
    )
    norm_dups = (
        fps.groupBy("norm_fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("norm_dup_docs"))
    )
    n_docs = fps.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        n_docs.crossJoin(raw_dups)
        .crossJoin(norm_dups)
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("raw_dup_docs").cast("bigint").alias("raw_dup_docs"),
            F.col("norm_dup_docs").cast("bigint").alias("norm_dup_docs"),
            (F.col("norm_dup_docs") - F.col("raw_dup_docs"))
            .cast("bigint")
            .alias("extra_dup_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-free splits: train/val/test routing at CLUSTER granularity.
# corpus_splits hashes each doc_id independently, which is exactly how
# benchmark leakage happens — two near-duplicate documents hash to
# different splits and the eval set contains a paraphrase of a training
# document. Routing by the near-dup CLUSTER id (min doc of the MinHash
# component; singletons are their own cluster) makes cross-split leakage
# structurally impossible — and the query still COMPUTES the cross-split
# pair count so the guarantee is a driver-checked zero, not an assertion
# in prose. The oracle re-derives the clusters as a recursive transitive
# closure (dup_clusters' independent algorithm), then routes and counts
# leaks the same way.
# ---------------------------------------------------------------------------


@register(
    "leakage_free_splits",
    oracle=f"""
WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
assign AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
routed AS (
    SELECT d.doc_id,
           COALESCE(a.cluster_id, d.doc_id) AS cluster_id,
           {_hex48_sql("md5(CAST(COALESCE(a.cluster_id, d.doc_id) AS VARCHAR))")}
               % 10 AS bucket
    FROM documents d LEFT JOIN assign a ON d.doc_id = a.doc_id
),
labeled AS (
    SELECT doc_id, cluster_id,
           CASE WHEN bucket <= 7 THEN 'train'
                WHEN bucket = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM routed
),
leaks AS (
    SELECT COUNT(*) AS leaked_pairs
    FROM pairs p
    JOIN labeled la ON p.doc_a = la.doc_id
    JOIN labeled lb ON p.doc_b = lb.doc_id
    WHERE la.split <> lb.split
)
SELECT split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT cluster_id) AS n_clusters,
       (SELECT CAST(leaked_pairs AS BIGINT) FROM leaks) AS leaked_pairs
FROM labeled
GROUP BY split
""",
)
def leakage_free_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware 80/10/10 splits: near-dup closure (MinHash pairs →
    min-label connected components), singletons self-clustered, the
    SPLIT hash taken over the cluster id so every member of a component
    lands in the same split. The leak count is recomputed from the pair
    list (two id-equi-joins against the assignment) rather than trusted
    — the oracle must agree it is zero.

    Scale shape: the component closure is the audited dup_clusters
    machinery (one shuffle join per round, rounds ~ log(diameter));
    routing is a row-local hash over O(corpus) rows; the leak audit
    joins the O(pairs) frame to the assignment by id twice. Nothing is
    pair-quadratic; no window spans the corpus."""
    from asritha_metamorphetl_spark.functions.hashing import shingle_hash

    from asritha_metamorphetl_spark.plans.fixtures import (
        minhash_cluster_labels,
        minhash_pairs,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    pairs = minhash_pairs(spark, sf_dir)
    labels = minhash_cluster_labels(spark, sf_dir).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    assigned = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    bucket = shingle_hash(F.col("cluster_id").cast("string")) % 10
    labeled = assigned.withColumn(
        "split",
        F.when(bucket <= 7, "train").when(bucket == 8, "val").otherwise("test"),
    )
    leaks = (
        pairs.join(
            labeled.select(F.col("doc_id").alias("doc_a"),
                           F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            labeled.select(F.col("doc_id").alias("doc_b"),
                           F.col("split").alias("split_b")),
            "doc_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("leaked_pairs"))
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leaks))
    )


def _quality_dup_calibration_oracle() -> str:
    from asritha_metamorphetl_spark.plans.passage_queries import (
        QUALITY_LOGIT_ORACLE,
    )

    return f"""
WITH qscored AS ({QUALITY_LOGIT_ORACLE}),
pairs AS ({MINHASH_PAIRS_ORACLE}),
dup_ids AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL
        SELECT doc_b AS doc_id FROM pairs
    )
),
bucketed AS (
    SELECT LEAST(CAST(FLOOR(q.score * 10) AS INT), 9) AS score_decile,
           (d.doc_id IS NOT NULL) AS is_dup
    FROM qscored q LEFT JOIN dup_ids d ON q.doc_id = d.doc_id
)
SELECT score_decile,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       ROUND(CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_rate
FROM bucketed GROUP BY score_decile
"""


@register(
    "quality_vs_dup_calibration",
    oracle=_quality_dup_calibration_oracle(),
)
def quality_vs_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-signal diagnostic: does the learned quality filter's score
    correlate with near-duplication? Buckets every document by a
    ROW-LOCAL score decile (floor(score·10), capped at 9 — no rank
    window over the corpus) and reports the share of documents in each
    bucket that participate in at least one MinHash near-dup pair.
    Both inputs are the already-verified fragments
    (quality_logit_scores; minhash_lsh_pairs) joined by doc id; the
    dup-membership frame is a bounded distinct-id set. The answer a
    curation team calibrates thresholds with: if low-quality buckets
    are ALSO the duplicated ones, the two filters overlap and the
    combined kill rate is not the sum."""
    from asritha_metamorphetl_spark.plans.passage_queries import (
        quality_logit_scores,
    )

    from asritha_metamorphetl_spark.plans.fixtures import minhash_pairs

    scored = quality_logit_scores(spark, sf_dir).select("doc_id", "score")
    pairs = minhash_pairs(spark, sf_dir)
    dup_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    bucketed = scored.join(dup_ids, "doc_id", "left").select(
        F.least(F.floor(F.col("score") * 10), F.lit(9))
        .cast("int")
        .alias("score_decile"),
        F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
    )
    return bucketed.groupBy("score_decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_dup").cast("int")).cast("bigint").alias("n_dup"),
        F.round(
            F.sum(F.col("is_dup").cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )
