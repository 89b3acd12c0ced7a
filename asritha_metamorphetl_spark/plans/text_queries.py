"""Training-data-pipeline queries over documents + embeddings: text
analysis, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), and
similarity search. Each has an exact DuckDB oracle built from the same
portable primitives (md5, list lambdas, integer math) — hash parity was
spiked cell-for-cell before these were registered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions import text as T
from asritha_metamorphetl_spark.operators import dedup as D
from asritha_metamorphetl_spark.operators.similarity import (
    brute_force_topk,
    finite_vec_where,
    finite_vectors,
    lsh_bucketed_topk,
)
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

_STOPLIST_SQL = "(" + ",".join(f"'{w}'" for w in T.EN_STOPWORDS) + ")"

#: DuckDB CTE producing (doc_id, t tokens, s shingles) — shared by oracles.
_SHINGLE_CTE = """
toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
shingled AS (
    SELECT doc_id,
           list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS s
    FROM toks
)
"""


# ---------------------------------------------------------------------------
# Text analysis: token/char counts, stopword ratio, language id, quality
# ---------------------------------------------------------------------------


@register(
    "doc_text_stats",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, text,
           list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
)
SELECT
    doc_id,
    len(t) AS n_tokens,
    length(text) AS n_chars,
    CASE WHEN len(t) > 0
         THEN CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
         ELSE 0.0 END AS avg_token_len,
    CASE WHEN len(t) > 0
         THEN CAST(len(list_filter(t, x -> x IN {_STOPLIST_SQL})) AS DOUBLE) / len(t)
         ELSE 0.0 END AS stopword_ratio,
    md5(text) AS fingerprint
FROM toks
""",
)
def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local text enrichment — runs entirely inside the scan stage."""
    docs = Catalog(sf_dir).load(spark, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(c).alias("n_tokens"),
        T.char_count(c).alias("n_chars"),
        T.avg_token_length(c).alias("avg_token_len"),
        T.stopword_ratio(c).alias("stopword_ratio"),
        T.fingerprint(c).alias("fingerprint"),
    )


@register(
    "doc_language_counts",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
scored AS (
    SELECT doc_id,
        CASE WHEN len(t) > 0
             AND CAST(len(list_filter(t, x -> x IN {_STOPLIST_SQL})) AS DOUBLE)
                 / len(t) >= 0.03
             THEN 'en' ELSE 'unk' END AS lang_pred
    FROM toks
)
SELECT lang_pred, COUNT(*) AS n_docs
FROM scored
GROUP BY lang_pred
""",
)
def doc_language_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(sf_dir).load(spark, "documents")
    return (
        docs.select(T.language_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


#: Mirror of operators.dedup.exact_duplicates member_cap default.
_DUP_MEMBER_CAP = 20


@register(
    "exact_dup_groups",
    oracle=f"""
SELECT
    md5(text) AS fp,
    MIN(doc_id) AS canonical_id,
    COUNT(*) AS n_dupes,
    array_to_string(
        list_slice(list_sort(list(doc_id)), 1, {_DUP_MEMBER_CAP}),
        ',') AS member_ids
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) > 1
""",
)
def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(sf_dir).load(spark, "documents")
    out = D.exact_duplicates(docs, "text", "doc_id", member_cap=_DUP_MEMBER_CAP)
    # serialize member array for engine-neutral hashing
    return out.select(
        "fp",
        "canonical_id",
        "n_dupes",
        F.concat_ws(",", F.col("member_ids")).alias("member_ids"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidate pairs
# ---------------------------------------------------------------------------

def _hex48_sql(hex_expr: str) -> str:
    """SQL twin of hashing._hex48: first 48 md5 bits as bigint arithmetic."""
    from asritha_metamorphetl_spark.functions.hashing import _HEX48_POWS

    terms = [
        f"(strpos('0123456789abcdef', substr({hex_expr}, {i + 1}, 1)) - 1)"
        f" * {p}"
        for i, p in enumerate(_HEX48_POWS)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _minhash_sig_sql() -> str:
    from asritha_metamorphetl_spark.functions.hashing import (
        MERSENNE61,
        MINHASH_K,
        _PERM_A,
        _PERM_B,
    )

    return ",\n       ".join(
        f"list_min(list_transform(hv, h -> ({_PERM_A[i]} * h + {_PERM_B[i]})"
        f" % {MERSENNE61})) AS mh_{i}"
        for i in range(MINHASH_K)
    )


_BAND_ROWS = "\n    UNION ALL\n".join(
    f"    SELECT doc_id, md5('{b}' || '|' || CAST(mh_{b*3} AS VARCHAR) || '|' || "
    f"CAST(mh_{b*3+1} AS VARCHAR) || '|' || CAST(mh_{b*3+2} AS VARCHAR)) "
    f"AS band_key FROM sig"
    for b in range(4)
)


#: The band-construction CTE chain (shingle → signature → band keys),
#: shared by every MinHash oracle variant: the self-join pair oracle
#: below, the duplicate-cluster closure (plans/pipeline_queries.py),
#: and the incremental delta-vs-base pairs (plans/passage_queries.py).
MINHASH_BANDS_CTE = f"""{_SHINGLE_CTE},
nonempty AS (SELECT doc_id, s FROM shingled WHERE len(s) > 0),
hashed AS (
    SELECT doc_id, list_transform(s, x -> {_hex48_sql('md5(x)')}) AS hv
    FROM nonempty
),
sig AS (
    SELECT doc_id,
       {_minhash_sig_sql()}
    FROM hashed
),
bands AS (
{_BAND_ROWS}
)"""

#: Shared with plans/pipeline_queries.py, which embeds the pair oracle
#: as the edge source of the duplicate-cluster closure.
MINHASH_PAIRS_ORACLE = f"""
WITH {MINHASH_BANDS_CTE}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b USING (band_key)
WHERE a.doc_id < b.doc_id
"""


@register("minhash_near_dups", oracle=MINHASH_PAIRS_ORACLE)
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(sf_dir).load(spark, "documents")
    return D.minhash_lsh_pairs(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (MinHash verification stage)
# ---------------------------------------------------------------------------


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH {_SHINGLE_CTE},
sh_d AS (
    SELECT doc_id, unnest(list_distinct(s)) AS sh
    FROM shingled WHERE len(s) > 0
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_d GROUP BY doc_id),
rare AS (SELECT sh FROM sh_d GROUP BY sh HAVING COUNT(*) <= 100),
idx AS (SELECT d.doc_id, d.sh FROM sh_d d JOIN rare USING (sh)),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM idx a JOIN idx b USING (sh)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_common,
       ROUND(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
""",
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(sf_dir).load(spark, "documents")
    return D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5, max_doc_freq=100)


# ---------------------------------------------------------------------------
# SimHash blocking keys
# ---------------------------------------------------------------------------


def _tok16_sql() -> str:
    """SQL twin of hashing.simhash's per-token 16-bit value (4 nibbles)."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5(tok), {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "simhash_docs",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
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
)
SELECT doc_id, CAST(SUM(v) AS BIGINT) AS simhash
FROM bits
GROUP BY doc_id
""",
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(sf_dir).load(spark, "documents")
    return D.simhash_keys(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Similarity search: exact brute-force top-k (oracle) + LSH (rows-only)
# ---------------------------------------------------------------------------

KNN_K = 10
KNN_QUERIES = 5  # vec_id < 5 are the query vectors


@register(
    "knn_cosine_topk",
    oracle=f"""
WITH fin AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM fin WHERE vec_id < {KNN_QUERIES}
),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
        ROUND(list_dot_product(q.qv, e.embedding::DOUBLE[])
              / (sqrt(list_dot_product(q.qv, q.qv))
                 * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                         e.embedding::DOUBLE[]))), 4) AS score
    FROM fin e CROSS JOIN q
    WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, score, rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM scored
)
WHERE rnk <= {KNN_K}
""",
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k under the FINITE-VECTOR gate
    (operators/similarity.finite_vectors): zero-norm and NaN/Inf
    vectors are excluded on BOTH sides before scoring — on a clean
    catalog the gate passes everything, on a hostile one both engines
    exclude the identical rows (tools/build_hostile_embedding_fixture
    sweep)."""
    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return brute_force_topk(emb, queries, "vec_id", "embedding", k=KNN_K)


#: LSH/IVF knobs pinned module-level so the engine call and the generated
#: oracle SQL can never drift apart.
LSH_PLANES = 4
LSH_TABLES = 8
LSH_PROBE_FLIPS = 2  # multi-probe: flip the 2 least-confident bits per table
EMB_DIM = 64
IVF_NLIST = 16
IVF_NPROBE = 4
IVF_REFINE_ITERS = 2  # Lloyd iterations over the lowest-id seeds

_COSINE_SQL = """ROUND(list_dot_product(q.v, c.v)
              / (sqrt(list_dot_product(q.v, q.v))
                 * sqrt(list_dot_product(c.v, c.v))), 4) AS score"""


def _knn_lsh_oracle(probe_flips: int = 0) -> str:
    """Generate the LSH oracle with the engine's hyperplane constants
    inlined. The planes come from a seeded LCG (similarity._hyperplanes)
    — fully deterministic, so the bucket assignment is SQL-expressible:
    per table t, bucket = MSB-first bit pattern of sign(v · plane_p).

    With ``probe_flips`` > 0 the query side is multi-probed exactly like
    the engine: per table, the |projections| are rounded to 6 decimals,
    ranked ascending with the plane index as tiebreak (a lexicographic
    list_sort over [abs, plane] pairs — the same ordering as the
    kernel's stable argsort), and the ``probe_flips`` least-confident
    bits are flipped one at a time to produce extra probe buckets."""
    from asritha_metamorphetl_spark.operators.similarity import _hyperplanes

    bucket_cols = []
    probe_cols = []
    for t in range(LSH_TABLES):
        planes = _hyperplanes(EMB_DIM, LSH_PLANES, seed=42 + t)
        terms = []
        abs_pairs = []
        for p, plane in enumerate(planes):
            vec = "[" + ", ".join(repr(x) for x in plane) + "]"
            weight = 1 << (LSH_PLANES - 1 - p)
            terms.append(
                f"CASE WHEN list_dot_product(v, {vec}::DOUBLE[]) >= 0"
                f" THEN {weight} ELSE 0 END"
            )
            abs_pairs.append(
                f"[ROUND(ABS(list_dot_product(v, {vec}::DOUBLE[])), 6),"
                f" CAST({p} AS DOUBLE)]"
            )
        bucket_cols.append("(" + "\n     + ".join(terms) + f") AS b{t}")
        if probe_flips > 0:
            ranked = "list_sort([" + ",\n        ".join(abs_pairs) + "])"
            probe_cols.append(
                f"[CAST(b{t} AS BIGINT)] || list_transform(\n"
                f"    list_slice({ranked}, 1, {probe_flips}),\n"
                f"    x -> xor(CAST(b{t} AS BIGINT),\n"
                f"             CAST(power(2, {LSH_PLANES - 1} - x[2]) AS BIGINT))"
                f") AS pr{t}"
            )
    bucket_sql = ",\n    ".join(bucket_cols)
    if probe_flips > 0:
        probe_sql = ",\n    ".join(probe_cols)
        qb = f"""qb AS (
    SELECT vec_id,
    {probe_sql}
    FROM bucketed WHERE vec_id < {KNN_QUERIES}
)"""
        any_table = " OR ".join(
            f"list_contains(q.pr{t}, CAST(c.b{t} AS BIGINT))"
            for t in range(LSH_TABLES)
        )
    else:
        qb = f"qb AS (SELECT * FROM bucketed WHERE vec_id < {KNN_QUERIES})"
        any_table = " OR ".join(f"c.b{t} = q.b{t}" for t in range(LSH_TABLES))
    return f"""
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
bucketed AS (
    SELECT vec_id, v,
    {bucket_sql}
    FROM vecs
),
{qb},
pairs AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM bucketed c JOIN qb q ON ({any_table})
    WHERE c.vec_id != q.vec_id
),
scored AS (
    SELECT p.query_id, p.neighbor_id,
        {_COSINE_SQL}
    FROM pairs p
    JOIN vecs q ON q.vec_id = p.query_id
    JOIN vecs c ON c.vec_id = p.neighbor_id
)
SELECT query_id, neighbor_id, score, rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM scored
)
WHERE rnk <= {KNN_K}
"""


@register("knn_lsh_topk", oracle=_knn_lsh_oracle(LSH_PROBE_FLIPS))
def knn_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-probe random-hyperplane LSH.
    Oracle-checked: the deterministic hyperplanes AND the multi-probe
    bit-flip selection are inlined into the generated SQL, so the driver
    verifies bucket assignment + probe expansion + candidate generation +
    scoring end-to-end. Multi-probe (2 least-confident bits per table)
    lifts fixture recall 0.52 → ≥0.94 at under 2× the candidates; recall
    vs the exact path is continuously checked by the registered
    ``knn_lsh_recall_eval`` query and asserted in tests/test_llm_ops.py
    (sf0.001)."""
    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return lsh_bucketed_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        dim=EMB_DIM,
        k=KNN_K,
        n_planes=LSH_PLANES,
        n_tables=LSH_TABLES,
        probe_flips=LSH_PROBE_FLIPS,
    )


_KNN_EXACT_SQL = f"""
WITH fin AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM fin WHERE vec_id < {KNN_QUERIES}
),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
        ROUND(list_dot_product(q.qv, e.embedding::DOUBLE[])
              / (sqrt(list_dot_product(q.qv, q.qv))
                 * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                         e.embedding::DOUBLE[]))), 4) AS score
    FROM fin e CROSS JOIN q
    WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM scored
)
WHERE rnk <= {KNN_K}
"""


@register(
    "knn_lsh_recall_eval",
    oracle=f"""
WITH approx AS ({_knn_lsh_oracle(LSH_PROBE_FLIPS)}),
truth AS ({_KNN_EXACT_SQL}),
hits AS (
    SELECT t.query_id, t.neighbor_id
    FROM truth t JOIN approx a
      ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
)
SELECT
    (SELECT COUNT(*) FROM truth)::BIGINT AS n_truth,
    (SELECT COUNT(*) FROM approx)::BIGINT AS n_approx,
    (SELECT COUNT(*) FROM hits)::BIGINT AS n_hits,
    CASE WHEN (SELECT COUNT(*) FROM truth) > 0
         THEN ROUND((SELECT COUNT(*) FROM hits)::DOUBLE
                    / (SELECT COUNT(*) FROM truth), 6)
         ELSE 1.0 END AS recall,
    TRUE AS recall_ok
""",
)
def knn_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-checked ANN quality: multi-probe LSH top-k scored
    against the exact brute-force top-k, the vector-side twin of
    ``minhash_recall_eval`` — and the same single-pass shape: the two
    pair sets meet in ONE full-outer join with membership flags and
    collapse in one global aggregate, so the brute-force scorer and the
    LSH pipeline each execute exactly once. A hyperplane /
    probe-selection regression shows up as a dropped recall value in
    CORRECTNESS rather than a silent quality drift. Fixture recall
    ≥ 0.94 at these knobs; ``recall_ok`` pins recall ≥ 0.8 as a hard
    invariant — the oracle emits TRUE unconditionally, so a Spark-side
    quality regression hash-mismatches instead of matching an equally
    degraded oracle."""
    from asritha_metamorphetl_spark.plans.fixtures import cosine_truth_topk

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    truth = (
        cosine_truth_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("in_t", F.lit(1))
    )
    approx = lsh_bucketed_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        dim=EMB_DIM,
        k=KNN_K,
        n_planes=LSH_PLANES,
        n_tables=LSH_TABLES,
        probe_flips=LSH_PROBE_FLIPS,
    ).select("query_id", "neighbor_id").withColumn("in_a", F.lit(1))
    both = truth.join(approx, ["query_id", "neighbor_id"], "full_outer")
    counts = both.agg(
        F.sum("in_t").cast("bigint").alias("n_truth"),
        F.sum("in_a").cast("bigint").alias("n_approx"),
        F.sum(F.col("in_t") * F.col("in_a")).cast("bigint").alias("n_hits"),
    )
    return (
        counts.select(
            F.coalesce(F.col("n_truth"), F.lit(0)).alias("n_truth"),
            F.coalesce(F.col("n_approx"), F.lit(0)).alias("n_approx"),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        ).select(
            "n_truth",
            "n_approx",
            "n_hits",
            F.when(
                F.col("n_truth") > 0,
                F.round(F.col("n_hits").cast("double") / F.col("n_truth"), 6),
            )
            .otherwise(F.lit(1.0))
            .alias("recall"),
        )
        # the oracle hard-codes TRUE: if Spark-side recall drops below
        # the floor, the driver compare goes red instead of matching an
        # equally degraded oracle value
        .withColumn("recall_ok", F.col("recall") >= F.lit(0.8))
    )


# ---------------------------------------------------------------------------
# Composite: corpus curation — the full training-data filter chain in one
# plan (quality floor → language gate → exact-dedup survivor selection)
# ---------------------------------------------------------------------------


@register(
    "curated_corpus",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, text, source,
           list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
scored AS (
    SELECT doc_id, text, source,
        len(t) AS n_tokens,
        CASE WHEN len(t) > 0
             THEN CAST(len(list_filter(t, x -> x IN {_STOPLIST_SQL})) AS DOUBLE)
                  / len(t)
             ELSE 0.0 END AS stop_ratio
    FROM toks
),
gated AS (
    SELECT * FROM scored
    WHERE n_tokens >= 30 AND stop_ratio >= 0.03
),
survivors AS (
    SELECT md5(text) AS fp, MIN(doc_id) AS doc_id
    FROM gated
    GROUP BY md5(text)
)
SELECT g.doc_id, g.source, g.n_tokens
FROM gated g
JOIN survivors s ON g.doc_id = s.doc_id
""",
)
def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality floor + language gate + exact-dedup survivors — the
    minimal LLM-corpus curation chain as one declarative plan (filters
    run in the scan stage; dedup is one hash shuffle)."""
    from asritha_metamorphetl_spark.functions.text import (
        fingerprint,
        stopword_ratio,
        token_count,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    gated = docs.select(
        "doc_id",
        "text",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        stopword_ratio(F.col("text")).alias("stop_ratio"),
    ).filter((F.col("n_tokens") >= 30) & (F.col("stop_ratio") >= 0.03))

    survivors = (
        gated.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return gated.join(survivors, "doc_id").select("doc_id", "source", "n_tokens")


# ---------------------------------------------------------------------------
# Embedding stats per label (decimal-exact vector-norm aggregation)
# ---------------------------------------------------------------------------


@register(
    "embedding_label_stats",
    oracle=f"""
WITH norms AS (
    SELECT label,
           CAST(ROUND(sqrt(list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[])), 4)
                AS DECIMAL(18,4)) AS norm
    FROM embeddings
    WHERE {finite_vec_where("embedding")}
)
SELECT label,
       COUNT(*) AS n_vectors,
       CAST(SUM(norm) AS DOUBLE) AS total_norm,
       CAST(MIN(norm) AS DOUBLE) AS min_norm,
       CAST(MAX(norm) AS DOUBLE) AS max_norm
FROM norms
GROUP BY label
""",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm stats: norms rounded then decimal-quantized
    before SUM so the aggregate is partition-order-independent.
    FINITE-VECTOR-gated: one NaN norm poisons its label's total and a
    decimal cast of NaN is an ANSI crash (oracle mirrors the gate)."""
    from asritha_metamorphetl_spark.operators.similarity import _to_double, l2_norm

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    norms = emb.select(
        "label",
        F.round(l2_norm(_to_double(F.col("embedding"))), 4)
        .cast("decimal(18,4)")
        .alias("norm"),
    )
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("norm").cast("double").alias("total_norm"),
        F.min("norm").cast("double").alias("min_norm"),
        F.max("norm").cast("double").alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (label-blocked, exact within block)
# ---------------------------------------------------------------------------


@register(
    "embedding_near_dups",
    oracle=f"""
WITH v AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {finite_vec_where("embedding")}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 4) AS score
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.45
""",
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked on label so pair
    generation is bounded per block (the all-pairs scale trap never
    materializes); exact cosine on every in-block candidate. Inputs
    run through the FINITE-VECTOR gate (similarity.finite_vectors)."""
    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    return D.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", block_col="label", threshold=0.45
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling k-gram hash + window minima) and
# BPE-style token budgeting
# ---------------------------------------------------------------------------

#: DuckDB twin of functions/text.py::winnow_fingerprints — k=5-char
#: polynomial hashes (base 257, explicit int64 power constants so no
#: float creeps in), then distinct minima of every 4-hash window.
_WINNOW_CTE = """
gram_hashes AS (
    SELECT doc_id,
        [ CAST(list_sum([
              (ascii(text[i:i])     % 257) * 4362470401,
              (ascii(text[i+1:i+1]) % 257) * 16974593,
              (ascii(text[i+2:i+2]) % 257) * 66049,
              (ascii(text[i+3:i+3]) % 257) * 257,
              (ascii(text[i+4:i+4]) % 257) * 1
          ]) AS BIGINT)
          for i in range(1, greatest(length(text) - 3, 1)) ] AS hashes
    FROM documents
),
winnowed AS (
    SELECT doc_id,
        list_distinct([ list_min(hashes[i:i+3])
                        for i in range(1, greatest(len(hashes) - 2, 1)) ])
            AS fps
    FROM gram_hashes
)
"""


@register(
    "winnow_fingerprint_profile",
    oracle=f"""
WITH {_WINNOW_CTE}
SELECT doc_id,
       len(fps) AS n_fps,
       CAST(list_min(fps) AS BIGINT) AS min_fp,
       CAST(list_max(fps) AS BIGINT) AS max_fp
FROM winnowed
""",
)
def winnow_fingerprint_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing sketch profile. The sketch itself is
    row-local (no shuffle — computed inside the scan stage); fingerprint
    count scales with document length / w, not corpus size."""
    docs = Catalog(sf_dir).load(spark, "documents")
    fps = T.winnow_fingerprints(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(fps).alias("n_fps"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
    )


@register(
    "winnow_candidate_pairs",
    oracle=f"""
WITH {_WINNOW_CTE},
exploded AS (SELECT doc_id, unnest(fps) AS fp FROM winnowed),
usable AS (
    SELECT fp FROM exploded GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 50
),
indexed AS (SELECT e.doc_id, e.fp FROM exploded e JOIN usable u USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
FROM indexed a JOIN indexed b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING COUNT(*) >= 2
""",
)
def winnow_candidate_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-copy candidates: docs sharing ≥2 winnowing fingerprints
    (inverted-index self-join with a document-frequency cap — same scale
    shape as the Jaccard index join)."""
    docs = Catalog(sf_dir).load(spark, "documents")
    return D.winnow_candidate_pairs(docs, "text", "doc_id")


@register(
    "bpe_token_stats",
    oracle=f"""
WITH c AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x != ''))
               AS n_ws_tokens,
           len(regexp_extract_all(text, '{T.BPE_SPLIT_PATTERN}'))
               AS n_bpe_tokens
    FROM documents
)
SELECT doc_id, n_ws_tokens, n_bpe_tokens,
       CASE WHEN n_ws_tokens > 0
            THEN ROUND(CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens, 4)
            ELSE 0.0 END AS fertility
FROM c
""",
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation: whitespace tokens vs BPE-style subword
    matches, plus fertility (subwords per word) — the pre-tokenizer pass
    a corpus pipeline runs to cost a training run before invoking a real
    BPE tokenizer. Row-local, zero shuffle."""
    docs = Catalog(sf_dir).load(spark, "documents")
    n_ws = T.token_count(F.col("text"))
    n_bpe = T.bpe_token_count(F.col("text"))
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.when(
            n_ws > 0,
            F.round(n_bpe.cast("double") / n_ws, 4),
        )
        .otherwise(F.lit(0.0))
        .alias("fertility"),
    )


# ---------------------------------------------------------------------------
# Multimodal: synthesized binary assets → real header/PCM decode. The
# oracle can't read the binary, but the synthesis geometry is closed-form
# arithmetic on doc_id, so the SQL verifies the ENTIRE encode→decode
# roundtrip: any header mis-write or mis-parse breaks the hash match.
# ---------------------------------------------------------------------------

_MEDIA_DOCS = 120  # doc_id < this feed the asset synthesizer


@register(
    "media_asset_features",
    oracle=f"""
SELECT
    doc_id AS asset_id,
    CASE WHEN doc_id % 3 = 2 THEN 'audio' ELSE 'image' END AS media_type,
    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE NULL END
        AS format_detected,
    CASE WHEN doc_id % 3 = 2 THEN NULL
         ELSE CAST(8 + doc_id % 24 AS INTEGER) END AS width,
    CASE WHEN doc_id % 3 = 2 THEN NULL
         ELSE CAST(8 + (doc_id // 3) % 16 AS INTEGER) END AS height,
    CASE WHEN doc_id % 3 = 2 THEN NULL ELSE CAST(3 AS INTEGER) END
        AS channels,
    CASE WHEN doc_id % 3 = 2 THEN CAST(8000 AS INTEGER) ELSE NULL END
        AS sample_rate,
    CASE WHEN doc_id % 3 = 2 THEN CAST(64 + doc_id % 128 AS BIGINT)
         ELSE NULL END AS n_frames,
    CASE WHEN doc_id % 3 = 2 THEN CAST(8000.0 AS DOUBLE) ELSE NULL END
        AS rms
FROM documents
WHERE doc_id < {_MEDIA_DOCS}
""",
)
def media_asset_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end: synthesize real PNG/BMP/WAV blobs
    from document ids (distributed mapInPandas), then decode them with
    the real header/PCM parsers (operators/multimodal.py). The oracle
    recomputes the expected geometry arithmetically — agreement proves
    both codec directions, the Arrow batch plumbing, and the schema
    contract."""
    from asritha_metamorphetl_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_features,
        synthesize_assets,
    )

    docs = Catalog(sf_dir).load(spark, "documents").filter(
        F.col("doc_id") < _MEDIA_DOCS
    )
    assets = synthesize_assets(docs)
    img = extract_image_features(
        assets.filter(F.col("media_type") == "image")
    ).select(
        "asset_id",
        F.lit("image").alias("media_type"),
        "format_detected",
        "width",
        "height",
        "channels",
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("long").alias("n_frames"),
        F.lit(None).cast("double").alias("rms"),
    )
    aud = extract_audio_features(
        assets.filter(F.col("media_type") == "audio")
    ).select(
        "asset_id",
        F.lit("audio").alias("media_type"),
        F.lit(None).cast("string").alias("format_detected"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("channels"),
        "sample_rate",
        "n_frames",
        "rms",
    )
    return img.unionByName(aud)


def _knn_ivf_oracle(refine_iters: int = 0) -> str:
    """IVF oracle: seed centroids are the NLIST lowest-id vectors, then
    ``refine_iters`` Lloyd iterations — assign every vector to its nearest
    centroid (cosine rounded to 6 decimals, cell-index tiebreak — the
    same stable argsort the engine's Arrow kernel uses), recompute each
    centroid as the per-dimension member mean rounded to 6 decimals,
    cells that lose all members keep their previous centroid. The final
    assignment and NPROBE probing run against the refined centroids.
    Rounding at every step makes the whole iteration SQL-expressible and
    engine-exact despite float-summation-order differences."""
    ctes = [
        f"""cent0 AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cell, v AS cv
    FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT {IVF_NLIST})
)"""
    ]
    for i in range(refine_iters):
        ctes.append(
            f"""sims{i} AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim
    FROM vecs e CROSS JOIN cent{i} c
),
assign{i} AS (
    SELECT vec_id, cell
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn FROM sims{i})
    WHERE rn = 1
),
means{i} AS (
    SELECT cell, i, ROUND(AVG(val), 6) AS val
    FROM (SELECT a.cell, unnest(e.v) AS val,
                 unnest(generate_series(1, len(e.v))) AS i
          FROM assign{i} a JOIN vecs e USING (vec_id))
    GROUP BY cell, i
),
cent{i + 1} AS (
    SELECT c.cell, COALESCE(m.cv, c.cv) AS cv
    FROM cent{i} c LEFT JOIN
         (SELECT cell, list(val ORDER BY i) AS cv
          FROM means{i} GROUP BY cell) m
    USING (cell)
)"""
        )
    final = f"cent{refine_iters}"
    cte_sql = ",\n".join(ctes)
    return f"""
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
{cte_sql},
sims AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim
    FROM vecs e CROSS JOIN {final} c
),
corpus_cells AS (
    SELECT vec_id AS neighbor_id, cell
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn FROM sims)
    WHERE rn = 1
),
query_cells AS (
    SELECT vec_id AS query_id, cell
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn
          FROM sims WHERE vec_id < {KNN_QUERIES})
    WHERE rn <= {IVF_NPROBE}
),
pairs AS (
    SELECT q.query_id, c.neighbor_id
    FROM corpus_cells c JOIN query_cells q USING (cell)
    WHERE c.neighbor_id != q.query_id
),
scored AS (
    SELECT p.query_id, p.neighbor_id,
        {_COSINE_SQL}
    FROM pairs p
    JOIN vecs q ON q.vec_id = p.query_id
    JOIN vecs c ON c.vec_id = p.neighbor_id
)
SELECT query_id, neighbor_id, score, rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM scored
)
WHERE rnk <= {KNN_K}
"""


@register("knn_ivf_topk", oracle=_knn_ivf_oracle(IVF_REFINE_ITERS))
def knn_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with k-means-refined centroids. Seeds are
    the NLIST lowest-id vectors; IVF_REFINE_ITERS distributed Lloyd
    iterations make the cells a property of the data distribution, not
    of row ordering. Oracle-checked end-to-end: seeding, every Lloyd
    iteration (rounded assignment + rounded member means), the final
    cell assignment, and probing are all inlined into the generated SQL;
    recall vs the exact path is additionally asserted in
    tests/test_llm_ops.py (≥0.8 on the fixture)."""
    from asritha_metamorphetl_spark.operators.similarity import ivf_topk
    from asritha_metamorphetl_spark.plans.fixtures import ivf_centroids_knn

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return ivf_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        k=KNN_K,
        nlist=IVF_NLIST,
        nprobe=IVF_NPROBE,
        refine_iters=IVF_REFINE_ITERS,
        centroids_raw=ivf_centroids_knn(spark, sf_dir),
    )


@register(
    "knn_ivf_recall_eval",
    oracle=f"""
WITH approx AS ({_knn_ivf_oracle(IVF_REFINE_ITERS)}),
truth AS ({_KNN_EXACT_SQL}),
hits AS (
    SELECT t.query_id, t.neighbor_id
    FROM truth t JOIN approx a
      ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
)
SELECT
    (SELECT COUNT(*) FROM truth)::BIGINT AS n_truth,
    (SELECT COUNT(*) FROM approx)::BIGINT AS n_approx,
    (SELECT COUNT(*) FROM hits)::BIGINT AS n_hits,
    CASE WHEN (SELECT COUNT(*) FROM truth) > 0
         THEN ROUND((SELECT COUNT(*) FROM hits)::DOUBLE
                    / (SELECT COUNT(*) FROM truth), 6)
         ELSE 1.0 END AS recall,
    TRUE AS recall_ok
""",
)
def knn_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-checked IVF quality, closing the telemetry gap LSH
    already covered: the Lloyd-refined IVF top-k scored against the
    exact brute-force top-k in the same single-pass shape as
    ``knn_lsh_recall_eval`` — the two pair sets meet in ONE full-outer
    join with membership flags, one global aggregate, each pipeline
    executed exactly once. A centroid-seeding or probe regression now
    surfaces as a dropped recall value in CORRECTNESS instead of only
    in the (point-in-time) test assertion, and ``recall_ok`` pins
    recall ≥ 0.8 as a hard invariant (oracle emits TRUE
    unconditionally). Fixture recall 0.84 at these knobs."""
    from asritha_metamorphetl_spark.operators.similarity import ivf_topk

    from asritha_metamorphetl_spark.plans.fixtures import (
        cosine_truth_topk,
        ivf_centroids_knn,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    truth = (
        cosine_truth_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("in_t", F.lit(1))
    )
    approx = (
        ivf_topk(
            emb,
            queries,
            "vec_id",
            "embedding",
            k=KNN_K,
            nlist=IVF_NLIST,
            nprobe=IVF_NPROBE,
            refine_iters=IVF_REFINE_ITERS,
            centroids_raw=ivf_centroids_knn(spark, sf_dir),
        )
        .select("query_id", "neighbor_id")
        .withColumn("in_a", F.lit(1))
    )
    both = truth.join(approx, ["query_id", "neighbor_id"], "full_outer")
    counts = both.agg(
        F.sum("in_t").cast("bigint").alias("n_truth"),
        F.sum("in_a").cast("bigint").alias("n_approx"),
        F.sum(F.col("in_t") * F.col("in_a")).cast("bigint").alias("n_hits"),
    )
    return (
        counts.select(
            F.coalesce(F.col("n_truth"), F.lit(0)).alias("n_truth"),
            F.coalesce(F.col("n_approx"), F.lit(0)).alias("n_approx"),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        ).select(
            "n_truth",
            "n_approx",
            "n_hits",
            F.when(
                F.col("n_truth") > 0,
                F.round(F.col("n_hits").cast("double") / F.col("n_truth"), 6),
            )
            .otherwise(F.lit(1.0))
            .alias("recall"),
        )
        # the oracle hard-codes TRUE: if Spark-side recall drops below
        # the floor, the driver compare goes red instead of matching an
        # equally degraded oracle value
        .withColumn("recall_ok", F.col("recall") >= F.lit(0.8))
    )


# ---------------------------------------------------------------------------
# SemDeDup: embedding-space near-duplicate pruning inside clusters — the
# semantic complement of the MinHash/exact dedup stack.
# ---------------------------------------------------------------------------

#: Pair-similarity threshold for the fixture corpus (random-ish
#: embeddings: intra-cluster pair sims p99 ~ 0.34, max ~ 0.49 — 0.30
#: drops a real tail while most of the corpus survives). Production
#: text embeddings use ~0.95+.
SEMDEDUP_TAU = 0.30

#: Cell count for the registered SemDeDup queries. Deliberately LARGER
#: than IVF_NLIST (r5 directive #2): at 64 cells the within-cell pair
#: test is visibly the blocking (≈N²/64 pairs), the centroid matrix
#: rides an explicit sc.broadcast, and the oracle replays the larger
#: assignment end-to-end. auto_nlist() sizes production runs (√N).
SEMDEDUP_NLIST = 64


@register(
    "semdedup_survivors",
    oracle=f"""
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
cent AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cell, v AS cv
    FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT {SEMDEDUP_NLIST})
),
sims AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim
    FROM vecs e CROSS JOIN cent c
),
asg AS (
    SELECT vec_id, cell, sim AS csim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn FROM sims)
    WHERE rn = 1
),
dropped AS (
    SELECT DISTINCT x.vec_id
    FROM asg x
    JOIN asg y ON x.cell = y.cell AND x.vec_id != y.vec_id
    JOIN vecs xv ON xv.vec_id = x.vec_id
    JOIN vecs yv ON yv.vec_id = y.vec_id
    WHERE ROUND(list_cosine_similarity(xv.v, yv.v), 4) >= {SEMDEDUP_TAU}
      AND (y.csim < x.csim OR (y.csim = x.csim AND y.vec_id < x.vec_id))
)
SELECT a.vec_id, a.cell, a.csim, d.vec_id IS NULL AS kept
FROM asg a LEFT JOIN dropped d ON a.vec_id = d.vec_id
""",
)
def semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540) over the embeddings table: Voronoi-
    cluster on the deterministic IVF seeds, then inside each cluster
    drop every vector with a kept-ranked near-duplicate (cos >= tau),
    keeping the member FARTHEST from its centroid. The oracle re-runs
    the identical rounded assignment + pair test + keep rule in SQL, so
    the driver verifies clustering, similarity, and survivor selection
    end-to-end — per-row (500 rows, each with its cell, centroid
    similarity, and kept flag), not just aggregate counts.

    Scale shape: assignment is an Arrow matmul in the scan stage; the
    pair test shuffles once on the bounded cell id and runs within
    clusters only (sum-of-cluster² work — the clustering IS the
    blocking); the keep rule is one anti-join. No global operation
    anywhere (operators/similarity.semdedup)."""
    from asritha_metamorphetl_spark.operators.similarity import semdedup

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    return semdedup(
        emb, "vec_id", "embedding", nlist=SEMDEDUP_NLIST, threshold=SEMDEDUP_TAU
    )


#: Shared oracle CTEs: rounded cell assignment at SEMDEDUP_NLIST (the
#: same seeding/rounding as semdedup_survivors).
def _semdedup_asg_sql(nlist: int) -> str:
    return f"""
vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
cent AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cell, v AS cv
    FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT {nlist})
),
csims AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim
    FROM vecs e CROSS JOIN cent c
),
asg AS (
    SELECT vec_id, cell, sim AS csim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn FROM csims)
    WHERE rn = 1
)"""


@register(
    "semdedup_recall_eval",
    oracle=f"""
WITH {_semdedup_asg_sql(SEMDEDUP_NLIST)},
pairs AS (
    SELECT x.vec_id AS xid, y.vec_id AS yid,
           x.cell AS xc, y.cell AS yc,
           x.csim AS xs, y.csim AS ys,
           ROUND(list_cosine_similarity(xv.v, yv.v), 4) AS s
    FROM asg x JOIN asg y ON x.vec_id != y.vec_id
    JOIN vecs xv ON xv.vec_id = x.vec_id
    JOIN vecs yv ON yv.vec_id = y.vec_id
),
near AS (SELECT * FROM pairs WHERE s >= {SEMDEDUP_TAU}),
dropped_global AS (
    SELECT DISTINCT xid FROM near
    WHERE ys < xs OR (ys = xs AND yid < xid)
),
dropped_blocked AS (
    SELECT DISTINCT xid FROM near
    WHERE xc = yc AND (ys < xs OR (ys = xs AND yid < xid))
),
agg AS (
    SELECT
        (SELECT COUNT(*) FROM near WHERE xid < yid) AS n_true_pairs,
        (SELECT COUNT(*) FROM near WHERE xid < yid AND xc = yc)
            AS n_blocked_pairs,
        (SELECT COUNT(*) FROM dropped_global) AS n_dropped_exhaustive,
        (SELECT COUNT(*) FROM dropped_blocked) AS n_dropped_blocked,
        (SELECT COUNT(*) FROM dropped_blocked b
          WHERE b.xid IN (SELECT xid FROM dropped_global)) AS n_drop_hits
)
SELECT n_true_pairs::BIGINT AS n_true_pairs,
       n_blocked_pairs::BIGINT AS n_blocked_pairs,
       CASE WHEN n_true_pairs > 0
            THEN ROUND(n_blocked_pairs::DOUBLE / n_true_pairs, 6)
            ELSE 1.0 END AS block_recall,
       n_dropped_exhaustive::BIGINT AS n_dropped_exhaustive,
       n_dropped_blocked::BIGINT AS n_dropped_blocked,
       CASE WHEN n_dropped_exhaustive > 0
            THEN ROUND(n_drop_hits::DOUBLE / n_dropped_exhaustive, 6)
            ELSE 1.0 END AS drop_recall,
       TRUE AS recall_ok
FROM agg
""",
)
def semdedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup QUALITY telemetry (r5 directive #3) — unlike
    ``semdedup_survivors`` (which proves determinism; its oracle replays
    the same math), this measures what cell-blocking COSTS against the
    exhaustive all-pairs ground truth, continuously:

    - ``block_recall``: fraction of true near-dup pairs (rounded
      cos ≥ τ, every pair tested) that land in the same cell — i.e.
      that SemDeDup's clustering ever compares;
    - ``drop_recall``: fraction of the documents the EXHAUSTIVE
      keep-rule would drop that SemDeDup actually drops.

    The exhaustive baseline is O(N²) BY DESIGN — this is an eval query
    over a probe corpus (the same contract as ``minhash_recall_eval``),
    never a production path; the pair scan is the broadcast-matrix
    ``all_pairs_near`` — one (batch × N) matmul per Arrow batch, only
    the ≥ τ tail leaves Python. On this near-RANDOM fixture recall is
    structurally low (measured drop_recall 0.26 at nlist=64: τ=0.30
    pairs are the random-similarity tail, which shares no cluster
    structure for the centroids to exploit — real text embeddings
    cluster, which is SemDeDup's premise); the floor in ``recall_ok``
    (≥ 0.15, oracle pins TRUE) catches assignment regressions, and the
    hash-pinned values catch any drift at all."""
    from asritha_metamorphetl_spark.operators.similarity import (
        all_pairs_near,
    )

    from asritha_metamorphetl_spark.plans.fixtures import (
        semdedup_assignment,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    sem = semdedup_assignment(spark, sf_dir)
    # exhaustive ground truth via the broadcast-matrix scan — one
    # (batch × N) matmul per Arrow batch, only the ≥ τ tail leaves
    # Python (30 s → ~2 s at sf0.1 vs pairing all N² vectors through
    # a nested-loop join)
    pairs = all_pairs_near(emb, "vec_id", "embedding", SEMDEDUP_TAU)
    ax = sem.select(
        F.col("vec_id").alias("xid"), F.col("cell").alias("xc"),
        F.col("csim").alias("xs"),
    )
    ay = sem.select(
        F.col("vec_id").alias("yid"), F.col("cell").alias("yc"),
        F.col("csim").alias("ys"),
    )
    near = (
        pairs.join(ax, "xid")
        .join(ay, "yid")
        .select("xid", "yid", "xc", "yc", "xs", "ys")
        .localCheckpoint(eager=False)  # feeds four aggregates below
    )
    kill = (F.col("ys") < F.col("xs")) | (
        (F.col("ys") == F.col("xs")) & (F.col("yid") < F.col("xid"))
    )
    d_global = near.filter(kill).select("xid").distinct()
    d_blocked = (
        near.filter(kill & (F.col("xc") == F.col("yc")))
        .select("xid")
        .distinct()
    )
    counts = (
        near.agg(
            F.sum(F.when(F.col("xid") < F.col("yid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_true_pairs"),
            F.sum(
                F.when(
                    (F.col("xid") < F.col("yid"))
                    & (F.col("xc") == F.col("yc")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_blocked_pairs"),
        )
        .crossJoin(
            d_global.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_dropped_exhaustive")
            )
        )
        .crossJoin(
            d_blocked.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_dropped_blocked")
            )
        )
        .crossJoin(
            d_blocked.join(d_global, "xid")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_drop_hits"))
        )
    )
    return counts.select(
        "n_true_pairs",
        "n_blocked_pairs",
        F.when(
            F.col("n_true_pairs") > 0,
            F.round(
                F.col("n_blocked_pairs").cast("double")
                / F.col("n_true_pairs"),
                6,
            ),
        )
        .otherwise(F.lit(1.0))
        .alias("block_recall"),
        "n_dropped_exhaustive",
        "n_dropped_blocked",
        F.when(
            F.col("n_dropped_exhaustive") > 0,
            F.round(
                F.col("n_drop_hits").cast("double")
                / F.col("n_dropped_exhaustive"),
                6,
            ),
        )
        .otherwise(F.lit(1.0))
        .alias("drop_recall"),
    ).withColumn(
        # oracle hard-codes TRUE: a Spark-side regression below the
        # floor goes red in the driver instead of matching a degraded
        # oracle (the knn_ivf_recall_eval pattern)
        "recall_ok",
        F.col("drop_recall") >= F.lit(0.15),
    )


#: Two-level assignment knobs for the registered agreement query: 8
#: coarse representatives (the first 8 fine centroids), 2 probes.
TWOLEVEL_NCOARSE = 8
TWOLEVEL_W = 2


@register(
    "ivf_twolevel_agreement",
    oracle=f"""
WITH {_semdedup_asg_sql(SEMDEDUP_NLIST)},
reps AS (SELECT cell AS g, cv AS rv FROM cent WHERE cell < {TWOLEVEL_NCOARSE}),
cell_groups AS (
    SELECT cell, g FROM (
        SELECT c.cell, r.g,
               ROW_NUMBER() OVER (PARTITION BY c.cell
                   ORDER BY ROUND(list_cosine_similarity(c.cv, r.rv), 6)
                            DESC, r.g ASC) AS rn
        FROM cent c CROSS JOIN reps r)
    WHERE rn = 1
),
probes AS (
    SELECT vec_id, g FROM (
        SELECT e.vec_id, r.g,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ROUND(list_cosine_similarity(e.v, r.rv), 6)
                            DESC, r.g ASC) AS rn
        FROM vecs e CROSS JOIN reps r)
    WHERE rn <= {TWOLEVEL_W}
),
two AS (
    SELECT vec_id, cell AS cell_two FROM (
        SELECT e.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6)
                            DESC, c.cell ASC) AS rn
        FROM vecs e
        JOIN probes p ON p.vec_id = e.vec_id
        JOIN cell_groups cg ON cg.g = p.g
        JOIN cent c ON c.cell = cg.cell)
    WHERE rn = 1
)
SELECT a.vec_id, a.cell AS cell_flat, t.cell_two,
       a.cell = t.cell_two AS agree
FROM asg a JOIN two t ON a.vec_id = t.vec_id
""",
)
def ivf_twolevel_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row verification of TWO-LEVEL centroid assignment (the
    O(√nlist) scale path for IVF/SemDeDup at paper-regime nlist, r5
    directive #2): every vector's flat argmax cell AND its coarse→fine
    cell, side by side, with the oracle replaying BOTH — coarse
    grouping of the fine centroids, top-w probe choice, and the
    restricted fine argmax — in SQL. A disagreement row is a legitimate
    approximation (the true cell's group wasn't probed), so it is
    REPORTED, hash-pinned, and visible, not hidden behind an aggregate;
    tests/test_llm_ops.py additionally pins ≥0.95 agreement on a
    clustered corpus (this fixture is near-random — the structural
    worst case)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        _cell_assign_udf,
        _normalize_rows,
        _to_double,
        broadcast_centroids,
    )

    import numpy as np

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    cent_rows = (
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .orderBy("cid")
        .limit(SEMDEDUP_NLIST)
        .collect()
    )
    C = _normalize_rows(
        np.vstack([np.asarray(r["cv"], dtype=np.float64) for r in cent_rows])
    )
    bc = broadcast_centroids(spark, C)
    vecs = emb.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    return vecs.select(
        "vec_id",
        F.element_at(_cell_assign_udf(bc, 1)(F.col("v")), 1).alias("cell_flat"),
        F.element_at(
            _cell_assign_udf(
                bc, 1, n_coarse=TWOLEVEL_NCOARSE, w_coarse=TWOLEVEL_W
            )(F.col("v")),
            1,
        ).alias("cell_two"),
    ).withColumn("agree", F.col("cell_flat") == F.col("cell_two"))


# ---------------------------------------------------------------------------
# Training-data partitioning: deterministic splits + centroid clustering
# ---------------------------------------------------------------------------


@register(
    "corpus_splits",
    oracle=f"""
WITH assigned AS (
    SELECT doc_id, text,
           {_hex48_sql("md5(CAST(doc_id AS VARCHAR))")} % 10 AS bucket
    FROM documents
)
SELECT CASE WHEN bucket <= 7 THEN 'train'
            WHEN bucket = 8 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(string_split(text, ' '), x -> x != '')))
            AS BIGINT) AS n_tokens
FROM assigned
GROUP BY split
""",
)
def corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-hash bucket
    of the document id — reproducible across runs, engines, and cluster
    sizes (no RNG, no sampleBy seed semantics to pin), and any future
    re-run routes a given document to the same split. Row-local; the
    only shuffle is the 3-row rollup."""
    from asritha_metamorphetl_spark.functions.hashing import shingle_hash

    docs = Catalog(sf_dir).load(spark, "documents")
    bucket = shingle_hash(F.col("doc_id").cast("string")) % 10
    return (
        docs.select(
            F.when(bucket <= 7, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
            T.token_count(F.col("text")).alias("toks"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "embedding_cluster_sizes",
    oracle=f"""
WITH fin AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
centroids AS (
    SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
    FROM fin ORDER BY vec_id LIMIT 8
),
scored AS (
    SELECT e.vec_id, c.cid,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6)
               AS sim
    FROM fin e CROSS JOIN centroids c
),
assigned AS (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cid ASC) AS rn
    FROM scored
)
SELECT cid AS cluster_id, COUNT(*) AS n_members
FROM assigned WHERE rn = 1
GROUP BY cid
""",
)
def embedding_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voronoi cluster occupancy around 8 deterministic seed centroids
    (the IVF assignment step, made oracle-checkable): nearest centroid by
    rounded cosine with the centroid id as tiebreak. The centroid side is
    8 rows — broadcast; assignment is row-local; one small rollup."""
    from asritha_metamorphetl_spark.operators.similarity import _to_double, cosine

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    cent = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("cid"), _to_double(F.col("embedding")).alias("cv"))
    )
    scored = emb.select(
        "vec_id", _to_double(F.col("embedding")).alias("ev")
    ).crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.round(cosine(F.col("ev"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


@register(
    "kmeans_step_centroids",
    oracle=f"""
WITH fin AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
centroids AS (
    SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
    FROM fin ORDER BY vec_id LIMIT 8
),
scored AS (
    SELECT e.vec_id, c.cid,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6)
               AS sim
    FROM fin e CROSS JOIN centroids c
),
assigned AS (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cid ASC) AS rn
    FROM scored
),
members AS (
    SELECT a.cid, e.embedding::DOUBLE[] AS ev
    FROM assigned a JOIN fin e ON e.vec_id = a.vec_id
    WHERE a.rn = 1
),
exploded AS (
    -- two unnests in one SELECT expand in lockstep (zip semantics)
    SELECT cid, unnest(ev) AS val,
           unnest(generate_series(1, len(ev))) AS i
    FROM members
)
SELECT cid AS cluster_id,
       CAST(i - 1 AS BIGINT) AS dim,
       ROUND(AVG(val), 6) AS centroid_val,
       COUNT(*) AS n_members
FROM exploded
GROUP BY 1, 2
""",
)
def kmeans_step_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means, the iterative-ML building block:
    assign every vector to its nearest seed centroid (broadcast 8-row
    centroid side, row-local scoring), then recompute each centroid as
    the member mean per dimension. The posexplode expands rows × dim —
    data-proportional, no shuffle until the (cluster, dim) hash agg,
    whose output is k × dim rows (bounded). Iterating = feeding the
    result back as the next centroid frame; every round is this same
    one-shuffle shape. Mean components are rounded so the cross-engine
    compare is insensitive to summation order."""
    from asritha_metamorphetl_spark.operators.similarity import _to_double, cosine

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    cent = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("cid"), _to_double(F.col("embedding")).alias("cv")
        )
    )
    scored = (
        emb.select("vec_id", _to_double(F.col("embedding")).alias("ev"))
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "ev",
            "cid",
            F.round(cosine(F.col("ev"), F.col("cv")), 6).alias("sim"),
        )
    )
    # Top-1 fused into the aggregate (max_by on (sim, -cid): highest
    # similarity, lowest cid on ties — identical to the oracle's
    # ROW_NUMBER ordering) instead of a per-vector ranking window;
    # measured 3.0s → 1.1s at sf0.1.
    members = scored.groupBy("vec_id").agg(
        F.max_by(
            "cid", F.struct(F.col("sim"), (-F.col("cid")).alias("nc"))
        ).alias("cid"),
        F.first("ev").alias("ev"),
    )
    return (
        members.select("cid", F.posexplode("ev").alias("dim", "val"))
        .groupBy(
            F.col("cid").alias("cluster_id"), F.col("dim").cast("bigint").alias("dim")
        )
        .agg(
            F.round(F.avg("val"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


@register(
    "embedding_int8_profile",
    oracle=f"""
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS ev, label FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
scaled AS (
    SELECT vec_id, label, ev,
           list_max(list_transform(ev, x -> abs(x))) AS mx
    FROM base
),
quant AS (
    SELECT vec_id, label, len(ev) AS n_dims,
           ROUND(mx, 6) AS scale,
           CASE WHEN mx > 0 THEN
               list_transform(ev, x -> CAST(FLOOR(x / mx * 127.0) AS BIGINT))
           ELSE list_transform(ev, x -> CAST(0 AS BIGINT)) END AS q
    FROM scaled
),
exploded AS (
    SELECT vec_id, label, n_dims, scale,
           unnest(q) AS qv,
           unnest(generate_series(1, len(q))) AS i
    FROM quant
)
SELECT vec_id, label, CAST(n_dims AS BIGINT) AS n_dims, scale,
       CAST(SUM(qv) AS BIGINT) AS q_sum,
       CAST(MIN(qv) AS BIGINT) AS q_min,
       CAST(MAX(qv) AS BIGINT) AS q_max,
       CAST(SUM(qv * i) AS BIGINT) AS q_checksum
FROM exploded
GROUP BY 1, 2, 3, 4
""",
)
def embedding_int8_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization manifest (the storage/serving compression pass):
    per-vector max-abs scale and floor-quantized component profile with
    a position-weighted checksum proving the quantized stream
    byte-identical across engines. Quantization uses floor (engine-exact
    on identical IEEE doubles) — never round, whose half-way ties differ
    between engines. Row-local until one bounded per-vector aggregate.
    FINITE-VECTOR-gated: FLOOR(NaN/Inf) cast to BIGINT is an ANSI
    CAST_OVERFLOW crash — degenerate vectors never reach the quantizer
    (oracle mirrors the gate)."""
    from asritha_metamorphetl_spark.operators.similarity import _to_double

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    ev = _to_double(F.col("embedding"))
    mx = F.array_max(F.transform(ev, F.abs))
    staged = emb.select("vec_id", "label", ev.alias("ev"), mx.alias("mx"))
    q = F.when(
        F.col("mx") > 0,
        F.transform(
            F.col("ev"),
            lambda x: F.floor(x / F.col("mx") * 127.0).cast("long"),
        ),
    ).otherwise(F.transform(F.col("ev"), lambda x: F.lit(0).cast("long")))
    quant = staged.select(
        "vec_id",
        "label",
        F.size("ev").cast("bigint").alias("n_dims"),
        F.round(F.col("mx"), 6).alias("scale"),
        q.alias("q"),
    )
    # Entirely row-local: per-vector sums/extremes/checksum fold over
    # the array in place. A posexplode + re-group would shuffle
    # rows × dims only to reassemble the very rows we started from —
    # a 64× exchange bought nothing at scale.
    idx_weighted = F.zip_with(
        "q",
        F.sequence(F.lit(1), F.size("q").cast("int")),
        lambda v, i: v * i.cast("long"),
    )
    fold_sum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return quant.select(
        "vec_id",
        "label",
        "n_dims",
        "scale",
        fold_sum(F.col("q")).cast("bigint").alias("q_sum"),
        F.array_min("q").cast("bigint").alias("q_min"),
        F.array_max("q").cast("bigint").alias("q_max"),
        fold_sum(idx_weighted).cast("bigint").alias("q_checksum"),
    )


@register(
    "lang_id_confusion",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
scored AS (
    SELECT lang,
        CASE WHEN len(t) > 0
             AND CAST(len(list_filter(t, x -> x IN {_STOPLIST_SQL}))
                      AS DOUBLE) / len(t) >= 0.03
             THEN 'en' ELSE 'unk' END AS lang_pred
    FROM toks
)
SELECT lang, lang_pred, COUNT(*) AS n_docs
FROM scored
GROUP BY 1, 2
""",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval shape: the language-ID heuristic's confusion
    matrix against the corpus's labeled lang column. Row-local scoring,
    one bounded (label × prediction) aggregate — the pattern any model
    evaluation over a labeled corpus follows."""
    docs = Catalog(sf_dir).load(spark, "documents")
    return (
        docs.select("lang", T.language_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "minhash_recall_eval",
    oracle=f"""
WITH {_SHINGLE_CTE},
sh_d AS (
    SELECT doc_id, unnest(list_distinct(s)) AS sh
    FROM shingled WHERE len(s) > 0
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_d GROUP BY doc_id),
rare AS (SELECT sh FROM sh_d GROUP BY sh HAVING COUNT(*) <= 100),
idx AS (SELECT d.doc_id, d.sh FROM sh_d d JOIN rare USING (sh)),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM idx a JOIN idx b USING (sh)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
truth AS (
    SELECT doc_a, doc_b
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
),
cand AS ({MINHASH_PAIRS_ORACLE}),
counts AS (
    SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM truth t
            JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
               AS n_hits
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_hits AS BIGINT) AS n_hits,
       CASE WHEN n_truth > 0
            THEN ROUND(CAST(n_hits AS DOUBLE) / n_truth, 6) ELSE 1.0 END
           AS recall,
       CASE WHEN n_candidates > 0
            THEN ROUND(CAST(n_hits AS DOUBLE) / n_candidates, 6) ELSE 1.0 END
           AS precision
FROM counts
""",
)
def minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness for the dedup stack: MinHash-LSH candidate
    pairs scored against exact rare-shingle Jaccard >= 0.5 ground truth.
    Both sides reuse the production operators. The two pair sets meet in
    ONE full-outer join with membership flags and collapse in a single
    global aggregate, so each expensive pipeline (exact Jaccard index,
    LSH banding) is evaluated exactly once — the earlier
    three-separate-counts shape re-ran both pipelines for the hits join
    (measured ~5.2 s → ~3 s at sf0.1). The recall number is the
    banded-LSH guarantee made continuously checkable — a
    signature/banding regression shows up as a dropped recall row, not a
    silent quality drift."""
    from asritha_metamorphetl_spark.plans.fixtures import (
        minhash_pairs,
        ngram_jaccard_scored,
    )

    truth = (
        ngram_jaccard_scored(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("in_t", F.lit(1))
    )
    cand = minhash_pairs(spark, sf_dir).withColumn("in_c", F.lit(1))
    both = truth.join(cand, ["doc_a", "doc_b"], "full_outer")
    counts = both.agg(
        F.sum("in_t").cast("bigint").alias("n_truth"),
        F.sum("in_c").cast("bigint").alias("n_candidates"),
        F.sum(F.col("in_t") * F.col("in_c")).cast("bigint").alias("n_hits"),
    )
    return (
        counts.select(
            F.coalesce(F.col("n_truth"), F.lit(0)).alias("n_truth"),
            F.coalesce(F.col("n_candidates"), F.lit(0)).alias("n_candidates"),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        ).select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.when(
                F.col("n_truth") > 0,
                F.round(F.col("n_hits").cast("double") / F.col("n_truth"), 6),
            )
            .otherwise(F.lit(1.0))
            .alias("recall"),
            F.when(
                F.col("n_candidates") > 0,
                F.round(
                    F.col("n_hits").cast("double") / F.col("n_candidates"), 6
                ),
            )
            .otherwise(F.lit(1.0))
            .alias("precision"),
        )
    )


@register(
    "label_centering_profile",
    oracle=f"""
WITH base AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
    WHERE {finite_vec_where("embedding")}
),
expl AS (
    SELECT vec_id, label, unnest(ev) AS v,
           unnest(generate_series(1, len(ev))) AS i
    FROM base
),
dim_means AS (
    SELECT label, i, AVG(v) AS mu FROM expl GROUP BY 1, 2
)
SELECT e.label,
       COUNT(DISTINCT e.vec_id) AS n_vectors,
       CAST(SUM(CAST(FLOOR(ABS(e.v - m.mu) * 1000) AS BIGINT)) AS BIGINT)
           AS total_abs_dev_q3,
       MAX(CAST(FLOOR(ABS(e.v - m.mu) * 1000000) AS BIGINT)) AS max_abs_dev_q6
FROM expl e
JOIN dim_means m ON e.label = m.label AND e.i = m.i
GROUP BY e.label
""",
)
def label_centering_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centering (feature whitening's first step) as
    a grouped ``applyInPandas`` kernel: each label's vectors arrive as
    one Arrow batch, numpy subtracts the per-dimension mean, and the
    deviation profile comes back — the grouped-map UDF surface (§2.12)
    with an exact SQL twin. Groups are labels (bounded count, each a
    numpy matrix); a label too large for one task would move to the
    mean-broadcast join the oracle itself uses.

    Deviations are floor-quantized to integers *per element* before
    aggregating (the int8-profile pattern): numpy's pairwise-summation
    mean and DuckDB's sequential AVG differ in the last ulps, and a
    float SUM over 1e5 such terms can land on opposite sides of a
    decimal-rounding boundary. Integer sums of quantized deviations are
    order-independent and compare exactly.

    FINITE-VECTOR-gated: one NaN/Inf component shifts its label's
    per-dimension mean to NaN and every deviation with it, and
    FLOOR(NaN) into int64 is nonsense — centering is only defined over
    finite vectors (oracle mirrors the gate)."""
    import numpy as np
    import pandas as pd

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf["ev"].tolist(), dtype=np.float64)
        dev = np.abs(mat - mat.mean(axis=0, keepdims=True))
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [len(pdf)],
                "total_abs_dev_q3": [int(np.floor(dev * 1000.0).astype(np.int64).sum())],
                "max_abs_dev_q6": [int(np.floor(dev.max() * 1000000.0))],
            }
        )

    from asritha_metamorphetl_spark.operators.similarity import _to_double

    staged = emb.select("vec_id", "label", _to_double(F.col("embedding")).alias("ev"))
    return staged.groupBy("label").applyInPandas(
        center,
        "label LONG, n_vectors BIGINT, total_abs_dev_q3 BIGINT, max_abs_dev_q6 BIGINT",
    )


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard join (operators/setjoin.py): the
# provably-complete exact-similarity join — no doc-frequency cap, no
# probabilistic bands; every pair >= t is guaranteed present.
# ---------------------------------------------------------------------------


@register(
    "prefix_jaccard_pairs",
    oracle=f"""
WITH {_SHINGLE_CTE},
sh_raw AS (
    SELECT doc_id, unnest(list_distinct(s)) AS s
    FROM shingled WHERE len(s) > 0
),
sh_d AS (
    SELECT doc_id, {_hex48_sql("md5(s)")} AS sh FROM sh_raw
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_d GROUP BY doc_id),
dfreq AS (SELECT sh, COUNT(*) AS n_df FROM sh_d GROUP BY sh),
ranked AS (
    SELECT d.doc_id, d.sh, s.n_sh,
           ROW_NUMBER() OVER (
               PARTITION BY d.doc_id ORDER BY f.n_df, d.sh
           ) AS rn
    FROM sh_d d JOIN dfreq f USING (sh) JOIN sizes s USING (doc_id)
),
pfx AS (
    SELECT doc_id, sh, n_sh FROM ranked
    WHERE rn <= n_sh - ((4 * n_sh + 4) // 5) + 1
),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           MIN(a.n_sh) AS na, MIN(b.n_sh) AS nb
    FROM pfx a JOIN pfx b USING (sh)
    WHERE a.doc_id < b.doc_id
      AND b.n_sh >= (4 * a.n_sh + 4) // 5
      AND a.n_sh >= (4 * b.n_sh + 4) // 5
    GROUP BY a.doc_id, b.doc_id
),
common AS (
    SELECT c.doc_a, c.doc_b, c.na, c.nb, COUNT(*) AS n_common
    FROM cand c
    JOIN sh_d x ON x.doc_id = c.doc_a
    JOIN sh_d y ON y.doc_id = c.doc_b AND y.sh = x.sh
    GROUP BY c.doc_a, c.doc_b, c.na, c.nb
)
SELECT doc_a, doc_b, n_common,
       ROUND(CAST(n_common AS DOUBLE) / (na + nb - n_common), 6)
           AS jaccard
FROM common
WHERE n_common * 5 >= 4 * (na + nb - n_common)
""",
)
def prefix_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard pairs at t = 4/5 via PPJoin-style prefix
    filtering — the COMPLETE exact join (operators/setjoin.py): unlike
    ngram_jaccard_pairs' doc-frequency cap (which drops stop-shingles
    and can miss pairs) or MinHash's probabilistic bands, a pair
    >= t is structurally guaranteed to surface. Rarest-first global
    ordering makes prefixes selective; the threshold is the rational
    4/5 so every ceil and the final test stay in INTEGER arithmetic —
    no float boundary can disagree between engines."""
    from asritha_metamorphetl_spark.operators.setjoin import (
        prefix_jaccard_pairs,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    return prefix_jaccard_pairs(docs, "text", "doc_id", t_num=4, t_den=5)


@register(
    "containment_dup_pairs",
    oracle=f"""
WITH {_SHINGLE_CTE},
sh_raw AS (
    SELECT doc_id, unnest(list_distinct(s)) AS s
    FROM shingled WHERE len(s) > 0
),
sh_d AS (
    SELECT doc_id, {_hex48_sql("md5(s)")} AS sh FROM sh_raw
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_d GROUP BY doc_id),
dfreq AS (SELECT sh, COUNT(*) AS n_df FROM sh_d GROUP BY sh),
ranked AS (
    SELECT d.doc_id, d.sh, s.n_sh,
           ROW_NUMBER() OVER (
               PARTITION BY d.doc_id ORDER BY f.n_df, d.sh
           ) AS rn
    FROM sh_d d JOIN dfreq f USING (sh) JOIN sizes s USING (doc_id)
),
pfx AS (
    SELECT doc_id AS doc_small, sh, n_sh AS n_small FROM ranked
    WHERE rn <= n_sh - ((9 * n_sh + 9) // 10) + 1
),
idx AS (
    SELECT d.doc_id AS doc_large, d.sh, s.n_sh AS n_large
    FROM sh_d d JOIN sizes s USING (doc_id)
),
cand AS (
    SELECT p.doc_small, i.doc_large, MIN(p.n_small) AS n_small
    FROM pfx p JOIN idx i USING (sh)
    WHERE p.n_small < i.n_large
       OR (p.n_small = i.n_large AND p.doc_small < i.doc_large)
    GROUP BY p.doc_small, i.doc_large
),
common AS (
    SELECT c.doc_small, c.doc_large, c.n_small, COUNT(*) AS n_common
    FROM cand c
    JOIN sh_d x ON x.doc_id = c.doc_small
    JOIN sh_d y ON y.doc_id = c.doc_large AND y.sh = x.sh
    GROUP BY c.doc_small, c.doc_large, c.n_small
)
SELECT doc_small, doc_large, n_common,
       ROUND(CAST(n_common AS DOUBLE) / n_small, 6) AS containment
FROM common
WHERE n_common * 10 >= 9 * n_small
""",
)
def containment_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote/subset near-dups: pairs where the smaller document's
    shingle set is >= 9/10 contained in the other
    (operators/setjoin.containment_pairs) — the duplication mode
    Jaccard structurally misses when sizes are skewed (a document
    quoted whole inside a larger one has J ≈ small/large at
    containment 1.0). Prefix filter on the smaller side vs the full
    index keeps the candidate join complete AND bounded; integer
    threshold arithmetic keeps the oracle exact."""
    from asritha_metamorphetl_spark.operators.setjoin import (
        containment_pairs,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    return containment_pairs(docs, "text", "doc_id", t_num=9, t_den=10)


# ---------------------------------------------------------------------------
# LSH band tuning: the S-curve measured, not assumed
# ---------------------------------------------------------------------------

#: (bands, rows-per-band) configurations swept, all within the k=12
#: signature. Shared verbatim with the oracle.
BAND_CONFIGS = ((4, 3), (6, 2), (3, 4), (12, 1), (2, 6))
#: Ground-truth threshold for precision/recall (the audited exact
#: pair operator's own threshold).
BAND_TUNE_TAU = 0.5


def _band_rows_sql(bands: int, rows: int) -> str:
    return "\n    UNION ALL\n".join(
        f"    SELECT doc_id, md5('{b}' || '|' || "
        + " || '|' || ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        + ") AS band_key FROM sig"
        for b in range(bands)
    )


def _band_tuning_oracle() -> str:
    exact = f"""
sh_d AS (
    SELECT doc_id, unnest(list_distinct(s)) AS sh
    FROM shingled WHERE len(s) > 0
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh_d GROUP BY doc_id),
rare AS (SELECT sh FROM sh_d GROUP BY sh HAVING COUNT(*) <= 100),
idx AS (SELECT d.doc_id, d.sh FROM sh_d d JOIN rare USING (sh)),
common AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM idx a JOIN idx b USING (sh)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
exact AS (
    SELECT doc_a, doc_b FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {BAND_TUNE_TAU}
),
n_exact AS (SELECT COUNT(*) AS nx FROM exact)"""
    per_cfg = []
    for bands, rows in BAND_CONFIGS:
        tag = f"{bands}_{rows}"
        per_cfg.append(f"""
bands{tag} AS (
{_band_rows_sql(bands, rows)}
),
pairs{tag} AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands{tag} a JOIN bands{tag} b USING (band_key)
    WHERE a.doc_id < b.doc_id
),
stats{tag} AS (
    SELECT {bands} AS n_bands, {rows} AS n_rows,
           (SELECT COUNT(*) FROM pairs{tag})::BIGINT AS n_candidates,
           (SELECT COUNT(*) FROM pairs{tag} p
             JOIN exact e ON e.doc_a = p.doc_a AND e.doc_b = p.doc_b
           )::BIGINT AS n_true
)""")
    union = "\nUNION ALL ".join(
        f"SELECT * FROM stats{b}_{r}" for b, r in BAND_CONFIGS
    )
    return f"""
WITH {_SHINGLE_CTE},
nonempty AS (SELECT doc_id, s FROM shingled WHERE len(s) > 0),
hashed AS (
    SELECT doc_id, list_transform(s, x -> {_hex48_sql('md5(x)')}) AS hv
    FROM nonempty
),
sig AS (
    SELECT doc_id,
       {_minhash_sig_sql()}
    FROM hashed
),
{exact},
{",".join(per_cfg)}
SELECT s.n_bands, s.n_rows, s.n_candidates, s.n_true,
       ROUND(CASE WHEN s.n_candidates > 0
                  THEN CAST(s.n_true AS DOUBLE)
                       / CAST(s.n_candidates AS DOUBLE)
                  ELSE 1.0 END, 6) AS precision_vs_exact,
       ROUND(CASE WHEN x.nx > 0
                  THEN CAST(s.n_true AS DOUBLE) / CAST(x.nx AS DOUBLE)
                  ELSE 1.0 END, 6) AS recall_vs_exact
FROM ({union}) s CROSS JOIN n_exact x
"""


@register("minhash_band_tuning", oracle=_band_tuning_oracle())
def minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH S-curve measured end-to-end: candidate-pair volume,
    precision, and recall against the audited exact-Jaccard pair set
    for five (bands × rows) splits of the SAME 12-hash signature —
    from 12 bands of 1 (collision probability s per hash: everything
    collides, recall 1, precision floor) to 2 bands of 6 (s⁶ per
    band: near-exact precision, recall cliff). This is the table a
    dedup owner reads to place the S-curve knee at their target
    threshold BEFORE burning a corpus-scale run — at 100 TB a
    mis-tuned band config is either a missed-duplicate epidemic or a
    candidate-verification bill that dwarfs the scan. The signature
    table is computed ONCE (localCheckpoint) and each config is one
    banded self-join over its exploded keys, the identical audited
    shape as minhash_near_dups; truth is the registered blocked
    exact-pair operator at τ={BAND_TUNE_TAU}."""
    from asritha_metamorphetl_spark.functions import hashing as H
    from asritha_metamorphetl_spark.operators import dedup as D

    docs = Catalog(sf_dir).load(spark, "documents")
    shingled = docs.select(
        "doc_id", H.word_shingles(F.col("text")).alias("sh")
    ).filter(F.size("sh") > 0)
    hashed = shingled.select("doc_id", H.hashed48(F.col("sh")).alias("hv"))
    sig = hashed.select(
        "doc_id", *H.minhash_signature(F.col("hv"))
    ).localCheckpoint(eager=False)  # one materialization, 5 configs
    from asritha_metamorphetl_spark.plans.fixtures import (
        ngram_jaccard_scored,
    )

    # shared session materialization (BAND_TUNE_TAU == the fixture's
    # loosest tau, so this IS the inline pipeline's output); reading
    # parquet replaces the old localCheckpoint for the 5 semi-joins
    exact = ngram_jaccard_scored(spark, sf_dir).select("doc_a", "doc_b")
    n_exact = exact.agg(F.count(F.lit(1)).alias("nx"))
    # ALL FIVE configs banded in ONE pass (VERDICT r13 #5): the sweep
    # used to run one banded self-join PER config — five shuffles of
    # the exploded corpus plus five distincts and five semi-joins
    # against truth. The (cfg, band_key) tagging makes one combined
    # frame carry every config's keys (27 per doc in total — the same
    # md5 count the five frames paid), so the corpus is shuffled ONCE
    # for one self-join, one distinct, one semi-join. Joining on BOTH
    # cfg and band_key keeps the pair semantics exactly per-config (a
    # cross-config md5 collision cannot manufacture a pair). Per-config
    # counts come off groupBy(cfg); a literal config frame left-joined
    # with coalesce(…, 0) keeps zero-candidate configs in the output,
    # matching the old per-config single-row unions.
    entries = []
    for ci, (bands, rows) in enumerate(BAND_CONFIGS):
        for b in range(bands):
            chunk = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
            key = F.md5(F.concat_ws("|", F.lit(str(b)), *chunk))
            entries.append(
                F.struct(
                    F.lit(ci).alias("cfg"), key.alias("band_key")
                )
            )
    banded = sig.select(
        "doc_id", F.explode(F.array(*entries)).alias("e")
    ).select(
        F.col("e.cfg").alias("cfg"),
        F.col("e.band_key").alias("band_key"),
        "doc_id",
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, ["cfg", "band_key"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            "cfg",
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # candidate count + semi-join
    )
    n_cand = pairs.groupBy("cfg").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    n_true = (
        pairs.join(exact, ["doc_a", "doc_b"], "left_semi")
        .groupBy("cfg")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    cfgs = spark.createDataFrame(
        [(ci, b, r) for ci, (b, r) in enumerate(BAND_CONFIGS)],
        "cfg int, n_bands int, n_rows int",
    )
    return (
        cfgs.join(n_cand, "cfg", "left")
        .join(n_true, "cfg", "left")
        .crossJoin(n_exact)
        .select(
            "n_bands",
            "n_rows",
            F.coalesce(F.col("n_candidates"), F.lit(0).cast("bigint")).alias(
                "n_candidates"
            ),
            F.coalesce(F.col("n_true"), F.lit(0).cast("bigint")).alias(
                "n_true"
            ),
            F.round(
                F.when(
                    F.coalesce(F.col("n_candidates"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_true"), F.lit(0)).cast("double")
                    / F.col("n_candidates").cast("double"),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("precision_vs_exact"),
            F.round(
                F.when(
                    F.col("nx") > 0,
                    F.coalesce(F.col("n_true"), F.lit(0)).cast("double")
                    / F.col("nx").cast("double"),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("recall_vs_exact"),
        )
    )
