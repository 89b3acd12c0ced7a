"""Product-quantization ANN queries: PQ/ADC top-k with exact re-rank,
plus its recall telemetry against the exact squared-L2 baseline.

The oracle replays the ENTIRE PQ pipeline in SQL — deterministic seeding
(lowest-id vectors sliced into subspaces), every Lloyd refinement
iteration (rounded squared-L2 assignment + rounded member means, empty
codes keeping their previous codeword), the final encode, the ADC
partial-distance sum, the shortlist cut, and the exact re-rank — so a
regression anywhere in the chain (seeding, refinement, encode, LUT,
ranking) goes red in CORRECTNESS rather than surviving as a silent
quality drop. Knobs are pinned module-level so the engine call and the
generated SQL can never drift apart (the same discipline as the
LSH/IVF oracles in plans/text_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.similarity import (
    brute_force_l2_topk,
    pq_adc_topk,
)
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.plans.text_queries import EMB_DIM, KNN_K, KNN_QUERIES
from asritha_metamorphetl_spark.sources.files import Catalog

#: PQ knobs for the registered queries. M=4 subspaces of 16 dims, 16
#: codewords each (one byte of code space per subspace at production
#: ncodes=256; 16 keeps the fixture oracle tractable), one distributed
#: Lloyd refinement, and an ADC shortlist deep enough that the exact
#: re-rank recovers the true neighborhood (recall vs exact-L2 measured
#: in tests/test_llm_ops.py and pinned by knn_pq_recall_eval).
PQ_M = 4
PQ_NCODES = 16
PQ_REFINE = 1
#: ADC shortlist depth scales with the corpus: max(PQ_SHORTLIST_MIN,
#: ceil(PQ_SHORTLIST_FRAC * N)). A FIXED depth quietly loses recall as
#: the corpus grows (measured 0.86 at N=500 but 0.68 at N=2000 with a
#: flat 100); the fraction keeps the recall floor meaningful at every
#: SF, and both the engine and the generated SQL compute it from the
#: same count so they can never drift.
PQ_SHORTLIST_MIN = 100
PQ_SHORTLIST_FRAC = 0.2


def pq_shortlist(n_vectors: int) -> int:
    import math

    return max(PQ_SHORTLIST_MIN, math.ceil(PQ_SHORTLIST_FRAC * n_vectors))


_PQ_SHORTLIST_SQL = (
    f"(SELECT GREATEST({PQ_SHORTLIST_MIN}, "
    f"CAST(CEIL({PQ_SHORTLIST_FRAC} * COUNT(*)) AS BIGINT)) FROM vecs)"
)
PQ_SUBDIM = EMB_DIM // PQ_M

_SQ = "(q.qv[{i}] - c.v[{i}]) * (q.qv[{i}] - c.v[{i}])"


def _sub_d2(vec_expr: str, book_alias: str, sub_expr: str) -> str:
    """Rounded squared-L2 between a vector's subspace slice and a
    codeword: the assignment metric, identical everywhere it appears."""
    return (
        f"ROUND(list_sum(list_transform(generate_series(1, {PQ_SUBDIM}),"
        f" i -> ({vec_expr}[{sub_expr} * {PQ_SUBDIM} + i] - {book_alias}.cw[i])"
        f" * ({vec_expr}[{sub_expr} * {PQ_SUBDIM} + i] - {book_alias}.cw[i]))), 6)"
    )


def _pq_books_ctes(refine_iters: int) -> tuple[str, str]:
    """CTE chain training the codebooks; returns (sql, final_books_name)."""
    parts = [
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"subs AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS sub)",
        f"""seeds AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS code, v
    FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT {PQ_NCODES})
)""",
        f"""books0 AS (
    SELECT s.sub, d.code,
           list_slice(d.v, s.sub * {PQ_SUBDIM} + 1,
                      (s.sub + 1) * {PQ_SUBDIM}) AS cw
    FROM seeds d CROSS JOIN subs s
)""",
    ]
    for t in range(1, refine_iters + 1):
        prev = f"books{t - 1}"
        parts.append(f"""asg{t} AS (
    SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, b.sub, b.code,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, b.sub
                   ORDER BY {_sub_d2("e.v", "b", "b.sub")} ASC, b.code ASC
               ) AS rn
        FROM vecs e CROSS JOIN {prev} b
    ) WHERE rn = 1
)""")
        parts.append(f"""means{t} AS (
    SELECT a.sub, a.code, ii.i AS subpos,
           ROUND(AVG(e.v[a.sub * {PQ_SUBDIM} + ii.i]), 6) AS val
    FROM asg{t} a
    JOIN vecs e USING (vec_id)
    CROSS JOIN (SELECT unnest(generate_series(1, {PQ_SUBDIM})) AS i) ii
    GROUP BY 1, 2, 3
)""")
        parts.append(f"""mvec{t} AS (
    SELECT sub, code, list(val ORDER BY subpos) AS cw
    FROM means{t} GROUP BY 1, 2
)""")
        parts.append(f"""books{t} AS (
    SELECT b.sub, b.code, COALESCE(m.cw, b.cw) AS cw
    FROM books{t - 1} b LEFT JOIN mvec{t} m USING (sub, code)
)""")
    return ",\n".join(parts), f"books{refine_iters}"


def _pq_topk_oracle() -> str:
    books_sql, books = _pq_books_ctes(PQ_REFINE)
    return f"""
WITH {books_sql},
enc AS (
    SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, b.sub, b.code,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, b.sub
                   ORDER BY {_sub_d2("e.v", "b", "b.sub")} ASC, b.code ASC
               ) AS rn
        FROM vecs e CROSS JOIN {books} b
    ) WHERE rn = 1
),
qs AS (SELECT vec_id AS query_id, v AS qv FROM vecs
       WHERE vec_id < {KNN_QUERIES}),
parts AS (
    SELECT q.query_id, en.vec_id AS neighbor_id,
           {_sub_d2("q.qv", "b", "en.sub")} AS part
    FROM enc en
    JOIN {books} b ON b.sub = en.sub AND b.code = en.code
    CROSS JOIN qs q
    WHERE en.vec_id != q.query_id
),
adc AS (
    SELECT query_id, neighbor_id, ROUND(SUM(part), 4) AS adc_dist
    FROM parts GROUP BY 1, 2
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc_dist ASC, neighbor_id ASC) AS srn
        FROM adc
    ) WHERE srn <= {_PQ_SHORTLIST_SQL}
),
rer AS (
    SELECT s.query_id, s.neighbor_id,
           ROUND(list_sum(list_transform(generate_series(1, {EMB_DIM}),
               i -> (q.qv[i] - c.v[i]) * (q.qv[i] - c.v[i]))), 4) AS dist
    FROM short s
    JOIN qs q ON q.query_id = s.query_id
    JOIN vecs c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, dist, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY dist ASC, neighbor_id ASC) AS rnk
    FROM rer
) WHERE rnk <= {KNN_K}
"""


_KNN_EXACT_L2_SQL = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qs AS (SELECT vec_id AS query_id, v AS qv FROM vecs
       WHERE vec_id < {KNN_QUERIES}),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROUND(list_sum(list_transform(generate_series(1, {EMB_DIM}),
               i -> (q.qv[i] - c.v[i]) * (q.qv[i] - c.v[i]))), 4) AS dist
    FROM vecs c CROSS JOIN qs q
    WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, dist, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY dist ASC, neighbor_id ASC) AS rnk
    FROM scored
) WHERE rnk <= {KNN_K}
"""


@register("knn_l2_topk", oracle=_KNN_EXACT_L2_SQL)
def knn_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact squared-L2 top-k — the metric baseline the PQ path
    approximates (cosine already has knn_cosine_topk)."""
    emb = Catalog(sf_dir).load(spark, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return brute_force_l2_topk(emb, queries, "vec_id", "embedding", k=KNN_K)


@register("knn_pq_topk", oracle=_pq_topk_oracle())
def knn_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-ranking (Jégou et al.
    2011). The 100 TB shape: codebooks train on a bounded pass
    (O(m·ncodes·subdim) driver state), encode is one Arrow matmul-free
    batch op in the scan stage against broadcast codebooks, ADC scoring
    is m JVM array lookups per candidate — the full-precision vectors
    are only touched again for the shortlist re-rank."""
    emb = Catalog(sf_dir).load(spark, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return pq_adc_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        k=KNN_K,
        m=PQ_M,
        ncodes=PQ_NCODES,
        refine_iters=PQ_REFINE,
        shortlist=pq_shortlist(emb.count()),
    )


@register(
    "knn_pq_recall_eval",
    oracle=f"""
WITH approx AS ({_pq_topk_oracle()}),
truth AS ({_KNN_EXACT_L2_SQL}),
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
def knn_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality telemetry, same one-pass shape as the LSH/IVF recall
    evals: PQ/ADC top-k against the exact squared-L2 top-k, both
    pipelines executed once, met in one full-outer join. The oracle
    emits TRUE for recall_ok unconditionally, so a Spark-side recall
    drop below the floor goes red in CORRECTNESS instead of matching an
    equally degraded oracle."""
    emb = Catalog(sf_dir).load(spark, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    truth = (
        brute_force_l2_topk(emb, queries, "vec_id", "embedding", k=KNN_K)
        .select("query_id", "neighbor_id")
        .withColumn("in_t", F.lit(1))
    )
    approx = (
        pq_adc_topk(
            emb,
            queries,
            "vec_id",
            "embedding",
            k=KNN_K,
            m=PQ_M,
            ncodes=PQ_NCODES,
            refine_iters=PQ_REFINE,
            shortlist=pq_shortlist(emb.count()),
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
        )
        .select(
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
        # hard floor: the oracle hard-codes TRUE (see knn_ivf_recall_eval)
        .withColumn("recall_ok", F.col("recall") >= F.lit(0.8))
    )


@register(
    "hard_negative_mining",
    oracle=f"""
WITH vecs AS (
    SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
),
qs AS (SELECT vec_id AS query_id, v AS qv, label AS q_label FROM vecs
       WHERE vec_id < {KNN_QUERIES}),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
           ROUND(list_dot_product(q.qv, c.v)
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(c.v, c.v))), 4) AS score
    FROM vecs c CROSS JOIN qs q
    WHERE c.vec_id != q.query_id AND c.label != q.q_label
)
SELECT query_id, neighbor_id, neighbor_label, score, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM scored
) WHERE rnk <= {KNN_K}
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data prep: each query vector's top-k most
    similar DIFFERENT-label corpus vectors (the near-misses that define
    a metric-learning margin; operators/similarity.py:hard_negatives).
    The label inequality filters before any dot product is paid."""
    from asritha_metamorphetl_spark.operators.similarity import hard_negatives

    emb = Catalog(sf_dir).load(spark, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return hard_negatives(
        emb, queries, "vec_id", "embedding", "label", k=KNN_K
    )


def _pq_hist_oracle() -> str:
    books_sql, books = _pq_books_ctes(PQ_REFINE)
    return f"""
WITH {books_sql},
enc AS (
    SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, b.sub, b.code,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, b.sub
                   ORDER BY {_sub_d2("e.v", "b", "b.sub")} ASC, b.code ASC
               ) AS rn
        FROM vecs e CROSS JOIN {books} b
    ) WHERE rn = 1
)
SELECT sub, code, COUNT(*) AS n_vectors
FROM enc GROUP BY 1, 2
"""


@register("pq_code_histogram", oracle=_pq_hist_oracle())
def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook-utilization telemetry: vectors per (subspace, code)
    under the registered PQ configuration. A skewed histogram means
    dead codewords (wasted code space, coarser quantization where the
    mass is) — the health check you run before trusting ADC recall at
    scale. Map-side encode + one bounded m·ncodes-row aggregate."""
    from asritha_metamorphetl_spark.operators.similarity import (
        _pq_assign_udf,
        _to_double,
        broadcast_centroids,
        pq_train_codebooks,
    )

    emb = Catalog(sf_dir).load(spark, "embeddings")
    B = pq_train_codebooks(
        emb, "embedding", "vec_id", m=PQ_M, ncodes=PQ_NCODES,
        refine_iters=PQ_REFINE,
    )
    bc = broadcast_centroids(spark, B)
    enc = emb.select(
        _pq_assign_udf(bc, PQ_M, PQ_SUBDIM)(
            _to_double(F.col("embedding"))
        ).alias("codes")
    )
    return (
        enc.select(F.posexplode("codes").alias("sub", "code"))
        .groupBy(
            F.col("sub").cast("bigint").alias("sub"),
            F.col("code").cast("bigint").alias("code"),
        )
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


#: Fixture keyword queries for the registered BM25 search: one rare
#: discriminative term paired with common ones, one all-common query,
#: one two-term mixed query — enough to exercise idf spread.
BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("dup", "scan")),
    (1, ("spark", "window", "sort")),
    (2, ("customer", "merge")),
)
BM25_K1 = 1.2
BM25_B = 0.75

_BM25_TERM_VALUES = ",".join(
    f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
)


@register(
    "bm25_search",
    oracle=f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (
    SELECT COUNT(*)::DOUBLE AS n,
           SUM(dl)::DOUBLE / COUNT(*) AS avgdl
    FROM lens
),
terms(query_id, term) AS (VALUES {_BM25_TERM_VALUES}),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM (SELECT doc_id, unnest(t) AS term FROM toks) x
    JOIN (SELECT DISTINCT term FROM terms) q USING (term)
    GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
contrib AS (
    SELECT q.query_id, f.doc_id,
           ROUND(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)), 6)
           * (f.tf * {BM25_K1 + 1.0})
           / (f.tf + {BM25_K1}
              * ({1.0 - BM25_B} + {BM25_B} * l.dl / s.avgdl)) AS c
    FROM tf f
    JOIN dfreq d USING (term)
    JOIN terms q USING (term)
    JOIN lens l ON l.doc_id = f.doc_id
    CROSS JOIN stats s
),
agg AS (
    SELECT query_id, doc_id, ROUND(SUM(c), 4) AS score
    FROM contrib GROUP BY 1, 2
)
SELECT query_id, doc_id, score, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY score DESC, doc_id ASC) AS rnk
    FROM agg
) WHERE rnk <= {KNN_K}
""",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval over the corpus (operators/retrieval.py):
    Okapi BM25 top-10 per query — the curation team's corpus grep.
    Postings materialize only for queried terms (semi-join against the
    broadcast term set inside the explode stage), so the shuffle is
    O(matching postings), never O(corpus tokens)."""
    from asritha_metamorphetl_spark.operators.retrieval import bm25_topk

    docs = Catalog(sf_dir).load(spark, "documents")
    return bm25_topk(
        docs,
        "text",
        "doc_id",
        [(qid, list(terms)) for qid, terms in BM25_QUERIES],
        k=KNN_K,
        k1=BM25_K1,
        b=BM25_B,
    )
