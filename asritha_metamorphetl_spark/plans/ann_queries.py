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
    finite_vec_where,
    finite_vectors,
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


#: FINITE-VECTOR gate for the quantizing ANN families (the r12-#6
#: discipline extended to every query whose codebook / centering /
#: integer-quantization math a NaN, Inf, or zero vector would poison —
#: under ANSI a NaN reaching a BIGINT cast is a crash, and a recall
#: floor measured over degenerate vectors is meaningless). Mirrored
#: verbatim in each gated oracle; pass-through on a clean catalog.
#: knn_l2_topk / knn_bq_topk / knn_jl_* stay UNGATED on purpose: their
#: ungated hostile behavior is already cross-engine identical
#: (tests/test_hostile_fixtures.py EMBEDDING_SWEEP pins both lists).
_VEC_GATE = f"\n    WHERE {finite_vec_where('embedding')}"


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
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
        f"{_VEC_GATE})",
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


def _knn_exact_l2_sql(vec_where: str = "") -> str:
    """Exact squared-L2 top-k; ``vec_where`` optionally injects the
    FINITE-VECTOR gate (recall-eval truths use the gated form so the
    floor is measured over queryable content only; knn_l2_topk itself
    stays ungated — its hostile behavior is cross-engine identical)."""
    return f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings{vec_where}),
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


_KNN_EXACT_L2_SQL = _knn_exact_l2_sql()
_KNN_EXACT_L2_GATED_SQL = _knn_exact_l2_sql(_VEC_GATE)


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
    are only touched again for the shortlist re-rank. Inputs pass the
    FINITE-VECTOR gate (a NaN/Inf component would poison codebook
    means; the oracle mirrors the gate in its vecs CTE)."""
    from asritha_metamorphetl_spark.plans.fixtures import (
        embedding_count,
        pq_codebooks_raw,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
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
        shortlist=pq_shortlist(embedding_count(spark, sf_dir)),
        codebooks=pq_codebooks_raw(spark, sf_dir),
    )


@register(
    "knn_pq_recall_eval",
    oracle=f"""
WITH approx AS ({_pq_topk_oracle()}),
truth AS ({_KNN_EXACT_L2_GATED_SQL}),
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
    equally degraded oracle. Both pipelines read FINITE-VECTOR-gated
    input — a recall floor over degenerate vectors measures nothing."""
    from asritha_metamorphetl_spark.plans.fixtures import (
        embedding_count,
        l2_truth_topk_gated,
        pq_codebooks_raw,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    truth = (
        l2_truth_topk_gated(spark, sf_dir)
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
            shortlist=pq_shortlist(embedding_count(spark, sf_dir)),
            codebooks=pq_codebooks_raw(spark, sf_dir),
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
    SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings{_VEC_GATE}
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
    The label inequality filters before any dot product is paid.
    FINITE-VECTOR-gated: a NaN near-miss is noise, not a hard negative,
    and cosine of a zero vector is 0/0 (oracle mirrors the gate)."""
    from asritha_metamorphetl_spark.operators.similarity import hard_negatives

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
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
    scale. Map-side encode + one bounded m·ncodes-row aggregate.
    FINITE-VECTOR-gated like every quantizing consumer: a NaN component
    would make the subspace argmin undefined (oracle mirrors)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        _pq_assign_udf,
        _to_double,
        broadcast_centroids,
    )
    from asritha_metamorphetl_spark.plans.fixtures import pq_codebooks_raw

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    B = pq_codebooks_raw(spark, sf_dir)
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


# ---------------------------------------------------------------------------
# IVF-PQ composition: IVF cells route, PQ/ADC scores, exact re-rank
# ---------------------------------------------------------------------------

#: IVF-PQ knobs. Routing reuses the registered IVF machinery (lowest-id
#: seeds + one Lloyd iteration, cosine cells); scoring reuses the PQ
#: codebook knobs above, with ADC approximating the COSINE via
#: per-subspace inner-product + codeword-norm lookup tables. nprobe=6
#: (vs knn_ivf's 4) buys the composed recall margin measured in
#: tests/test_round7_ops.py: 0.94 / 0.90 / 0.98 at sf0.001/0.01/0.1.
IVFPQ_NLIST = 16
IVFPQ_NPROBE = 6
IVFPQ_IVF_REFINE = 1
#: Shortlist depth scales with the CANDIDATE count (~N·nprobe/nlist),
#: not the corpus — the PQ lesson applied to the composed shape; both
#: engine and oracle compute it from the same COUNT(*).
IVFPQ_SHORTLIST_MIN = 100
IVFPQ_SHORTLIST_FRAC = 0.4


def ivfpq_shortlist(n_vectors: int) -> int:
    import math

    return max(
        IVFPQ_SHORTLIST_MIN,
        math.ceil(IVFPQ_SHORTLIST_FRAC * n_vectors * IVFPQ_NPROBE / IVFPQ_NLIST),
    )


_IVFPQ_SHORTLIST_SQL = (
    f"(SELECT GREATEST({IVFPQ_SHORTLIST_MIN}, "
    f"CAST(CEIL({IVFPQ_SHORTLIST_FRAC} * COUNT(*) * {IVFPQ_NPROBE} "
    f"/ {IVFPQ_NLIST}) AS BIGINT)) FROM vecs)"
)


def _ivf_cent_ctes(nlist: int, refine_iters: int) -> tuple[str, str]:
    """IVF centroid CTE chain ('ic'-prefixed so it composes beside the
    PQ books chain): lowest-id seeding + rounded-cosine Lloyd
    refinement, the same replay as text_queries._knn_ivf_oracle."""
    parts = [
        f"""icent0 AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS cell, v AS cv
    FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT {nlist})
)"""
    ]
    for i in range(refine_iters):
        parts.append(f"""isims{i} AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim
    FROM vecs e CROSS JOIN icent{i} c
),
iassign{i} AS (
    SELECT vec_id, cell
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn FROM isims{i})
    WHERE rn = 1
),
imeans{i} AS (
    SELECT cell, i, ROUND(AVG(val), 6) AS val
    FROM (SELECT a.cell, unnest(e.v) AS val,
                 unnest(generate_series(1, len(e.v))) AS i
          FROM iassign{i} a JOIN vecs e USING (vec_id))
    GROUP BY cell, i
),
icent{i + 1} AS (
    SELECT c.cell, COALESCE(m.cv, c.cv) AS cv
    FROM icent{i} c LEFT JOIN
         (SELECT cell, list(val ORDER BY i) AS cv
          FROM imeans{i} GROUP BY cell) m
    USING (cell)
)""")
    return ",\n".join(parts), f"icent{refine_iters}"


def _ivfpq_topk_oracle() -> str:
    books_sql, books = _pq_books_ctes(PQ_REFINE)
    cent_sql, cent = _ivf_cent_ctes(IVFPQ_NLIST, IVFPQ_IVF_REFINE)
    return f"""
WITH {books_sql},
{cent_sql},
fsims AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim
    FROM vecs e CROSS JOIN {cent} c
),
ccell AS (
    SELECT vec_id, cell
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn FROM fsims)
    WHERE rn = 1
),
qprobe AS (
    SELECT vec_id AS query_id, cell
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn
          FROM fsims WHERE vec_id < {KNN_QUERIES})
    WHERE rn <= {IVFPQ_NPROBE}
),
enc AS (
    SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, b.sub, b.code,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, b.sub
                   ORDER BY {_sub_d2("e.v", "b", "b.sub")} ASC, b.code ASC
               ) AS rn
        FROM vecs e CROSS JOIN {books} b
    ) WHERE rn = 1
),
cand AS (
    SELECT q.query_id, c.vec_id AS neighbor_id
    FROM ccell c JOIN qprobe q USING (cell)
    WHERE c.vec_id != q.query_id
),
parts AS (
    SELECT ca.query_id, ca.neighbor_id,
           ROUND(list_dot_product(
               list_slice(q.v, en.sub * {PQ_SUBDIM} + 1,
                          (en.sub + 1) * {PQ_SUBDIM}), b.cw), 6) AS ip,
           ROUND(list_dot_product(b.cw, b.cw), 6) AS nr
    FROM cand ca
    JOIN enc en ON en.vec_id = ca.neighbor_id
    JOIN {books} b ON b.sub = en.sub AND b.code = en.code
    JOIN vecs q ON q.vec_id = ca.query_id
),
adcsum AS (
    SELECT query_id, neighbor_id, SUM(ip) AS ips, SUM(nr) AS nrs
    FROM parts GROUP BY 1, 2
),
adc AS (
    SELECT a.query_id, a.neighbor_id,
           ROUND(a.ips / (sqrt(list_dot_product(q.v, q.v)) * sqrt(a.nrs)),
                 4) AS adc_score
    FROM adcsum a JOIN vecs q ON q.vec_id = a.query_id
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc_score DESC, neighbor_id ASC) AS srn
        FROM adc
    ) WHERE srn <= {_IVFPQ_SHORTLIST_SQL}
),
rer AS (
    SELECT s.query_id, s.neighbor_id,
           ROUND(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 4) AS score
    FROM short s
    JOIN vecs q ON q.vec_id = s.query_id
    JOIN vecs c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, score, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM rer
) WHERE rnk <= {KNN_K}
"""


@register("knn_ivfpq_topk", oracle=_ivfpq_topk_oracle())
def knn_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN — the production 100 TB shape: IVF cells
    route each query to ~N·nprobe/nlist candidates, PQ/ADC scores those
    candidates from one-byte codes (JVM lookups, full vectors never
    move), the exact cosine decides on the shortlist. Composes the two
    registered halves (operators/similarity.py: ivf_topk's centroid
    machinery + pq_adc_topk's codebooks); the oracle replays the ENTIRE
    chain — seeding, one cosine Lloyd iteration, routing, PQ training,
    encode, inner-product/norm LUTs, shortlist, re-rank — in SQL.
    FINITE-VECTOR-gated (both the IVF routing cosine and the PQ
    codebook means are NaN-poisonable; oracle mirrors the gate)."""
    from asritha_metamorphetl_spark.operators.similarity import ivfpq_topk
    from asritha_metamorphetl_spark.plans.fixtures import (
        embedding_count,
        ivfpq_centroids,
        pq_codebooks_raw,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return ivfpq_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        k=KNN_K,
        nlist=IVFPQ_NLIST,
        nprobe=IVFPQ_NPROBE,
        ivf_refine_iters=IVFPQ_IVF_REFINE,
        m=PQ_M,
        ncodes=PQ_NCODES,
        pq_refine_iters=PQ_REFINE,
        shortlist=ivfpq_shortlist(embedding_count(spark, sf_dir)),
        centroids_raw=ivfpq_centroids(spark, sf_dir),
        codebooks=pq_codebooks_raw(spark, sf_dir),
    )


def _knn_exact_cos_sql(n_queries: int, vec_where: str = "") -> str:
    return f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings{vec_where}),
qs AS (SELECT vec_id AS query_id, v AS qv FROM vecs
       WHERE vec_id < {n_queries}),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROUND(list_dot_product(q.qv, c.v)
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(c.v, c.v))), 4) AS score
    FROM vecs c CROSS JOIN qs q
    WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, score, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM scored
) WHERE rnk <= {KNN_K}
"""


#: Gated exact-cosine truth for the IVF-PQ recall evals (the floor is
#: measured over queryable content; cosine of a zero vector is 0/0).
_KNN_EXACT_COS_GATED_SQL = _knn_exact_cos_sql(KNN_QUERIES, _VEC_GATE)


@register(
    "knn_ivfpq_recall_eval",
    oracle=f"""
WITH approx AS ({_ivfpq_topk_oracle()}),
truth AS ({_KNN_EXACT_COS_GATED_SQL}),
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
def knn_ivfpq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ quality telemetry against the exact cosine top-k, same
    one-pass full-outer-join shape as the LSH/IVF/PQ recall evals. The
    oracle emits TRUE unconditionally, so a composed-recall drop below
    the 0.8 floor goes red in CORRECTNESS instead of matching an
    equally degraded oracle. Measured: 0.94/0.90/0.98 at
    sf0.001/0.01/0.1 (shortlist scales with the candidate count).
    Both pipelines read FINITE-VECTOR-gated input (oracle mirrors)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        ivfpq_topk,
    )
    from asritha_metamorphetl_spark.plans.fixtures import (
        cosine_truth_topk,
        embedding_count,
        ivfpq_centroids,
        pq_codebooks_raw,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    truth = (
        cosine_truth_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("in_t", F.lit(1))
    )
    approx = (
        ivfpq_topk(
            emb,
            queries,
            "vec_id",
            "embedding",
            k=KNN_K,
            nlist=IVFPQ_NLIST,
            nprobe=IVFPQ_NPROBE,
            ivf_refine_iters=IVFPQ_IVF_REFINE,
            m=PQ_M,
            ncodes=PQ_NCODES,
            pq_refine_iters=PQ_REFINE,
            shortlist=ivfpq_shortlist(embedding_count(spark, sf_dir)),
            centroids_raw=ivfpq_centroids(spark, sf_dir),
            codebooks=pq_codebooks_raw(spark, sf_dir),
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
        .withColumn("recall_ok", F.col("recall") >= F.lit(0.8))
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


_BM25_ORACLE = f"""
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
"""


@register("bm25_search", oracle=_BM25_ORACLE)
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


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense cosine fused by reciprocal rank
# ---------------------------------------------------------------------------

#: Hybrid fusion knobs: the three BM25 keyword queries pair with the
#: embeddings of vec_id 0/1/2 as their dense twins (documents and
#: embeddings share the id space, as curation_verdict relies on). kk=60
#: is the canonical RRF constant.
HYBRID_N_QUERIES = 3
RRF_KK = 60


@register(
    "hybrid_search_rrf",
    oracle=f"""
WITH bm AS ({_BM25_ORACLE}),
dn AS ({_knn_exact_cos_sql(HYBRID_N_QUERIES, _VEC_GATE)}),
fused AS (
    SELECT COALESCE(b.query_id, d.query_id) AS query_id,
           COALESCE(b.doc_id, d.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / ({RRF_KK} + b.rnk), 0.0)
                 + COALESCE(1.0 / ({RRF_KK} + d.rnk), 0.0), 6) AS rrf_score
    FROM (SELECT CAST(query_id AS BIGINT) AS query_id,
                 CAST(doc_id AS BIGINT) AS doc_id, rnk FROM bm) b
    FULL OUTER JOIN
         (SELECT CAST(query_id AS BIGINT) AS query_id,
                 CAST(neighbor_id AS BIGINT) AS doc_id, rnk FROM dn) d
    USING (query_id, doc_id)
)
SELECT query_id, doc_id, rrf_score, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY rrf_score DESC, doc_id ASC) AS rnk
    FROM fused
) WHERE rnk <= {KNN_K}
""",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid keyword+dense retrieval via reciprocal-rank fusion
    (operators/retrieval.py:rrf_fuse): the BM25 top-k and the exact
    cosine top-k for the same three queries merge as Σ 1/(60+rank) —
    rank-only fusion, no score calibration, the standard production
    hybrid. Both input lists are the REGISTERED, individually-verified
    rankers (bm25_search, knn_cosine_topk's operator); the fusion
    itself moves only O(queries·k·2) rows. The oracle composes the two
    verified SQL fragments under the same formula. The dense side is
    FINITE-VECTOR-gated (cosine of a zero vector is 0/0; a NaN dense
    rank would poison the fused ordering) — the BM25 side reads the
    full corpus untouched."""
    from asritha_metamorphetl_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_topk,
    )

    docs = Catalog(sf_dir).load(spark, "documents")
    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    bm = bm25_topk(
        docs,
        "text",
        "doc_id",
        [(qid, list(terms)) for qid, terms in BM25_QUERIES],
        k=KNN_K,
        k1=BM25_K1,
        b=BM25_B,
    ).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "rnk",
    )
    dq = emb.filter(F.col("vec_id") < HYBRID_N_QUERIES)
    dn = brute_force_topk(emb, dq, "vec_id", "embedding", k=KNN_K).select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("doc_id"),
        "rnk",
    )
    return rrf_fuse([bm, dn], kk=RRF_KK, k=KNN_K)


# ---------------------------------------------------------------------------
# Residual IVF-PQ: PQ trains on v - centroid[cell] (the Faiss shape)
# ---------------------------------------------------------------------------


def _pq_books_ctes_src(src: str, refine_iters: int, p: str) -> tuple[str, str]:
    """The PQ codebook CTE chain generalized over its training source:
    identical replay to ``_pq_books_ctes`` but reading ``{src}(vec_id,
    v)`` and prefixing every CTE with ``p`` so it can coexist with the
    raw-vector chain in one statement (residual training)."""
    parts = [
        f"{p}subs AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS sub)",
        f"""{p}seeds AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS code, v
    FROM (SELECT * FROM {src} ORDER BY vec_id LIMIT {PQ_NCODES})
)""",
        f"""{p}books0 AS (
    SELECT s.sub, d.code,
           list_slice(d.v, s.sub * {PQ_SUBDIM} + 1,
                      (s.sub + 1) * {PQ_SUBDIM}) AS cw
    FROM {p}seeds d CROSS JOIN {p}subs s
)""",
    ]
    for t in range(1, refine_iters + 1):
        prev = f"{p}books{t - 1}"
        parts.append(f"""{p}asg{t} AS (
    SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, b.sub, b.code,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, b.sub
                   ORDER BY {_sub_d2("e.v", "b", "b.sub")} ASC, b.code ASC
               ) AS rn
        FROM {src} e CROSS JOIN {prev} b
    ) WHERE rn = 1
)""")
        parts.append(f"""{p}means{t} AS (
    SELECT a.sub, a.code, ii.i AS subpos,
           ROUND(AVG(e.v[a.sub * {PQ_SUBDIM} + ii.i]), 6) AS val
    FROM {p}asg{t} a
    JOIN {src} e USING (vec_id)
    CROSS JOIN (SELECT unnest(generate_series(1, {PQ_SUBDIM})) AS i) ii
    GROUP BY 1, 2, 3
)""")
        parts.append(f"""{p}mvec{t} AS (
    SELECT sub, code, list(val ORDER BY subpos) AS cw
    FROM {p}means{t} GROUP BY 1, 2
)""")
        parts.append(f"""{p}books{t} AS (
    SELECT b.sub, b.code, COALESCE(m.cw, b.cw) AS cw
    FROM {p}books{t - 1} b LEFT JOIN {p}mvec{t} m USING (sub, code)
)""")
    return ",\n".join(parts), f"{p}books{refine_iters}"


def _ivfpq_residual_oracle() -> str:
    cent_sql, cent = _ivf_cent_ctes(IVFPQ_NLIST, IVFPQ_IVF_REFINE)
    rbooks_sql, rbooks = _pq_books_ctes_src("rvecs", PQ_REFINE, "r")
    return f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings{_VEC_GATE}),
{cent_sql},
fsims AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim
    FROM vecs e CROSS JOIN {cent} c
),
ccell AS (
    SELECT vec_id, cell
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn FROM fsims)
    WHERE rn = 1
),
qprobe AS (
    SELECT vec_id AS query_id, cell
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, cell ASC) AS rn
          FROM fsims WHERE vec_id < {KNN_QUERIES})
    WHERE rn <= {IVFPQ_NPROBE}
),
rvecs AS (
    SELECT e.vec_id,
           list_transform(generate_series(1, {EMB_DIM}),
                          i -> e.v[i] - c.cv[i]) AS v
    FROM vecs e
    JOIN ccell cc ON cc.vec_id = e.vec_id
    JOIN {cent} c ON c.cell = cc.cell
),
{rbooks_sql},
enc AS (
    SELECT vec_id, sub, code FROM (
        SELECT e.vec_id, b.sub, b.code,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id, b.sub
                   ORDER BY {_sub_d2("e.v", "b", "b.sub")} ASC, b.code ASC
               ) AS rn
        FROM rvecs e CROSS JOIN {rbooks} b
    ) WHERE rn = 1
),
cand AS (
    SELECT q.query_id, c.vec_id AS neighbor_id
    FROM ccell c JOIN qprobe q USING (cell)
    WHERE c.vec_id != q.query_id
),
parts AS (
    SELECT ca.query_id, ca.neighbor_id,
           ROUND(list_dot_product(
               list_slice(q.v, en.sub * {PQ_SUBDIM} + 1,
                          (en.sub + 1) * {PQ_SUBDIM}), b.cw), 6) AS ip,
           ROUND(list_dot_product(b.cw, b.cw), 6) AS rn2,
           ROUND(list_dot_product(
               list_slice(ct.cv, en.sub * {PQ_SUBDIM} + 1,
                          (en.sub + 1) * {PQ_SUBDIM}), b.cw), 6) AS cx
    FROM cand ca
    JOIN ccell cc ON cc.vec_id = ca.neighbor_id
    JOIN {cent} ct ON ct.cell = cc.cell
    JOIN enc en ON en.vec_id = ca.neighbor_id
    JOIN {rbooks} b ON b.sub = en.sub AND b.code = en.code
    JOIN vecs q ON q.vec_id = ca.query_id
),
sums AS (
    SELECT query_id, neighbor_id,
           SUM(ip) AS ips, SUM(rn2) AS rns, SUM(cx) AS cxs
    FROM parts GROUP BY 1, 2
),
adc AS (
    SELECT s.query_id, s.neighbor_id,
           ROUND((ROUND(list_dot_product(q.v, ct.cv), 6) + s.ips)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(ROUND(list_dot_product(ct.cv, ct.cv), 6)
                           + 2 * s.cxs + s.rns)), 4) AS adc_score
    FROM sums s
    JOIN ccell cc ON cc.vec_id = s.neighbor_id
    JOIN {cent} ct ON ct.cell = cc.cell
    JOIN vecs q ON q.vec_id = s.query_id
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY adc_score DESC, neighbor_id ASC) AS srn
        FROM adc
    ) WHERE srn <= {_IVFPQ_SHORTLIST_SQL}
),
rer AS (
    SELECT s.query_id, s.neighbor_id,
           ROUND(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 4) AS score
    FROM short s
    JOIN vecs q ON q.vec_id = s.query_id
    JOIN vecs c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, score, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM rer
) WHERE rnk <= {KNN_K}
"""


@register("knn_ivfpq_residual_topk", oracle=_ivfpq_residual_oracle())
def knn_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ — the full Faiss production shape: codebooks
    train on within-cell residuals (v - centroid), the ADC cosine
    decomposes exactly through precomputed centroid/codeword tables
    (operators/similarity.py:ivfpq_residual_topk), exact re-rank
    decides. At equal code bits the residual statistic is sharper than
    raw-vector PQ — measured at shortlist=50/sf0.1: 0.70 vs 0.60. The
    oracle replays centroid training, routing, RESIDUAL computation,
    residual codebook training, encode, the three lookup tables, and
    both rankings in SQL. FINITE-VECTOR-gated: Inf − centroid is an
    Inf residual and Inf − Inf inside the decomposition is a NaN
    factory (oracle mirrors the gate)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        ivfpq_residual_topk,
    )
    from asritha_metamorphetl_spark.plans.fixtures import (
        embedding_count,
        ivfpq_centroids,
        ivfpq_residual_books,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return ivfpq_residual_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        k=KNN_K,
        nlist=IVFPQ_NLIST,
        nprobe=IVFPQ_NPROBE,
        ivf_refine_iters=IVFPQ_IVF_REFINE,
        m=PQ_M,
        ncodes=PQ_NCODES,
        pq_refine_iters=PQ_REFINE,
        shortlist=ivfpq_shortlist(embedding_count(spark, sf_dir)),
        centroids_raw=ivfpq_centroids(spark, sf_dir),
        res_codebooks=ivfpq_residual_books(spark, sf_dir),
    )


@register(
    "knn_ivfpq_residual_recall_eval",
    oracle=f"""
WITH approx AS ({_ivfpq_residual_oracle()}),
truth AS ({_KNN_EXACT_COS_GATED_SQL}),
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
def knn_ivfpq_residual_recall_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Residual IVF-PQ recall against the exact cosine top-k, same
    one-pass shape and hard 0.8 floor as the other ANN recall evals
    (oracle emits TRUE unconditionally — a Spark-side drop goes red).
    Both pipelines read FINITE-VECTOR-gated input (oracle mirrors)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        ivfpq_residual_topk,
    )
    from asritha_metamorphetl_spark.plans.fixtures import (
        cosine_truth_topk,
        embedding_count,
        ivfpq_centroids,
        ivfpq_residual_books,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    truth = (
        cosine_truth_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("in_t", F.lit(1))
    )
    approx = (
        ivfpq_residual_topk(
            emb,
            queries,
            "vec_id",
            "embedding",
            k=KNN_K,
            nlist=IVFPQ_NLIST,
            nprobe=IVFPQ_NPROBE,
            ivf_refine_iters=IVFPQ_IVF_REFINE,
            m=PQ_M,
            ncodes=PQ_NCODES,
            pq_refine_iters=PQ_REFINE,
            shortlist=ivfpq_shortlist(embedding_count(spark, sf_dir)),
            centroids_raw=ivfpq_centroids(spark, sf_dir),
            res_codebooks=ivfpq_residual_books(spark, sf_dir),
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
        .withColumn("recall_ok", F.col("recall") >= F.lit(0.8))
    )


# ---------------------------------------------------------------------------
# Binary quantization: sign-bit Hamming shortlist + exact re-rank
# ---------------------------------------------------------------------------

#: Bit-decision rounding (center and vector values are rounded to this
#: before the strict compare, so summation-order ulps can't flip a bit).
BQ_DECIMALS = 6
_BQ_WORDS = (EMB_DIM + 31) // 32


def _bq_topk_oracle(vec_where: str = "") -> str:
    word_cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN b AND i > {32 * w} AND i <= {32 * (w + 1)}"
        f" THEN (CAST(1 AS BIGINT) << CAST(i - {32 * w + 1} AS INT))"
        f" ELSE 0 END) AS BIGINT) AS w{w}"
        for w in range(_BQ_WORDS)
    )
    ham_sum = " + ".join(
        f"bit_count(xor(q.w{w}, c.w{w}))" for w in range(_BQ_WORDS)
    )
    return f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings{vec_where}),
dims AS (
    SELECT vec_id, i, v[i] AS x
    FROM vecs, UNNEST(range(1, {EMB_DIM + 1})) AS t(i)
),
ctr AS (SELECT i, ROUND(AVG(x), {BQ_DECIMALS}) AS c FROM dims GROUP BY i),
bits AS (
    SELECT d.vec_id, d.i, ROUND(d.x, {BQ_DECIMALS}) > c.c AS b
    FROM dims d JOIN ctr c USING (i)
),
codes AS (
    SELECT vec_id,
           {word_cols}
    FROM bits GROUP BY vec_id
),
ham AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {ham_sum} AS hamm
    FROM codes c JOIN codes q
      ON q.vec_id < {KNN_QUERIES} AND c.vec_id <> q.vec_id
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY hamm ASC, neighbor_id ASC) AS hrnk FROM ham
    ) WHERE hrnk <= {_PQ_SHORTLIST_SQL}
),
rer AS (
    SELECT s.query_id, s.neighbor_id,
           ROUND(list_sum(list_transform(generate_series(1, {EMB_DIM}),
               i -> (qv.v[i] - cv.v[i]) * (qv.v[i] - cv.v[i]))), 4) AS dist
    FROM short s
    JOIN vecs qv ON qv.vec_id = s.query_id
    JOIN vecs cv ON cv.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, dist, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY dist ASC, neighbor_id ASC) AS rnk FROM rer
) WHERE rnk <= {KNN_K}
"""


@register("knn_bq_topk", oracle=_bq_topk_oracle())
def knn_bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization approximate top-k: corpus-mean sign bits
    packed 32/word (scan-stage JVM aggregate, no Python), Hamming
    shortlist via XOR+popcount — the cheapest quantization tier a
    vector store offers, 32× smaller search state than float — then
    exact squared-L2 re-rank of the shortlist. The oracle replays the
    whole chain: center, bit decisions, packing, Hamming ranking,
    shortlist cut, exact re-rank."""
    from asritha_metamorphetl_spark.operators.similarity import (
        bq_hamming_topk,
    )

    from asritha_metamorphetl_spark.plans.fixtures import embedding_count

    emb = Catalog(sf_dir).load(spark, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    return bq_hamming_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        k=KNN_K,
        dim=EMB_DIM,
        shortlist=pq_shortlist(embedding_count(spark, sf_dir, gated=False)),
        decimals=BQ_DECIMALS,
    )


@register(
    "knn_bq_recall_eval",
    oracle=f"""
WITH approx AS ({_bq_topk_oracle(_VEC_GATE)}),
truth AS ({_KNN_EXACT_L2_GATED_SQL}),
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
def knn_bq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ quality telemetry against exact L2, same contract as the
    LSH/IVF/PQ recall evals: the oracle hard-codes recall_ok TRUE, the
    engine computes recall >= 0.8 — a recall regression goes red in
    CORRECTNESS instead of silently degrading. Both pipelines read
    FINITE-VECTOR-gated input: NaN rows score NaN Hamming words and
    drag the measured floor below 0.8 on hostile corpora while
    knn_bq_topk itself stays (deliberately) ungated — both engines
    agree on the ungated ranking, but a floor over degenerate vectors
    is meaningless (oracle mirrors the gate on both sides)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        bq_hamming_topk,
    )

    from asritha_metamorphetl_spark.plans.fixtures import (
        embedding_count,
        l2_truth_topk_gated,
    )

    emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    truth = (
        l2_truth_topk_gated(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("in_t", F.lit(1))
    )
    approx = (
        bq_hamming_topk(
            emb,
            queries,
            "vec_id",
            "embedding",
            k=KNN_K,
            dim=EMB_DIM,
            shortlist=pq_shortlist(embedding_count(spark, sf_dir)),
            decimals=BQ_DECIMALS,
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
        .withColumn("recall_ok", F.col("recall") >= F.lit(0.8))
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection: dimensionality reduction as a
# search accelerator, with its recall measured rather than assumed
# ---------------------------------------------------------------------------

#: Projected dimensionality (64 -> 8) and the deterministic +-1 sign
#: matrix (Achlioptas 2003: Rademacher entries satisfy the JL lemma).
#: Signs are PYTHON-generated literals baked into both plans, so no
#: runtime hash needs cross-engine parity.
JL_DIM = 8


def _jl_sign(i: int, j: int) -> int:
    """Deterministic Rademacher sign for (input dim i, output dim j)."""
    return 1 if ((i * 31 + j * 17) % 7) % 2 == 0 else -1


def _jl_proj_sql(vec: str, j: int) -> str:
    """The j-th projected coordinate as a left-associated literal sum —
    identical addition order in both engines => identical doubles."""
    terms = [
        f"({_jl_sign(i, j)}.0 * CAST({vec}[{i + 1}] AS DOUBLE))"
        for i in range(EMB_DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _jl_proj_spark(j: int) -> str:
    terms = [
        f"({_jl_sign(i, j)}.0 * CAST(element_at(embedding, {i + 1}) AS DOUBLE))"
        for i in range(EMB_DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _jl_topk_oracle() -> str:
    projs = ", ".join(
        f"{_jl_proj_sql('v', j)} AS p{j}" for j in range(JL_DIM)
    )
    d2 = " + ".join(
        f"((q.p{j} - c.p{j}) * (q.p{j} - c.p{j}))" for j in range(JL_DIM)
    )
    return f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
proj AS (SELECT vec_id, {projs} FROM vecs),
qs AS (SELECT * FROM proj WHERE vec_id < {KNN_QUERIES}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND({d2}, 4) AS dist
    FROM proj c CROSS JOIN qs q
    WHERE c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, dist, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY dist ASC, neighbor_id ASC) AS rnk
    FROM scored
) WHERE rnk <= {KNN_K}
"""


def _jl_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Catalog(sf_dir).load(spark, "embeddings")
    return emb.select(
        "vec_id",
        *[F.expr(_jl_proj_spark(j)).alias(f"p{j}") for j in range(JL_DIM)],
    )


@register("knn_jl_topk", oracle=_jl_topk_oracle())
def knn_jl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k in JL-projected space: every vector is mapped
    through a +-1 Rademacher projection (64 -> {JL_DIM} dims, an 8x
    distance-computation compression that preserves pairwise L2 within
    the JL bound), then ranked by projected squared-L2. At 100 TB this
    is the cheap FIRST pass of a projection cascade: the projection is
    a map-side JVM expression in the scan stage (no UDF, no shuffle),
    and the projected corpus is what a shortlist search actually
    touches. Companion recall eval measures what the compression costs
    rather than assuming it."""
    proj = _jl_projected(spark, sf_dir)
    qs = proj.filter(F.col("vec_id") < KNN_QUERIES)
    qr = qs.select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"p{j}").alias(f"q{j}") for j in range(JL_DIM)],
    )
    d2 = None
    for j in range(JL_DIM):
        term = (F.col(f"q{j}") - F.col(f"p{j}")) * (
            F.col(f"q{j}") - F.col(f"p{j}")
        )
        d2 = term if d2 is None else (d2 + term)
    from pyspark.sql import Window as W

    scored = (
        proj.crossJoin(F.broadcast(qr))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(d2, 4).alias("dist"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .select("query_id", "neighbor_id", "dist", "rnk")
    )


@register(
    "knn_jl_recall_eval",
    oracle=f"""
WITH approx AS ({_jl_topk_oracle()}),
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
         ELSE 1.0 END AS recall
""",
)
def knn_jl_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of JL-projected search against exact full-dimension L2
    truth — the honest price tag of the 8x compression (the JL lemma
    bounds DISTORTION, not top-k recall; only measurement answers
    whether a given projected width is usable as a filter stage).
    Both sides are the registered, individually-audited rankers."""
    approx = knn_jl_topk(spark, sf_dir).select("query_id", "neighbor_id")
    emb = Catalog(sf_dir).load(spark, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
    truth = brute_force_l2_topk(
        emb, queries, "vec_id", "embedding", k=KNN_K
    ).select("query_id", "neighbor_id")
    hits = truth.join(approx, ["query_id", "neighbor_id"])
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    na = approx.agg(F.count(F.lit(1)).alias("n_approx"))
    nh = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        nt.crossJoin(na)
        .crossJoin(nh)
        .select(
            "n_truth",
            "n_approx",
            "n_hits",
            F.when(
                F.col("n_truth") > 0,
                F.round(
                    F.col("n_hits").cast("double")
                    / F.col("n_truth").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(1.0))
            .alias("recall"),
        )
    )
