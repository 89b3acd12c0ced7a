"""Session-cached materializations of deterministic intermediate frames
shared by several registered queries (round-13 optimization).

Several registered queries start from the IDENTICAL expensive
sub-derivation — the MinHash-LSH candidate pair set, its connected-
component closure, the exact rare-shingle Jaccard pair table, the
brute-force kNN truth tables, the SemDeDup assignment — and each used
to recompute it from the raw corpus (guide §1.2: fix the distributed
algorithm first — don't compute things twice). In a production
warehouse these ARE materializations: the dedup graph is built once per
corpus snapshot and every downstream consumer (split router, keeper
picker, contamination audit, calibration report) reads the
materialized table; the ANN truth table is built once per eval wave.
This module gives the bench/sweep session the same shape through the
audited ``cached_fixture`` mechanism: built at most once per
(session, sf), attributed in ``FIXTURE_BUILD_LOG`` (bench.py emits the
map so per-query numbers stay honest), rebuilt from the parquet inputs
by every fresh session — never persisted across runs.

The OPERATOR-DEMO queries (``minhash_near_dups``,
``ngram_jaccard_pairs``, ``knn_cosine_topk``, ``knn_l2_topk``,
``semdedup_survivors``) deliberately keep their inline pipelines:
their job is to demonstrate the operator itself, so their bench rows
keep paying the real pipeline cost. Only DOWNSTREAM consumers read the
materialization.

Content is deterministic (salted content hashes, no RNG), so consumers'
oracle hashes are unchanged — verified per consumer through
tools/check_correctness.py after the switch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from asritha_metamorphetl_spark.session import cached_fixture
from asritha_metamorphetl_spark.sources.files import Catalog

#: The one (threshold, max_doc_freq) setting every sharing consumer
#: uses — the registered sweep's loosest tau equals the recall/band
#: truth threshold, so a single materialization at this setting serves
#: all of them (consumers re-filter ``jaccard >= tau`` for tighter
#: taus; the filter is the pipeline's final row predicate, so the
#: result is identical to an inline run at that tau).
NGRAM_FIXTURE_TAU = 0.5
NGRAM_FIXTURE_MAX_DF = 100


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH candidate pair set (doc_a < doc_b), materialized
    once per session — the shared front end of the near-dup closure,
    split-leakage, overlap-matrix, and calibration queries."""
    from asritha_metamorphetl_spark.operators import dedup as D

    def build(root: str) -> None:
        docs = Catalog(sf_dir).load(spark, "documents")
        D.minhash_lsh_pairs(docs, "text", "doc_id").write.parquet(
            os.path.join(root, "pairs")
        )

    root = cached_fixture(spark, "minhash_pairs", sf_dir, build)
    return spark.read.parquet(os.path.join(root, "pairs"))


def minhash_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (min-label) of the MinHash pair graph as
    (id, label) — the cluster assignment every keep-one-per-cluster
    consumer re-derived per query. The iterative closure runs once per
    session; the label table is O(clustered docs)."""
    from asritha_metamorphetl_spark.operators.graph import (
        connected_components,
    )

    def build(root: str) -> None:
        pairs = minhash_pairs(spark, sf_dir)
        connected_components(pairs, "doc_a", "doc_b").write.parquet(
            os.path.join(root, "labels")
        )

    root = cached_fixture(spark, "minhash_labels", sf_dir, build)
    return spark.read.parquet(os.path.join(root, "labels"))


def ngram_jaccard_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rare-shingle Jaccard pairs at the shared loosest setting
    (tau=0.5, max_doc_freq=100): (doc_a, doc_b, n_common, jaccard).
    Ground truth for the MinHash recall eval, the band-tuning sweep,
    and the threshold sweep — consumers filter ``jaccard >= tau`` for
    tighter settings."""
    from asritha_metamorphetl_spark.operators import dedup as D

    def build(root: str) -> None:
        docs = Catalog(sf_dir).load(spark, "documents")
        D.ngram_jaccard_pairs(
            docs,
            "text",
            "doc_id",
            threshold=NGRAM_FIXTURE_TAU,
            max_doc_freq=NGRAM_FIXTURE_MAX_DF,
        ).write.parquet(os.path.join(root, "scored"))

    root = cached_fixture(spark, "ngram_scored", sf_dir, build)
    return spark.read.parquet(os.path.join(root, "scored"))


def cosine_truth_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k truth over FINITE-VECTOR-gated embeddings
    (query set = vec_id < KNN_QUERIES, k = KNN_K): the ground-truth
    side every cosine recall eval (LSH, IVF, IVF-PQ, IVF-PQ-residual)
    re-ran as its own cross-join + window. One brute-force pass per
    session serves them all; the demo ranker ``knn_cosine_topk`` keeps
    its inline pipeline."""
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_topk,
        finite_vectors,
    )
    from asritha_metamorphetl_spark.plans.text_queries import (
        KNN_K,
        KNN_QUERIES,
    )

    def build(root: str) -> None:
        emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
        queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
        brute_force_topk(
            emb, queries, "vec_id", "embedding", k=KNN_K
        ).write.parquet(os.path.join(root, "truth"))

    root = cached_fixture(spark, "cos_truth", sf_dir, build)
    return spark.read.parquet(os.path.join(root, "truth"))


def l2_truth_topk_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact squared-L2 top-k truth over FINITE-VECTOR-gated embeddings
    (same query set/k contract as ``cosine_truth_topk``) — the truth
    side of the PQ and BQ recall evals. The UNGATED variant used by
    ``knn_l2_topk`` / ``knn_jl_recall_eval`` is deliberately NOT
    served from this fixture: gating changes what those queries
    compute on degenerate inputs."""
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_l2_topk,
        finite_vectors,
    )
    from asritha_metamorphetl_spark.plans.text_queries import (
        KNN_K,
        KNN_QUERIES,
    )

    def build(root: str) -> None:
        emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
        queries = emb.filter(F.col("vec_id") < KNN_QUERIES)
        brute_force_l2_topk(
            emb, queries, "vec_id", "embedding", k=KNN_K
        ).write.parquet(os.path.join(root, "truth"))

    root = cached_fixture(spark, "l2_truth", sf_dir, build)
    return spark.read.parquet(os.path.join(root, "truth"))


def semdedup_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup cell assignment + keep verdict
    (vec_id, cell, csim, kept) at the registered knobs
    (SEMDEDUP_NLIST, SEMDEDUP_TAU) — shared by the recall eval and the
    end-to-end curation verdict; ``semdedup_survivors`` (the operator
    demo) keeps its inline pipeline."""
    from asritha_metamorphetl_spark.operators.similarity import (
        finite_vectors,
        semdedup,
    )
    from asritha_metamorphetl_spark.plans.text_queries import (
        SEMDEDUP_NLIST,
        SEMDEDUP_TAU,
    )

    def build(root: str) -> None:
        emb = finite_vectors(Catalog(sf_dir).load(spark, "embeddings"))
        semdedup(
            emb,
            "vec_id",
            "embedding",
            nlist=SEMDEDUP_NLIST,
            threshold=SEMDEDUP_TAU,
        ).write.parquet(os.path.join(root, "assignment"))

    root = cached_fixture(spark, "semdedup_asg", sf_dir, build)
    return spark.read.parquet(os.path.join(root, "assignment"))


#: Session-scoped scalar memo: (applicationId, abspath(sf_dir), gated)
#: → row count. Keyed by applicationId exactly like ``cached_fixture``
#: roots, so a fresh session always recounts from the parquet input and
#: two concurrent sessions never share state. A benign racing double
#: count computes the same deterministic value. Bounded: one small
#: entry per (session, sf, variant).
_EMB_COUNT_MEMO: dict[tuple[str, str, bool], int] = {}


def embedding_count(
    spark: SparkSession, sf_dir: str, gated: bool = True
) -> int:
    """Row count of the embeddings table (optionally FINITE-VECTOR
    gated), counted once per session — eight ANN queries used to each
    pay a full count() scan just to size their re-rank shortlist."""
    from asritha_metamorphetl_spark.operators.similarity import (
        finite_vectors,
    )

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        gated,
    )
    n = _EMB_COUNT_MEMO.get(key)
    if n is None:
        emb = Catalog(sf_dir).load(spark, "embeddings")
        if gated:
            emb = finite_vectors(emb)
        n = emb.count()
        _EMB_COUNT_MEMO[key] = n
    return n
