"""Round-7 operator tests: PQ id-type generality and contract guards,
the unimax row-constant budget assert, IVF-PQ composition, and the
curated-shard composition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_pq_adc_topk_string_ids(spark):
    """String-keyed corpora must flow through the LUT frame (the id type
    derives from the input schema — a hardcoded ``long`` broke them).
    The per-query exact-distance multisets must match the long-id run:
    only the id TIEBREAK may legitimately reorder equal distances."""
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_l2_topk,
        pq_adc_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(200)
    s_emb = emb.select(
        F.concat(F.lit("id-"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    s_q = s_emb.filter(F.col("vec_id").isin("id-0", "id-1", "id-2"))
    # shortlist >= corpus: ADC prunes nothing, so the exact re-rank must
    # reproduce brute-force L2 exactly — end-to-end proof the string-id
    # path (seeding order, LUT frame, joins, ranking) is sound.
    got = {
        (r.query_id, r.neighbor_id, r.dist, r.rnk)
        for r in pq_adc_topk(
            s_emb, s_q, "vec_id", "embedding", k=5, m=4, ncodes=8,
            refine_iters=1, shortlist=300,
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.dist, r.rnk)
        for r in brute_force_l2_topk(
            s_emb, s_q, "vec_id", "embedding", k=5
        ).collect()
    }
    assert got == want
    assert all(isinstance(t[1], str) for t in got)


def test_pq_train_codebooks_small_corpus_raises(spark):
    """A corpus smaller than ncodes cannot seed the codebooks — the
    contract violation must be named, not a numpy reshape error."""
    from asritha_metamorphetl_spark.operators.similarity import (
        pq_train_codebooks,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(5)
    with pytest.raises(ValueError, match="seeded"):
        pq_train_codebooks(emb, "embedding", "vec_id", m=4, ncodes=16)


def test_unimax_nonconstant_budget_raises(spark):
    """A budget Column that varies across rows mixes two inconsistent
    readings (per-row cap test vs aggregated level) — the in-plan
    assert must fail the job instead of silently misallocating."""
    from asritha_metamorphetl_spark.operators.sampling import (
        unimax_allocation,
    )

    stats = spark.createDataFrame(
        [("a", 100), ("b", 300)], "source string, n_tokens long"
    )
    bad = unimax_allocation(
        stats, "source", "n_tokens",
        budget=F.col("n_tokens").cast("double"), max_epochs=1.0,
    )
    with pytest.raises(Exception, match="row-constant"):
        bad.collect()


def test_ivfpq_recall_vs_exact_cosine(spark):
    """The composed IVF-PQ path must recover most true cosine
    neighbors at the registered knobs, and every reported score is the
    exact metric (re-rank contract)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )
    from asritha_metamorphetl_spark.plans.ann_queries import (
        IVFPQ_IVF_REFINE,
        IVFPQ_NLIST,
        IVFPQ_NPROBE,
        PQ_M,
        PQ_NCODES,
        PQ_REFINE,
        ivfpq_shortlist,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=10)
    approx = ivfpq_topk(
        emb, queries, "vec_id", "embedding", k=10,
        nlist=IVFPQ_NLIST, nprobe=IVFPQ_NPROBE,
        ivf_refine_iters=IVFPQ_IVF_REFINE, m=PQ_M, ncodes=PQ_NCODES,
        pq_refine_iters=PQ_REFINE, shortlist=ivfpq_shortlist(emb.count()),
    )
    e_rows = exact.collect()
    a_rows = approx.collect()
    e = {(r.query_id, r.neighbor_id) for r in e_rows}
    a = {(r.query_id, r.neighbor_id) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"IVF-PQ recall {recall:.2f} below floor"
    exact_s = {(r.query_id, r.neighbor_id): r.score for r in e_rows}
    for r in a_rows:
        if (r.query_id, r.neighbor_id) in exact_s:
            assert abs(exact_s[(r.query_id, r.neighbor_id)] - r.score) < 1e-9


def test_unimax_constant_budget_still_allocates(spark):
    """The guard must not disturb the constant-budget path."""
    from asritha_metamorphetl_spark.operators.sampling import (
        unimax_allocation,
    )

    stats = spark.createDataFrame(
        [("a", 100), ("b", 300)], "source string, n_tokens long"
    )
    out = unimax_allocation(
        stats, "source", "n_tokens", budget=F.lit(200.0), max_epochs=1.0
    ).collect()
    assert {r.source: r.allocation for r in out} == {"a": 100.0, "b": 100.0}


def test_curated_shard_manifest_is_subset_of_full_manifest(spark):
    """Content-hash shard routing means curation only SUBTRACTS from
    each shard: per-shard counts bound the full manifest's, totals
    equal the verdict's kept count, and signatures stay internally
    consistent (a shard whose doc set is unchanged by curation keeps
    its exact content_sig)."""
    from asritha_metamorphetl_spark.plans.passage_queries import (
        curated_shard_manifest,
        curation_verdict,
        training_shard_manifest,
    )

    full = {
        r.shard: (r.n_docs, r.n_tokens, r.content_sig)
        for r in training_shard_manifest(spark, SF_SMOKE).collect()
    }
    cur = {
        r.shard: (r.n_docs, r.n_tokens, r.content_sig)
        for r in curated_shard_manifest(spark, SF_SMOKE).collect()
    }
    n_kept = (
        curation_verdict(spark, SF_SMOKE).filter(F.col("final_kept")).count()
    )
    assert set(cur) <= set(full)
    assert sum(v[0] for v in cur.values()) == n_kept
    for shard, (n_docs, n_tokens, sig) in cur.items():
        f_docs, f_tokens, f_sig = full[shard]
        assert n_docs <= f_docs and n_tokens <= f_tokens
        if n_docs == f_docs:  # untouched shard: byte-identical doc set
            assert (n_tokens, sig) == (f_tokens, f_sig)
