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


def test_heavy_hitters_exact_under_eviction_pressure(spark):
    """With a vocabulary far larger than the sketch (k counters per
    partition, thousands of distinct keys), the MG candidate pass must
    still emit a superset of every above-threshold item, making the
    two-pass result EXACTLY the full GROUP BY answer."""
    from asritha_metamorphetl_spark.operators.frequent import (
        _mg_candidates,
        heavy_hitters,
    )

    # 40 planted hitters (60 copies each) drowned in 12000 singleton
    # noise keys, interleaved so MG eviction churns constantly.
    rows = []
    for i in range(12000):
        rows.append((f"noise-{i}",))
        if i % 5 == 0 and i // 5 < 40 * 60:
            rows.append((f"hot-{(i // 5) % 40}",))
    df = spark.createDataFrame(rows, "token string").repartition(8)
    total = df.count()
    share = 50.0 / total  # threshold 50 < 60 planted copies
    got = {
        r.token: r.freq
        for r in heavy_hitters(
            df, "token", F.lit(total), min_share=share
        ).collect()
    }
    import math

    thr = math.ceil(share * total)
    want = {
        r.token: r.freq
        for r in df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= thr)
        .collect()
    }
    assert got == want
    assert set(got) == {f"hot-{j}" for j in range(40)}
    # the candidate pass stays bounded: <= k rows per partition
    k = math.ceil(1.0 / share) + 1
    n_cand = _mg_candidates(df, "token", k).count()
    assert n_cand <= 8 * k


def test_mg_candidates_never_miss_above_threshold(spark):
    """The pigeonhole guarantee directly: any item with global
    frequency > N/(k+1) appears in the per-partition candidate union,
    for a small k where eviction is constant."""
    from asritha_metamorphetl_spark.operators.frequent import _mg_candidates

    rows = [(f"v{i % 97}",) for i in range(5000)] + [("big",)] * 800
    df = spark.createDataFrame(rows, "token string").repartition(4)
    n = df.count()
    k = 6
    cands = {r.token for r in _mg_candidates(df, "token", k).collect()}
    over = {
        r.token
        for r in df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") > n / (k + 1))
        .collect()
    }
    assert over <= cands


def test_rrf_fuse_hand_example(spark):
    """RRF on a hand-built pair of lists: overlapping docs sum both
    reciprocal ranks, single-list docs take one term, ties break by
    doc id."""
    from asritha_metamorphetl_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rnk int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rnk int"
    )
    out = {
        r.doc_id: (r.rrf_score, r.rnk)
        for r in rrf_fuse([a, b], kk=60, k=10).collect()
    }
    assert out[11] == (round(1 / 62 + 1 / 61, 6), 1)  # both lists
    assert out[10] == (round(1 / 61, 6), 2)
    assert out[13] == (round(1 / 62, 6), 3)
    assert out[12] == (round(1 / 63, 6), 4)
    with pytest.raises(ValueError, match="two ranked lists"):
        rrf_fuse([a])


def test_hybrid_search_contains_both_modalities(spark):
    """The fused list must actually mix the rankers: for at least one
    query, it keeps documents that only one of the two sides ranked."""
    from asritha_metamorphetl_spark.plans.ann_queries import (
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, SF_SMOKE).collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, lst in per_q.items():
        assert len(lst) == 10
        assert [r.rnk for r in sorted(lst, key=lambda x: x.rnk)] == list(
            range(1, 11)
        )
    # a doc ranked by both sides carries both reciprocal terms — its
    # score exceeds the single-list maximum 1/61
    assert any(r.rrf_score > round(1 / 61, 6) for r in rows)


def test_best_keeper_picks_max_quality_one_per_cluster(spark):
    """Exactly one keeper per cluster, and it is the (rounded score,
    -doc_id) argmax — the quality-aware refinement of the min-id rule
    near_dup_survivors uses."""
    from asritha_metamorphetl_spark.plans.pipeline_queries import (
        near_dup_best_keeper,
    )

    rows = near_dup_best_keeper(spark, SF_SMOKE).collect()
    clusters = {}
    for r in rows:
        clusters.setdefault(r.cluster_id, []).append(r)
    assert sum(len(v) for v in clusters.values()) == 500
    for cid, members in clusters.items():
        keepers = [r for r in members if r.kept]
        assert len(keepers) == 1
        best = max(members, key=lambda r: (r.score, -r.doc_id))
        assert keepers[0].doc_id == best.doc_id
    # the rule genuinely differs from min-id on this corpus: at least
    # one multi-member cluster keeps a non-minimal id
    multi = [v for v in clusters.values() if len(v) > 1]
    assert multi, "fixture has no near-dup clusters?"
    assert any(
        max(m, key=lambda r: (r.score, -r.doc_id)).doc_id
        != min(r.doc_id for r in m)
        for m in multi
    )


def test_merge_manifests_equals_full_on_arbitrary_splits(spark):
    """manifest(base ∪ delta) == merge(manifest(base), manifest(delta))
    for several disjoint splits — the O(delta) append contract, and a
    three-way merge associativity spot-check."""
    from asritha_metamorphetl_spark.plans.passage_queries import (
        merge_manifests,
        shard_manifest_incremental,
        training_shard_manifest,
    )

    rows = shard_manifest_incremental(spark, SF_SMOKE).collect()
    assert rows and all(r.append_consistent for r in rows)

    # three-way: split by doc_id % 3, merge all parts
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    full = {
        r.shard: (r.n_docs, r.n_tokens, r.content_sig)
        for r in training_shard_manifest(spark, SF_SMOKE).collect()
    }
    import asritha_metamorphetl_spark.plans.passage_queries as pq
    from asritha_metamorphetl_spark.functions.hashing import shingle_hash
    from asritha_metamorphetl_spark.operators.sampling import hash_bucket
    from asritha_metamorphetl_spark.functions import text as T

    def manifest(d):
        sig = shingle_hash(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.md5(F.col("text"))
            )
        )
        return (
            d.select(
                hash_bucket(F.col("doc_id"), pq.N_TRAINING_SHARDS).alias(
                    "shard"
                ),
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

    parts = [manifest(docs.filter(F.col("doc_id") % 3 == i)) for i in range(3)]
    merged = {
        r.shard: (r.n_docs, r.n_tokens, r.content_sig)
        for r in merge_manifests(*parts).collect()
    }
    assert merged == full


def _clustered_corpus(spark, n_centers=32, per=20, dim=16, seed=7):
    # Interleaved ids (cluster-major round-robin) so the operators'
    # lowest-id centroid seeding spans every cluster — the regime the
    # two-level premise (cluster structure) assumes.
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, dim) * 4.0
    pts = np.repeat(centers, per, axis=0) + rng.randn(n_centers * per, dim) * 0.3
    order = [c * per + j for j in range(per) for c in range(n_centers)]
    return spark.createDataFrame(
        [
            (i, [float(x) for x in pts[p]])
            for i, p in enumerate(order)
        ],
        "vec_id long, embedding array<double>",
    )


def test_ivf_topk_two_level_routing_agrees_on_clustered_data(spark):
    """The production operators can route through the O(sqrt(nlist))
    two-level kernel: on clustered data (its premise), ivf_topk with
    n_coarse routing returns near-identical neighbor sets to flat
    routing at the same knobs."""
    from asritha_metamorphetl_spark.operators.similarity import ivf_topk

    vecs = _clustered_corpus(spark)
    q = vecs.filter(F.col("vec_id") % 97 == 0)
    flat = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            vecs, q, "vec_id", "embedding", k=5, nlist=32, nprobe=4
        ).collect()
    }
    two = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            vecs, q, "vec_id", "embedding", k=5, nlist=32, nprobe=4,
            n_coarse=8, w_coarse=2,
        ).collect()
    }
    overlap = len(flat & two) / len(flat)
    assert overlap >= 0.9, f"two-level routing overlap {overlap:.2f}"


def test_semdedup_two_level_assignment_agrees_on_clustered_data(spark):
    """SemDeDup's two-level opt-in: cell assignments (and therefore
    keep verdicts) match the flat path almost everywhere on clustered
    data, and every row still gets a real cell + csim."""
    import math

    from asritha_metamorphetl_spark.operators.similarity import semdedup

    vecs = _clustered_corpus(spark)
    flat = {
        r.vec_id: (r.cell, r.kept)
        for r in semdedup(
            vecs, "vec_id", "embedding", nlist=32, threshold=0.9
        ).collect()
    }
    two_rows = semdedup(
        vecs, "vec_id", "embedding", nlist=32, threshold=0.9,
        n_coarse=8, w_coarse=2,
    ).collect()
    two = {r.vec_id: (r.cell, r.kept) for r in two_rows}
    assert set(flat) == set(two)
    assert all(r.cell >= 0 and not math.isnan(r.csim) for r in two_rows)
    agree = sum(1 for k in flat if flat[k][0] == two[k][0]) / len(flat)
    assert agree >= 0.95, f"two-level cell agreement {agree:.2f}"


def test_residual_ivfpq_beats_plain_at_tight_shortlist(spark):
    """At equal code bits and a TIGHT shortlist the residual ADC
    statistic must rank at least as well as raw-vector PQ — the whole
    point of encoding within-cell residuals (measured 0.70 vs 0.60 at
    shortlist=50/sf0.1; both converge once the shortlist is generous).
    Also pins the exact-re-rank contract on overlapping pairs."""
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_residual_topk,
        ivfpq_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    truth_rows = brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()
    truth = {(r.query_id, r.neighbor_id) for r in truth_rows}
    kw = dict(
        k=10, nlist=16, nprobe=6, ivf_refine_iters=1, m=4, ncodes=16,
        pq_refine_iters=1, shortlist=50,
    )
    res_rows = ivfpq_residual_topk(emb, q, "vec_id", "embedding", **kw).collect()
    res = {(r.query_id, r.neighbor_id) for r in res_rows}
    plain = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(emb, q, "vec_id", "embedding", **kw).collect()
    }
    r_res = len(truth & res) / len(truth)
    r_plain = len(truth & plain) / len(truth)
    assert r_res >= r_plain, f"residual {r_res:.2f} < plain {r_plain:.2f}"
    assert r_res >= 0.6
    exact_s = {(r.query_id, r.neighbor_id): r.score for r in truth_rows}
    for r in res_rows:
        if (r.query_id, r.neighbor_id) in exact_s:
            assert abs(exact_s[(r.query_id, r.neighbor_id)] - r.score) < 1e-9


def test_cross_corpus_contamination_planted_passages(spark):
    """An eval doc sharing a >=3-token passage with train is flagged
    with exactly the overlapping gram count; a clean doc and a
    too-short doc report zeros."""
    from asritha_metamorphetl_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [
            # copies "quick brown fox jumps" -> grams: "the quick brown"? no:
            # its own grams: (quick brown fox), (brown fox jumps), (fox jumps here)
            (10, "quick brown fox jumps here"),
            (11, "completely novel eval sentence tokens"),
            (12, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.contaminated)
        for r in cross_corpus_contamination(
            train, eval_df, "text", "doc_id"
        ).collect()
    }
    assert out[10] == (3, 2, True)  # 2 of its 3 grams occur in train
    assert out[11] == (3, 0, False)
    assert out[12] == (0, 0, False)


def test_weighted_sample_statistics_and_determinism(spark):
    """E-S weighted sampling: (a) two runs are identical (hash variates,
    no RNG), (b) the sample is exactly k, (c) heavy weights are
    overrepresented — with w=9 vs w=1 at 50/50 population, the heavy
    class should take clearly more than half of a k=200 sample, (d)
    sampling is without replacement (ids unique)."""
    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [(i, 9.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    s1 = weighted_sample_without_replacement(df, "w", "id", 200).collect()
    s2 = weighted_sample_without_replacement(df, "w", "id", 200).collect()
    assert s1 == s2
    assert len(s1) == 200
    ids = [r.id for r in s1]
    assert len(set(ids)) == 200
    heavy = sum(1 for r in s1 if r.w == 9.0)
    assert heavy > 140  # E[heavy] ≈ 180 of 200; >140 is 6+ sigma safe


def test_weighted_sample_rejects_nonpositive_weight(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.0)], "id long, w double"
    )
    with pytest.raises(SparkRuntimeException, match="weight must be > 0"):
        weighted_sample_without_replacement(df, "w", "id", 2).collect()


def test_skipgrams_hand_example(spark):
    """'a b c d' at window 2 → d=1: (a,b)(b,c)(c,d); d=2: (a,c)(b,d).
    A one-token document contributes nothing and must not error."""
    from asritha_metamorphetl_spark.operators.lm import doc_skipgrams

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.w1, r.w2, r.dist)
        for r in doc_skipgrams(docs, window=2).collect()
    }
    assert got == {
        (1, "a", "b", 1),
        (1, "b", "c", 1),
        (1, "c", "d", 1),
        (1, "a", "c", 2),
        (1, "b", "d", 2),
    }


def test_countmin_never_underestimates_and_is_exact_when_wide(spark):
    """CMS contract: estimates are >= exact counts always; with width
    >> vocabulary (no collisions possible to matter) the min over
    depth rows recovers the exact count for every item."""
    from asritha_metamorphetl_spark.operators.frequent import (
        countmin_estimate,
        countmin_sketch,
    )

    toks = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1, "tok string"
    )
    exact = {"a": 7, "b": 3, "c": 1}
    sk = countmin_sketch(toks, "tok", depth=3, width=4096)
    items = spark.createDataFrame([("a",), ("b",), ("c",)], "tok string")
    est = {
        r.tok: r.cms_n
        for r in countmin_estimate(items, sk, "tok", depth=3, width=4096).collect()
    }
    assert est == exact
    # narrow width forces collisions: still never underestimates
    sk2 = countmin_sketch(toks, "tok", depth=2, width=2)
    est2 = {
        r.tok: r.cms_n
        for r in countmin_estimate(items, sk2, "tok", depth=2, width=2).collect()
    }
    assert all(est2[t] >= exact[t] for t in exact)


def test_per_group_weighted_sample_quota_and_determinism(spark):
    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [(i, "g%d" % (i % 3), 1.0 + (i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    s1 = weighted_sample_per_group(df, "g", "w", "id", 10).collect()
    s2 = weighted_sample_per_group(df, "g", "w", "id", 10).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    from collections import Counter

    per = Counter(r.g for r in s1)
    assert per == {"g0": 10, "g1": 10, "g2": 10}
    # small group: quota larger than the group returns the whole group
    s3 = weighted_sample_per_group(
        df.filter(F.col("id") < 5), "g", "w", "id", 10
    ).collect()
    assert len(s3) == 5


def test_pmi_hand_example(spark):
    """Two docs 'a b' and 'a b' → pairs (a,b)x2 at d=1, nothing else:
    c12=2, r(a)=2, c(b)=2, T=2 → pmi = ln(2*2/(2*2)) = 0."""
    from asritha_metamorphetl_spark.operators.lm import (
        doc_skipgrams,
        pmi_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    out = pmi_scores(doc_skipgrams(docs, window=2)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.w1, r.w2, r.c12, r.pmi) == ("a", "b", 2, 0.0)


def test_prefix_jaccard_join_is_complete_vs_bruteforce(spark):
    """The PPJoin guarantee: EVERY pair at/above the threshold appears
    — compare against python brute-force over all pairs of shingle
    sets, including docs whose only shared shingles are corpus-frequent
    (the case a doc-frequency-capped index misses)."""
    import itertools

    from asritha_metamorphetl_spark.operators.setjoin import (
        prefix_jaccard_pairs,
    )

    base = [f"tok{j % 11}x{j}" for j in range(40)]
    texts = {}
    for i in range(30):
        words = list(base)
        # 3 families (substitution site), plus per-doc noise for some:
        # family members differ from each other by <= 2 word sites
        # (J >= ~0.85 at 40 tokens), cross-family pairs fall below t
        words[i % 3] = f"fam{i % 3}"
        if i % 5 == 0:
            words[20] = f"noise{i}"
        if i % 7 == 0:
            words[35] = f"late{i}"
        texts[i] = " ".join(words)

    def shingles(s):
        t = [x for x in s.split(" ") if x]
        return {" ".join(t[j : j + 3]) for j in range(len(t) - 2)}

    want = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        inter = len(sa & sb)
        if inter * 5 >= 4 * (len(sa) + len(sb) - inter):
            want.add((a, b))
    assert want  # the fixture must actually contain qualifying pairs

    docs = spark.createDataFrame(
        [(i, s) for i, s in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_jaccard_pairs(docs, t_num=4, t_den=5).collect()
    }
    assert got == want


def test_countmin_partials_fold_to_full_sketch(spark):
    """Linearity: sketch(A) + sketch(B) folded cell-wise equals
    sketch(A ∪ B) exactly — the property the streaming fold relies on."""
    from asritha_metamorphetl_spark.operators.frequent import countmin_sketch

    toks = spark.createDataFrame(
        [(f"t{i % 13}",) for i in range(400)], "tok string"
    )
    a = toks.filter(F.crc32(F.col("tok")) % 2 == 0)
    b = toks.filter(F.crc32(F.col("tok")) % 2 == 1)
    folded = (
        countmin_sketch(a, "tok")
        .unionByName(countmin_sketch(b, "tok"))
        .groupBy("row", "cell")
        .agg(F.sum("n").alias("n"))
    )
    full = countmin_sketch(toks, "tok")
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_containment_join_catches_quotes_jaccard_misses(spark):
    """A short doc quoted whole inside a much larger one: containment
    ≈ 1.0, Jaccard ≈ |small|/|large| — the containment join must
    surface it (completeness vs brute force over all oriented pairs)
    while the Jaccard join at 4/5 structurally cannot."""
    import itertools

    from asritha_metamorphetl_spark.operators.setjoin import (
        containment_pairs,
        prefix_jaccard_pairs,
    )

    quote = [f"q{j}" for j in range(12)]
    texts = {0: " ".join(quote)}
    # doc 1 embeds the quote inside 60 tokens of other content
    texts[1] = " ".join([f"a{j}" for j in range(30)] + quote + [f"b{j}" for j in range(18)])
    # unrelated docs + one partial quote (drops below 9/10)
    texts[2] = " ".join(f"c{j}" for j in range(40))
    texts[3] = " ".join([f"d{j}" for j in range(30)] + quote[:6])

    def shingles(s):
        t = [x for x in s.split(" ") if x]
        return {" ".join(t[j : j + 3]) for j in range(len(t) - 2)}

    want = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        small, large = (a, b) if (len(sa), a) < (len(sb), b) else (b, a)
        n_small = min(len(sa), len(sb))
        if len(sa & sb) * 10 >= 9 * n_small:
            want.add((small, large))
    assert want == {(0, 1)}  # the full quote, nothing else

    docs = spark.createDataFrame(
        [(i, s) for i, s in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_small, r.doc_large)
        for r in containment_pairs(docs, t_num=9, t_den=10).collect()
    }
    assert got == want
    jacc = {
        (r.doc_a, r.doc_b)
        for r in prefix_jaccard_pairs(docs, t_num=4, t_den=5).collect()
    }
    assert (0, 1) not in jacc  # Jaccard blind to the quote, as claimed


def test_token_entropy_hand_values(spark):
    """'a a a a' → 0 nats; 'a b c d' → ln(4); 'a a b b' → ln(2)."""
    import math

    from asritha_metamorphetl_spark.operators.lm import token_entropy

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.entropy_nats for r in token_entropy(docs).collect()}
    assert got[1] == 0.0
    assert abs(got[2] - round(math.log(4), 6)) < 1e-9
    assert abs(got[3] - round(math.log(2), 6)) < 1e-9


def test_robust_outliers_hand_example(spark):
    """9 docs of lengths 10..18 in one lang: n=9 → q1 at rank 3 (12),
    q3 at rank 7 (16), IQR 4 → fences [6, 22]: no outliers; adding a
    length-40 doc shifts ranks and flags exactly the extreme."""
    from asritha_metamorphetl_spark.plans.registry import all_queries  # noqa: F401
    from asritha_metamorphetl_spark.plans.curation_queries import (
        robust_length_outliers,
    )

    def doc(i, n):
        return (i, " ".join(["w"] * n), "en", "s", n)

    rows = [doc(i, 10 + i) for i in range(9)] + [doc(9, 40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.lang: r for r in robust_length_outliers(spark, d).collect()}
    r = out["en"]
    # n=10: q1 at rank (10+3)//4 = 3 → len 12; q3 at rank (30+3)//4 = 8 → 17
    assert (r.n_docs, r.q1, r.q3) == (10, 12, 17)
    # fences: low < 2*12-15=9/2 → none; high > 2*17+15=49/2=24.5 → the 40
    assert (r.n_low, r.n_high) == (0, 1)


def test_interval_merge_hand_example(spark):
    """User 1: [0,100) ∪ [50,80) ∪ [90,200) merge to one interval of
    200s; [300,310) stands alone — the early long interval swallowing
    later short ones is the case lag-based sessionization gets wrong."""
    from asritha_metamorphetl_spark.plans.registry import all_queries  # noqa: F401
    import os, tempfile
    from pyspark.sql import functions as F  # noqa: F811
    from asritha_metamorphetl_spark.plans.operator_queries import (
        merged_event_intervals,
    )

    rows = [
        # (event_id, user, epoch_sec, value): dur = 60 + round(v*100)%3600
        (1, 1, 1000, 0.40),  # dur 100 -> [1000, 1100)
        (2, 1, 1020, 0.00),  # dur  60 -> [1020, 1080) swallowed by #1
        (3, 1, 1090, 0.50),  # dur 110 -> [1090, 1200) chains via #1's end
        (4, 1, 1300, 0.00),  # dur  60 -> [1300, 1360) stands alone
    ]
    df = spark.createDataFrame(
        [
            (e, u, s, v, "t", "{}")
            for (e, u, s, v) in rows
        ],
        "event_id long, user_id long, sec long, value double, event_type string, props string",
    ).select(
        "event_id", F.col("sec").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {r.user_id: r for r in merged_event_intervals(spark, d).collect()}
    r = out[1]
    assert (r.n_intervals, r.covered_sec, r.n_events) == (2, 260, 4)


def test_grouped_percent_rank_matches_sql_window(spark):
    """Collapsed-frame per-group pr must equal the classic
    percent_rank window (SQL tie semantics), including single-row
    groups (0.0) and tie plateaus."""
    from pyspark.sql import Window as W

    from asritha_metamorphetl_spark.operators.ranks import (
        grouped_percent_rank,
    )

    rows = [(i, "g%d" % (i % 3), float((i * 7) % 5)) for i in range(60)]
    rows.append((100, "solo", 9.0))
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {
        (r.id): round(r.pr, 9)
        for r in grouped_percent_rank(
            df, ["g"], F.col("v"), out_col="pr"
        ).collect()
    }
    want = {
        r.id: round(r.pr, 9)
        for r in df.withColumn(
            "pr",
            F.percent_rank().over(W.partitionBy("g").orderBy("v")),
        ).collect()
    }
    assert got == want
    assert got[100] == 0.0


def test_weighted_topk_merge_algebra(spark):
    """topk(topk(A) ∪ B) == topk(A ∪ B): the mergeability the
    streaming fold relies on, plus idempotency — re-folding rows
    already in the state changes nothing after the id-dedup."""
    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_without_replacement as wswr,
    )

    rows = [(i, 1.0 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 2 == 1)

    def topk(frame):
        return (
            frame.dropDuplicates(["id"])
            .orderBy(F.col("es_key").desc(), F.col("id"))
            .limit(50)
        )

    full = sorted(map(tuple, wswr(df, "w", "id", 50).collect()))
    folded = topk(wswr(a, "w", "id", 50).unionByName(wswr(b, "w", "id", 50)))
    assert sorted(map(tuple, folded.collect())) == full
    # idempotency: folding B's keyed rows again is a no-op
    refolded = topk(folded.unionByName(wswr(b, "w", "id", 50)))
    assert sorted(map(tuple, refolded.collect())) == full


class TestWhiteBoxHLL:
    def _df(self, spark, vals):
        return spark.createDataFrame(
            [(v,) for v in vals], "x long"
        ).repartition(4)

    def test_registers_match_reference_python(self, spark):
        """Registers equal a straight-line Python HLL over the same
        md5-derived 48-bit hash — bucket, remainder, and rank all
        integer-exact."""
        import hashlib

        from asritha_metamorphetl_spark.operators.frequent import (
            HLL_HASH_BITS,
            HLL_P,
            hll_registers,
        )

        vals = list(range(500))
        m = 1 << HLL_P
        width = HLL_HASH_BITS - HLL_P
        want: dict[int, int] = {}
        for v in vals:
            h = int(hashlib.md5(f"hll:{v}".encode()).hexdigest()[:12], 16)
            w = h // m
            rank = (width + 1) - w.bit_length() if w > 0 else width + 1
            b = h % m
            want[b] = max(want.get(b, 0), rank)
        got = {
            r["bucket"]: r["register"]
            for r in hll_registers(self._df(spark, vals), "x").collect()
        }
        assert got == want

    def test_register_fold_is_max_mergeable(self, spark):
        """max-fold of OVERLAPPING splits == one-shot registers: the
        idempotence the streaming append path relies on."""
        import pyspark.sql.functions as F

        from asritha_metamorphetl_spark.operators.frequent import (
            hll_registers,
        )

        df = self._df(spark, list(range(2000)))
        whole = {
            r["bucket"]: r["register"]
            for r in hll_registers(df, "x").collect()
        }
        # overlapping thirds (every element appears at least once,
        # boundary elements twice) — duplicates must change nothing
        parts = (
            hll_registers(df.filter("x < 800"), "x")
            .unionByName(hll_registers(df.filter("x >= 600 AND x < 1500"), "x"))
            .unionByName(hll_registers(df.filter("x >= 1400"), "x"))
            .groupBy("bucket")
            .agg(F.max("register").alias("register"))
        )
        folded = {r["bucket"]: r["register"] for r in parts.collect()}
        assert folded == whole

    def test_estimate_error_within_bound(self, spark):
        from asritha_metamorphetl_spark.operators.frequent import (
            hll_estimate,
            hll_registers,
        )

        n = 5000
        regs = hll_registers(self._df(spark, list(range(n))), "x")
        est = hll_estimate(regs, ()).first()["hll_est"]
        assert abs(est - n) / n < 0.40


def test_cms_width_matches_sql_twin():
    """Python _cms_width == the oracle's 1 << length(bin(N // 10))
    (GREATEST 1024) for a spread of corpus sizes, including the floor
    edge at N < 10240."""
    import duckdb

    from asritha_metamorphetl_spark.plans.sketch_queries import _cms_width

    con = duckdb.connect()
    for n in (0, 5, 6000, 10239, 10240, 60175, 600572, 123456789):
        (w_sql,) = con.sql(
            f"SELECT GREATEST(1024, 1::BIGINT"
            f" << length(bin(({n} // 10)::BIGINT)))"
        ).fetchone()
        assert _cms_width(n) == w_sql, n


class TestJoinViewDelta:
    def test_union_equals_full_recompute(self, spark):
        from asritha_metamorphetl_spark.operators.incremental import (
            join_view_delta,
        )

        a = spark.createDataFrame(
            [(k, f"a{k}") for k in range(40)], "k long, av string"
        )
        b = spark.createDataFrame(
            [(k % 25, i, f"b{k}_{i}") for k in range(50) for i in range(2)],
            "k long, i long, bv string",
        )
        a_old, a_delta = a.filter("k % 3 != 0"), a.filter("k % 3 = 0")
        b_old, b_delta = b.filter("i = 0"), b.filter("i = 1")
        got = (
            a_old.join(b_old, "k")
            .unionByName(join_view_delta(a_old, a_delta, b_old, b_delta, ["k"]))
            .collect()
        )
        want = a.join(b, "k").collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_terms_are_disjoint_no_duplicates(self, spark):
        """Each (a-row, b-row) pair lands in exactly one quadrant — the
        union needs no dedup even when keys repeat on both sides."""
        from asritha_metamorphetl_spark.operators.incremental import (
            join_view_delta,
        )

        a = spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, "z")], "k long, av string"
        )
        b = spark.createDataFrame(
            [(1, "p"), (1, "q"), (2, "r")], "k long, bv string"
        )
        a_old, a_delta = a.filter("av != 'y'"), a.filter("av = 'y'")
        b_old, b_delta = b.filter("bv != 'q'"), b.filter("bv = 'q'")
        full = a.join(b, "k").count()
        old = a_old.join(b_old, "k").count()
        delta = join_view_delta(a_old, a_delta, b_old, b_delta, ["k"]).count()
        assert old + delta == full


class TestPoissonBootstrap:
    def test_counts_distribution_and_determinism(self, spark):
        """Multiplicities follow Poisson(1) closely (mean ~1, P(0) ~.368)
        and are pure functions of (replicate, id)."""
        import pyspark.sql.functions as F

        from asritha_metamorphetl_spark.operators.sampling import (
            poisson_bootstrap_counts,
        )

        df = spark.createDataFrame(
            [(str(i),) for i in range(4000)], "id string"
        ).withColumn("b", F.lit(0))
        c = poisson_bootstrap_counts(F.col("id"), F.col("b"))
        stats = df.select(
            F.avg(c).alias("m"),
            F.avg((c == 0).cast("double")).alias("p0"),
            F.max(c).alias("mx"),
        ).first()
        assert abs(stats["m"] - 1.0) < 0.05
        assert abs(stats["p0"] - 0.3679) < 0.03
        assert stats["mx"] <= 7
        again = df.select(c.alias("c")).collect()
        once = df.select(c.alias("c")).collect()
        assert once == again

    def test_replicates_differ(self, spark):
        import pyspark.sql.functions as F

        from asritha_metamorphetl_spark.operators.sampling import (
            poisson_bootstrap_counts,
        )

        df = spark.createDataFrame([(str(i),) for i in range(200)], "id string")
        c0 = poisson_bootstrap_counts(F.col("id"), F.lit(0))
        c1 = poisson_bootstrap_counts(F.col("id"), F.lit(1))
        n_diff = df.filter(c0 != c1).count()
        assert n_diff > 50  # independent hash streams per replicate

    def test_ci_brackets_true_mean_on_synthetic(self, spark):
        """CI from the registered query's machinery brackets the
        population mean for an iid sample (sanity, not a coverage
        proof)."""
        from asritha_metamorphetl_spark.plans.registry import all_queries
        from tests.conftest import SF_CORRECT

        row = all_queries()["bootstrap_mean_ci"](spark, SF_CORRECT).first()
        assert row["ci_lo"] <= row["point_mean"] <= row["ci_hi"]
        spread = (row["ci_hi"] - row["ci_lo"]) / row["point_mean"]
        assert 0 < spread < 0.1  # tight at n~15k, but nonzero


def test_countmin_weighted_equals_expanded(spark):
    """Round-13 contract: building the sketch over a (key, count)
    aggregate with ``weight=`` yields EXACTLY the sketch of the
    expanded multiset — every occurrence of a key hashes to the same
    depth cells, so sum(weight) per cell == count(*) per cell."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.operators.frequent import (
        countmin_sketch,
    )

    raw = spark.createDataFrame(
        [Row(tok=t) for t in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]]
    )
    grouped = raw.groupBy("tok").agg(F.count(F.lit(1)).alias("w"))
    expanded = {
        (r["row"], r["cell"], r["n"])
        for r in countmin_sketch(raw, "tok", depth=3, width=64).collect()
    }
    weighted = {
        (r["row"], r["cell"], r["n"])
        for r in countmin_sketch(
            grouped, "tok", depth=3, width=64, weight="w"
        ).collect()
    }
    assert weighted == expanded
