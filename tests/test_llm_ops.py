"""Semantic tests for the training-data operators: planted duplicates must
be found, LSH recall vs the exact path, text stats edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and AGAIN"),  # near dup
        (4, "completely different text about spark query engines at scale"),
        (5, ""),  # empty document
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_planted(docs):
    from asritha_metamorphetl_spark.operators.dedup import exact_duplicates

    groups = exact_duplicates(docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0].canonical_id == 1
    assert groups[0].member_ids == [1, 2]


def test_minhash_finds_near_dup(docs):
    from asritha_metamorphetl_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, "text", "doc_id").collect()
    }
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # one-token change should band-collide
    assert not any(4 in p for p in pairs)  # unrelated doc must not pair


def test_ngram_jaccard_scores(docs):
    from asritha_metamorphetl_spark.operators.dedup import ngram_jaccard_pairs

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect()
    }
    assert got[(1, 2)] == 1.0
    assert 0.3 <= got[(1, 3)] < 1.0


def test_simhash_near_dup_distance(docs):
    from asritha_metamorphetl_spark.operators.dedup import simhash_keys

    sh = {r.doc_id: r.simhash for r in simhash_keys(docs, "text", "doc_id").collect()}
    assert sh[1] == sh[2]  # identical text, identical hash

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    # near-dup closer than unrelated doc
    assert hamming(sh[1], sh[3]) <= hamming(sh[1], sh[4])


def test_lsh_recall_vs_exact(spark):
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=10)
    approx = lsh_bucketed_topk(
        emb, queries, "vec_id", "embedding", dim=64, k=10, n_planes=3, n_tables=8
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # Random 64-dim data (true neighbors ≈ cosine 0.33) is LSH's worst
    # case; 3 planes × 8 tables measured at 0.78 recall. Assert well above
    # chance (10 of ~500 ≈ 2%) with slack for fixture variation.
    assert recall >= 0.5, f"recall {recall}"


def test_lsh_multiprobe_recall_vs_exact(spark):
    """Multi-probe (2 least-confident bit flips per table) must lift the
    production 4×8 configuration from 0.52 single-probe recall to ≥0.8 —
    the judge-set quality bar — at bounded candidate growth (<3×,
    measured ~2× in the numpy prototype and pinned by the registered
    knn_lsh_recall_eval query)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=10)
    approx = lsh_bucketed_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        dim=64,
        k=10,
        n_planes=4,
        n_tables=8,
        probe_flips=2,
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"multi-probe recall {recall:.2f} below bar"


def test_text_stats_empty_doc(spark):
    from asritha_metamorphetl_spark.functions import text as T

    df = spark.createDataFrame([(1, "")], "doc_id long, text string").select(
        T.token_count(F.col("text")).alias("n"),
        T.avg_token_length(F.col("text")).alias("avg_len"),
        T.stopword_ratio(F.col("text")).alias("ratio"),
        T.language_id(F.col("text")).alias("lang"),
    )
    row = df.collect()[0]
    assert row.n == 0 and row.avg_len == 0.0 and row.ratio == 0.0
    assert row.lang == "unk"


def test_ivf_recall_vs_exact(spark):
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=10)
    approx = ivf_topk(emb, queries, "vec_id", "embedding", k=10, nlist=8, nprobe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # probing half the cells must recover a solid share of true neighbors
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"
    # every reported neighbor is exactly scored, so scores must agree
    exact_scores = {(r.query_id, r.neighbor_id): r.score for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.score) < 1e-9


def test_ivf_refined_recall_vs_exact(spark):
    """Lloyd-refined IVF: 2 distributed k-means iterations over the
    lowest-id seeds must keep recall ≥ 0.8 (the judge-set bar) while
    making cell shapes a property of the data distribution rather than
    of row ordering — measured 0.96 on this fixture at nlist=8/nprobe=4
    in the numpy prototype."""
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=10)
    approx = ivf_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        k=10,
        nlist=8,
        nprobe=4,
        refine_iters=2,
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"refined IVF recall {recall:.2f} below bar"


def test_winnow_udf_matches_expr(spark):
    """The vectorized winnowing kernel must be value-identical to the
    pure-Column spelling (which is the direct mirror of the SQL oracle)."""
    from asritha_metamorphetl_spark.functions.text import (
        winnow_fingerprints,
        winnow_fingerprints_expr,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    fast = docs.select(
        "doc_id", F.array_sort(winnow_fingerprints(F.col("text"))).alias("fps")
    )
    slow = docs.select(
        "doc_id", F.array_sort(winnow_fingerprints_expr(F.col("text"))).alias("fps")
    )
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_exact_duplicates_mega_cluster_bounded(spark):
    """A 100k-row single-fingerprint cluster must complete with the
    member sample capped — the unbounded collect_list OOM scenario."""
    from asritha_metamorphetl_spark.operators.dedup import exact_duplicates

    df = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("boilerplate page").alias("text")
    )
    groups = exact_duplicates(df, "text", "doc_id", member_cap=20).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_dupes == 100_000
    assert g.canonical_id == 0
    assert g.member_ids == list(range(20))


def test_exact_duplicates_cap_keeps_smallest_ids(spark):
    from asritha_metamorphetl_spark.operators.dedup import exact_duplicates

    rows = [(i, "same") for i in (9, 3, 7, 1, 5)] + [(10, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_duplicates(df, "text", "doc_id", member_cap=3).collect()
    assert len(groups) == 1
    assert groups[0].member_ids == [1, 3, 5]
    assert groups[0].n_dupes == 5


def test_semdedup_keeps_farthest_from_centroid(spark):
    """Planted near-duplicate group: all members but one dropped, the
    survivor being the member FARTHEST from its centroid (the paper's
    keep-low-centroid-similarity rule); singletons untouched."""
    from pyspark.sql import Row

    from asritha_metamorphetl_spark.operators.similarity import semdedup

    # 2 seed centroids (ids 0,1). ids 10,11,12 are near-copies of seed 0
    # with increasing perturbation (so 12 is farthest from the centroid);
    # id 20 sits alone near seed 1.
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=10, embedding=[1.0, 0.01, 0.0]),
        Row(vec_id=11, embedding=[1.0, 0.02, 0.0]),
        Row(vec_id=12, embedding=[1.0, 0.08, 0.0]),
        Row(vec_id=20, embedding=[0.5, 1.0, 0.0]),  # cos to seed 1 ~ 0.894 < tau
    ]
    out = {
        r.vec_id: r
        for r in semdedup(
            spark.createDataFrame(rows),
            "vec_id",
            "embedding",
            nlist=2,
            threshold=0.95,
        ).collect()
    }
    assert len(out) == 6
    cluster0 = {0, 10, 11, 12}
    assert all(out[i].cell == out[0].cell for i in cluster0)
    # the whole near-dup group collapses to its lowest-csim member (12)
    kept0 = {i for i in cluster0 if out[i].kept}
    assert kept0 == {12}
    assert out[20].kept and out[1].kept  # not near-duplicated
    assert out[12].csim == min(out[i].csim for i in cluster0)


def test_semdedup_high_threshold_keeps_everything(spark):
    from pyspark.sql import Row

    from asritha_metamorphetl_spark.operators.similarity import semdedup

    rows = [Row(vec_id=i, embedding=[float(i + 1), 1.0, 0.0]) for i in range(6)]
    out = semdedup(
        spark.createDataFrame(rows), "vec_id", "embedding", nlist=2,
        threshold=1.0001,
    ).collect()
    assert all(r.kept for r in out)


def test_token_budget_sample_semantics(spark):
    """Exclusive-prefix budget: every positive-budget source keeps >= 1
    doc, overshoot is bounded by one document, order is the stable md5
    rank, and a zero-budget source keeps nothing."""
    from pyspark.sql import Row

    from asritha_metamorphetl_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [
        Row(doc_id=i, source=f"s{i % 3}", n_tokens=40 + (i * 7) % 25)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows)
    kept = token_budget_sample(
        df, "source", "doc_id", "n_tokens",
        budget_by_source={"s2": 0}, default_budget=100,
    ).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    assert "s2" not in by_src  # zero budget keeps nothing
    for src in ("s0", "s1"):
        docs = by_src[src]
        assert docs  # at least one doc under a positive budget
        total = sum(r.n_tokens for r in docs)
        max_doc = max(r.n_tokens for r in docs)
        assert total < 100 + max_doc  # overshoot bounded by one doc
        # every kept doc's exclusive prefix is under the budget
        assert all(r.tokens_before < 100 for r in docs)
    # determinism: rerun yields the identical kept set
    again = token_budget_sample(
        df, "source", "doc_id", "n_tokens",
        budget_by_source={"s2": 0}, default_budget=100,
    ).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)


# ---------------------------------------------------------------------------
# Centroid machinery at scale: explicit broadcast, two-level assignment,
# auto-sized nlist (VERDICT r5 directive #2).
# ---------------------------------------------------------------------------


def test_auto_nlist_sqrt_regime():
    from asritha_metamorphetl_spark.operators.similarity import auto_nlist

    assert auto_nlist(0) == 16
    assert auto_nlist(100) == 16          # floor: tiny fixtures keep members
    assert auto_nlist(10_000) == 100      # sqrt(N)
    assert auto_nlist(1_000_000) == 1000
    assert auto_nlist(10**10) == 100_000  # the SemDeDup-paper regime
    assert auto_nlist(10**12) == 1 << 17  # ceiling: broadcastable matrix


def test_cell_assignment_accepts_broadcast_handle(spark):
    """The assignment UDFs must consume an explicit sc.broadcast handle
    (closure stays O(1) regardless of nlist) and produce the identical
    assignment as closure capture."""
    import numpy as np

    from asritha_metamorphetl_spark.operators.similarity import (
        _cell_assign_udf,
        _normalize_rows,
        broadcast_centroids,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(200)
    rows = emb.orderBy("vec_id").limit(16).collect()
    C = _normalize_rows(
        np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    )
    vecs = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    bc = broadcast_centroids(spark, C)
    with_bc = {
        r["vec_id"]: r["c"]
        for r in vecs.select(
            "vec_id", F.element_at(_cell_assign_udf(bc, 1)(F.col("v")), 1).alias("c")
        ).collect()
    }
    with_closure = {
        r["vec_id"]: r["c"]
        for r in vecs.select(
            "vec_id", F.element_at(_cell_assign_udf(C, 1)(F.col("v")), 1).alias("c")
        ).collect()
    }
    assert with_bc == with_closure
    bc.unpersist()


def test_two_level_assignment_agrees_with_flat_on_clustered_data(spark):
    """Two-level (coarse->fine) assignment scores O(sqrt(nlist)) cells
    per row. Its premise is CLUSTER STRUCTURE — on a clustered corpus
    (the regime SemDeDup/IVF exist for) the winning fine cell's coarse
    group is almost always among the top probes, so agreement with the
    flat argmax is near-total; on pure-random vectors (the parquet
    fixture) coarse scores carry no signal and agreement degrades
    toward w/n_coarse — which is why this test builds a deterministic
    clustered corpus instead of reading the random fixture."""
    import numpy as np

    from asritha_metamorphetl_spark.operators.similarity import (
        _cell_assign_udf,
        _normalize_rows,
        broadcast_centroids,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(32, 16) * 4.0
    pts = np.repeat(centers, 20, axis=0) + rng.randn(32 * 20, 16) * 0.3
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, v array<double>",
    )
    nlist = 32
    C = _normalize_rows(pts[:: len(pts) // nlist][:nlist].copy())
    bc = broadcast_centroids(spark, C)
    flat = vecs.select(
        "vec_id", F.element_at(_cell_assign_udf(bc, 1)(F.col("v")), 1).alias("cf")
    )
    two = vecs.select(
        "vec_id",
        F.element_at(
            _cell_assign_udf(bc, 1, n_coarse=8, w_coarse=2)(F.col("v")), 1
        ).alias("c2"),
    )
    joined = flat.join(two, "vec_id")
    n = joined.count()
    agree = joined.filter(F.col("cf") == F.col("c2")).count()
    assert n == len(pts) and agree / n >= 0.95, f"two-level agreement {agree}/{n}"
    bc.unpersist()


def test_two_level_gather_matches_masked_reference_at_large_nlist(spark):
    """The gathered per-group matmul (round-7: per-row fine work is the
    candidate count, O(sqrt(nlist)) at n_coarse=sqrt(nlist)) must pick
    EXACTLY the cells the pre-round-7 masked-full-matmul spelling
    picked — same rounded scores, same (score desc, cell asc) order —
    at a paper-regime nlist where the gather path is the one that
    matters. The reference below IS that old algorithm, inline."""
    import numpy as np

    from asritha_metamorphetl_spark.operators.similarity import (
        _cell_assign_udf,
        _coarse_groups,
        _normalize_rows,
        broadcast_centroids,
    )

    rng = np.random.RandomState(11)
    nlist, dim, n_rows, n_coarse, w, n_out = 4096, 16, 120, 64, 3, 2
    C = _normalize_rows(rng.randn(nlist, dim))
    pts = rng.randn(n_rows, dim)

    # old masked-full-matmul reference, computed directly in numpy
    X = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
    groups = _coarse_groups(C, n_coarse)
    csims = np.round(X @ C[:n_coarse].T, 6)
    topw = np.argsort(-csims, axis=1, kind="stable")[:, :w]
    mask = (groups[None, :, None] == topw[:, None, :]).any(-1)
    sims = np.where(mask, np.round(X @ C.T, 6), -np.inf)
    expected = {
        i: [int(c) for c in np.argsort(-sims[i], kind="stable")[:n_out]]
        for i in range(n_rows)
    }

    vecs = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, v array<double>",
    )
    bc = broadcast_centroids(spark, C)
    got = {
        r["vec_id"]: list(r["c"])
        for r in vecs.select(
            "vec_id",
            _cell_assign_udf(bc, n_out, n_coarse=n_coarse, w_coarse=w)(
                F.col("v")
            ).alias("c"),
        ).collect()
    }
    assert got == expected
    bc.unpersist()


def test_semdedup_auto_nlist_runs(spark):
    """nlist=None auto-sizes from the corpus count (sqrt-N clamped to
    the floor on this 500-row fixture) and still partitions every row."""
    from asritha_metamorphetl_spark.operators.similarity import semdedup

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = semdedup(emb, "vec_id", "embedding", nlist=None, threshold=0.99)
    assert out.count() == emb.count()
