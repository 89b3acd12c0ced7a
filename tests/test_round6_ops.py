"""Round-6 operator tests: PQ/ADC similarity search, duplicated-passage
spans, the model-as-data quality classifier, and UniMax allocation."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_pq_recall_vs_exact_l2(spark):
    """ADC shortlist + exact re-rank must recover most true L2
    neighbors; every reported distance is the exact metric."""
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_l2_topk,
        pq_adc_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_l2_topk(emb, queries, "vec_id", "embedding", k=10)
    approx = pq_adc_topk(
        emb, queries, "vec_id", "embedding", k=10, m=4, ncodes=8,
        refine_iters=1, shortlist=30,
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r.query_id, r.neighbor_id) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"PQ recall {recall:.2f} below floor"
    # re-ranked distances are the exact metric, so overlapping pairs
    # must carry identical distances
    exact_d = {(r.query_id, r.neighbor_id): r.dist for r in exact.collect()}
    for r in a_rows:
        if (r.query_id, r.neighbor_id) in exact_d:
            assert abs(exact_d[(r.query_id, r.neighbor_id)] - r.dist) < 1e-9


def test_pq_codebooks_shape_and_bad_m(spark):
    from asritha_metamorphetl_spark.operators.similarity import (
        pq_train_codebooks,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    B = pq_train_codebooks(emb, "embedding", "vec_id", m=4, ncodes=8)
    assert B.shape == (4, 8, 16)
    assert np.isfinite(B).all()
    with pytest.raises(ValueError, match="not divisible"):
        pq_train_codebooks(emb, "embedding", "vec_id", m=7, ncodes=8)


def test_pq_encode_deterministic_under_repartition(spark):
    """Codes are a pure function of (vector, codebooks) — partitioning
    must not change them, and every code is in range."""
    from asritha_metamorphetl_spark.operators.similarity import (
        _pq_assign_udf,
        broadcast_centroids,
        pq_train_codebooks,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    B = pq_train_codebooks(emb, "embedding", "vec_id", m=4, ncodes=8)
    bc = broadcast_centroids(spark, B)
    from asritha_metamorphetl_spark.operators.similarity import _to_double

    def enc(df):
        return {
            r.vec_id: tuple(r.codes)
            for r in df.select(
                "vec_id",
                _pq_assign_udf(bc, 4, 16)(
                    _to_double(F.col("embedding"))
                ).alias("codes"),
            ).collect()
        }

    a = enc(emb.repartition(1))
    b = enc(emb.repartition(7, "vec_id"))
    assert a == b
    assert all(
        len(codes) == 4 and all(0 <= c < 8 for c in codes)
        for codes in a.values()
    )


def test_dup_passage_spans_known_corpus(spark):
    """Two documents sharing a 5-token run produce exactly one span
    each, covering that run; a unique document produces none."""
    from asritha_metamorphetl_spark.operators.dedup import (
        duplicated_passage_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e x y z"),
            (2, "q w a b c d e r"),
            (3, "totally unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: (r.span_start, r.span_end, r.n_grams)
        for r in duplicated_passage_spans(docs, "text", "doc_id").collect()
    }
    # shared run "a b c d e": grams (a b c)(b c d)(c d e) at doc1 pos
    # 1-3 → tokens 1..5; at doc2 pos 3-5 → tokens 3..7
    assert rows == {1: (1, 5, 3), 2: (3, 7, 3)}


def test_dup_passage_spans_merges_adjacent_runs(spark):
    """Two overlapping shared runs in one doc merge into one island."""
    from asritha_metamorphetl_spark.operators.dedup import (
        duplicated_passage_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "a b c d z z z"),
            (3, "z c d e f g z"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: (r.span_start, r.span_end, r.n_grams)
        for r in duplicated_passage_spans(docs, "text", "doc_id").collect()
    }
    # doc1: grams 1-2 shared with doc2, grams 3-5 shared with doc3 —
    # positions 1..5 are contiguous, so ONE span covering tokens 1..7
    assert rows[1] == (1, 7, 5)


def test_quality_logit_threshold_and_fallback(spark):
    """kept ⇔ score ≥ 0.5, and an unknown language falls back to the
    default coefficients instead of dropping the row."""
    from asritha_metamorphetl_spark.plans.passage_queries import (
        quality_logit_scores,
    )
    from tests.conftest import SF_SMOKE as sf

    out = quality_logit_scores(spark, sf)
    rows = out.collect()
    assert len(rows) == spark.read.parquet(f"{sf}/documents.parquet").count()
    for r in rows:
        assert r.kept == (r.score >= 0.5)
        assert 0.0 <= r.score <= 1.0


def _waterfill(tokens: list[int], frac: float, cap: float):
    """Reference sequential water-fill."""
    caps = sorted(
        (cap * t, i) for i, t in enumerate(tokens)
    )
    budget = sum(tokens) * frac
    rem = budget
    alloc = {}
    n = len(caps)
    for j, (c, i) in enumerate(caps):
        share = rem / (n - j)
        if c <= share:
            alloc[i] = c
            rem -= c
        else:
            # all remaining get the common level
            level = rem / (n - j)
            for _, i2 in caps[j:]:
                alloc[i2] = level
            break
    return alloc


@settings(max_examples=15, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=10, max_value=10_000), min_size=2, max_size=12),
    frac=st.floats(min_value=0.1, max_value=0.99),
)
def test_unimax_matches_sequential_waterfill(spark, tokens, frac):
    from asritha_metamorphetl_spark.operators.sampling import unimax_allocation
    from pyspark.sql import Window

    stats = spark.createDataFrame(
        [(f"s{i}", t) for i, t in enumerate(tokens)],
        "source string, n_tokens long",
    ).withColumn(
        "total",
        F.sum("n_tokens").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    out = unimax_allocation(
        stats, "source", "n_tokens",
        budget=F.col("total").cast("double") * F.lit(frac), max_epochs=1.0,
    ).collect()
    ref = _waterfill(tokens, frac, 1.0)
    got = {int(r.source[1:]): r.allocation for r in out}
    assert set(got) == set(ref)
    for i in ref:
        assert got[i] == pytest.approx(ref[i], rel=1e-9, abs=1e-5)
    # allocations never exceed capacity, and the budget is exhausted
    # (unless everything capped)
    total_alloc = sum(got.values())
    budget = sum(tokens) * frac
    for r in out:
        assert r.allocation <= r.capacity + 1e-6
    if not all(r.capped for r in out):
        assert total_alloc == pytest.approx(budget, rel=1e-6, abs=1e-3)


def test_unimax_all_capped(spark):
    """Budget above total capacity: every source caps out at its full
    capacity and the water level path is never taken."""
    from asritha_metamorphetl_spark.operators.sampling import unimax_allocation

    stats = spark.createDataFrame(
        [("a", 100), ("b", 300)], "source string, n_tokens long"
    )
    out = unimax_allocation(
        stats, "source", "n_tokens", budget=F.lit(10_000.0), max_epochs=1.0
    ).collect()
    assert all(r.capped for r in out)
    assert {r.source: r.allocation for r in out} == {"a": 100.0, "b": 300.0}


def test_lsh_banded_carry_cols_ride_through(spark):
    """``carry_cols`` (r14: the incremental join's base/delta flag)
    must ride through the banding unchanged — same (doc_id, band_key)
    rows as the plain call, each tagged with its input row's flag."""
    from asritha_metamorphetl_spark.operators.dedup import lsh_banded

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").withColumn(
        "flag", F.col("doc_id") % 2 == 0
    )
    plain = {
        (r.doc_id, r.band_key)
        for r in lsh_banded(docs, "text", "doc_id").collect()
    }
    carried = lsh_banded(
        docs, "text", "doc_id", carry_cols=("flag",)
    ).collect()
    assert {(r.doc_id, r.band_key) for r in carried} == plain
    assert all(r.flag == (r.doc_id % 2 == 0) for r in carried)


def test_incremental_dedup_equals_full_minus_base_pairs(spark):
    """The incremental operator must find EXACTLY the full self-join's
    pairs that involve at least one delta doc — no more (no phantom
    collisions) and no fewer (no missed cross pairs)."""
    from asritha_metamorphetl_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )
    from asritha_metamorphetl_spark.operators.sampling import hash_bucket

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bucket = hash_bucket(F.col("doc_id"), 10)
    base, delta = docs.filter(bucket <= 7), docs.filter(bucket >= 8)
    delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}

    full = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, "text", "doc_id").collect()
    }
    want = {
        (a, b) for a, b in full if a in delta_ids or b in delta_ids
    }
    inc_rows = minhash_lsh_pairs_incremental(
        base, delta, "text", "doc_id"
    ).collect()
    # normalize to the full self-join's (min, max) orientation
    got = {(min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in inc_rows}
    assert got == want
    for r in inc_rows:
        assert r.doc_b in delta_ids  # right side is always a delta doc
        if r.pair_type == "base_delta":
            assert r.doc_a not in delta_ids
        else:
            assert r.pair_type == "delta_delta"
            assert r.doc_a in delta_ids and r.doc_a < r.doc_b


def test_incremental_dedup_hand_corpus(spark):
    """base near-dups stay silent; base↔delta and delta↔delta surface."""
    from asritha_metamorphetl_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"
    base = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "completely different text about ships")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(10, shared), (11, shared)], "doc_id long, text string"
    )
    rows = {
        (r.doc_a, r.doc_b, r.pair_type)
        for r in minhash_lsh_pairs_incremental(
            base, delta, "text", "doc_id"
        ).collect()
    }
    assert rows == {
        (1, 10, "base_delta"),
        (1, 11, "base_delta"),
        (2, 10, "base_delta"),
        (2, 11, "base_delta"),
        (10, 11, "delta_delta"),
    }


def test_incremental_dedup_accumulation_is_batch_order_independent(spark):
    """The streaming ingest-dedup contract: accumulating normalized
    pairs over micro-batches yields the same set whatever order the
    batches arrive in (each batch pairs against base + previously
    ingested batches)."""
    from asritha_metamorphetl_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
    )
    from asritha_metamorphetl_spark.operators.sampling import hash_bucket

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bucket = hash_bucket(F.col("doc_id"), 10)
    base = docs.filter(bucket <= 7)
    delta = docs.filter(bucket >= 8)
    batches = [delta.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    def accumulate(order):
        ingested = base
        pairs = set()
        for i in order:
            rows = minhash_lsh_pairs_incremental(
                ingested, batches[i], "text", "doc_id"
            ).collect()
            pairs |= {
                (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in rows
            }
            ingested = ingested.unionByName(batches[i])
        return pairs

    assert accumulate([0, 1, 2]) == accumulate([2, 0, 1])


def test_hard_negatives_excludes_same_label(spark):
    from asritha_metamorphetl_spark.operators.similarity import hard_negatives

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    q_labels = {r.vec_id: r.label for r in queries.collect()}
    rows = hard_negatives(
        emb, queries, "vec_id", "embedding", "label", k=5
    ).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r.neighbor_label != q_labels[r.query_id]
        assert r.neighbor_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r.rnk)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_span_removal_stats_consistent_with_spans(spark):
    """Per-doc invariants tying the two passage views together: span
    counts agree, distinct covered tokens never exceed the sum of span
    lengths (overlap only shrinks) and never fall below the longest
    span, and every document gets a row."""
    from asritha_metamorphetl_spark.plans.passage_queries import (
        dup_passage_spans,
        dup_span_removal_stats,
    )

    spans = dup_passage_spans(spark, SF_SMOKE).collect()
    stats = {r.doc_id: r for r in dup_span_removal_stats(spark, SF_SMOKE).collect()}
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(stats) == n_docs

    per_doc: dict[int, list] = {}
    for r in spans:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, doc_spans in per_doc.items():
        s = stats[doc_id]
        assert s.n_spans == len(doc_spans)
        total_len = sum(r.span_end - r.span_start + 1 for r in doc_spans)
        longest = max(r.span_end - r.span_start + 1 for r in doc_spans)
        assert longest <= s.dup_tokens <= total_len
        assert 0.0 <= s.pct_dup <= 1.0
    for doc_id, s in stats.items():
        if doc_id not in per_doc:
            assert s.n_spans == 0 and s.dup_tokens == 0 and s.pct_dup == 0.0


def test_near_dup_survivors_one_keeper_per_cluster(spark):
    from asritha_metamorphetl_spark.plans.pipeline_queries import (
        near_dup_survivors,
    )

    rows = near_dup_survivors(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs
    clusters: dict[int, list] = {}
    for r in rows:
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, members in clusters.items():
        keepers = [m for m in members if m.kept]
        assert len(keepers) == 1
        assert keepers[0].doc_id == cid == min(m.doc_id for m in members)


def test_bm25_rare_term_dominates(spark):
    """Documents containing the rare discriminative term must outrank
    common-term-only documents for the query that includes it, and
    ranks must be dense per query."""
    from asritha_metamorphetl_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "needle scan scan table"),
            (2, "scan scan scan scan table table"),
            (3, "table join merge window"),
            (4, "needle needle scan"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(
        docs, "text", "doc_id", [(0, ["needle", "scan"])], k=4
    ).collect()
    by_rank = {r.rnk: r.doc_id for r in rows}
    # docs 4 and 1 carry the rare term; doc 3 has neither query term
    assert set(by_rank.values()) == {1, 2, 4}
    assert by_rank[1] in (1, 4) and by_rank[2] in (1, 4)
    scores = [r.score for r in sorted(rows, key=lambda r: r.rnk)]
    assert scores == sorted(scores, reverse=True)


def test_curation_verdict_consistent_with_stages(spark):
    """Every per-stage flag in the composite verdict must equal the
    standalone query's own keep decision, and the reason must be the
    first failing stage in priority order."""
    from asritha_metamorphetl_spark.plans.passage_queries import (
        curation_verdict,
        quality_logit_scores,
    )
    from asritha_metamorphetl_spark.plans.pipeline_queries import (
        near_dup_survivors,
    )

    verdicts = {r.doc_id: r for r in curation_verdict(spark, SF_SMOKE).collect()}
    near = {r.doc_id: r.kept for r in near_dup_survivors(spark, SF_SMOKE).collect()}
    qual = {r.doc_id: r.kept for r in quality_logit_scores(spark, SF_SMOKE).collect()}
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(verdicts) == n_docs
    order = [
        ("exact_kept", "exact_dup"),
        ("near_kept", "near_dup"),
        ("sem_kept", "semantic_dup"),
        ("quality_kept", "low_quality"),
    ]
    for doc_id, v in verdicts.items():
        assert v.near_kept == near[doc_id]
        assert v.quality_kept == qual[doc_id]
        assert v.final_kept == (
            v.exact_kept and v.near_kept and v.sem_kept and v.quality_kept
        )
        expect = "kept"
        for flag, why in order:
            if not getattr(v, flag):
                expect = why
                break
        assert v.reason == expect


def test_unimax_zero_token_source(spark):
    """A zero-token source caps at 0 allocation and reports 0 epochs —
    never NaN from 0/0."""
    import math

    from asritha_metamorphetl_spark.operators.sampling import unimax_allocation

    stats = spark.createDataFrame(
        [("empty", 0), ("a", 100), ("b", 300)], "source string, n_tokens long"
    )
    out = {r.source: r for r in unimax_allocation(
        stats, "source", "n_tokens", budget=F.lit(200.0), max_epochs=1.0
    ).collect()}
    assert out["empty"].allocation == 0.0
    assert out["empty"].epochs == 0.0
    assert not any(math.isnan(r.epochs) for r in out.values())


def test_dup_passage_spans_boilerplate_heavy_corpus(spark):
    """Degenerate corpus: many identical documents. Every gram is
    duplicated, every document becomes one full-length span — the
    operator must stay bounded (per-doc state only) and exact."""
    from asritha_metamorphetl_spark.operators.dedup import (
        duplicated_passage_spans,
    )

    n = 50
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(n)],
        "doc_id long, text string",
    )
    rows = duplicated_passage_spans(docs, "text", "doc_id").collect()
    assert len(rows) == n
    for r in rows:
        assert (r.span_start, r.span_end, r.n_grams) == (1, 6, 4)


def test_pq_with_full_shortlist_equals_exact(spark):
    """Exactness property: when the ADC shortlist covers the whole
    corpus, the exact re-rank IS the final ranking — PQ must reproduce
    brute-force squared-L2 top-k bit-for-bit (ids, distances, ranks)."""
    from asritha_metamorphetl_spark.operators.similarity import (
        brute_force_l2_topk,
        pq_adc_topk,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    n = emb.count()
    exact = {
        (r.query_id, r.rnk): (r.neighbor_id, r.dist)
        for r in brute_force_l2_topk(
            emb, queries, "vec_id", "embedding", k=7
        ).collect()
    }
    approx = {
        (r.query_id, r.rnk): (r.neighbor_id, r.dist)
        for r in pq_adc_topk(
            emb, queries, "vec_id", "embedding", k=7, m=4, ncodes=8,
            refine_iters=1, shortlist=n,
        ).collect()
    }
    assert approx == exact


def test_bm25_unmatched_term_is_ignored(spark):
    """A query term absent from the corpus contributes nothing; a query
    whose terms ALL miss returns no rows rather than failing."""
    from asritha_metamorphetl_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta")],
        "doc_id long, text string",
    )
    rows = bm25_topk(
        docs, "text", "doc_id",
        [(0, ["beta", "zzz_absent"]), (1, ["qqq_absent"])], k=5,
    ).collect()
    qids = {r.query_id for r in rows}
    assert qids == {0}  # query 1 has no matching postings at all
    assert {r.doc_id for r in rows} == {1, 2}


def test_all_pairs_near_matches_pairwise_cosine(spark):
    """The broadcast-matrix near-pair scan must produce exactly the
    pairs the rounded pairwise cosine predicate admits."""
    import itertools

    import numpy as np

    from asritha_metamorphetl_spark.operators.similarity import all_pairs_near

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(60)
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    tau = 0.2
    want = set()
    for x, y in itertools.permutations(vecs, 2):
        c = float(vecs[x] @ vecs[y] / (np.linalg.norm(vecs[x]) * np.linalg.norm(vecs[y])))
        if round(c, 4) >= tau:
            want.add((x, y))
    got = {
        (r.xid, r.yid)
        for r in all_pairs_near(emb, "vec_id", "embedding", tau).collect()
    }
    assert got == want


def test_all_pairs_near_enforces_probe_bound(spark):
    """The O(N²) eval scan must refuse an over-sized corpus instead of
    collecting it onto the driver."""
    import pytest as _pytest

    from asritha_metamorphetl_spark.operators.similarity import all_pairs_near

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with _pytest.raises(ValueError, match="max_rows"):
        all_pairs_near(emb, "vec_id", "embedding", 0.3, max_rows=10)


def test_shard_manifest_partition_invariant_and_complete(spark):
    """Shard assignment and content signatures are independent of input
    partitioning, and the manifest accounts for every document."""
    from asritha_metamorphetl_spark.plans.passage_queries import (
        training_shard_manifest,
    )

    rows1 = {
        r.shard: (r.n_docs, r.n_tokens, r.content_sig)
        for r in training_shard_manifest(spark, SF_SMOKE).collect()
    }
    rows2 = {
        r.shard: (r.n_docs, r.n_tokens, r.content_sig)
        for r in training_shard_manifest(spark, SF_SMOKE).collect()
    }
    assert rows1 == rows2
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(v[0] for v in rows1.values()) == n_docs
