"""Round-7 second-wave operators: Bloom join pruning, banded EWMA,
GROUPING SETS, market-basket rules — unit semantics + the plan shapes
that make each one survive 100 TB (the umbrella oracle test covers the
registered-query value hashes)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Membership contract on a disjoint build/probe split: every build
    key passes (no false negatives — Bloom's hard guarantee) and the
    false-positive rate over known non-members stays under the audit
    bound with 16 bits/key."""
    from asritha_metamorphetl_spark.operators.frequent import (
        bloom_build,
        bloom_candidates,
    )

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    non_members = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    words, m, n = bloom_build(members, "k")
    assert n == 500 and m == 16 * 500 and len(words) == (m + 63) // 64
    hits = bloom_candidates(members, "k", words, m).count()
    assert hits == 500  # no false negatives, ever
    fp = bloom_candidates(non_members, "k", words, m).count()
    assert fp <= 2000 * 0.05  # theory ~0.5%; 10x headroom


def test_bloom_member_flag_matches_candidates(spark):
    """``bloom_member_flag`` (the one-pass audit form) must agree row
    for row with ``bloom_candidates`` (the filter form): the flagged
    True set IS the candidate set, and the flag never loses or adds
    probe rows (r14: bloom_prune_audit counts members and non-members
    from the flag in a single scan)."""
    from asritha_metamorphetl_spark.operators.frequent import (
        bloom_build,
        bloom_candidates,
        bloom_member_flag,
    )

    members = spark.range(0, 300).select(F.col("id").alias("k"))
    probe = spark.range(0, 5_000).select(F.col("id").alias("k"))
    words, m, _n = bloom_build(members, "k")
    flagged = bloom_member_flag(probe, "k", words, m, out_col="might")
    assert flagged.count() == 5_000  # cardinality preserved
    flag_true = sorted(
        r["k"] for r in flagged.filter("might").collect()
    )
    cand = sorted(
        r["k"] for r in bloom_candidates(probe, "k", words, m).collect()
    )
    assert flag_true == cand


def test_bloom_build_empty_and_floor(spark):
    """Degenerate build sides: zero keys still yields a valid (all-zero,
    floor-sized) filter that rejects everything."""
    from asritha_metamorphetl_spark.operators.frequent import (
        bloom_build,
        bloom_candidates,
    )

    empty = spark.range(0).select(F.col("id").alias("k"))
    words, m, n = bloom_build(empty, "k")
    assert n == 0 and m == 64 and words == [0]
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    assert bloom_candidates(probe, "k", words, m).count() == 0


def test_bloom_probe_path_never_shuffles_probe_rows(spark):
    """The whole point of the Bloom prune: probe rows meet the bitmap
    via a one-row broadcast (BroadcastNestedLoopJoin) and are filtered
    map-side — the candidate plan must contain NO hash-partition
    exchange of the probe side."""
    from asritha_metamorphetl_spark.operators.frequent import (
        bloom_build,
        bloom_candidates,
    )

    members = spark.range(0, 100).select(F.col("id").alias("k"))
    words, m, _ = bloom_build(members, "k")
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = _plan(bloom_candidates(probe, "k", words, m))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_audit_pushes_build_filter_to_scan(spark):
    """The build side's priority predicate must reach the orders scan.

    r14: the audit pins the distinct build keys (lazy localCheckpoint)
    so orders is scanned ONCE for the count, the position pass and the
    exact-membership broadcast; the orders FileScan therefore lives in
    the pinned subtree's plan, and the FINAL plan must hold exactly one
    customer scan (the one-pass audit aggregate) and no orders scan."""
    from asritha_metamorphetl_spark.plans.registry import all_queries
    from asritha_metamorphetl_spark.plans.sketch_queries import (
        _bloom_build_keys,
    )

    keys_plan = _plan(_bloom_build_keys(spark, SF_CORRECT))
    scan = next(
        seg for seg in keys_plan.split("FileScan")[1:]
        if "orders" in seg.splitlines()[0]
    )
    # the PushedFilters section specifically — column pruning alone
    # (o_orderpriority in ReadSchema) must NOT satisfy this
    header = scan.splitlines()[0]
    pushed = header[header.index("PushedFilters"):]
    assert "EqualTo(o_orderpriority,1-URGENT)" in pushed

    plan = _plan(all_queries()["bloom_prune_audit"](spark, SF_CORRECT))
    scans = [
        seg.splitlines()[0] for seg in plan.split("FileScan")[1:]
    ]
    assert sum("customer" in s for s in scans) == 1
    assert not any("orders" in s for s in scans)


# ---------------------------------------------------------------------------
# Banded EWMA
# ---------------------------------------------------------------------------


def test_ewma_banded_hand_example(spark):
    """x = [1, 2, 3] on one key, half-life weights:
    t1 = 1; t2 = (2·2 + 1)/3; t3 = (3·4 + 2·2 + 1)/7."""
    from asritha_metamorphetl_spark.operators.temporal import ewma_banded

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("a", 3, 3)], "k string, t int, x int"
    )
    got = {
        r["t"]: r["ewma"]
        for r in ewma_banded(df, ["k"], "t", "x").collect()
    }
    assert got[1] == 1.0
    assert got[2] == round(5 / 3, 6)
    assert got[3] == round(17 / 7, 6)


def test_ewma_banded_truncates_and_separates_keys(spark):
    """Beyond the window the oldest value must drop out entirely, and
    keys never contaminate each other."""
    from asritha_metamorphetl_spark.operators.temporal import ewma_banded

    rows = [("a", t, 1000 if t == 1 else 0) for t in range(1, 19)]
    rows += [("b", 1, 7)]
    df = spark.createDataFrame(rows, "k string, t int, x int")
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma_banded(df, ["k"], "t", "x").collect()
    }
    assert got[("a", 16)] > 0.0  # lag 15: still inside the band
    assert got[("a", 17)] == 0.0  # lag 16: truncated away
    assert got[("b", 1)] == 7.0


def test_ewma_plan_is_equi_join_not_theta(spark):
    """The band must execute as a hash equi-join on (key, bucket) —
    never a BroadcastNestedLoop theta-join over the spine."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["ewma_daily_orders"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# GROUPING SETS
# ---------------------------------------------------------------------------


def test_grouping_sets_one_scan_one_expand(spark):
    """All four granularities must come from ONE lineitem scan through
    Spark's Expand operator — not four separate scans unioned."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    df = all_queries()["revenue_grouping_sets"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "Expand" in plan
    assert plan.count("FileScan") == 1


def test_grouping_sets_levels_reconcile(spark):
    """The grand-total row must equal the sum of the (flag) level rows
    — the internal consistency GROUPING() exists to make checkable."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    rows = all_queries()["revenue_grouping_sets"](spark, SF_CORRECT).collect()
    grand = [r for r in rows if r["g_flag"] == 1 and r["g_status"] == 1]
    flag_rows = [r for r in rows if r["g_flag"] == 0 and r["g_status"] == 1]
    assert len(grand) == 1
    assert grand[0]["n_lines"] == sum(r["n_lines"] for r in flag_rows)
    assert abs(
        grand[0]["revenue"] - sum(r["revenue"] for r in flag_rows)
    ) < 1e-6


# ---------------------------------------------------------------------------
# Market-basket rules
# ---------------------------------------------------------------------------


def test_basket_pairs_are_order_local_no_self_join(spark):
    """Pair generation must be the local HOF expansion (one Generate
    over the aggregated basket), never an op-times-op self-join. Since
    round 13 the pair table is the shared co-purchase materialization
    (plans/fixtures rationale), so the basket-local contract is gated
    on the BUILD pipeline (``copurchase_pairs_frame``) and the query
    itself is gated against cartesian stages and re-derivation (its
    plan must read the pair parquet, not re-expand baskets)."""
    from asritha_metamorphetl_spark.plans.linalg_queries import (
        copurchase_pairs_frame,
    )
    from asritha_metamorphetl_spark.plans.registry import all_queries

    build_plan = _plan(copurchase_pairs_frame(spark, SF_CORRECT))
    assert "CartesianProduct" not in build_plan
    assert build_plan.count("FileScan") <= 1
    assert "Generate explode" in build_plan

    plan = _plan(all_queries()["market_basket_rules"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    # pair front end comes from the materialized fixture: the query's
    # own plan re-runs NO basket expansion
    assert "Generate explode" not in plan


def test_basket_rules_semantics(spark):
    """Hand-checked lift: parts co-ordered in every order have
    confidence 1 and lift = 1/P(consequent) — verified on a 3-order
    synthetic basket via the same registered-query arithmetic."""
    from asritha_metamorphetl_spark.plans.analytics_queries import (
        BASKET_DECIMALS,
    )

    # baskets: {1,2} {1,2} {1,3} — rule 2→1 has conf 1, lift 1.0;
    # rule 1→2 has conf 2/3, lift (2·3)/(3·2) = 1.0
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)]
    df = spark.createDataFrame(rows, "o long, p long")
    op = df.distinct()
    pairs = (
        op.alias("a")
        .join(op.alias("b"), ["o"])
        .filter(F.col("a.p") < F.col("b.p"))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .count()
    )
    got = {(r["pa"], r["pb"]): r["count"] for r in pairs.collect()}
    assert got[(1, 2)] == 2 and got[(1, 3)] == 1
    # the registered query's lift arithmetic on these counts:
    n_orders, n1, n2, n12 = 3, 3, 2, 2
    lift = round(n12 * n_orders / (n1 * n2), BASKET_DECIMALS)
    assert lift == 1.0


# ---------------------------------------------------------------------------
# BPE merge learning
# ---------------------------------------------------------------------------


def test_bpe_learns_expected_merges(spark):
    """Hand-checked corpus: 'ab' ×3 + 'abc' ×1 → first merge must be
    ('a b', 4); after fusing, ('ab c', 1) is the only remaining pair
    (tie broken lexicographically if equal counts)."""
    from asritha_metamorphetl_spark.operators.lm import bpe_learn_merges

    words = spark.createDataFrame(
        [("ab", 3), ("abc", 1)], "w string, freq int"
    )
    merges = bpe_learn_merges(words, steps=2)
    assert merges == [(1, "a b", 4), (2, "ab c", 1)]


def test_bpe_merge_is_leftmost_nonoverlapping(spark):
    """'aaa' with merge (a,a) must become (aa, a) — leftmost greedy,
    never the overlapping double-merge; chained pairs 'abab' fuse BOTH
    occurrences in the single replace pass."""
    from asritha_metamorphetl_spark.operators.lm import (
        bpe_learn_merges,
        bpe_pair_counts,
        bpe_initial_sequences,
    )
    import pyspark.sql.functions as F

    words = spark.createDataFrame([("aaa", 1)], "w string, freq int")
    merges = bpe_learn_merges(words, steps=2)
    # first step: pair 'a a' appears twice (adjacent overlap counts both)
    assert merges[0] == (1, "a a", 2)
    # after the leftmost merge the sequence is (aa, a): one 'aa a' pair
    assert merges[1] == (2, "aa a", 1)

    words2 = spark.createDataFrame([("abab", 5)], "w string, freq int")
    m2 = bpe_learn_merges(words2, steps=2)
    assert m2[0] == (1, "a b", 10)  # both occurrences, freq-weighted
    # one replace pass fused BOTH 'a b' occurrences → pair (ab, ab)
    assert m2[1] == (2, "ab ab", 5)

    # symbol never matches INSIDE a neighbor: (xa, by) has no 'a b' pair
    seqs = bpe_initial_sequences(
        spark.createDataFrame([("xaby", 1)], "w string, freq int")
    ).select(
        "freq",
        F.replace(F.col("seq"), F.lit("|x||a|"), F.lit("|xa|")).alias("seq"),
    ).select(
        "freq",
        F.replace(F.col("seq"), F.lit("|b||y|"), F.lit("|by|")).alias("seq"),
    )
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(seqs).collect()}
    assert got == {"xa b": 1, "b y": 1} or got == {"xa by": 1}


# ---------------------------------------------------------------------------
# Binary quantization
# ---------------------------------------------------------------------------


def test_bq_codes_hand_packing(spark):
    """Known vectors against a zero center: bits set exactly where the
    (rounded) component is positive, packed 32 per word."""
    from asritha_metamorphetl_spark.operators.similarity import bq_codes

    dim = 40
    vec = [0.0] * dim
    vec[0] = 1.0      # bit 0 of word 0
    vec[5] = 0.5      # bit 5 of word 0
    vec[31] = 2.0     # bit 31 of word 0
    vec[32] = 3.0     # bit 0 of word 1
    vec[39] = -1.0    # negative: NOT set
    df = spark.createDataFrame([(1, vec)], "id long, v array<double>")
    row = bq_codes(df, "id", "v", dim, [0.0] * dim).collect()[0]
    assert row["bq_w0"] == (1 << 0) + (1 << 5) + (1 << 31)
    assert row["bq_w1"] == 1
    # strictly-greater: a value equal to the center sets nothing
    df0 = spark.createDataFrame([(2, [0.0] * dim)], "id long, v array<double>")
    r0 = bq_codes(df0, "id", "v", dim, [0.0] * dim).collect()[0]
    assert r0["bq_w0"] == 0 and r0["bq_w1"] == 0


def test_bq_topk_exact_on_separable_data(spark):
    """Clearly separable clusters: BQ shortlist + exact re-rank must
    return the true nearest neighbors."""
    from asritha_metamorphetl_spark.operators.similarity import (
        bq_hamming_topk,
    )

    dim = 8
    rows = []
    for i in range(20):  # cluster A: near +1
        rows.append((i, [1.0 + 0.01 * i] * dim))
    for i in range(20, 40):  # cluster B: near -1
        rows.append((i, [-1.0 - 0.01 * i] * dim))
    corpus = spark.createDataFrame(rows, "id long, v array<double>")
    queries = corpus.filter(F.col("id") == 0)
    got = bq_hamming_topk(
        corpus, queries, "id", "v", k=5, dim=dim, shortlist=20
    ).collect()
    ids = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rnk"])]
    assert ids == [1, 2, 3, 4, 5]  # nearest by construction


def test_bloom_generalizes_to_string_keys(spark):
    """The hash is salted-md5 over CAST(key AS STRING), so non-numeric
    key types work unchanged — same contract as the PQ LUT id-type
    generalization."""
    from asritha_metamorphetl_spark.operators.frequent import (
        bloom_build,
        bloom_candidates,
    )

    members = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(200)], "k string"
    )
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(500)], "k string"
    )
    words, m, n = bloom_build(members, "k")
    assert n == 200
    assert bloom_candidates(members, "k", words, m).count() == 200
    assert bloom_candidates(others, "k", words, m).count() <= 500 * 0.05
