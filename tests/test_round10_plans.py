"""Gates for the round-10 scale fixes (round-9 verdict directives
#1/#2/#5): PassJoin segment blocking for fuzzy matching (exact recall
+ vocabulary-scaled block keys), corpus-derived block count for the
cosine pair histogram, and degree caps on both co-purchase graph
queries."""

from __future__ import annotations

import math
import random

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------
# fuzzy_part_name_pairs: PassJoin segment blocking
# ---------------------------------------------------------------------


def _segment_keys(s: str, shifted: bool):
    """Pure-Python twin of segment_block_candidates' key generation:
    exact segment keys (index side) or offset-shifted substring keys
    (probe side). Kept in sync by test_fuzzy_blocking_matches_python
    below, which cross-checks it against the Spark candidate set."""
    n = len(s)
    keys = set()
    for i in (1, 2, 3):
        st = (i - 1) * n // 3 + 1  # 1-indexed
        sl = i * n // 3 - (i - 1) * n // 3
        offs = (0,) if not shifted else (-1, 0, 1)
        for o in offs:
            p = st + o
            if p >= 1 and p + sl - 1 <= n:
                keys.add((n, i, s[p - 1 : p - 1 + sl]))
    return keys


def _blocked(a: str, b: str) -> bool:
    """True when the pair survives candidate generation. Mirrors the
    Spark join's canonical orientation exactly: the lexicographically
    smaller name is the index side (exact segments), the larger the
    probe side (shifted substrings) — the nm_a < nm_b filter keeps
    only that orientation. The pigeonhole recall argument is
    per-direction (an untouched segment of the SOURCE appears in the
    target), so it holds for whichever name plays index."""
    x, y = min(a, b), max(a, b)
    return bool(_segment_keys(x, False) & _segment_keys(y, True))


def _random_same_length_edit(rng: random.Random, s: str) -> str:
    """Apply ≤2 length-preserving edits: k∈{1,2} substitutions, or one
    deletion + one insertion (the shift case the offsets exist for)."""
    alpha = "abcdefgh"
    chars = list(s)
    if rng.random() < 0.5:
        for _ in range(rng.choice((1, 2))):
            i = rng.randrange(len(chars))
            chars[i] = rng.choice(alpha)
    else:
        del chars[rng.randrange(len(chars))]
        chars.insert(rng.randrange(len(chars) + 1), rng.choice(alpha))
    return "".join(chars)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def test_fuzzy_blocking_exact_recall_property():
    """Pigeonhole invariant: EVERY same-length pair within edit
    distance 2 shares a segment key (3 segments, ≤2 cut points, offset
    ∈ {-1,0,+1}) — 2000 random edit pairs across lengths 6..40, zero
    misses allowed. This is the recall proof the oracle hash-match
    relies on (the DuckDB side stays the naive length block)."""
    rng = random.Random(101)
    misses = []
    for _ in range(2000):
        n = rng.randrange(6, 41)
        s = "".join(rng.choice("abcdefgh") for _ in range(n))
        t = _random_same_length_edit(rng, s)
        if s == t:
            continue
        assert _lev(s, t) <= 2
        if not _blocked(s, t):
            misses.append((s, t))
    assert not misses, f"segment blocking missed ED<=2 pairs: {misses[:5]}"


def test_fuzzy_blocking_matches_python(spark):
    """The Spark candidate generator and the pure-Python twin agree on
    a small vocabulary — pins the key formula (floor boundaries,
    1-indexed substring, offset validity) across both spellings."""
    from asritha_metamorphetl_spark.plans.analytics2_queries import (
        segment_block_candidates,
    )

    rng = random.Random(7)
    base = ["".join(rng.choice("abcd") for _ in range(9)) for _ in range(40)]
    vocab = sorted(
        set(base + [_random_same_length_edit(rng, s) for s in base])
    )
    names = spark.createDataFrame([(v,) for v in vocab], ["nm"])
    got = {
        (r.nm_a, r.nm_b)
        for r in segment_block_candidates(names).collect()
    }
    want = {
        (a, b)
        for i, a in enumerate(vocab)
        for b in vocab[i + 1 :]
        if len(a) == len(b) and _blocked(a, b)
    }
    assert got == want


def test_fuzzy_block_keys_scale_with_vocab(spark):
    """The round-9 failure mode was a block key with ~constant
    cardinality (name LENGTH). The segment keys must grow with the
    vocabulary: on the sf0.01 part names, distinct (len, seg_idx, seg)
    keys must exceed 8× the distinct lengths, and the largest block
    must hold a small fraction of the names."""
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.plans.analytics2_queries import (
        segment_block_candidates,  # noqa: F401  (import pins the module)
    )
    from asritha_metamorphetl_spark.sources.files import Catalog

    part = Catalog(SF).load(spark, "part")
    names = part.select(F.col("p_name").alias("nm")).distinct()
    n_names = names.count()
    n_lens = names.select(F.length("nm")).distinct().count()
    seg = names.select(
        F.length("nm").alias("len"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("si"),
        F.col("nm"),
    ).select(
        "len",
        "si",
        F.expr(
            "substring(nm, CAST(floor((si-1)*len/3)+1 AS INT), "
            "CAST(floor(si*len/3)-floor((si-1)*len/3) AS INT))"
        ).alias("seg"),
    )
    n_keys = seg.distinct().count()
    assert n_keys > 8 * n_lens, (n_keys, n_lens)
    max_block = (
        seg.groupBy("len", "si", "seg")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_block <= max(4, n_names // 2), (max_block, n_names)


# ---------------------------------------------------------------------
# cosine_pair_histogram: corpus-derived block count
# ---------------------------------------------------------------------


def test_cosine_block_count_derived_from_corpus(spark):
    """B must equal ceil(n / COS_BLOCK_ROWS) — derived, not a constant.
    At sf0.01 (500 vectors, COS_BLOCK_ROWS=64) that is 8 blocks; the
    bucket column in the registered plan must span exactly [0, B) and
    the oracle string must interpolate the same CEIL(COUNT(*)/...)
    derivation."""
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.functions.hashing import shingle_hash
    from asritha_metamorphetl_spark.plans.registry import all_oracles
    from asritha_metamorphetl_spark.plans.vector_queries import (
        COS_BLOCK_ROWS,
    )
    from asritha_metamorphetl_spark.sources.files import Catalog

    emb = Catalog(SF).load(spark, "embeddings")
    n = emb.count()
    want_b = max(1, math.ceil(n / COS_BLOCK_ROWS))
    assert want_b >= 2, "sf0.01 corpus must exercise a multi-block plan"
    buckets = (
        emb.select(
            (shingle_hash(F.col("vec_id").cast("string")) % want_b).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .count()
    )
    rows = {r.bucket: r["count"] for r in buckets.collect()}
    assert set(rows) == set(range(want_b))
    # hash balance: no block more than 3x the target size
    assert max(rows.values()) <= 3 * COS_BLOCK_ROWS
    sql = all_oracles()["cosine_pair_histogram"]
    assert "CEIL" in sql and str(COS_BLOCK_ROWS) in sql
    assert "nblocks" in sql


# ---------------------------------------------------------------------
# graph degree caps
# ---------------------------------------------------------------------


def test_pagerank_out_degree_capped(spark):
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.plans.linalg_queries import (
        PR_DEG_CAP,
        capped_copurchase_out_edges,
    )

    edges = capped_copurchase_out_edges(spark, SF)
    deg = edges.groupBy("src").count()
    mx = deg.agg(F.max("count")).collect()[0][0]
    n_nodes = deg.count()
    assert mx <= PR_DEG_CAP, (mx, PR_DEG_CAP)
    # the cap must actually bind at sf0.01 (otherwise the gate proves
    # nothing about truncation)
    assert edges.count() < n_nodes * (n_nodes - 1), "cap never binds?"


def test_triangle_degree_capped_strictly(spark):
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.plans.linalg_queries import (
        TRI_DEG_CAP,
        mutual_capped_copurchase_edges,
    )

    _, capped = mutual_capped_copurchase_edges(spark, SF)
    sym = capped.unionByName(
        capped.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mx = sym.groupBy("u").count().agg(F.max("count")).collect()[0][0]
    assert mx <= TRI_DEG_CAP, (mx, TRI_DEG_CAP)


def test_poisson_bootstrap_mixed_distribution(spark):
    """The one-md5 bootstrap weights keep the Poisson(1) contract:
    counts in [0, 7], replicate means near 1, and replicates
    decorrelated (different permutation constants give different
    resamples)."""
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.functions.hashing import shingle_hash
    from asritha_metamorphetl_spark.operators.sampling import (
        BOOT_B,
        poisson_bootstrap_counts_mixed,
    )

    ids = spark.range(0, 20000).select(
        shingle_hash(F.col("id").cast("string")).alias("h")
    )
    expanded = ids.select(
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    ).select(
        "b", poisson_bootstrap_counts_mixed(F.col("h"), F.col("b")).alias("c")
    )
    stats = expanded.groupBy("b").agg(
        F.min("c").alias("mn"),
        F.max("c").alias("mx"),
        F.avg("c").alias("mean"),
    ).collect()
    assert len(stats) == BOOT_B
    for r in stats:
        assert 0 <= r["mn"] and r["mx"] <= 7
        assert 0.95 < r["mean"] < 1.05, (r["b"], r["mean"])
    # decorrelated: replicate 0 and 1 disagree on many rows
    two = ids.select(
        poisson_bootstrap_counts_mixed(F.col("h"), F.lit(0)).alias("c0"),
        poisson_bootstrap_counts_mixed(F.col("h"), F.lit(1)).alias("c1"),
    )
    diff = two.filter(F.col("c0") != F.col("c1")).count()
    assert diff > 5000
