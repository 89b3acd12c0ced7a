"""Distributed heavy hitters: Misra-Gries candidates + exact recount.

The vocabulary question a curation team asks at 100 TB — "which tokens
dominate this corpus?" — cannot be answered by a full GROUP BY when the
distinct-token domain explodes (every typo, URL, and hash is its own
key; the shuffle carries the whole vocabulary). The classic production
answer is TWO passes:

1. **Candidate pass**: each partition streams its tokens through a
   Misra-Gries summary with ``k`` counters (Misra & Gries 1982,
   "Finding repeated elements") — O(k) memory per task regardless of
   the partition's distinct count. The union of per-partition
   candidates provably contains every item with global frequency
   > N/(k+1): an item absent from every summary had local frequency
   ≤ n_p/(k+1) in each partition, which sums to ≤ N/(k+1). The union
   is bounded by partitions × k rows — broadcastable.
2. **Verify pass**: exact counts for the candidates only (the explode
   stream semi-joins the broadcast candidate set before the count
   aggregate, so the shuffle carries candidate postings, never the
   vocabulary), then the exact threshold filter.

Because the candidate set is a SUPERSET of everything that can pass the
threshold, the output is EXACT — identical to the full GROUP BY — while
memory stays bounded. The candidate set itself depends on partitioning
(MG evicts adaptively); the final result does not, which is what makes
the operator oracle-checkable.

Reference scope: the reference engine has no frequent-items operator;
this is part of the training-data-pipeline surface the build brief adds
(corpus vocabulary telemetry).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate extraction over ``df[col]``
    (one value per row — explode upstream). Emits the ≤ k surviving
    keys per partition; state is a k-entry dict maintained across the
    partition's Arrow batches, never the partition's distinct count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                # batch-level pre-aggregation, then the MG update: add
                # c to an existing/free counter or decrement all by the
                # shortfall (the streaming algorithm, batched — same
                # invariant: true_freq - counter ≤ N_seen/(k+1))
                c = int(c)
                if v in counters:
                    counters[v] += c
                elif len(counters) < k:
                    counters[v] = c
                else:
                    dec = min(c, min(counters.values()))
                    counters = {
                        key: cnt - dec
                        for key, cnt in counters.items()
                        if cnt - dec > 0
                    }
                    if c > dec:
                        counters[v] = c - dec
        yield pd.DataFrame({col: pd.array(sorted(counters), dtype="object")})

    return df.mapInPandas(gen, f"{col} string")


def heavy_hitters(
    exploded: DataFrame,
    col: str,
    total: Column,
    min_share: float,
    k: int | None = None,
) -> DataFrame:
    """Every value of ``exploded[col]`` whose EXACT frequency is
    ≥ ceil(min_share · total), with its exact count — the two-pass
    MG-candidates + verify shape described in the module docstring.

    ``total`` is a Column evaluating to the total row count of
    ``exploded`` (pass a literal or scalar-subquery-like column; it
    parameterizes the threshold without forcing an extra count job
    when the caller already knows it). ``k`` defaults to
    ``ceil(1/min_share) + 1``, which makes the candidate guarantee
    strict: threshold = min_share·N > N/(k+1) ⇒ no qualifying item can
    be missed. Returns (col, freq), exact.

    Scale shape: pass 1 is map-only (O(k) state per task, bounded
    candidate output); pass 2 semi-joins the broadcast candidates
    inside the scan stage and aggregates candidate postings only. Two
    scans of the token stream — the standard trade for never shuffling
    the vocabulary.
    """
    if not (0.0 < min_share <= 1.0):
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    if k is None:
        import math

        k = math.ceil(1.0 / min_share) + 1
    cand = _mg_candidates(exploded, col, k).distinct()
    threshold = F.ceil(total * F.lit(float(min_share))).cast("bigint")
    return (
        exploded.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= threshold)
    )


def countmin_sketch(
    tokens: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 1024,
    salt: str = "cms:",
    weight: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a token
    stream as a DataFrame: ``(row, cell, n)`` with ``depth * width``
    cells at most. Each token lands in one cell per row via an
    independent content hash; a cell's count is the sum of everything
    that hashed into it.

    Built as ONE map-side-combining hash aggregate over the exploded
    (row, cell) keys — at 100 TB the shuffle carries at most
    ``depth * width`` partial rows per task, never the vocabulary.
    Where Misra-Gries (``heavy_hitters``) answers "which items are
    frequent", the sketch answers point queries about ANY item from
    O(depth * width) state, at the cost of a bounded overestimate
    (≤ e/width · N with prob 1 − e^−depth per query). Deterministic:
    the hash functions are salted content hashes, so the same corpus
    yields the same sketch on any engine.

    ``weight`` (round 13): name of a bigint column carrying each row's
    multiplicity. A cell's count becomes ``sum(weight)`` instead of
    ``count(*)`` — EXACTLY the sketch of the expanded multiset, because
    every occurrence of a key lands in the same depth cells (the hash
    is a function of the key alone). Callers that already hold a
    (key, count) aggregate hash each DISTINCT key once instead of
    paying ``depth`` md5 digests per raw occurrence — at 100 TB that
    moves the hash work from O(rows) to O(distinct keys); the integer
    cell sums are identical either way (pinned by
    tests/test_round7_ops.py::test_countmin_weighted_equals_expanded).
    """
    cells = _cms_cells(
        tokens, col, depth, width, salt, keep=[weight] if weight else []
    )
    ex = cells.select(
        *([F.col(weight)] if weight else []),
        F.posexplode(F.array(*[f"_c{i}" for i in range(depth)])).alias(
            "row", "cell"
        ),
    )
    if weight is None:
        return ex.groupBy("row", "cell").agg(F.count(F.lit(1)).alias("n"))
    return ex.groupBy("row", "cell").agg(
        F.sum(weight).cast("bigint").alias("n")
    )


def _cms_cells(
    df: DataFrame,
    col: str,
    depth: int,
    width: int,
    salt: str,
    keep: list[str] | None = None,
) -> DataFrame:
    """Per-row CMS cell columns ``_c0.._c{depth-1}``, computed in two
    STAGED projections (md5 digests, then nibble arithmetic) so the
    generator downstream explodes a plain bigint array of column refs.
    Two traps measured at sf0.1 (600k-row build): inlining
    ``_hex48(md5(...))`` re-evaluates md5 per nibble where common-
    subexpression elimination doesn't reach, and exploding an array of
    STRUCTS with non-trivial children knocks the generator off
    whole-stage codegen into interpreted evaluation — together 26.3 s
    vs 4.6 s for this staged + posexplode(array<bigint>) shape."""
    from asritha_metamorphetl_spark.functions.hashing import _hex48

    passthrough = [F.col(c) for c in (keep or [])]
    staged = df.select(
        F.col(col),
        *passthrough,
        *[
            F.md5(F.concat(F.lit(f"{salt}{i}:"), F.col(col))).alias(f"_d{i}")
            for i in range(depth)
        ],
    )
    return staged.select(
        F.col(col),
        *passthrough,
        *[
            (_hex48(F.col(f"_d{i}")) % width).alias(f"_c{i}")
            for i in range(depth)
        ],
    )


def countmin_estimate(
    items: DataFrame,
    sketch: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 1024,
    salt: str = "cms:",
) -> DataFrame:
    """Point-query the sketch for each item: the estimate is the MIN
    over the item's ``depth`` cells. One equi-join of the item→cell
    rows against the (tiny, broadcastable) sketch plus a per-item min —
    the corpus itself is never touched again. Adds ``cms_n``."""
    cells = _cms_cells(items, col, depth, width, salt).select(
        F.col(col),
        F.posexplode(F.array(*[f"_c{i}" for i in range(depth)])).alias(
            "row", "cell"
        ),
    )
    return (
        cells.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy(col)
        .agg(F.min("n").alias("cms_n"))
    )


#: White-box HyperLogLog geometry (Flajolet et al. 2007): p=6 → m=64
#: registers. Contract constants — the DuckDB oracle replays them
#: literally, so changing either is a breaking change to every
#: registered HLL query.
HLL_P = 6
#: Hash width feeding the sketch (functions/hashing.shingle_hash).
HLL_HASH_BITS = 48
#: Bias constant for m=64 (the standard alpha_64).
HLL_ALPHA = 0.709


def hll_alpha(m: int) -> float:
    """The Flajolet et al. 2007 bias constant for ``m`` registers:
    tabulated for the small sketches, ``0.7213/(1 + 1.079/m)`` from
    m=128 up. Using alpha_64 at m=1024 would bias every estimate ~1.6%
    low — the constant must track the register count."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return HLL_ALPHA
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
    salt: str = "hll:",
) -> DataFrame:
    """Deterministic HyperLogLog register table per group:
    ``(*group_cols, bucket, register)`` — the max leading-zero rank seen
    in each of the ``m = 2^p`` hash buckets. This is the sketch's WHOLE
    state, exposed as data: unlike ``approx_count_distinct`` (whose HLL++
    bytes are engine-private), every register here is replayable in ANSI
    SQL from the same md5-based 48-bit content hash, so the oracle checks
    the sketch bit-for-bit, not just an error bound.

    Why it scales: one map-side-combining MAX aggregate; the shuffle
    carries at most ``groups × m`` partial rows per task, never the
    distinct values themselves — the 100 TB answer to COUNT(DISTINCT)'s
    distinct-expand shuffle. And because MAX is idempotent and
    commutative, register tables are mergeable by construction: the fold
    of any partition of the corpus (including overlapping or duplicated
    parts — at-least-once delivery is free) equals the one-shot table.

    Rank arithmetic is pure integer via binary-string length:
    ``floor(log2(w)) = length(bin(w)) - 1`` in both Spark and DuckDB, so
    no float log appears anywhere. Empty buckets are simply absent
    (readers treat absence as register 0).
    """
    from asritha_metamorphetl_spark.functions.hashing import _hex48

    m = 1 << p
    width = HLL_HASH_BITS - p  # bits of w, the post-bucket remainder
    # three staged projections (digest → 48-bit value → bucket/remainder)
    # so md5 runs once per row: inlining _hex48(md5(...)) into bucket AND
    # w re-evaluates the digest per nibble reference (24×) — Catalyst's
    # CollapseProject keeps each multi-referenced non-cheap alias staged
    digests = df.select(
        *group_cols,
        F.md5(F.concat(F.lit(salt), F.col(col).cast("string"))).alias("_dg"),
    )
    hashed = digests.select(*group_cols, _hex48(F.col("_dg")).alias("_h"))
    staged = hashed.select(
        *group_cols,
        (F.col("_h") % m).alias("bucket"),
        F.floor(F.col("_h") / m).cast("long").alias("w"),
    )
    rank = F.when(
        F.col("w") > 0,
        F.lit(width + 1) - F.length(F.bin(F.col("w"))),
    ).otherwise(F.lit(width + 1))
    return (
        staged.select(*group_cols, "bucket", rank.cast("long").alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...],
    p: int = HLL_P,
) -> DataFrame:
    """Raw HLL cardinality estimate per group from a register table:
    ``E = alpha_m · m² / Σ_j 2^(−M_j)`` (empty buckets contribute 2⁰).

    The harmonic sum is kept EXACT: with max register ``width+1``, every
    ``2^(−M_j)`` is a multiple of ``2^(−(width+1))``, so the sum is the
    integer ``Σ 2^(width+1−M_j) + V·2^(width+1)`` over that common
    denominator (V = empty-bucket count) — bigint arithmetic both
    engines agree on bit-for-bit. The only float op is one IEEE division
    by that integer, which is correctly rounded and therefore
    engine-identical. No small-range (linear-counting) correction:
    callers audit groups with cardinality ≫ 2.5m, where the raw
    estimator is the right one.
    """
    m = 1 << p
    width = HLL_HASH_BITS - p
    denom_pow = width + 1
    numer = hll_alpha(m) * (m * m) * (1 << denom_pow)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(1L, {denom_pow} - CAST(register AS INT))")
        ).alias("occ_sum"),
        F.count(F.lit(1)).alias("occ"),
    )
    inv_numer = (
        F.col("occ_sum")
        + (F.lit(m) - F.col("occ")) * F.lit(1 << denom_pow).cast("long")
    )
    return agg.select(
        *group_cols,
        inv_numer.alias("inv_numer"),
        (F.lit(numer) / inv_numer).alias("hll_est"),
    )


# ---------------------------------------------------------------------------
# Bloom filter: build-side sketch + map-side probe pruning
# ---------------------------------------------------------------------------

def _bloom_pos_cols(
    df: DataFrame, col: str, k: int, m: int, salt: str
) -> DataFrame:
    """Stage the ``k`` Bloom bit positions of ``df[col]`` as columns
    ``_bp0.._bp{k-1}``: md5 digests first in their OWN projection, nibble
    arithmetic second — the same two-stage shape as ``_cms_cells`` (an
    inlined ``_hex48(md5(...))`` re-evaluates md5 once per nibble where
    common-subexpression elimination doesn't reach). The hash family is
    the portable salted-md5 48-bit construction every sketch in this
    module uses, so a SQL oracle replays positions bit-for-bit."""
    from asritha_metamorphetl_spark.functions.hashing import _hex48

    staged = df.select(
        "*",
        *[
            F.md5(
                F.concat(F.lit(f"{salt}{i}:"), F.col(col).cast("string"))
            ).alias(f"_bd{i}")
            for i in range(k)
        ],
    )
    return staged.select(
        *df.columns,
        *[(_hex48(F.col(f"_bd{i}")) % m).alias(f"_bp{i}") for i in range(k)],
    )


def bloom_build(
    keys: DataFrame,
    col: str,
    k: int = 3,
    bits_per_key: int = 16,
    salt: str = "bloom:",
    max_bits: int = 1 << 27,
) -> tuple[list[int], int, int]:
    """Build a Bloom filter over the DISTINCT values of ``keys[col]``:
    returns ``(words, m, n_build)`` where ``words`` packs the ``m``-bit
    array little-endian into 64-bit signed words.

    This is the build side of Bloom-pruned joins — the standard 100 TB
    trick for cutting a shuffle before it happens (Spark's own runtime
    row-level filtering, Iceberg/Parquet bloom columns): hash the small
    side's join keys into a bitset a few KB–MB wide, broadcast it, and
    drop probe rows map-side before they reach the exchange. With
    ``bits_per_key=16`` and ``k=3`` the theoretical false-positive rate
    is (1−e^(−3/16))³ ≈ 0.5%, so ≥ 99% of non-matching probe rows never
    shuffle.

    Everything up to the final word assembly is distributed: distinct →
    position explode → per-word ``bit_or`` aggregate. The driver collect
    is bounded by m/64 rows — the sketch itself, NOT the data (same
    contract as collecting HLL registers or CMS cells; the whole point
    of a sketch is that this is small). ``m = bits_per_key · n_distinct``
    is data-derived the same way ``auto_nlist`` sizes IVF: a fixed m
    would silently saturate when the build side grows 100×.

    ``max_bits`` (default 2²⁷ bits = 16 MB packed) caps the bitset so a
    runaway build side degrades the false-positive rate instead of the
    driver: uncapped, a 10⁹-distinct-key build would collect ~2 GB to
    the driver and ship it in every task closure. At the cap the FPR
    follows the standard curve ``(1 − e^(−k·n/m))^k`` — e.g. 10⁹ keys
    against 2²⁷ bits ≈ (1−e^(−22.4))³ ≈ 1: the filter prunes nothing
    but never drops a true match (no false negatives, pruning is the
    only casualty). Builds that big should use the engine's runtime
    row-level Bloom join instead (``spark.sql.optimizer.runtime.
    bloomFilter.enabled``, pinned by ``tests/test_plan_quality.py``)."""
    distinct = keys.select(col).distinct()
    n_build = distinct.count()
    m = min(max(64, bits_per_key * n_build), max_bits)
    pos = _bloom_pos_cols(distinct, col, k, m, salt).select(
        F.explode(F.array(*[f"_bp{i}" for i in range(k)])).alias("pos")
    )
    word_rows = (
        pos.select(
            F.floor(F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    words = [0] * ((m + 63) // 64)
    for r in word_rows:
        words[r["w"]] = r["word"]
    return words, m, n_build


def bloom_member_flag(
    probe: DataFrame,
    col: str,
    words: list[int],
    m: int,
    k: int = 3,
    salt: str = "bloom:",
    out_col: str = "bloom_might",
) -> DataFrame:
    """``probe`` plus a boolean ``out_col``: True when ``col`` MIGHT be
    in the filter (no false negatives; false positives at the build's
    configured rate). The flag form lets an audit count members and
    non-members in ONE pass instead of aggregating the filtered frame
    and the raw frame separately (two scans of the probe table).

    The packed bitmap rides a ONE-ROW DataFrame broadcast into every
    task (a one-row BroadcastNestedLoopJoin — constant cost, no literal
    array bloating the plan tree), and membership is k JVM-side bit
    tests per row: ``element_at`` the word, AND against the shifted bit.
    The probe side is never shuffled, re-hashed into Python, or
    collected."""
    spark = probe.sparkSession
    bitmap = spark.createDataFrame([(words,)], "_bw array<bigint>")
    staged = _bloom_pos_cols(probe, col, k, m, salt).crossJoin(
        F.broadcast(bitmap)
    )
    cond = None
    for i in range(k):
        bit = F.expr(
            f"(element_at(_bw, CAST(_bp{i} / 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(_bp{i} % 64 AS INT))) <> 0"
        )
        cond = bit if cond is None else (cond & bit)
    return staged.select(*probe.columns, cond.alias(out_col))


def bloom_candidates(
    probe: DataFrame,
    col: str,
    words: list[int],
    m: int,
    k: int = 3,
    salt: str = "bloom:",
) -> DataFrame:
    """Filter ``probe`` to the rows whose ``col`` MIGHT be in the filter
    (no false negatives; false positives at the build's configured
    rate) — ``bloom_member_flag`` with the flag consumed as a
    predicate. This predicate composes with any downstream join, which
    then moves only the ≈(selectivity + 0.5%) fraction that survives."""
    return (
        bloom_member_flag(
            probe, col, words, m, k=k, salt=salt, out_col="_bloom_might"
        )
        .filter(F.col("_bloom_might"))
        .select(*probe.columns)
    )
