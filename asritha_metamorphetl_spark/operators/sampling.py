"""Deterministic stratified sampling for training-data curation.

``df.sampleBy`` is seed-driven: the sampled set changes with
partitioning, Spark version, and row order, which makes pipeline reruns
non-reproducible and cross-engine verification impossible. This sampler
derives the keep/drop decision from a content hash of the row's id —
every engine, run, and cluster size selects the same rows, and adding
documents never flips the decision for existing ones (stable under
incremental ingest).

``stratified_sample`` is row-local (no shuffle, no RNG state);
``token_budget_sample`` pays one range exchange for its per-source
running total but never funnels a source into a single task. The hash
is the md5-derived 48-bit bucket shared with the dedup operators
(functions/hashing.py), so the oracle SQL can reproduce it bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions.hashing import shingle_hash


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Stable [0, buckets) bucket of an id — the sampling coin flip."""
    return shingle_hash(id_col.cast("string")) % buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    pct_by_stratum: Mapping[object, int],
    default_pct: int = 100,
) -> DataFrame:
    """Keep ``pct_by_stratum[stratum]`` percent of each stratum's rows
    (``default_pct`` for unlisted strata), chosen by stable id-hash
    bucket. Typical use: downsample over-represented languages/sources
    to a target mix before training."""
    pct: Column = F.lit(default_pct)
    for stratum, p in pct_by_stratum.items():
        pct = F.when(F.col(strata_col) == stratum, F.lit(p)).otherwise(pct)
    return df.filter(hash_bucket(F.col(id_col)) < pct)


def token_budget_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_col: str,
    budget_by_source: Mapping[object, int] | None = None,
    default_budget: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cap each source's contribution by TOKENS, not document count —
    how training mixes are actually specified ("100 B tokens of web,
    10 B of code"). Documents are taken in stable ``md5(id)`` order (a
    deterministic shuffle — reruns, engines, and cluster sizes all pick
    the same set, and the selection never flips for existing docs when
    new ones arrive with new ids); a document is kept while the tokens
    BEFORE it stay under the budget, so every source with a positive
    budget contributes at least one document and overshoot is bounded
    by one document's length.

    Adds ``tokens_before`` (the exclusive running total) to the kept
    rows. The running total is ``packing.grouped_running_sum`` —
    range-repartition on (source, md5(id), id), per-(partition, source)
    sums, a driver prefix sum over O(partitions + sources) rows, local
    window + broadcast offset — so a dominant source (web is ALWAYS
    the dominant source at corpus scale) spreads its cumulative scan
    across many tasks instead of serializing into one. The only
    bounded-cardinality contract left is on SOURCES (tens to
    thousands), enforced by the offset-row cap."""
    from asritha_metamorphetl_spark.operators.packing import grouped_running_sum

    budget: Column = F.lit(default_budget)
    for src, b in (budget_by_source or {}).items():
        budget = F.when(F.col(source_col) == src, F.lit(b)).otherwise(budget)
    with_hk = df.withColumn("__hk", F.md5(F.col(id_col).cast("string")))
    out = grouped_running_sum(
        with_hk,
        [source_col],
        [F.col("__hk"), F.col(id_col)],
        F.col(token_col).cast("long"),
        out_col="tokens_before",
        num_partitions=num_partitions,
    ).drop("__hk")
    return out.filter(F.col("tokens_before") < budget)


def unimax_allocation(
    stats: DataFrame,
    source_col: str,
    tokens_col: str,
    budget: Column,
    max_epochs: float = 1.0,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    distribute a global token ``budget`` across sources as uniformly as
    possible, capping every source at ``max_epochs`` passes over its
    ``tokens_col`` tokens — the sampling schedule that avoids both
    proportional sampling's head-domination and temperature sampling's
    tail over-epoching.

    Exact water-filling, closed form: with capacities c_i = max_epochs ·
    tokens_i sorted ascending, source i is capped iff
    ``c_i · (n - i + 1) ≤ budget - Σ_{j<i} c_j`` (for ascending
    capacities this per-row test reproduces the sequential fill
    exactly), and every uncapped source gets the common water level
    ``(budget - Σ_capped c) / n_uncapped``. All quantities are
    integer-valued doubles until the final level division, so the
    comparison is IEEE-exact and reproducible across engines.

    ``stats`` is the per-source rollup — O(sources) rows, which is what
    the single global sort window here is bounded by (tens to thousands
    of sources; never row-scale data). ``budget`` must evaluate to the
    same value on every row (a literal or a scalar subquery) — enforced
    by an in-plan assert. Returns one row per source:
    (source, n_tokens, capacity, allocation, epochs, capped).
    """
    n_tok = F.col(tokens_col).cast("double")
    cap = (n_tok * F.lit(float(max_epochs))).alias("capacity")
    base = stats.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        cap,
        budget.cast("double").alias("budget"),
    )
    w = Window.orderBy(F.col("capacity").asc(), F.col("source").asc())
    ranked = base.select(
        "source",
        "n_tokens",
        "capacity",
        "budget",
        F.row_number().over(w).alias("i"),
        F.coalesce(
            F.sum("capacity").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ).alias("cum_prev"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    ).withColumn(
        "capped",
        F.col("capacity") * (F.col("n") - F.col("i") + 1)
        <= F.col("budget") - F.col("cum_prev"),
    )
    # budget must evaluate to the SAME value on every row (the per-row
    # capped test uses each row's own value, the level uses max) — a
    # non-constant Column would silently mix the two. The guard rides
    # the level expression so the optimizer can't prune it.
    guard = F.assert_true(
        F.min("budget") == F.max("budget"),
        F.lit(
            "unimax_allocation: budget must be row-constant — it is "
            "compared per-row AND aggregated; a per-source budget "
            "Column would silently produce inconsistent allocations"
        ),
    )
    level = ranked.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("capacity"))), F.lit(0.0)
        ).alias("capped_sum"),
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).alias("n_capped"),
        F.max("n").alias("n_all"),
        F.max("budget").alias("b"),
        guard.cast("double").alias("b_guard"),
    ).select(
        (
            F.when(
                F.col("n_capped") < F.col("n_all"),
                (F.col("b") - F.col("capped_sum"))
                / (F.col("n_all") - F.col("n_capped")),
            ).otherwise(F.lit(0.0))
            + F.coalesce(F.col("b_guard"), F.lit(0.0))
        ).alias("level")
    )
    return (
        ranked.crossJoin(F.broadcast(level))
        .select(
            "source",
            "n_tokens",
            F.round("capacity", 6).alias("capacity"),
            F.round(
                F.when(F.col("capped"), F.col("capacity")).otherwise(
                    F.col("level")
                ),
                6,
            ).alias("allocation"),
            # a zero-token source has capacity 0, caps immediately, and
            # gets allocation 0 — emit 0 epochs instead of 0/0 = NaN
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.when(F.col("capped"), F.col("capacity")).otherwise(
                        F.col("level")
                    )
                    / F.col("n_tokens"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("epochs"),
            "capped",
        )
    )


#: variate resolution for weighted sampling: u is an exact (N+1)/RES
#: millionth, so Spark and a SQL oracle agree bit-for-bit on it
ES_RES = 1_000_000


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    salt: str = "es:",
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement:
    every row gets key u^(1/w) for an independent uniform u, and the k
    largest keys form an exact weighted sample (Efraimidis & Spirakis
    2006). Ranking by ``ln(u)/w`` descending is the same order (ln is
    monotone, w > 0), numerically tamer, and — because u here is a
    content-hash millionth in (0, 1] and w arrives pre-rounded — the
    key is reproducible on any engine.

    Scale shape: the key is one row-local hash + divide in the scan
    stage, and the top-k is ``orderBy().limit(k)`` which Spark executes
    as TakeOrderedAndProject — every partition keeps only its local
    k-best, the driver merges O(partitions * k) rows, nothing global
    sorts. At 100 TB this is one pass over the corpus with O(k)
    memory per task. Weights must be > 0 (asserted in-plan: the guard
    term rides the key expression, adding 0.0 when the weight is
    valid). Ties on the rounded key break by ``id_col`` so the k-th
    boundary is deterministic.

    Returns ``df``'s columns plus ``es_key`` (rounded, 6 dp).
    """
    u = (
        shingle_hash(F.concat(F.lit(salt), F.col(id_col).cast("string")))
        % ES_RES
        + 1
    ) / F.lit(float(ES_RES))
    guard = F.assert_true(
        F.col(weight_col) > 0,
        F.concat(
            F.lit("weighted_sample: weight must be > 0, got "),
            F.col(weight_col).cast("string"),
        ),
    )
    # invalid weights become NULL in the divide (ANSI div-by-zero would
    # otherwise raise before the guard's own message gets to fire); the
    # guard term must be the LEFT operand — binary Add short-circuits
    # its right child when the left is NULL, which a bad weight makes it
    w_ok = F.when(F.col(weight_col) > 0, F.col(weight_col))
    key = F.coalesce(guard.cast("double"), F.lit(0.0)) + F.round(
        F.log(u) / w_ok, 6
    )
    return (
        df.withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), F.col(id_col))
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    id_col: str,
    k: int,
    salt: str = "es:",
) -> DataFrame:
    """Exactly ``k`` rows per group, weighted without replacement: the
    per-group variant of ``weighted_sample_without_replacement`` —
    the same Efraimidis–Spirakis content-hash key, ranked inside each
    group by ``row_number``. The quota shape for "exactly 50k
    quality-biased documents from EVERY source".

    Scale shape: one shuffle on ``group_col`` over however narrow a
    projection the caller passes (project to (group, weight, id)
    first at 100 TB — the window needs nothing else); per-group state
    is the sort, not a global one. Ties break by ``id_col``; weights
    must be > 0 (same in-plan guard)."""
    u = (
        shingle_hash(F.concat(F.lit(salt), F.col(id_col).cast("string")))
        % ES_RES
        + 1
    ) / F.lit(float(ES_RES))
    guard = F.assert_true(
        F.col(weight_col) > 0,
        F.concat(
            F.lit("weighted_sample: weight must be > 0, got "),
            F.col(weight_col).cast("string"),
        ),
    )
    w_ok = F.when(F.col(weight_col) > 0, F.col(weight_col))
    key = F.coalesce(guard.cast("double"), F.lit(0.0)) + F.round(
        F.log(u) / w_ok, 6
    )
    win = Window.partitionBy(group_col).orderBy(
        F.col("es_key").desc(), F.col(id_col)
    )
    return (
        df.withColumn("es_key", key)
        .withColumn("__es_rn", F.row_number().over(win))
        .filter(F.col("__es_rn") <= k)
        .drop("__es_rn")
    )


#: Poisson-bootstrap geometry: replicate count and the truncated
#: Poisson(1) inverse-CDF thresholds over the 48-bit hash space.
#: T[k] = floor(P(X <= k) * 2^48) for k = 0..6; a draw u lands on count
#: c = #{k : u >= T[k]} (so c = 0 with prob ~.3679, capped at 7 — tail
#: mass ~1e-5 truncated identically in both engines). Contract
#: constants: the oracle SQL embeds these integers literally.
BOOT_B = 32
_POISSON1_CDF = []
_acc, _term = 0.0, 2.718281828459045 ** -1.0
for _k in range(7):
    _acc += _term
    _POISSON1_CDF.append(_acc)
    _term /= _k + 1
BOOT_THRESHOLDS = tuple(int(c * (1 << 48)) for c in _POISSON1_CDF)
del _acc, _term, _k, _POISSON1_CDF


def _small_primes(n: int, start: int) -> tuple[int, ...]:
    out, x = [], start
    while len(out) < n:
        if all(x % p for p in range(2, int(x**0.5) + 1)):
            out.append(x)
        x += 2
    return tuple(out)


#: Per-replicate mixing constants for the ONE-md5 bootstrap:
#: u_b = ((A_b·h + C_b) mod (2^61−1)) mod 2^48 — the MinHash
#: multiply-add mixing family applied to the bootstrap (one content
#: hash per row, B integer multiply-adds, instead of B md5s per row).
#: A_b·h + C_b stays < 2^61-1 (A_b < 2^13, h < 2^48), so the mod-M61
#: step in the variate never wraps and both engines compute the whole
#: thing in exact BIGINT arithmetic; the oracle embeds these tuples
#: literally.
BOOT_PERM_A = _small_primes(BOOT_B, 769)
BOOT_PERM_C = tuple((i * i * 7919 + 13) for i in range(BOOT_B))


def poisson_bootstrap_counts_mixed(
    hash_col: Column, b_col: Column
) -> Column:
    """Poisson(1) multiplicity of a row in replicate ``b`` from ONE
    precomputed 48-bit content hash (``shingle_hash(id)``): replicate
    b's uniform variate is ((A_b·h + C_b) mod M61) mod 2^48, then the
    same inverse-CDF integer thresholds as
    ``poisson_bootstrap_counts``. NOTE: at the current constants the
    mod-M61 step never wraps (A_b < 2^13, h < 2^48 ⇒ A_b·h + C_b <
    2^61-1), so the effective construction is a multiply-add LCG mod
    2^48, not a true Mersenne-prime permutation; decorrelation across
    replicates is empirical (distinct odd multipliers), and growing
    BOOT_B past ~2^13 primes would silently change the regime. Same
    contract (pure integers, engine-replayable, no RNG state) at 1/B
    the md5 cost — the md5-per-(row, replicate) spelling was the
    bootstrap query's entire hot path."""
    from asritha_metamorphetl_spark.functions.hashing import MERSENNE61

    a = F.element_at(
        F.array(*[F.lit(v) for v in BOOT_PERM_A]), b_col + 1
    )
    c0 = F.element_at(
        F.array(*[F.lit(v) for v in BOOT_PERM_C]), b_col + 1
    )
    u = ((a * hash_col + c0) % F.lit(MERSENNE61)) % F.lit(1 << 48)
    c = F.lit(0)
    for t in BOOT_THRESHOLDS:
        c = c + F.when(u >= F.lit(t), 1).otherwise(0)
    return c


def poisson_bootstrap_counts(id_col: Column, b_col: Column) -> Column:
    """Deterministic Poisson(1) resample multiplicity of a row in
    bootstrap replicate ``b``: hash (replicate, id) to 48 bits and
    invert the CDF with pure integer comparisons. This is the
    one-pass bootstrap (Poisson bootstrap — the large-scale form used
    when n is unknown until the scan ends): instead of materializing B
    resampled datasets, each row carries B tiny integer weights, and a
    replicate statistic is a weighted aggregate — so B bootstrap
    replicates cost ONE scan plus a B-row-per-task map-side combine,
    never a data shuffle. Deterministic and engine-replayable: no RNG
    state, just content hashes.
    """
    u = shingle_hash(
        F.concat(F.lit("boot"), b_col.cast("string"), F.lit(":"), id_col)
    )
    c = F.lit(0)
    for t in BOOT_THRESHOLDS:
        c = c + F.when(u >= F.lit(t), 1).otherwise(0)
    return c
