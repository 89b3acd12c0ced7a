"""Sketch-accuracy audits: approximate aggregates checked against exact.

At 100 TB, exact ``COUNT(DISTINCT)`` and exact percentiles are often the
single most expensive aggregates in a workload (a full shuffle of every
distinct value / a full sort). Spark's HyperLogLog++
(``approx_count_distinct``) and Greenwald-Khanna (``percentile_approx``)
sketches compute them in one map-side-combinable pass with bounded
memory — but an engine that ships sketches must also ship the evidence
that their error is inside the advertised bound, continuously, the same
way ``minhash_recall_eval`` / ``knn_lsh_recall_eval`` keep the ANN
recall regression-visible.

Oracle pattern: the query computes BOTH the sketch and the exact value,
emits the exact value plus a boolean ``within_bound``; the DuckDB oracle
recomputes the exact value and expects the boolean to be literally TRUE.
If a Spark upgrade (or a knob change here) degrades the sketch past the
bound, the hash compare fails — the driver sees sketch drift as a
correctness failure, not a silent quality loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

# HLL++ at rsd=0.05 has a standard error of 5%; 3 sigma ≈ 15%. The
# fixture sits far inside this, so the audit bound is conservative
# without being vacuous.
_HLL_RSD = 0.05
_HLL_BOUND = 3 * _HLL_RSD


@register(
    "approx_distinct_audit",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_cust,
       COUNT(*) AS n_orders,
       TRUE AS within_bound
FROM orders
GROUP BY o_orderpriority
""",
)
def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count audit per order priority.

    One hash aggregate computes the HLL sketch AND the exact distinct
    count side by side; ``within_bound`` asserts relative error <= 3×rsd.
    The sketch is the 100 TB path (fixed ~1.5 KB of state per group, no
    distinct-expand shuffle); the exact count is the audit — affordable
    at sf0.01/sf0.1, and exactly what you'd run on a 0.1% sample in
    production to keep the sketch honest."""
    orders = Catalog(sf_dir).load(spark, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=_HLL_RSD).alias("approx_cust"),
        F.countDistinct("o_custkey").alias("exact_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    rel_err = F.abs(F.col("approx_cust") - F.col("exact_cust")) / F.col(
        "exact_cust"
    )
    return agg.select(
        "o_orderpriority",
        "exact_cust",
        "n_orders",
        (rel_err <= F.lit(_HLL_BOUND)).alias("within_bound"),
    )


# percentile_approx(accuracy=A) guarantees rank error <= n/A; the audit
# re-ranks the sketch's answer against the raw data and allows the
# guaranteed slack plus a small tie margin.
_GK_ACCURACY = 1000
_RANK_SLACK = 1.0 / _GK_ACCURACY + 0.01


@register(
    "quantile_sketch_audit",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
FROM orders
GROUP BY o_orderpriority
""",
)
def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile-sketch audit per order priority.

    Phase 1 computes ``percentile_approx`` for p25/p50/p75 in one
    map-side-combinable aggregate (the 100 TB path — no global sort).
    Phase 2 broadcasts the tiny per-group sketch answers back onto the
    raw rows and measures the ACHIEVED rank of each answer
    (``avg(price <= answer)``); each ``pXX_ok`` asserts the achieved
    rank is within the guaranteed n/accuracy slack of the target. The
    audit costs one extra scan — run it on a sample in production."""
    orders = Catalog(sf_dir).load(spark, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    sketch = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx(
            "o_totalprice", [0.25, 0.5, 0.75], _GK_ACCURACY
        ).alias("qs")
    )
    ranked = orders.join(F.broadcast(sketch), "o_orderpriority")
    achieved = ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        *[
            F.avg(
                (F.col("o_totalprice") <= F.col("qs")[i]).cast("double")
            ).alias(f"rank_{p}")
            for i, p in enumerate((25, 50, 75))
        ],
    )
    checks = [
        (
            F.abs(F.col(f"rank_{p}") - F.lit(p / 100.0)) <= F.lit(_RANK_SLACK)
        ).alias(f"p{p}_ok")
        for p in (25, 50, 75)
    ]
    return achieved.select("o_orderpriority", "n_orders", *checks)


def _hll_reg_core_sql() -> str:
    """SQL replay of operators/frequent.hll_registers over lineitem
    (group = l_returnflag, element = l_orderkey): the md5-based 48-bit
    hash, bucket = h mod 64, and rank = leading zeros of the 42-bit
    remainder + 1 via pure integer binary-string length — the exact
    arithmetic the Spark operator runs, so registers compare
    bit-for-bit."""
    from asritha_metamorphetl_spark.operators.frequent import (
        HLL_HASH_BITS,
        HLL_P,
    )
    from asritha_metamorphetl_spark.plans.text_queries import _hex48_sql

    m = 1 << HLL_P
    top = HLL_HASH_BITS - HLL_P + 1  # rank of w == 0 (all zeros)
    hv = _hex48_sql("md5('hll:' || CAST(l_orderkey AS VARCHAR))")
    return f"""
hll_h AS (
    SELECT l_returnflag AS flag, {hv} AS hv FROM lineitem
),
hll_br AS (
    SELECT flag, hv % {m} AS bucket, hv // {m} AS w FROM hll_h
),
hll_reg AS (
    SELECT flag, CAST(bucket AS BIGINT) AS bucket,
           CAST(MAX(CASE WHEN w > 0
                         THEN {top} - length(bin(CAST(w AS BIGINT)))
                         ELSE {top} END) AS BIGINT) AS register
    FROM hll_br GROUP BY flag, bucket
)"""


def _hll_registers_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from asritha_metamorphetl_spark.operators.frequent import hll_registers

    li = Catalog(sf_dir).load(spark, "lineitem").select(
        "l_returnflag", "l_orderkey"
    )
    regs = hll_registers(li, "l_orderkey", ("l_returnflag",))
    return regs.select(
        F.col("l_returnflag").alias("flag"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("register").cast("bigint").alias("register"),
    )


@register(
    "hll_register_table",
    oracle=f"""
WITH {_hll_reg_core_sql()}
SELECT flag, bucket, register FROM hll_reg
""",
)
def hll_register_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """White-box HyperLogLog: the sketch's full register state as data,
    oracle-replayed register-for-register (not just bound-checked like
    ``approx_distinct_audit`` — here a single flipped register fails the
    hash). One map-side-combining MAX aggregate whose shuffle carries at
    most groups × 64 partial rows per task, never the distinct ids: the
    100 TB shape of COUNT(DISTINCT). Registers are mergeable by MAX
    (idempotent + commutative), which ``streaming_hll_parity`` exercises
    under at-least-once semantics."""
    return _hll_registers_df(spark, sf_dir)


def _hll_est_oracle() -> str:
    from asritha_metamorphetl_spark.operators.frequent import (
        HLL_HASH_BITS,
        HLL_P,
        hll_alpha,
    )

    m = 1 << HLL_P
    dp = HLL_HASH_BITS - HLL_P + 1  # common-denominator exponent
    numer = hll_alpha(m) * (m * m) * (1 << dp)
    return f"""
WITH {_hll_reg_core_sql()},
est AS (
    SELECT flag,
           SUM(1::BIGINT << ({dp} - CAST(register AS INT)))
           + ({m} - COUNT(*)) * (1::BIGINT << {dp}) AS inv_numer
    FROM hll_reg GROUP BY flag
),
ex AS (
    SELECT l_returnflag AS flag,
           COUNT(DISTINCT l_orderkey) AS exact_orders
    FROM lineitem GROUP BY 1
)
SELECT e.flag, ex.exact_orders,
       ROUND({numer!r} / e.inv_numer, 3) AS hll_est,
       ROUND(({numer!r} / e.inv_numer - ex.exact_orders)
             / ex.exact_orders, 4) AS rel_err,
       ABS(ROUND(({numer!r} / e.inv_numer - ex.exact_orders)
                 / ex.exact_orders, 4)) <= 0.40 AS within_bound
FROM est e JOIN ex ON ex.flag = e.flag
"""


@register("hll_estimate_audit", oracle=_hll_est_oracle())
def hll_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality estimate derived from the white-box registers,
    with the estimator itself oracle-replayed — exact integer harmonic
    sum (common-denominator bigint, see ``operators/frequent.
    hll_estimate``) and a single correctly-rounded IEEE division, so
    even the FLOAT estimate hash-matches across engines. ``rel_err``
    against the exact distinct count stays inside ±40% (3 sigma for
    m=64); groups here have cardinality ≫ 2.5m, where the raw
    (uncorrected) estimator is the right regime."""
    from asritha_metamorphetl_spark.operators.frequent import (
        hll_estimate,
        hll_registers,
    )

    li = Catalog(sf_dir).load(spark, "lineitem").select(
        "l_returnflag", "l_orderkey"
    )
    # ONE scan + one distinct shuffle feed both halves (round 13): the
    # exact side's countDistinct already dedupes (flag, orderkey), and
    # HLL registers are a function of the distinct key set (MAX is
    # idempotent — duplicates can't change a bucket's max rank), so the
    # sketch hashes each DISTINCT key once off the same checkpointed
    # frame instead of paying its own corpus scan with md5 per raw row.
    dk = li.distinct().localCheckpoint(eager=False)
    regs = hll_registers(dk, "l_orderkey", ("l_returnflag",))
    est = hll_estimate(regs, ("l_returnflag",))
    exact = dk.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("exact_orders")
    )
    joined = est.join(exact, "l_returnflag")
    rel_err = F.round(
        (F.col("hll_est") - F.col("exact_orders")) / F.col("exact_orders"), 4
    )
    return joined.select(
        F.col("l_returnflag").alias("flag"),
        "exact_orders",
        F.round(F.col("hll_est"), 3).alias("hll_est"),
        rel_err.alias("rel_err"),
        (F.abs(rel_err) <= F.lit(0.40)).alias("within_bound"),
    )


def _cms_key_cells_sql(key_expr: str, width_sql: str) -> str:
    """SQL twin of countmin_sketch's per-row cell assignment over a key
    column (same salt scheme as the vocabulary CMS in
    catalog_queries._cms_cells_sql, applied to join keys). ``width_sql``
    is a scalar expression — here a subquery deriving the width from
    the corpus count, because a fixed-width sketch's overestimate grows
    as N²/width while the exact join size only grows as N²/keys: the
    knob must scale with the data, in BOTH engines."""
    from asritha_metamorphetl_spark.plans.catalog_queries import (
        CMS_DEPTH,
        CMS_SALT,
    )
    from asritha_metamorphetl_spark.plans.text_queries import _hex48_sql

    parts = []
    for i in range(CMS_DEPTH):
        md5_expr = f"md5('{CMS_SALT}{i}:' || {key_expr})"
        parts.append(
            f"SELECT {i} AS row_i, {_hex48_sql(md5_expr)} % {width_sql}"
            f" AS cell FROM lineitem"
        )
    return " UNION ALL ".join(parts)


def _cms_width(n_rows: int) -> int:
    """Sketch width for a corpus of ``n_rows`` join keys: the next power
    of two above n_rows/10, floored at 1024. Keeps the inner-product
    excess (~N²/width per row) proportional to the exact self-join size
    instead of swamping it — integer-only so the SQL twin
    (1 << length(bin(N // 10))) lands on the identical value."""
    return max(1024, 1 << (n_rows // 10).bit_length())


def _selfjoin_oracle() -> str:
    cells = _cms_key_cells_sql(
        "CAST(l_partkey AS VARCHAR)", "(SELECT w FROM wcte)"
    )
    return f"""
WITH wcte AS (
    SELECT GREATEST(1024, 1::BIGINT
           << length(bin((COUNT(*) // 10)::BIGINT))) AS w
    FROM lineitem
),
cells AS ({cells}),
sk AS (SELECT row_i, cell, COUNT(*) AS n FROM cells GROUP BY 1, 2),
ip AS (SELECT row_i, SUM(n * n) AS est FROM sk GROUP BY 1),
cms AS (SELECT MIN(est) AS cms_estimate FROM ip),
ex AS (
    SELECT SUM(c * c) AS exact_size, SUM(c) AS n_rows
    FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey)
)
SELECT CAST(ex.exact_size AS BIGINT) AS exact_size,
       CAST(cms.cms_estimate AS BIGINT) AS cms_estimate,
       ROUND(CAST(cms.cms_estimate AS DOUBLE) / ex.exact_size, 4) AS ratio,
       cms.cms_estimate >= ex.exact_size AS never_under,
       cms.cms_estimate <= ex.exact_size
           + 3 * (ex.n_rows * ex.n_rows) // (SELECT w FROM wcte)
           AS within_bound
FROM cms, ex
"""


@register("selfjoin_size_estimate", oracle=_selfjoin_oracle())
def selfjoin_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join-cardinality estimation — the query-optimizer
    question ("how many rows would ``lineitem ⋈ lineitem ON l_partkey``
    produce?") answered from O(depth × width) state instead of a
    key-frequency shuffle: the Count-Min inner product
    ``min_r Σ_c A[r,c]²`` (Cormode & Muthukrishnan 2005 §4.2) NEVER
    underestimates, and overshoots by at most ~N²/width per row (depth
    rows take the min). The width SCALES with the corpus count
    (``_cms_width`` — next power of two above N/10, derived identically
    in the oracle's SQL), because a fixed width lets the N²/width excess
    swamp the exact size at scale: measured ratio stays ≲ 2 across
    sf0.001→0.1 where a frozen 1024 drifted to 19.8×. At 100 TB this is
    how a planner sizes a shuffle before paying for it; the audit
    recomputes the exact ``Σ_k count(k)²`` alongside and oracle-replays
    sketch, estimate, and both guarantees in exact integer arithmetic."""
    from asritha_metamorphetl_spark.operators.frequent import countmin_sketch
    from asritha_metamorphetl_spark.plans.catalog_queries import (
        CMS_DEPTH,
        CMS_SALT,
    )

    li = Catalog(sf_dir).load(spark, "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    # ONE pass over the fact table: the per-key count frame feeds the
    # width sizing, the weighted sketch, AND the exact audit (round 13
    # — the sketch used to hash depth md5s per RAW ROW; every
    # occurrence of a key lands in the same cells, so hashing each
    # DISTINCT key once and weighting by its count yields the
    # identical sketch with O(distinct) hash work, and the count()
    # that sized the width stops being its own corpus scan: it is the
    # localCheckpoint-materializing sum over the key frame).
    kc = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    width = _cms_width(kc.agg(F.sum("c")).collect()[0][0])
    sk = countmin_sketch(
        kc, "k", depth=CMS_DEPTH, width=width, salt=CMS_SALT, weight="c"
    )
    est = (
        sk.groupBy("row")
        .agg(F.sum(F.col("n") * F.col("n")).alias("est"))
        .agg(F.min("est").alias("cms_estimate"))
    )
    exact = kc.agg(
        F.sum(F.col("c") * F.col("c")).alias("exact_size"),
        F.sum("c").alias("n_rows"),
    )
    slack = F.floor(
        F.lit(3) * F.col("n_rows") * F.col("n_rows") / F.lit(width)
    ).cast("long")
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("exact_size").cast("bigint").alias("exact_size"),
        F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        F.round(
            F.col("cms_estimate").cast("double") / F.col("exact_size"), 4
        ).alias("ratio"),
        (F.col("cms_estimate") >= F.col("exact_size")).alias("never_under"),
        (F.col("cms_estimate") <= F.col("exact_size") + slack).alias(
            "within_bound"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pruning: the map-side shuffle-avoidance audit
# ---------------------------------------------------------------------------

#: Bloom knobs, shared verbatim by engine and oracle. k=3 hashes at 16
#: bits/key → theoretical fp ≈ (1−e^(−3/16))³ ≈ 0.5%; the audit bound is
#: 1/20 (5%) — 10× headroom, checked per segment with integer
#: cross-multiplication so no float literal can wobble the boolean.
BLOOM_K = 3
BLOOM_BPK = 16
BLOOM_FP_DEN = 20
BLOOM_SALT = "bloom:"


def _bloom_oracle() -> str:
    from asritha_metamorphetl_spark.plans.text_queries import _hex48_sql

    def pos(i: int, key: str) -> str:
        h = _hex48_sql(f"md5('{BLOOM_SALT}{i}:' || CAST({key} AS VARCHAR))")
        return f"{h} % (SELECT m FROM par)"

    pos_union = "\n    UNION ALL\n".join(
        f"    SELECT {pos(i, 'key')} AS pos FROM bkeys"
        for i in range(BLOOM_K)
    )
    member = "\n      AND ".join(
        f"{pos(i, 'p.c_custkey')} IN (SELECT pos FROM bpos)"
        for i in range(BLOOM_K)
    )
    return f"""
WITH bkeys AS (
    SELECT DISTINCT o_custkey AS key FROM orders
    WHERE o_orderpriority = '1-URGENT'
),
par AS (SELECT GREATEST(64, {BLOOM_BPK} * COUNT(*)) AS m FROM bkeys),
bpos AS (
    SELECT DISTINCT pos FROM (
{pos_union}
    )
),
probe AS (SELECT c_custkey, c_mktsegment FROM customer),
cand AS (
    SELECT p.c_custkey, p.c_mktsegment FROM probe p
    WHERE {member}
),
base AS (
    SELECT c_mktsegment, COUNT(*) AS n_probe FROM probe GROUP BY 1
),
cnd AS (
    SELECT c_mktsegment, COUNT(*) AS n_candidate FROM cand GROUP BY 1
),
exa AS (
    SELECT c_mktsegment, COUNT(*) AS n_exact FROM probe
    WHERE c_custkey IN (SELECT key FROM bkeys) GROUP BY 1
)
SELECT b.c_mktsegment,
       b.n_probe,
       COALESCE(c.n_candidate, 0) AS n_candidate,
       COALESCE(e.n_exact, 0) AS n_exact,
       COALESCE(c.n_candidate, 0) - COALESCE(e.n_exact, 0) AS n_false_pos,
       (SELECT m FROM par) AS m_bits,
       {BLOOM_FP_DEN} * (COALESCE(c.n_candidate, 0) - COALESCE(e.n_exact, 0))
           <= b.n_probe - COALESCE(e.n_exact, 0) AS fp_within_bound
FROM base b
LEFT JOIN cnd c USING (c_mktsegment)
LEFT JOIN exa e USING (c_mktsegment)
"""


def _bloom_build_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNPINNED distinct build-key frame (urgent-order customers).
    Factored out so the plan gate can assert the priority predicate
    pushes to the orders scan — the audit pins this frame with a lazy
    localCheckpoint, which hides the scan from the final plan."""
    orders = Catalog(sf_dir).load(spark, "orders")
    return (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )


@register("bloom_prune_audit", oracle=_bloom_oracle())
def bloom_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """White-box Bloom-filter join pruning, audited against the exact
    semi-join.

    The 100 TB scenario: a probe table (here ``customer``) must join a
    much smaller key set (urgent-order customers); shuffling the whole
    probe side to discover that most rows don't match is the single
    biggest avoidable exchange in many production joins. The Bloom path
    hashes the build keys into a ``bits_per_key·n``-bit set
    (``operators/frequent.bloom_build`` — distributed bit_or, O(m/64)
    driver rows), broadcasts it as ONE row, and drops probe rows
    map-side with 3 JVM bit tests (``bloom_member_flag``) — no false
    negatives, measured false positives.

    The audit emits, per market segment: probe rows, Bloom candidates,
    exact members (left-semi join ground truth), the false-positive
    count, and an integer-arithmetic bound check (fp ≤ 1/20 of the
    non-members — theory says ~0.5%). The DuckDB oracle replays the
    salted-md5 positions bit-for-bit and recomputes the same counts, so
    a hash drift, a saturated filter, or a broken bit test fails the
    driver compare rather than silently degrading prune rates.

    Reference scope: no Bloom surface in the reference; this belongs to
    the scale-operations additions (SURVEY §2's quality/efficiency
    envelope) alongside CMS/HLL."""
    from asritha_metamorphetl_spark.operators.frequent import (
        bloom_build,
        bloom_member_flag,
    )

    cat = Catalog(sf_dir)
    cust = cat.load(spark, "customer")
    # Pin the distinct build keys: bloom_build's count + position pass
    # AND the exact-membership broadcast below all read this one frame,
    # so orders is scanned ONCE instead of once per consumer (the old
    # spelling re-derived the filtered keys three times: the distinct
    # count, the position explode, and the left-semi ground truth).
    keys = _bloom_build_keys(spark, sf_dir).localCheckpoint(eager=False)
    words, m, _n = bloom_build(
        keys, "key", k=BLOOM_K, bits_per_key=BLOOM_BPK, salt=BLOOM_SALT
    )
    # ONE pass over the probe table: the Bloom verdict rides as a flag,
    # exact membership as a broadcast left join against the (distinct,
    # so cardinality-preserving) key set, and all three counters come
    # out of a single per-segment aggregate — the old spelling scanned
    # customer three times (probe totals, candidate totals, exact
    # totals) and stitched them with two per-segment joins.
    probe = cust.select("c_custkey", "c_mktsegment")
    flagged = bloom_member_flag(
        probe, "c_custkey", words, m, k=BLOOM_K, salt=BLOOM_SALT,
        out_col="_might",
    ).join(F.broadcast(keys), F.col("c_custkey") == F.col("key"), "left")
    one = flagged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.when(F.col("_might"), 1).otherwise(0))
        .cast("long")
        .alias("n_candidate"),
        F.sum(F.when(F.col("key").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
    )
    return one.select(
        "c_mktsegment",
        "n_probe",
        "n_candidate",
        "n_exact",
        (F.col("n_candidate") - F.col("n_exact")).alias("n_false_pos"),
        F.lit(m).cast("long").alias("m_bits"),
        (
            F.lit(BLOOM_FP_DEN) * (F.col("n_candidate") - F.col("n_exact"))
            <= F.col("n_probe") - F.col("n_exact")
        ).alias("fp_within_bound"),
    )


# ---------------------------------------------------------------------------
# HLL set algebra: mergeable union + inclusion-exclusion intersection
# ---------------------------------------------------------------------------

#: Separate precision for the set-algebra audit: m=1024 buckets (sigma
#: = 1.04/sqrt(m) ~ 3.25%) so the inclusion-exclusion intersection
#: bound is meaningful rather than vacuous at m=64.
HLL_SET_P = 10
_SET_A = "o_orderpriority = '1-URGENT'"
_SET_B = "o_orderpriority = '2-HIGH'"
#: 3 sigma at m=1024.
_HLL_SET_3SIG = 0.0975


def _hll_set_oracle() -> str:
    from asritha_metamorphetl_spark.operators.frequent import (
        HLL_HASH_BITS,
        hll_alpha,
    )
    from asritha_metamorphetl_spark.plans.text_queries import _hex48_sql

    m = 1 << HLL_SET_P
    top = HLL_HASH_BITS - HLL_SET_P + 1
    dp = top  # common-denominator exponent (width + 1)
    numer = hll_alpha(m) * (m * m) * (1 << dp)
    hv = _hex48_sql("md5('hll:' || CAST(o_custkey AS VARCHAR))")

    def reg(name: str, pred: str) -> str:
        return f"""
{name}_h AS (SELECT {hv} AS hv FROM orders WHERE {pred}),
{name}_br AS (SELECT hv % {m} AS bucket, hv // {m} AS w FROM {name}_h),
{name}_reg AS (
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(MAX(CASE WHEN w > 0
                         THEN {top} - length(bin(CAST(w AS BIGINT)))
                         ELSE {top} END) AS BIGINT) AS register
    FROM {name}_br GROUP BY bucket
)"""

    def est(name: str, src: str) -> str:
        return f"""
{name} AS (
    SELECT SUM(1::BIGINT << ({dp} - CAST(register AS INT)))
           + ({m} - COUNT(*)) * (1::BIGINT << {dp}) AS inv,
           COUNT(*) AS occ
    FROM {src}
)"""

    def corr(t: str) -> str:
        raw = f"{numer!r} / {t}.inv"
        return (
            f"CASE WHEN {raw} <= {2.5 * m} AND {m} - {t}.occ > 0"
            f" THEN {float(m)!r} * ln({float(m)!r} / ({m} - {t}.occ))"
            f" ELSE {raw} END"
        )

    ca, cb, cu = corr("a_est"), corr("b_est"), corr("u_est")
    return f"""
WITH {reg('a', _SET_A).lstrip()},
{reg('b', _SET_B).lstrip()},
u_reg AS (
    SELECT bucket, MAX(register) AS register FROM (
        SELECT * FROM a_reg UNION ALL SELECT * FROM b_reg
    ) GROUP BY bucket
),
{est('a_est', 'a_reg').lstrip()},
{est('b_est', 'b_reg').lstrip()},
{est('u_est', 'u_reg').lstrip()},
ex AS (
    SELECT COUNT(DISTINCT CASE WHEN {_SET_A} THEN o_custkey END) AS exact_a,
           COUNT(DISTINCT CASE WHEN {_SET_B} THEN o_custkey END) AS exact_b,
           COUNT(DISTINCT CASE WHEN ({_SET_A}) OR ({_SET_B})
                           THEN o_custkey END) AS exact_union
    FROM orders
),
exi AS (
    SELECT COUNT(*) AS exact_inter FROM (
        SELECT o_custkey FROM orders GROUP BY o_custkey
        HAVING SUM(CASE WHEN {_SET_A} THEN 1 ELSE 0 END) > 0
           AND SUM(CASE WHEN {_SET_B} THEN 1 ELSE 0 END) > 0
    )
)
SELECT ex.exact_a, ex.exact_b, ex.exact_union, exi.exact_inter,
       ROUND({cu}, 3) AS est_union,
       ROUND({ca} + {cb} - {cu}, 3) AS est_inter,
       ABS({cu} - ex.exact_union)
           <= {_HLL_SET_3SIG} * ex.exact_union AS union_ok,
       ABS(({ca} + {cb} - {cu}) - exi.exact_inter)
           <= {_HLL_SET_3SIG} * (ex.exact_a + ex.exact_b + ex.exact_union)
           AS inter_ok
FROM a_est, b_est, u_est, ex, exi
"""


@register("hll_set_algebra_audit", oracle=_hll_set_oracle())
def hll_set_algebra_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register MERGEABILITY end-to-end: two independently-built
    register tables (urgent-order vs high-order customers), union by
    per-bucket MAX — never touching the raw data again — and the
    inclusion-exclusion intersection estimate, both audited against
    exact distinct counts.

    This is why sketches win at 100 TB: |A ∪ B| for two corpora costs
    one m-row register merge instead of a distinct-union shuffle, and
    the same algebra answers overlap questions across any pre-computed
    per-source/per-day register tables. The intersection bound is the
    honest one — inclusion-exclusion accumulates the error of all three
    estimates (3 sigma x (|A|+|B|+|A∪B|)), which is exactly why m=1024
    here rather than the m=64 the single-set audits use. The oracle
    replays registers bit-for-bit AND the exact-integer harmonic sums,
    so the float estimates themselves hash-match."""
    from asritha_metamorphetl_spark.operators.frequent import (
        hll_estimate,
        hll_registers,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    m = 1 << HLL_SET_P
    # each register table feeds TWO consumers (its own estimate + the
    # union merge) and is at most m rows — materialize once lazily
    # instead of re-scanning orders per consumer (the bm25 lesson;
    # measured 8.3 s → the fused shape below at sf0.1)
    ra = hll_registers(
        orders.filter(_SET_A).select("o_custkey"), "o_custkey", p=HLL_SET_P
    ).localCheckpoint(eager=False)
    rb = hll_registers(
        orders.filter(_SET_B).select("o_custkey"), "o_custkey", p=HLL_SET_P
    ).localCheckpoint(eager=False)
    ru = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )

    def est(regs: DataFrame, name: str) -> DataFrame:
        # raw harmonic estimate + the standard small-range LINEAR
        # COUNTING correction (Flajolet et al. 2007 §4): below 2.5m the
        # raw estimator overshoots badly (the sweep measured 795 vs 147
        # at sf0.001), while m·ln(m/V) from the V empty buckets is
        # near-exact. The regime decision compares a deterministic
        # double to a constant; ln() differs across engines only in the
        # last ulp, absorbed by the 3-decimal rounding and the wide
        # audit bounds.
        raw = hll_estimate(regs, (), p=HLL_SET_P).crossJoin(
            regs.agg(F.count(F.lit(1)).alias("occ"))
        )
        v = F.lit(m) - F.col("occ")
        corrected = F.when(
            (F.col("hll_est") <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v),
        ).otherwise(F.col("hll_est"))
        return raw.select(corrected.alias(name))

    ea, eb, eu = est(ra, "e_a"), est(rb, "e_b"), est(ru, "e_u")
    pa, pb = F.expr(_SET_A), F.expr(_SET_B)
    # all four exact counts from ONE orders pass: per-customer set
    # membership flags, then one bounded rollup (a countDistinct per
    # predicate would re-expand the distinct shuffle three times)
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.when(pa, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(pb, 1).otherwise(0)).alias("in_b"),
    )
    ex = per_cust.agg(
        F.sum("in_a").cast("long").alias("exact_a"),
        F.sum("in_b").cast("long").alias("exact_b"),
        F.sum(
            F.greatest(F.col("in_a"), F.col("in_b"))
        ).cast("long").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias(
            "exact_inter"
        ),
    )
    est_inter = F.col("e_a") + F.col("e_b") - F.col("e_u")
    bound = F.lit(_HLL_SET_3SIG) * (
        F.col("exact_a") + F.col("exact_b") + F.col("exact_union")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(F.broadcast(ex))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            F.round(F.col("e_u"), 3).alias("est_union"),
            F.round(est_inter, 3).alias("est_inter"),
            (
                F.abs(F.col("e_u") - F.col("exact_union"))
                <= F.lit(_HLL_SET_3SIG) * F.col("exact_union")
            ).alias("union_ok"),
            (F.abs(est_inter - F.col("exact_inter")) <= bound).alias(
                "inter_ok"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Bottom-k sample quantile sketch: the mergeable white-box alternative
# to engine-private quantile sketches (approx_percentile's KLL bytes)
# ---------------------------------------------------------------------------

#: Sample size and salt, shared verbatim with the oracle. With k=1024
#: the q-quantile estimate's CDF position concentrates within
#: ~1/sqrt(k) ≈ 3% of q (Chernoff on the uniform hash order).
BK_K = 1024
BK_SALT = "bk:"
BK_QS = (25, 50, 75, 90)


def _bottomk_oracle() -> str:
    from asritha_metamorphetl_spark.plans.text_queries import _hex48_sql

    hv = _hex48_sql(f"md5('{BK_SALT}' || CAST(o_orderkey AS VARCHAR))")
    qs = ", ".join(f"({q})" for q in BK_QS)
    return f"""
WITH enc AS (
    SELECT o_orderkey AS id,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           ROUND(LN((({hv} % 1000000) + 1) / 1000000.0) / 1.0, 6)
               AS es_key
    FROM orders
),
sample AS (
    SELECT cents FROM enc ORDER BY es_key DESC, id LIMIT {BK_K}
),
scounts AS (SELECT cents, COUNT(*) AS c FROM sample GROUP BY cents),
scum AS (
    SELECT cents,
           SUM(c) OVER (ORDER BY cents ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
    FROM scounts
),
fcounts AS (SELECT cents, COUNT(*) AS c FROM enc GROUP BY cents),
fcum AS (
    SELECT cents,
           SUM(c) OVER (ORDER BY cents ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum,
           SUM(c) OVER () AS n
    FROM fcounts
),
qs(q_pct) AS (VALUES {qs}),
est AS (
    SELECT q.q_pct, MIN(s.cents) AS est_cents
    FROM qs q JOIN scum s ON s.cum >= (q.q_pct * {BK_K} + 99) // 100
    GROUP BY q.q_pct
),
exact AS (
    SELECT q.q_pct, MIN(f.cents) AS exact_cents
    FROM qs q
    JOIN fcum f ON f.cum >= (q.q_pct * f.n + 99) // 100
    GROUP BY q.q_pct
)
SELECT e.q_pct, CAST({BK_K} AS BIGINT) AS k,
       e.est_cents, x.exact_cents,
       ROUND(CAST(f.cum AS DOUBLE) / CAST(f.n AS DOUBLE), 6)
           AS cdf_at_est,
       ROUND(ABS(CAST(f.cum AS DOUBLE) / CAST(f.n AS DOUBLE)
                 - e.q_pct / 100.0), 6) AS abs_cdf_err
FROM est e
JOIN exact x ON x.q_pct = e.q_pct
JOIN fcum f ON f.cents = e.est_cents
"""


@register("bottomk_quantile_audit", oracle=_bottomk_oracle())
def bottomk_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE bottom-k hash sample,
    audited against the exact order statistics: the {BK_K} rows with
    the largest content-hash keys are a uniform sample whose union
    across any corpus partition re-folds to the same sketch
    (bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B)) — the same
    merge algebra the streaming weighted-sample fold already proves),
    so per-shard sketches answer corpus-wide quantiles with one O(k)
    merge — the white-box, SQL-replayable alternative to
    ``approx_percentile``'s engine-private KLL bytes that
    ``quantile_sketch_audit`` can only bound-check. The sample is one
    TakeOrderedAndProject pass (O(k) per task, no global sort); both
    the sample and full-data quantiles are found by CUMULATIVE
    COUNTING over per-value count tables, and the running sum is the
    two-pass ``global_cumsum`` — order totalprice in cents is
    near-unique, so the count table is ~O(rows) and a plain global
    window over it WOULD be a single-partition pass; the two-pass
    spelling keeps it partition-parallel at any value cardinality
    (its only collect is O(partitions)). The audit emits each
    estimate's exact CDF position, whose distance from q is the
    measured sketch error."""
    from pyspark.sql import Window

    from asritha_metamorphetl_spark.operators.ranks import (
        global_cumsum_with_total,
    )
    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    enc = orders.select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    sample = weighted_sample_without_replacement(
        enc.withColumn("w", F.lit(1.0)), "w", "id", BK_K, salt=BK_SALT
    ).select("cents")

    # The SAMPLE side is bounded by construction (≤ BK_K rows), so its
    # running count is a plain window over the collapsed per-value
    # frame — the two-pass machinery's repartitionByRange + checkpoint
    # + offset collect is pure fixed overhead at k rows (round 13; the
    # single-partition stage sits above the groupBy aggregate, the
    # exact shape the registry-wide plan gate allows for bounded
    # frames). The FULL-data side below keeps the scale-safe two-pass
    # walk: its distinct-value domain is ~O(rows).
    w_sample = Window.orderBy(F.col("cents").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scum = (
        sample.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(w_sample))
    )
    fcum, n_total = global_cumsum_with_total(
        enc.groupBy("cents").agg(F.count(F.lit(1)).alias("c")),
        [F.col("cents").asc()],
        "c",
        out_col="cum",
    )
    fcum = fcum.withColumn(
        "n", F.lit(int(n_total)).cast("bigint")
    ).localCheckpoint(eager=False)
    qs = spark.createDataFrame([(q,) for q in BK_QS], "q_pct int")
    est = (
        qs.join(
            scum,
            scum.cum >= F.floor((qs.q_pct * BK_K + 99) / 100),
        )
        .groupBy("q_pct")
        .agg(F.min("cents").alias("est_cents"))
    )
    exact = (
        qs.join(
            fcum,
            fcum.cum >= F.floor((qs.q_pct * fcum.n + 99) / 100),
        )
        .groupBy("q_pct")
        .agg(F.min("cents").alias("exact_cents"))
    )
    cdf = fcum.select(
        F.col("cents").alias("est_cents"),
        (F.col("cum").cast("double") / F.col("n").cast("double")).alias(
            "_cdf"
        ),
    )
    return (
        est.join(exact, "q_pct")
        .join(cdf, "est_cents")
        .select(
            "q_pct",
            F.lit(BK_K).cast("bigint").alias("k"),
            "est_cents",
            "exact_cents",
            F.round(F.col("_cdf"), 6).alias("cdf_at_est"),
            F.round(
                F.abs(F.col("_cdf") - F.col("q_pct") / 100.0), 6
            ).alias("abs_cdf_err"),
        )
    )


def _bottomk_merge_oracle() -> str:
    from asritha_metamorphetl_spark.plans.text_queries import _hex48_sql

    hv = _hex48_sql(f"md5('{BK_SALT}' || CAST(o_orderkey AS VARCHAR))")
    return f"""
WITH enc AS (
    SELECT o_orderkey AS id,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           ROUND(LN((({hv} % 1000000) + 1) / 1000000.0) / 1.0, 6)
               AS es_key
    FROM orders
),
sample AS (
    SELECT cents FROM enc ORDER BY es_key DESC, id LIMIT {BK_K}
)
SELECT cents, COUNT(*) AS n FROM sample GROUP BY cents
"""


@register("bottomk_merge_parity", oracle=_bottomk_merge_oracle())
def bottomk_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bottom-k sketch's MERGE LAW proved end-to-end: the corpus is
    hash-split three ways, each split builds its OWN k-sample, and the
    re-fold of the three partial sketches (top-k of their union) must
    equal the one-shot sample over the whole corpus — value-multiset
    identical under the oracle hash. This is why the sketch works at
    100 TB: every shard/day/source keeps an O(k) sample, and any
    ad-hoc scope (one source, one month, everything) answers quantile
    questions by merging the relevant sketches — the raw data is never
    re-scanned. Each partial is a TakeOrderedAndProject over its split;
    the fold runs over 3k rows."""
    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    orders = Catalog(sf_dir).load(spark, "orders")
    enc = orders.select(
        F.col("o_orderkey").alias("id"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).withColumn("w", F.lit(1.0))
    parts = [
        weighted_sample_without_replacement(
            enc.filter(F.col("id") % 3 == i), "w", "id", BK_K,
            salt=BK_SALT,
        ).select("id", "cents", "w")
        for i in range(3)
    ]
    pooled = parts[0].unionByName(parts[1]).unionByName(parts[2])
    folded = weighted_sample_without_replacement(
        pooled, "w", "id", BK_K, salt=BK_SALT
    )
    return folded.groupBy("cents").agg(F.count(F.lit(1)).alias("n"))
