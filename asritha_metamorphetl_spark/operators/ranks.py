"""Scale-safe global ranking.

The reference computes customer loyalty tiers with
``percent_rank().over(Window.orderBy(...))``
(ETL_Airflow/dags/tasks/m_customer_sales_report_task.py:106-122). An
unpartitioned window moves EVERY row to a single partition — correct at
60 k rows, fatal at 100 TB (SURVEY.md §7.3 flags it as the one true
single-partition hazard in the reference workload).

``global_percent_rank`` computes the identical result without ever
moving the full frame into one partition: since SQL percent_rank with
tie-merging is a function of the VALUE alone (pr = rows-strictly-better
/ (N-1)), only the distinct-value frame — one narrow (value, count) row
per distinct value, shrunk by a map-side-combining groupBy — is ranked,
then pr is mapped back with a join the optimizer can broadcast. The
full-width input never funnels anywhere and never shuffles when the map
broadcasts.

``global_row_number`` (needed when the caller wants a total order, not
a value function) keeps the partitioned machinery: range-repartition,
per-partition row_number, and a driver-side prefix sum over one count
per partition — the only collect is O(partitions), not O(rows).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANK_COLS = ("__pid", "__local_rn", "__offset", "__tie_key")

#: Below this compressed scan size the two-phase machinery's fixed local
#: overhead (extra jobs, offset broadcast) outweighs its scale safety —
#: a plain per-group window over ≤32 MB of parquet is a handful of small
#: tasks, not a spill hazard.
_TINY_SCAN_BYTES = 32 << 20

#: Hard ceiling for the O(partitions) driver collects below. The prefix-sum
#: operators collect ONE tiny row per range partition; 2^20 partitions is
#: already far past any sane shuffle width (a 100 TB input at a healthy
#: 128 MB/partition is ~800 k partitions), so a bound above it almost
#: certainly means a caller passed a row count — which would turn the
#: bounded collect into a driver OOM — and deserves an error, not an OOM.
_MAX_OFFSET_PARTITIONS = 1 << 20


def check_partition_bound(parts: int, operator: str) -> int:
    """Validate a prefix-sum partition count before it sizes a driver
    collect. Raises on non-positive or absurd values (the pattern set by
    grouped_row_number's take(cap+1) guard, applied at the input)."""
    parts = int(parts)
    if parts < 1:
        raise ValueError(f"{operator}: num_partitions must be >= 1, got {parts}")
    if parts > _MAX_OFFSET_PARTITIONS:
        raise ValueError(
            f"{operator}: num_partitions={parts} exceeds the "
            f"{_MAX_OFFSET_PARTITIONS} ceiling for the O(partitions) "
            "driver-side offset collect — this is almost certainly a row "
            "count passed where a partition count belongs. Size partitions "
            "so each holds ~128 MB instead."
        )
    return parts


def _scan_bytes(df: DataFrame) -> int | None:
    """Total compressed size of the files backing a scan-shaped plan,
    from METADATA only (no Spark job). Returns None whenever the answer
    isn't cheaply knowable — non-scan plans, remote filesystems — so
    callers default to the scale-safe path."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        path = uri
        if path.startswith("file:"):
            path = path[len("file:"):]
        elif "://" in path:
            return None  # remote FS — stat would be a network call
        try:
            total += os.stat(path).st_size
        except OSError:
            return None
    return total


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "global_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number under a total order, without a
    single-partition window. ``order_by`` must be a total order (include
    tie-break keys) for a deterministic result."""
    out, _total = _global_row_number_with_total(df, order_by, out_col, num_partitions)
    return out


def _global_row_number_with_total(
    df: DataFrame,
    order_by: list[Column],
    out_col: str,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Also returns the total row count — free from the partition-size
    pass, saving callers a separate count() job."""
    parts = check_partition_bound(
        num_partitions
        if num_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"),
        "global_row_number",
    )
    ranged = df.repartitionByRange(int(parts), *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Range boundaries are sampled; pin them so the two consumers below
    # (sizes + ranking) agree and re-runs see one consistent partitioning.
    # localCheckpoint (not persist): same materialization guarantee, but
    # the blocks are released when the plan is garbage-collected instead
    # of occupying executor storage for the session's lifetime.
    ranged = ranged.localCheckpoint(eager=False)  # lazy pin: the first
    # action (the totals/sizes pass) materializes the checkpoint and
    # fixes the sampled boundaries; eager=True bought the same pin at
    # the cost of one extra full-frame job per call (round 13)

    sizes = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = running
        running += sizes[pid]

    offset_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    local_window = Window.partitionBy("__pid").orderBy(*order_by)
    out = (
        ranged.withColumn("__local_rn", F.row_number().over(local_window))
        .join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, F.col("__local_rn") + F.col("__offset"))
        .drop("__pid", "__local_rn", "__offset")
    )
    return out, running


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    sum_col: str,
    out_col: str = "global_cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE cumulative sum of ``sum_col`` under a total
    order, without a single-partition window — the running-CDF twin of
    ``global_row_number``. The cumulative-count quantile spelling
    (per-value count tables walked by a running sum) degrades to a
    single-partition pass when the value domain is near-unique (order
    totalprice in cents, finely-quantized slopes: the count table is
    ~O(rows)); this keeps it partition-parallel at any cardinality:
    range-repartition on the order keys, per-partition running sums,
    and a driver prefix sum over ONE total per partition — the only
    collect is O(partitions), bounded by ``check_partition_bound``.
    ``order_by`` must be a total order (for the per-value count-table
    caller the value itself is already unique)."""
    out, _total = global_cumsum_with_total(
        df, order_by, sum_col, out_col, num_partitions
    )
    return out


def global_cumsum_with_total(
    df: DataFrame,
    order_by: list[Column],
    sum_col: str,
    out_col: str = "global_cum",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Also returns the grand total — free from the per-partition
    totals pass, saving callers the ``sum().over(Window.partitionBy())``
    spelling that would re-funnel the frame through one partition."""
    parts = check_partition_bound(
        num_partitions
        if num_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"),
        "global_cumsum",
    )
    ranged = df.repartitionByRange(int(parts), *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Pin the sampled range boundaries so the totals pass and the
    # running-sum pass see one consistent partitioning (same rationale
    # as global_row_number).
    ranged = ranged.localCheckpoint(eager=False)  # lazy pin: the first
    # action (the totals/sizes pass) materializes the checkpoint and
    # fixes the sampled boundaries; eager=True bought the same pin at
    # the cost of one extra full-frame job per call (round 13)
    totals_df = ranged.groupBy("__pid").agg(F.sum(sum_col).alias("s"))
    # The offset frame's type must follow F.sum(sum_col)'s result type
    # (long for integrals, decimal(38,x) for decimals, double for
    # floats) — a hardcoded `long` made any non-integral sum_col raise
    # in createDataFrame (or silently lose precision).
    sum_type = totals_df.schema["s"].dataType
    totals = {r["__pid"]: (r["s"] or 0) for r in totals_df.collect()}
    offsets, running = {}, 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid]
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
    )

    def _as_sum_type(v):
        import decimal

        from pyspark.sql.types import DecimalType, DoubleType, FloatType

        if isinstance(sum_type, (DoubleType, FloatType)):
            return float(v)
        if isinstance(sum_type, DecimalType):
            return decimal.Decimal(v)
        return int(v)

    offset_df = df.sparkSession.createDataFrame(
        [(pid, _as_sum_type(off)) for pid, off in offsets.items()],
        StructType(
            [
                StructField("__pid", IntegerType()),
                StructField("__offset", sum_type),
            ]
        ),
    )
    local_window = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ranged.withColumn("__local_cum", F.sum(sum_col).over(local_window))
        .join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, F.col("__local_cum") + F.col("__offset"))
        .drop("__pid", "__local_cum", "__offset")
    )
    return out, running


def global_cumsums(
    df: DataFrame,
    order_by: list[Column],
    sum_cols: list[tuple[str, str]],
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Exact inclusive cumulative sums of SEVERAL measures under one
    total order, in ONE range-partitioned pass — the k-measure
    generalization of ``global_cumsum_with_total``. A caller needing a
    running total AND a global position (Lorenz curves: cumulative
    revenue + row number via a lit(1) column) pays one
    repartitionByRange + one pin + one O(partitions) driver collect
    instead of k full passes. ``sum_cols`` maps source column →
    output column; returns (frame, {out_col: grand_total}). Integral
    measures only (the single-measure helper handles decimal/double
    offset typing; every current multi-measure caller sums bigints)."""
    parts = check_partition_bound(
        num_partitions
        if num_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"),
        "global_cumsums",
    )
    ranged = df.repartitionByRange(int(parts), *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)  # lazy pin: the first
    # action (the totals/sizes pass) materializes the checkpoint and
    # fixes the sampled boundaries; eager=True bought the same pin at
    # the cost of one extra full-frame job per call (round 13)
    totals_df = ranged.groupBy("__pid").agg(
        *[F.sum(src).alias(f"__s_{out}") for src, out in sum_cols]
    )
    # Integral-only is a RUNTIME contract, not a docstring note: the
    # offset fold below coerces with int(), which silently truncates a
    # decimal/double partition total (int(Decimal('1.5')) == 1) — the
    # exact bug class global_cumsum_with_total's typed offsets fix.
    # Callers with fractional measures must use the single-measure
    # helper (or pre-scale to integer cents, as every current caller
    # does).
    from pyspark.sql.types import IntegerType, LongType

    for field in totals_df.schema.fields:
        if field.name.startswith("__s_") and not isinstance(
            field.dataType, (LongType, IntegerType)
        ):
            raise TypeError(
                f"global_cumsums requires integral sum columns; "
                f"{field.name[4:]!r} aggregates to {field.dataType.simpleString()} "
                f"(use global_cumsum_with_total for decimal/double measures)"
            )
    totals = {r["__pid"]: r for r in totals_df.collect()}
    offsets_rows = []
    running = {out: 0 for _, out in sum_cols}
    for pid in sorted(totals):
        offsets_rows.append(
            (pid, *[int(running[out]) for _, out in sum_cols])
        )
        for _, out in sum_cols:
            running[out] += int(totals[pid][f"__s_{out}"] or 0)
    schema = "__pid int, " + ", ".join(
        f"__off_{out} long" for _, out in sum_cols
    )
    offset_df = df.sparkSession.createDataFrame(offsets_rows, schema)
    local_window = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_df = ranged
    for src, out in sum_cols:
        out_df = out_df.withColumn(
            f"__lc_{out}", F.sum(src).over(local_window)
        )
    out_df = out_df.join(F.broadcast(offset_df), "__pid")
    for _, out in sum_cols:
        out_df = out_df.withColumn(
            out, F.col(f"__lc_{out}") + F.col(f"__off_{out}")
        ).drop(f"__lc_{out}", f"__off_{out}")
    return out_df.drop("__pid"), running


def global_percent_rank(
    df: DataFrame,
    value: Column,
    descending: bool = True,
    tiebreak: list[Column] | None = None,
    out_col: str = "percent_rank",
    broadcast_map: bool = False,
    max_distinct: int = 50_000_000,
) -> DataFrame:
    """Partition-parallel equivalent of
    ``percent_rank().over(Window.orderBy(value))`` with SQL tie semantics:
    ties share a rank, pr = (rank_min − 1) / (N − 1).

    Since rank_min(v) − 1 = count of rows strictly better than v, pr is a
    function of the VALUE alone — so only the distinct-value frame (one
    narrow (value, count) row per distinct value) is ranked:

    1. groupBy(value).count() — one narrow shuffle with map-side combine
       collapses the input to |distinct| rows,
    2. a cumulative window over that collapsed frame computes
       strictly-better counts and the grand total N in one pass — its
       single-partition stage holds |distinct| 16-byte rows, bounded by
       the value domain (a rounded currency amount, a score), NOT by the
       input row count,
    3. pr maps back onto the full frame via an equi-join on the value,
       which the optimizer broadcasts while the map stays under the
       broadcast threshold — the WIDE input then never shuffles at all.

    Everything is lazy: no driver-side collect, no persist, one plan.
    For values with genuinely unbounded distinct cardinality, rank a
    quantized projection instead (round/bucket the value first), or use
    ``global_row_number`` and derive pr — the partitioned machinery there
    never single-partitions anything. That contract is now ENFORCED, not
    assumed: ``max_distinct`` bounds the collapsed frame with an
    in-plan ``assert_true`` evaluated in the same single-partition
    window stage — zero extra jobs, the plan stays lazy, and a caller
    ranking an unbounded key (order_id, raw timestamps) gets a clean
    runtime error carrying the quantize-first guidance instead of a
    silent spill-or-OOM. 50M distinct 16-byte rows ≈ 800 MB in one
    sort — the default sits at the edge of a healthy executor; raise
    it consciously.

    ``tiebreak`` is accepted for API stability but unused: pr values never
    depend on the order within a tie group.

    The map-side statistics are unknowable statically (it sits above a
    window-over-aggregate), so Catalyst's initial plan is a
    SortMergeJoin — and that is left for AQE to convert: at runtime the
    materialized map is tiny, AQE rewrites the join to broadcast with
    local shuffle reads, and that path measures FASTER than a static
    ``broadcast()`` hint (the hint forces an eager driver-side broadcast
    build; measured 3.1s vs 2.0s on the sf0.1 mart). ``broadcast_map``
    forces the static hint for engines/sessions running without AQE."""
    del tiebreak  # pr is value-determined; no total order needed
    vc = df.select(value.alias("__v")).groupBy("__v").agg(
        F.count(F.lit(1)).alias("__c")
    )

    order = F.col("__v").desc() if descending else F.col("__v").asc()
    # Both windows run in ONE single-partition stage over the collapsed
    # frame: cumulative strictly-better count + grand total.
    cum_w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    all_w = Window.orderBy(order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # The guard column MUST stay referenced by the output expression —
    # a free-standing assert_true column would be pruned away by the
    # optimizer together with its check.
    guard = F.assert_true(
        F.count(F.lit(1)).over(all_w) <= F.lit(int(max_distinct)),
        F.lit(
            f"global_percent_rank: distinct-value cardinality exceeds "
            f"max_distinct={int(max_distinct)} — the collapsed "
            "single-partition stage is bounded by the VALUE DOMAIN, not "
            "the row count. Quantize the value first (round/bucket), use "
            "global_row_number and derive pr, or raise max_distinct "
            "consciously (driver of one sort task's memory)."
        ),
    )
    pr_map = vc.select(
        "__v",
        F.coalesce(F.sum("__c").over(cum_w), F.lit(0)).alias("__better"),
        F.sum("__c").over(all_w).alias("__n"),
        guard.alias("__guard"),
    ).select(
        "__v",
        F.when(F.col("__guard").isNull() & (F.col("__n") <= 1), F.lit(0.0))
        .otherwise(F.col("__better") / (F.col("__n") - F.lit(1)))
        .alias(out_col),
    )
    if broadcast_map:
        pr_map = F.broadcast(pr_map)
    return df.join(pr_map, value == F.col("__v")).drop("__v")


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    out_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group under a total order, without giving each
    group a single task.

    A plain ``row_number().over(partitionBy(group))`` puts EVERY row of
    a group in one partition — fatal when group cardinality is bounded
    (brands, segments) and group size scales with the data. Phase 1
    prunes to the per-(group, physical-partition) top-k — any row in
    the global top-k has local rank ≤ its global rank ≤ k, so pruning
    below a local cap can never drop a global winner, REGARDLESS of how
    rows are spread (no salt column needed; the incoming partitioning
    is the salt). Phase 2 ranks the ≤ k·partitions survivors per group.
    ``order_by`` must be a total order for a deterministic result."""
    staged = df.withColumn("__seg", F.spark_partition_id())
    w1 = Window.partitionBy(*group_cols, "__seg").orderBy(*order_by)
    pruned = (
        staged.withColumn("__lrk", F.row_number().over(w1))
        .filter(F.col("__lrk") <= k)
        .drop("__seg", "__lrk")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return pruned.withColumn(out_col, F.row_number().over(w2)).filter(
        F.col(out_col) <= k
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    out_col: str = "rn",
    count_col: str | None = None,
    num_partitions: int | None = None,
    max_groups: int = 10_000,
) -> DataFrame:
    """Per-group 1-based row number under a total order, partition-
    parallel WITHIN each group (the grouped twin of global_row_number).

    Range-repartition on (group, order) spreads each group across many
    partitions in order; per-(partition, group) counts — O(partitions +
    groups) rows, since ranged partitions touch few groups each — feed
    a driver-side prefix sum, and the final rank is local row_number +
    broadcast offset. ``count_col`` additionally attaches the group's
    total row count (free from the same pass), which NTILE-style
    bucketing needs.

    This machinery is for BOUNDED group cardinality (market segments,
    priorities, brands): the offset collect is O(partitions + groups)
    driver rows. ``max_groups`` makes that contract enforced rather than
    assumed — the offset rows are fetched with an early-stopping
    ``take(cap + 1)`` where cap = partitions + max_groups (range
    partitions hold contiguous key ranges, so legitimate inputs produce
    at most groups + partitions − 1 offset rows), and a caller passing
    an unbounded key (user_id, order_id) gets an immediate ValueError
    with the driver never holding more than cap rows — instead of a
    silent driver OOM at scale. Raise the bound consciously if a genuine
    use case has more groups (driver memory is the budget: ~100
    bytes/offset row)."""
    # Tiny scan-backed inputs (knowable from file metadata, zero jobs):
    # the plain partitioned window computes the identical result in ONE
    # job with no repartition, no offset collect, no broadcast — and at
    # ≤32 MB compressed a single task per group is a few MB, not the
    # spill hazard the two-phase path exists to prevent. Anything the
    # metadata can't vouch for takes the scale-safe path below.
    scan = _scan_bytes(df)
    if scan is not None and scan <= _TINY_SCAN_BYTES:
        w = Window.partitionBy(*group_cols).orderBy(*order_by)
        out = df.withColumn(out_col, F.row_number().over(w).cast("long"))
        if count_col is not None:
            cw = Window.partitionBy(*group_cols)
            out = out.withColumn(count_col, F.count(F.lit(1)).over(cw))
        return out

    parts = check_partition_bound(
        num_partitions
        if num_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"),
        "grouped_row_number",
    )
    gcols = [F.col(c) for c in group_cols]
    ranged = df.repartitionByRange(int(parts), *gcols, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    # See global_row_number: checkpoint pins the sampled range boundaries
    # for both consumers without leaking session-lifetime cache. Pin
    # UNCONDITIONALLY: RangePartitioner seeds its boundary sample from
    # the physical RDD id, so two separate evaluations of an un-pinned
    # plan can partition rows differently and the pass-1 offsets then
    # misalign against pass-2 partition ids (observed once as a vanished
    # source in token_budget_mix at sf0.1). The former tiny-input skip
    # traded that soundness hole for ~1 s of fixed local cost — wrong
    # trade.
    ranged = ranged.localCheckpoint(eager=False)  # lazy pin: the first
    # action (the totals/sizes pass) materializes the checkpoint and
    # fixes the sampled boundaries; eager=True bought the same pin at
    # the cost of one extra full-frame job per call (round 13)

    # Fail fast on unbounded group keys: take() streams results and stops
    # at the cap, so the driver never materializes an unbounded offset
    # list even when the caller breaks the bounded-groups contract.
    cap = int(parts) + max_groups
    sizes = (
        ranged.groupBy("__pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .take(cap + 1)
    )
    if len(sizes) > cap:
        raise ValueError(
            f"grouped_row_number: offset rows exceed partitions + "
            f"max_groups ({cap}) — the group key has unbounded "
            "cardinality. This operator collects O(partitions + groups) "
            "offset rows to the driver and is meant for bounded group "
            "keys (segments, priorities); for unbounded keys use a plain "
            "partitioned window, or raise max_groups if the driver can "
            "hold the offsets."
        )
    totals: dict[tuple, int] = {}
    offsets = []
    for row in sorted(sizes, key=lambda r: r["__pid"]):
        key = tuple(row[c] for c in group_cols)
        offsets.append((row["__pid"], *key, totals.get(key, 0)))
        totals[key] = totals.get(key, 0) + row["__cnt"]

    schema = ", ".join(
        ["__pid int"]
        + [f"{c} {dict(df.dtypes)[c]}" for c in group_cols]
        + ["__offset long"]
    )
    offset_df = df.sparkSession.createDataFrame(offsets, schema)
    local = Window.partitionBy("__pid", *group_cols).orderBy(*order_by)

    # Null-safe equi-joins: a NULL group key is an ordinary group under
    # Window.partitionBy (the semantics this replaces); a plain join
    # would silently drop those rows.
    def _nsafe(left, right, keys):
        cond = None
        for c in keys:
            term = left[c].eqNullSafe(right[c])
            cond = term if cond is None else cond & term
        return cond

    ranked = ranged.withColumn("__lrn", F.row_number().over(local))
    out = (
        ranked.join(
            F.broadcast(offset_df),
            _nsafe(ranked, offset_df, ["__pid", *group_cols]),
        )
        .drop(*[offset_df[c] for c in ["__pid", *group_cols]])
        .withColumn(out_col, (F.col("__lrn") + F.col("__offset")).cast("long"))
        .drop("__pid", "__lrn", "__offset")
    )
    if count_col is not None:
        counts_df = df.sparkSession.createDataFrame(
            [(*k, v) for k, v in totals.items()],
            ", ".join(
                [f"{c} {dict(df.dtypes)[c]}" for c in group_cols]
                + [f"{count_col} long"]
            ),
        )
        out = (
            out.join(
                F.broadcast(counts_df), _nsafe(out, counts_df, list(group_cols))
            )
            .drop(*[counts_df[c] for c in group_cols])
        )
    return out


def ntile_from_rank(rn: Column, n: Column, buckets: int) -> Column:
    """SQL NTILE(buckets) as a pure function of (row_number, group
    count): the first n % buckets tiles hold ceil(n/buckets) rows, the
    rest floor(n/buckets) — exactly Spark's and DuckDB's NTILE when the
    window order is total."""
    big = n % buckets
    size_big = F.floor(n / buckets) + 1
    size_small = F.floor(n / buckets)
    in_big = rn <= big * size_big
    return (
        F.when(in_big, F.floor((rn - 1) / size_big) + 1)
        .otherwise(
            big + F.floor((rn - big * size_big - 1) / size_small) + 1
        )
        .cast("int")
    )


def grouped_percent_rank(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    descending: bool = False,
    out_col: str = "percent_rank",
    max_distinct: int = 50_000_000,
) -> DataFrame:
    """Per-GROUP percent_rank with the same collapsed distinct-value
    machinery as :func:`global_percent_rank` — and a strictly better
    scale story: the cumulative window partitions BY GROUP over the
    collapsed (group, value, count) frame, so there is no
    single-partition stage anywhere, for any group or value
    cardinality. Each group's collapsed slice is bounded by ITS value
    domain (enforced in-plan per group via ``max_distinct``); the wide
    input never shuffles — it meets the rank map in an equi-join on
    (group, value) that AQE broadcasts while the map is small.

    pr = (count of strictly-better values in the group) / (n − 1),
    SQL tie semantics; single-row groups rank 0.
    """
    vc = df.groupBy(*group_cols, value.alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    order = F.col("__v").desc() if descending else F.col("__v").asc()
    base = Window.partitionBy(*group_cols).orderBy(order)
    cum_w = base.rowsBetween(Window.unboundedPreceding, -1)
    all_w = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    guard = F.assert_true(
        F.count(F.lit(1)).over(all_w) <= F.lit(int(max_distinct)),
        F.lit(
            "grouped_percent_rank: a group's distinct-value cardinality "
            f"exceeds max_distinct={int(max_distinct)} — quantize the "
            "value first (round/bucket) or raise the bound consciously."
        ),
    )
    pr_map = vc.select(
        *group_cols,
        "__v",
        F.coalesce(F.sum("__c").over(cum_w), F.lit(0)).alias("__better"),
        F.sum("__c").over(all_w).alias("__n"),
        guard.alias("__guard"),
    ).select(
        *group_cols,
        "__v",
        F.when(F.col("__guard").isNull() & (F.col("__n") <= 1), F.lit(0.0))
        .otherwise(F.col("__better") / (F.col("__n") - F.lit(1)))
        .alias(out_col),
    )
    cond = [df[g] == pr_map[g] for g in group_cols] + [
        value == pr_map["__v"]
    ]
    return df.join(pr_map, cond).drop(pr_map["__v"]).drop(
        *[pr_map[g] for g in group_cols]
    )
