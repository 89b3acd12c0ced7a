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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANK_COLS = ("__pid", "__local_rn", "__offset", "__tie_key")


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
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    ranged = df.repartitionByRange(int(parts), *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Range boundaries are sampled; pin them so the two consumers below
    # (sizes + ranking) agree and re-runs see one consistent partitioning.
    ranged = ranged.persist()

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


def global_percent_rank(
    df: DataFrame,
    value: Column,
    descending: bool = True,
    tiebreak: list[Column] | None = None,
    out_col: str = "percent_rank",
    broadcast_map: bool = False,
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
    never single-partitions anything.

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
    pr_map = vc.select(
        "__v",
        F.coalesce(F.sum("__c").over(cum_w), F.lit(0)).alias("__better"),
        F.sum("__c").over(all_w).alias("__n"),
    ).select(
        "__v",
        F.when(F.col("__n") <= 1, F.lit(0.0))
        .otherwise(F.col("__better") / (F.col("__n") - F.lit(1)))
        .alias(out_col),
    )
    if broadcast_map:
        pr_map = F.broadcast(pr_map)
    return df.join(pr_map, value == F.col("__v")).drop("__v")
