"""Scale-safe global ranking.

The reference computes customer loyalty tiers with
``percent_rank().over(Window.orderBy(...))``
(ETL_Airflow/dags/tasks/m_customer_sales_report_task.py:106-122). An
unpartitioned window moves EVERY row to a single partition — correct at
60 k rows, fatal at 100 TB (SURVEY.md §7.3 flags it as the one true
single-partition hazard in the reference workload).

``global_percent_rank`` computes the identical result with a partitioned
plan:

1. range-repartition on the order key (the same shuffle a global sort
   pays — but downstream work stays parallel, nothing funnels to one
   task),
2. per-partition row_number (parallel windows keyed by partition id),
3. tiny partition-size table (one row per partition) → cumulative offsets
   via a driver-side prefix sum over ≤ num_partitions values,
4. global_rank = local row_number + partition offset,
5. SQL tie semantics (equal keys share the *min* rank of their group)
   restored with a groupBy(key).min(rank) + re-join.

Step 3's collect is O(partitions), not O(rows) — the only driver-side
data is one count per partition.
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
) -> DataFrame:
    """Partition-parallel equivalent of
    ``percent_rank().over(Window.orderBy(value))`` with SQL tie semantics:
    ties share a rank, pr = (rank − 1) / (N − 1).

    ``tiebreak`` columns only pin the internal total order; they do not
    affect the output values (ties are re-merged via min-rank)."""
    key = value.desc() if descending else value.asc()
    order = [key] + [c.asc() for c in (tiebreak or [])]

    df = df.withColumn("__tie_key", value)
    ranked, n = _global_row_number_with_total(df, order, out_col="__grn")

    if n <= 1:
        return ranked.withColumn(out_col, F.lit(0.0)).drop("__grn", "__tie_key")

    # Pin an exchange on the tie key: the min-rank aggregate and the
    # re-join both consume it, so ReuseExchange materializes the ranking
    # pipeline once instead of twice.
    ranked = ranked.repartition(F.col("__tie_key"))

    # SQL tie semantics: every row in a tie group takes the group's min rank.
    tie_min = ranked.groupBy("__tie_key").agg(F.min("__grn").alias("__tie_rn"))
    out = (
        ranked.join(tie_min, "__tie_key")
        .withColumn(out_col, (F.col("__tie_rn") - F.lit(1)) / F.lit(float(n - 1)))
        .drop("__grn", "__tie_rn", "__tie_key")
    )
    return out
