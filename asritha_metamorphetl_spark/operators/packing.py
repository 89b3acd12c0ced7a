"""Sequence packing: concatenate-and-chunk documents into fixed
context-length training sequences.

LLM pretraining consumes documents as one token stream chopped into
ctx_len-sized sequences; the manifest of "which document lands in which
sequence at which offset" is what a training-data pipeline must emit.
The parallel-hostile part is the EXCLUSIVE GLOBAL PREFIX SUM of token
counts under a total document order — the naive
``sum().over(Window.orderBy(...))`` funnels every row into one
partition (the same hazard SURVEY.md §7.3 flags for percent_rank).

``global_running_sum`` reuses the two-pass machinery of
``operators.ranks.global_row_number``: range-repartition on the order
key, a per-partition cumulative window (bounded by partition size), and
a driver-side prefix sum over ONE number per partition — the only
collect is O(partitions), never O(rows). At 100 TB the collected frame
is a few thousand longs; the data pays the range exchange plus a hash
exchange on the partition id for the local window, both over the
NARROW (order-key, count) projection — callers should project before
packing, as plans/corpus_queries.py does. The op scales like a sort,
which is optimal: a total order is part of the packing contract.

No equivalent exists in the reference (its engine is single-node and
row-at-a-time; a running total there is a trivial loop) — this is the
Spark-first re-expression of the same "assign output positions while
streaming the corpus" semantics, generalized from the positional writer
in ``[whl]Raptor/Raptor.py`` (sequential report-row emission).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    out_col: str = "running_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value`` under the total order
    ``order_by`` (the first row gets 0). ``order_by`` must be a total
    order — include tie-break keys — or offsets are nondeterministic.
    """
    from asritha_metamorphetl_spark.operators.ranks import check_partition_bound

    parts = check_partition_bound(
        num_partitions
        if num_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"),
        "global_running_sum",
    )
    ranged = (
        df.withColumn("__val", value.cast("long"))
        .repartitionByRange(int(parts), *order_by)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Range boundaries are sampled; pin them so the sizing pass and the
    # cumsum pass below see one consistent partitioning. localCheckpoint
    # (not persist): same pinning, but blocks are GC-released instead of
    # occupying executor storage for the session's lifetime.
    ranged = ranged.localCheckpoint(eager=True)

    part_sums = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum("__val").alias("s"))
        .collect()
    }
    offsets, running = {}, 0
    for pid in sorted(part_sums):
        offsets[pid] = running
        running += part_sums[pid] or 0

    offset_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    # Exclusive window: everything strictly before this row, within the
    # partition (bounded state — one partition's rows, not the table's).
    local = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.withColumn("__local", F.coalesce(F.sum("__val").over(local), F.lit(0)))
        .join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("bigint"))
        .drop("__pid", "__local", "__offset", "__val")
    )


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    value: Column,
    out_col: str = "running_before",
    num_partitions: int | None = None,
    max_groups: int = 10_000,
) -> DataFrame:
    """Exclusive prefix sum of ``value`` PER GROUP under the total order
    ``order_by`` — partition-parallel WITHIN each group (the grouped
    twin of ``global_running_sum``, sharing its shape with
    ``ranks.grouped_row_number``).

    A plain ``sum().over(Window.partitionBy(group).orderBy(...))``
    funnels every row of a group into ONE task — fatal when one group
    dominates the corpus (the token-budget "100 B tokens of web" case).
    Here the data is range-repartitioned on (group, order), so a huge
    group spreads across many partitions in order; per-(partition,
    group) sums — O(partitions + groups) rows, since range partitions
    hold contiguous key runs — feed a driver-side prefix sum, and the
    final value is the bounded local window plus a broadcast offset.

    Bounded-group contract, enforced: the offset fetch early-stops at
    ``partitions + max_groups`` rows (``take(cap+1)``), raising on an
    unbounded group key instead of a silent driver OOM. ``order_by``
    must be a total order within each group or sums are
    nondeterministic.
    """
    from asritha_metamorphetl_spark.operators.ranks import check_partition_bound

    parts = check_partition_bound(
        num_partitions
        if num_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"),
        "grouped_running_sum",
    )
    gcols = [F.col(c) for c in group_cols]
    ranged = (
        df.withColumn("__val", value.cast("long"))
        .repartitionByRange(int(parts), *gcols, *order_by)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Pin the sampled range boundaries for the two consumers (sums +
    # cumsum) — see global_running_sum. UNCONDITIONALLY: RangePartitioner
    # seeds its boundary reservoir sample from the physical RDD id, so
    # two separate evaluations of the same un-pinned plan (the sums
    # collect and the output pass) can land rows in different range
    # partitions whenever the sample is not exhaustive — and the pass-1
    # offsets then join against pass-2 partition ids, silently
    # corrupting every downstream running total. A "small enough to run
    # twice" skip is NOT sound (observed once at sf0.1: a whole source
    # vanished from token_budget_mix); the eager checkpoint's fixed ~1 s
    # is the price of determinism.
    ranged = ranged.localCheckpoint(eager=True)

    cap = int(parts) + max_groups
    sums = (
        ranged.groupBy("__pid", *group_cols)
        .agg(F.sum("__val").alias("__s"))
        .take(cap + 1)
    )
    if len(sums) > cap:
        raise ValueError(
            f"grouped_running_sum: offset rows exceed partitions + "
            f"max_groups ({cap}) — the group key has unbounded "
            "cardinality. This operator collects O(partitions + groups) "
            "offset rows to the driver; for unbounded keys raise "
            "max_groups consciously or restructure the group key."
        )
    totals: dict[tuple, int] = {}
    offsets = []
    for row in sorted(sums, key=lambda r: r["__pid"]):
        key = tuple(row[c] for c in group_cols)
        offsets.append((row["__pid"], *key, totals.get(key, 0)))
        totals[key] = totals.get(key, 0) + (row["__s"] or 0)

    schema = ", ".join(
        ["__pid int"]
        + [f"{c} {dict(df.dtypes)[c]}" for c in group_cols]
        + ["__offset long"]
    )
    offset_df = df.sparkSession.createDataFrame(offsets, schema)

    # Null-safe equi-join: a NULL group key is an ordinary group under
    # the window semantics this replaces (same rule as grouped_row_number).
    def _nsafe(left, right, keys):
        cond = None
        for c in keys:
            term = left[c].eqNullSafe(right[c])
            cond = term if cond is None else cond & term
        return cond

    local = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cumed = ranged.withColumn(
        "__local", F.coalesce(F.sum("__val").over(local), F.lit(0))
    )
    return (
        cumed.join(
            F.broadcast(offset_df),
            _nsafe(cumed, offset_df, ["__pid", *group_cols]),
        )
        .drop(*[offset_df[c] for c in ["__pid", *group_cols]])
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("bigint"))
        .drop("__pid", "__local", "__offset", "__val")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_by: list[Column],
    ctx_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document its position in the concatenated token
    stream and the [seq_begin, seq_end] range of ctx_len-sized training
    sequences it occupies. Adds:

    - ``begin_offset`` — global token offset where the document starts,
    - ``seq_begin`` / ``seq_end`` — first / last sequence index touched
      (a document longer than ctx_len spans several; an empty document
      occupies zero tokens and is pinned to the sequence at its offset),
    - ``n_seqs`` — seq_end − seq_begin + 1.
    """
    toks = F.col(token_col).cast("long")
    out = global_running_sum(
        df, order_by, toks, out_col="begin_offset", num_partitions=num_partitions
    )
    last_tok = F.col("begin_offset") + F.greatest(toks, F.lit(1)) - F.lit(1)
    return (
        out.withColumn(
            "seq_begin", F.floor(F.col("begin_offset") / ctx_len).cast("bigint")
        )
        .withColumn("seq_end", F.floor(last_tok / ctx_len).cast("bigint"))
        .withColumn(
            "n_seqs", (F.col("seq_end") - F.col("seq_begin") + F.lit(1)).cast("bigint")
        )
    )
