"""Temporal operators: as-of (point-in-time) join.

Spark has no built-in ASOF JOIN (DuckDB/kdb/Pandas `merge_asof` do). The
naive Spark spelling is a range theta-join (`l.ts >= r.ts`) followed by a
row_number window — a BroadcastNestedLoopJoin that explodes to O(L×R)
pairs per key before pruning, unusable at scale.

``as_of_join`` instead re-expresses the semantics as ONE sort: tag both
inputs, union them on (keys, time), and carry the most recent right-side
payload forward with ``last(..., ignorenulls=True)`` over a
rows-unbounded-preceding window. Cost is a single hash exchange on the
join keys plus one in-partition sort — identical to the shuffle a plain
sort-merge join of the two inputs would pay, with no pair explosion.
This is the standard log-merge formulation (see also Flink's temporal
join and the TimescaleDB as-of pattern).

Semantics: for each left row, the right row with the greatest
``right_ts <= left_ts`` on the same keys (inclusive match, like DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``); unmatched left rows keep NULL values
(left-outer flavor). Ties inside the right frame (same keys + same ts)
are NOT a total order — pre-aggregate the right side to one row per
(keys, ts) for deterministic output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.ranges import bucketed_range_join


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
    matched_ts_col: str | None = "asof_matched_ts",
) -> DataFrame:
    """Left as-of join: attach the most recent right-side payload at or
    before each left row's timestamp, per join key.

    ``value_cols``: right columns to carry (default: everything except
    keys + timestamp). They are carried as ONE struct, so a right row
    whose payload contains genuine NULLs still wins the match (per-column
    carry-forward would skip through it to an older row).

    ``tolerance``: optional max staleness in the timestamp's own units
    (e.g. ``F.lit(3600)`` for epoch-second columns); matches older than
    it are nulled, like pandas ``merge_asof(tolerance=...)``.

    ``matched_ts_col``: output column holding the matched right
    timestamp (None to omit).

    The timestamp column may be any orderable type; integer epoch
    seconds sidestep cross-engine sub-second precision mismatches.
    """
    right_ts = right_ts or left_ts
    keys = list(on)
    if value_cols is None:
        drop = set(keys) | {right_ts}
        value_cols = [c for c in right.columns if c not in drop]
    value_cols = list(value_cols)

    left_row = F.struct(*[F.col(c) for c in left.columns]).alias("_asof_row")
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        left_row,
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
            )
            + ">"
        )
        .alias("_asof_val"),
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.lit(None).cast(l_side.schema["_asof_row"].dataType).alias("_asof_row"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_asof_val"),
    )

    # Right rows sort BEFORE left rows at equal timestamps, so a right
    # row at exactly left_ts is visible to that left row (inclusive
    # match). One exchange on the keys, one sort — that's the whole cost.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        "*",
        F.last("_asof_val", ignorenulls=True).over(w).alias("_asof_match"),
        F.last(
            F.when(F.col("_asof_side") == 0, F.col("_asof_ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("_asof_match_ts"),
    )

    matched = F.col("_asof_match")
    match_ts = F.col("_asof_match_ts")
    if tolerance is not None:
        in_tol = (F.col("_asof_ts") - match_ts) <= tolerance
        matched = F.when(in_tol, matched)
        match_ts = F.when(in_tol, match_ts)

    out_cols = [F.col("_asof_row.*")]
    out_cols += [matched.getField(c).alias(c) for c in value_cols]
    if matched_ts_col is not None:
        out_cols.append(match_ts.alias(matched_ts_col))
    return filled.filter(F.col("_asof_side") == 1).select(*out_cols)


def ewma_banded(
    series: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    window: int = 16,
    decimals: int = 6,
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated half-life EWMA over a per-key ordered series, as a
    banded EQUI-join — the distributed spelling of a recursively-defined
    statistic.

    EWMA_t = Σ_j 2^-j · x_{t-j} / Σ_j 2^-j naively needs the previous
    state (a sequential scan per key). Truncating at ``window`` lags
    (2^-16 < 0.002% — below the rounding floor) turns each output row
    into a fixed-width band of contributors, which
    ``bucketed_range_join`` executes as a hash equi-join on
    (keys…, rn-bucket): W contributor rows per point, linear total, no
    per-key quadratic pairing and no BroadcastNestedLoop theta-join.

    Weights are INTEGER ``shiftleft(1, window-1-lag)``, so numerator and
    denominator are exact bigints under any summation order — the value
    hash is engine-independent by construction; only the final ratio is
    one deterministic double division, rounded to ``decimals``.

    ``series`` must hold ONE row per (keys, order_col) — it is a rollup
    output by contract; duplicate order positions would make row_number
    assignment order-dependent and double-count contributors. The
    row-number spine is windowed per key: callers' series must be
    per-key bounded (daily/hourly rollups are — the calendar bounds
    them, not data volume). The spine is lazily ``localCheckpoint``-ed
    so the point and contributor sides share ONE materialization instead
    of re-computing the upstream aggregate twice."""
    klist = list(keys)
    w = Window.partitionBy(*klist).orderBy(order_col)
    spine = series.withColumn("_rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    points = spine.withColumnRenamed("_rn", "_rn_p")
    contrib = spine.select(
        *klist,
        F.col(value_col).alias("_x_c"),
        F.col("_rn").alias("_rn_c"),
        (F.col("_rn") + F.lit(window)).alias("_rn_end"),
    )
    banded = bucketed_range_join(
        points,
        contrib,
        on=klist,
        point_col="_rn_p",
        start_col="_rn_c",
        end_col="_rn_end",
        bucket_width=window,
    )
    wint = F.expr(
        f"shiftleft(1L, CAST({window - 1} - (_rn_p - _rn_c) AS INT))"
    )
    point_cols = [c for c in series.columns]
    return (
        banded.groupBy(*point_cols)
        .agg(
            F.sum(F.col("_x_c") * wint).alias("_num"),
            F.sum(wint).alias("_den"),
        )
        .select(
            *point_cols,
            F.round(
                F.col("_num").cast("double") / F.col("_den").cast("double"),
                decimals,
            ).alias(out_col),
        )
    )
