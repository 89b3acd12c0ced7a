"""Range (interval) join: points joined to intervals without a theta-join.

Spark has no native range join (DuckDB and Trino pick interval-aware
strategies; Databricks Runtime has a range-join hint). The naive Spark
spelling — ``points JOIN intervals ON p BETWEEN s AND e`` — is a
non-equi theta-join, which Catalyst can only execute as a
BroadcastNestedLoopJoin: O(points × intervals) comparisons per key, the
same scale cliff the round-1 fuzzy join had.

``bucketed_range_join`` re-expresses it as an EQUI-join: slice the time
axis into fixed-width buckets, explode each interval to the buckets it
overlaps, tag each point with its single containing bucket, hash-join on
(keys…, bucket), then apply the exact range predicate as a post-filter.
A (point, interval) pair can match in at most one bucket — the point's —
so no dedup pass is needed. Cost: the interval side grows by
``ceil(len/width)+1`` rows (choose ``bucket_width`` ≈ the typical
interval length so that factor is ~2), and the join is an ordinary
shuffled hash join that partitions, skew-handles, and AQE-plans like any
other equi-join. This is the standard bucketization trick from the
spatial-join literature (also how Flink executes interval joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` keys) with
    ``start <= point < end`` (half-open), as an equi-join on bucket id.

    ``point_col``/``start_col``/``end_col`` must be integral (epoch
    seconds / days); ``bucket_width`` is in the same units and must be
    positive. Output carries all columns from both sides (names must not
    collide apart from ``on``).

    ``how='left'`` keeps unmatched points with NULL interval columns —
    implemented as inner-match + anti-join so the NULL-extension never
    enters the exploded frame. Point rows must be distinct for the left
    flavor (the anti-join compares whole rows).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(on)
    b = "__range_bucket"
    pt = points.withColumn(
        b, F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    # sequence() is ascending here by construction: end >= start implies
    # bucket(end) >= bucket(start). Intervals with end < start match
    # nothing; drop them before exploding rather than let sequence()
    # produce a descending range.
    iv = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn(
            b,
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / F.lit(bucket_width)),
                    F.floor(F.col(end_col) / F.lit(bucket_width)),
                )
            ),
        )
    )
    matched = pt.join(iv, on=keys + [b], how="inner").filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    matched = matched.drop(b)
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError(f"unsupported how={how!r}")
    interval_cols = [c for c in intervals.columns if c not in keys]
    point_cols = points.columns
    hit_keys = matched.select(*point_cols).distinct()
    missed = points.join(hit_keys, on=point_cols, how="left_anti")
    for c in interval_cols:
        missed = missed.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
    return matched.unionByName(missed)
