"""Incremental aggregation maintenance: mergeable partial-agg state.

A 100 TB rollup you recompute from scratch every day reads 100 TB every
day. The scalable pattern is the one Spark itself uses inside every
hash aggregate — decomposable aggregates kept as PARTIAL STATE
(count, sum, min, max) that merges associatively — lifted to the table
level: keep a small per-key state table, fold each day's delta into it
with one map-side-combinable aggregate, and derive the final metrics
(avg etc.) only at read time. Each increment costs O(delta + state),
never O(history).

State algebra (all columns exact — counts/sums on integers or
decimals, never raw-double sums):

    state(df)            — aggregate a batch to per-key state
    merge(a, b, ...)     — union + re-aggregate (associative, commutative)
    finalize(state)      — derive non-mergeable metrics (avg)

``merge(state(b1), state(b2)) == state(b1 ∪ b2)`` is the invariant the
registered query proves against a full-recompute oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: State columns appended to the grouping keys.
STATE_COLS = ("n", "total", "vmin", "vmax")


def agg_state(
    df: DataFrame, keys: Sequence[str], value: Column | str
) -> DataFrame:
    """Collapse a batch to mergeable per-key state. ``value`` must be an
    exact type (integer/decimal); pre-quantize doubles (e.g. to cents)
    so later merges are order-independent."""
    value = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value).alias("total"),
        F.min(value).alias("vmin"),
        F.max(value).alias("vmax"),
    )


def merge_agg_states(*states: DataFrame) -> DataFrame:
    """Fold state tables together: union + one re-aggregate. Associative
    and commutative, so daily deltas can merge in any order — and the
    union's partial aggregation collapses most rows map-side when the
    inputs share a partitioning."""
    if not states:
        raise ValueError("need at least one state")
    keys = [c for c in states[0].columns if c not in STATE_COLS]
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def finalize_state(state: DataFrame) -> DataFrame:
    """Derive read-time metrics from state: average as double division
    of exact components (bit-identical across engines)."""
    return state.withColumn(
        "avg_value", F.col("total") / F.col("n").cast("double")
    )


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Incremental maintenance of a JOIN view (append-only inputs): the
    new rows of ``V = A ⋈ B`` after deltas arrive are exactly

        ΔV  =  (ΔA ⋈ B_old)  ∪  (A_old ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

    — the standard delta-join decomposition (the four-quadrant partition
    of (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) minus the already-materialized
    old⋈old quadrant). Each output row appears in exactly ONE term, so
    ``V_old ∪ ΔV`` equals the full recompute without any dedup pass.

    Why it scales: the recompute reads |A| + |B| every refresh; the
    delta form reads each base table once and joins it against a DELTA.
    With ``broadcast_deltas`` (the IVM premise — deltas are small
    relative to state) the base-table sides never shuffle at all: three
    BroadcastHashJoins, each a single pass over data that was going to
    be scanned anyway, and at 100 TB the base scans themselves prune to
    the delta's key range when the view's storage is bucketed or
    zone-mapped by the join key (sources/bucketed.py pairs with this).
    Set ``broadcast_deltas=False`` for backfills where the delta is not
    small; AQE then picks the join strategy per term at runtime.

    Inputs must share the ``on`` column names (rename upstream);
    append-only semantics (no updates/deletes — for keyed upserts
    compose with operators/cdc.py's changelog apply instead).
    """
    on = list(on)

    def bcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_deltas else df

    d1 = bcast(a_delta).join(b_old, on)
    d2 = a_old.join(bcast(b_delta), on)
    d3 = bcast(a_delta).join(b_delta, on)
    cols = d1.columns
    return d1.unionByName(d2.select(cols)).unionByName(d3.select(cols))
