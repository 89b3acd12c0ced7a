"""Slowly-changing-dimension (type 2) merge.

The reference approximates history with full daily snapshots
(``legacy.*`` append keyed by DAY_DT — ingestion_task.py:48-69): every
row re-written every day, storage linear in days × table size. SCD2
keeps one row per VERSION instead: a new row only when a tracked
attribute actually changes, with ``effective_from`` / ``effective_to`` /
``is_current`` bracketing its validity.

Scale shape: one left join of the updates batch against the CURRENT
slice (both shuffled by the business key, or broadcast when the batch is
small), null-safe column comparison to detect real changes, and a union
of four disjoint row sets — history, closed, untouched, new. No windows,
no driver-side state.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: SCD2 bookkeeping columns added to the dimension's business columns.
SCD2_COLS = ("effective_from", "effective_to", "is_current")


def scd2_init(updates: DataFrame, batch_date: _dt.date) -> DataFrame:
    """First load: every row becomes the open current version."""
    return updates.withColumns(
        {
            "effective_from": F.lit(batch_date).cast("date"),
            "effective_to": F.lit(None).cast("date"),
            "is_current": F.lit(True),
        }
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    batch_date: _dt.date,
) -> DataFrame:
    """Merge one updates batch into an SCD2 dimension.

    ``current`` carries the SCD2_COLS; ``updates`` carries keys +
    attributes only (one row per key — enforce upstream with
    assert_unique). Rows whose tracked attributes are unchanged are left
    alone; changed/new keys close the old version (effective_to =
    batch_date) and open a new one. Comparison is NULL-SAFE — a change
    from NULL to a value (or back) versions the row like any other
    change.

    Memory/recovery trade-off of the pins below (ADVICE r13): each
    apply localCheckpoints its inputs and never unpersists them, so a
    fold over k batches holds k superseded MEMORY_AND_DISK frames for
    the application lifetime, and localCheckpoint output is not
    recomputable after executor loss (a concern under dynamic
    allocation, not on a static local cluster). That is deliberate:
    the pins are what keep the fold's plan linear instead of 4^k (see
    the comment at the pin), the superseded frames are dimension-sized
    (small next to the fact tables), and eagerly unpersisting frame
    k-1 inside apply k would recompute it if the caller still holds a
    reference. A long-lived incremental deployment should materialize
    the dimension to the table store every N batches and restart the
    fold from that snapshot, which both truncates lineage and frees
    the superseded pins."""
    keys = list(keys)
    business_cols = [c for c in current.columns if c not in SCD2_COLS]

    # Pin the incoming dimension (round 13): ``current`` feeds FOUR
    # subtrees below (history, the change join, closed, untouched), so
    # without a pin each scd2_apply in a fold multiplies its input plan
    # 4× — k applied batches replayed the snapshot subtrees ~4^k times
    # (scd2_pointintime_totals' physical plan held 204 copies of the
    # snapshot aggregate before this). A LAZY localCheckpoint keeps the
    # fold's plan linear in batch count and computes each stage once.
    current = current.localCheckpoint(eager=False)
    # ``updates`` likewise feeds two subtrees (the change join and the
    # new-version semi-join); one pin, one computation.
    updates = updates.localCheckpoint(eager=False)

    active = current.filter(F.col("is_current"))
    history = current.filter(~F.col("is_current"))

    u = updates.alias("u")
    c = active.alias("c")
    changed_pred = F.lit(False)
    for col in tracked:
        changed_pred = changed_pred | ~F.col(f"u.{col}").eqNullSafe(F.col(f"c.{col}"))

    joined = u.join(c, [F.col(f"u.{k}") == F.col(f"c.{k}") for k in keys], "left")
    # new key (no current row) or a real attribute change; pinned —
    # three consumers (new_rows semi, closed semi, untouched anti)
    # would otherwise re-run the change join each.
    delta_keys = (
        joined.filter(F.col(f"c.{keys[0]}").isNull() | changed_pred)
        .select(*[F.col(f"u.{k}").alias(k) for k in keys])
        .localCheckpoint(eager=False)
    )

    new_rows = scd2_init(
        updates.join(delta_keys, keys, "left_semi"), batch_date
    ).select(*business_cols, *SCD2_COLS)

    closed = (
        active.join(delta_keys, keys, "left_semi")
        .withColumns(
            {
                "effective_to": F.lit(batch_date).cast("date"),
                "is_current": F.lit(False),
            }
        )
        .select(*business_cols, *SCD2_COLS)
    )
    untouched = active.join(delta_keys, keys, "left_anti").select(
        *business_cols, *SCD2_COLS
    )
    return (
        history.select(*business_cols, *SCD2_COLS)
        .unionByName(closed)
        .unionByName(untouched)
        .unionByName(new_rows)
    )


def scd2_asof_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row gets the dimension VERSION that
    was valid at the fact's own time (``effective_from <= ts`` and
    ``ts < effective_to``, open current version included). This is what
    makes reports time-correct — joining facts to ``is_current`` instead
    silently rewrites history with today's attributes (and makes a
    training-data snapshot unreproducible).

    Scale shape: a hash equi-join on the business key with the bracket
    as a residual post-join filter. Per-key fan-out before the filter is
    the key's version count — bounded by update cadence, not data size —
    so this never degenerates toward a cartesian the way a pure range
    join would. At most one version matches each fact (brackets are
    disjoint by construction), so no dedup pass is needed."""
    keys = list(keys)
    f = facts.alias("f")
    d = dim.alias("d")
    ts = F.col(f"f.{ts_col}")
    cond = [F.col(f"f.{k}") == F.col(f"d.{k}") for k in keys]
    cond.append(F.col("d.effective_from") <= ts)
    cond.append(
        F.col("d.effective_to").isNull() | (ts < F.col("d.effective_to"))
    )
    dim_cols = [
        F.col(f"d.{c}").alias(c) for c in dim.columns if c not in keys
    ]
    fact_cols = [F.col(f"f.{c}").alias(c) for c in facts.columns]
    joined = f.join(d, cond, how)
    return joined.select(*fact_cols, *dim_cols)
