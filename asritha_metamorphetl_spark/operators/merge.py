"""Declarative MERGE INTO: conditional upsert of a source (delta) frame
into a target snapshot in ONE equi-join pass.

The Delta/Iceberg flagship mutation, re-expressed as a pure DataFrame
transform: ``WHEN MATCHED [AND cond] THEN UPDATE/DELETE`` and ``WHEN NOT
MATCHED [AND cond] THEN INSERT`` clauses evaluated first-match-wins, in
declaration order, exactly like Spark SQL's MERGE semantics. Rows of the
target with no source match pass through untouched; source rows no
NOT-MATCHED clause accepts are dropped.

Scale shape: one full-outer equi-join on the merge keys (the ONLY
shuffle of the target — at 100 TB the big side moves once, and AQE will
broadcast the delta side when it fits), plus a delta-side-only window
that enforces MERGE's ambiguity contract in-plan: a source with two rows
for one key would make the result order-dependent, so it raises — the
same error Delta Lake throws — instead of silently picking a winner.

Conditions and assignments are callables ``fn(t, s) -> Column`` where
``t``/``s`` are accessors returning the target/source image of a named
column, so clause authors never touch join-alias resolution and a
clause can freely compare both sides (``lambda t, s: s("seq") >
t("seq")``).

Reference parity: the reference's warehouse layer rewrites whole daily
snapshots (ETL_Airflow load_*.py full-table loads); MERGE is the
O(delta) replacement for that pattern at scale.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: accessor type: ``fn(t, s) -> Column``
ClauseFn = Callable[
    [Callable[[str], Column], Callable[[str], Column]], Column
]


@dataclass(frozen=True)
class WhenMatched:
    """One WHEN MATCHED clause: ``action`` is ``"update"`` or
    ``"delete"``; ``condition`` (optional) gates the clause;
    ``assignments`` maps target column -> ``fn(t, s)`` for updates
    (unassigned columns keep the target value)."""

    action: str
    condition: ClauseFn | None = None
    assignments: dict[str, ClauseFn] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.action not in ("update", "delete"):
            raise ValueError(f"unknown matched action {self.action!r}")
        if self.action == "delete" and self.assignments:
            raise ValueError("a delete clause takes no assignments")


@dataclass(frozen=True)
class WhenNotMatched:
    """One WHEN NOT MATCHED clause: inserts the source row when
    ``condition`` passes. ``values`` maps target column -> ``fn(t, s)``
    (``t`` resolves to NULL here); columns not assigned default to the
    source column of the same name, or NULL if the source lacks it."""

    condition: ClauseFn | None = None
    values: dict[str, ClauseFn] = field(default_factory=dict)


_S_PREFIX = "__mrg_s_"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    matched: Sequence[WhenMatched] = (),
    not_matched: Sequence[WhenNotMatched] = (),
) -> DataFrame:
    """Merge ``source`` into ``target`` on equi-``keys``; returns the
    next snapshot with exactly ``target.columns``.

    Clause evaluation is first-match-wins in declaration order (a
    matched row that satisfies no clause is kept unchanged). Raises at
    execution time — in-plan, no extra action — if the source holds
    more than one row for a merge key (MERGE's ambiguity contract)."""
    keys = list(keys)
    for k in keys:
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"merge key {k!r} missing from a side")

    # delta-side ambiguity guard: rides the source projection, so the
    # check costs one window over the (small) delta — never the target
    w = Window.partitionBy(*[F.col(k) for k in keys])
    guarded = source.withColumn("__mrg_n", F.count(F.lit(1)).over(w))
    src = guarded.select(
        *[F.col(c).alias(f"{_S_PREFIX}{c}") for c in source.columns],
        F.assert_true(
            F.col("__mrg_n") == 1,
            F.concat(
                F.lit("merge_into: source has duplicate rows for key ("),
                F.concat_ws(
                    ",", *[F.col(k).cast("string") for k in keys]
                ),
                F.lit(")"),
            ),
        ).isNull().alias("__mrg_s_exists"),
    )

    t_marked = target.withColumn("__mrg_t_exists", F.lit(True))
    cond = [
        t_marked[k] == src[f"{_S_PREFIX}{k}"] for k in keys
    ]
    joined = t_marked.join(src, cond, "full_outer")

    def t(c: str) -> Column:
        return F.col(c)

    def s(c: str) -> Column:
        return F.col(f"{_S_PREFIX}{c}")

    is_matched = (
        F.col("__mrg_t_exists").isNotNull()
        & F.col("__mrg_s_exists").isNotNull()
    )
    t_only = F.col("__mrg_t_exists").isNotNull() & F.col("__mrg_s_exists").isNull()
    s_only = F.col("__mrg_t_exists").isNull() & F.col("__mrg_s_exists").isNotNull()

    # first-match-wins clause index for matched rows (-1 = keep as-is)
    m_idx = F.lit(-1)
    chain = None
    for i, cl in enumerate(matched):
        c = F.lit(True) if cl.condition is None else cl.condition(t, s)
        chain = (chain.when(c, i) if chain is not None else F.when(c, F.lit(i)))
    if chain is not None:
        m_idx = chain.otherwise(F.lit(-1))

    i_idx = F.lit(-1)
    chain = None
    for i, cl in enumerate(not_matched):
        c = F.lit(True) if cl.condition is None else cl.condition(t, s)
        chain = (chain.when(c, i) if chain is not None else F.when(c, F.lit(i)))
    if chain is not None:
        i_idx = chain.otherwise(F.lit(-1))

    staged = joined.withColumn(
        "__mrg_m", F.when(is_matched, m_idx).otherwise(F.lit(-1))
    ).withColumn(
        "__mrg_i", F.when(s_only, i_idx).otherwise(F.lit(-1))
    )

    deleted = F.lit(False)
    for i, cl in enumerate(matched):
        if cl.action == "delete":
            deleted = deleted | (F.col("__mrg_m") == i)
    survivors = staged.filter(
        t_only
        | (is_matched & ~deleted)
        | (s_only & (F.col("__mrg_i") >= 0))
    )

    out_cols = []
    for c in target.columns:
        expr = t(c)  # keep target image by default (t_only, unmatched)
        for i, cl in enumerate(matched):
            if cl.action == "update":
                assigned = cl.assignments.get(c)
                if assigned is not None:
                    expr = F.when(
                        F.col("__mrg_m") == i, assigned(t, s)
                    ).otherwise(expr)
        ins_default = (
            s(c) if c in source.columns else F.lit(None).cast(
                dict(target.dtypes)[c]
            )
        )
        for i, cl in enumerate(not_matched):
            ins = cl.values.get(c)
            expr = F.when(
                s_only & (F.col("__mrg_i") == i),
                ins(t, s) if ins is not None else ins_default,
            ).otherwise(expr)
        out_cols.append(expr.cast(dict(target.dtypes)[c]).alias(c))
    return survivors.select(*out_cols)
