"""Declarative data-quality expectations, evaluated in ONE aggregate pass.

Generalizes the reference's single check (PK uniqueness, D1 —
ETL_Airflow/dags/utils.py:73-86) into a rule suite: not-null, accepted
values, numeric range, regex shape, and uniqueness. Every row-local rule
compiles to a conditional count inside the SAME hash aggregate, and
uniqueness rides along as ``count(*) − count(distinct keys)`` — so a
20-rule suite over a 100 TB table costs one scan + one 1-row aggregate,
not 20 jobs.

``validate`` returns a (rule, n_violations) frame via an unpivot of that
single row; ``enforce`` raises with the failing rules. Neither collects
data rows to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule: ``violated`` is a row-level predicate that is TRUE when
    the row breaks the rule (None for set-level rules that supply their
    own aggregate via ``agg``)."""

    name: str
    violated: Column | None = None
    agg: Column | None = None  # ready-made violation-count aggregate

    def count_expr(self) -> Column:
        # coalesce: aggregates over an EMPTY frame return NULL, and a
        # NULL violation count would read as "passed" — make it 0.
        if self.agg is not None:
            return F.coalesce(self.agg, F.lit(0)).alias(self.name)
        return F.coalesce(
            F.sum(F.when(self.violated, 1).otherwise(0)), F.lit(0)
        ).alias(self.name)


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", violated=F.col(col).isNull())


def expect_accepted_values(col: str, values: Sequence[str]) -> Expectation:
    return Expectation(
        f"accepted_values_{col}",
        violated=~F.col(col).isin(*values) | F.col(col).isNull(),
    )


def expect_between(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"between_{col}",
        violated=F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def expect_regex(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"regex_{col}",
        violated=F.col(col).isNull() | ~F.col(col).rlike(pattern),
    )


def expect_unique(keys: Sequence[str]) -> Expectation:
    """Duplicate ROW count: total rows − distinct key tuples. Plans as a
    distinct aggregate (Expand) inside the same pass as the row rules."""
    name = "unique_" + "_".join(keys)
    # struct-wrapped so a NULL key is a countable distinct value —
    # bare countDistinct silently drops NULL tuples and would report
    # every NULL-keyed row as a duplicate. SQL twins must mirror this
    # with COUNT(DISTINCT ROW(k, ...)) (see the dq_violations oracle);
    # a bare COUNT(DISTINCT k) disagrees whenever keys contain NULLs.
    dupes = F.count(F.lit(1)) - F.countDistinct(F.struct(*[F.col(k) for k in keys]))
    return Expectation(name, agg=dupes.cast("long"))


class ExpectationError(Exception):
    def __init__(self, failures: dict[str, int]):
        self.failures = failures
        super().__init__(f"data-quality expectations failed: {failures}")


def validate(df: DataFrame, expectations: Sequence[Expectation]) -> DataFrame:
    """(rule string, violations long) — one row per expectation, computed
    from a single aggregate over ``df``."""
    wide = df.agg(*[e.count_expr() for e in expectations])
    pairs = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("rule"),
                F.col(e.name).cast("long").alias("violations"),
            )
            for e in expectations
        ]
    )
    return wide.select(F.explode(pairs).alias("kv")).select("kv.rule", "kv.violations")


def enforce(df: DataFrame, expectations: Sequence[Expectation]) -> DataFrame:
    """Raise ExpectationError when any rule has violations; return ``df``
    unchanged otherwise so it chains inside pipelines (same contract as
    asserts.assert_unique)."""
    failures = {
        r["rule"]: r["violations"]
        for r in validate(df, expectations).collect()
        if r["violations"] > 0
    }
    if failures:
        raise ExpectationError(failures)
    return df
