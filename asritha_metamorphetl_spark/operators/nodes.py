"""Named processing-node combinators.

The reference's de-facto operator language is Informatica-style named nodes:
``SQ_`` source qualifier, ``FIL_`` filter, ``JNR_`` joiner, ``AGG_``
aggregator, ``EXP_`` expression, ``Shortcut_To_*_Tgt`` target (e.g.
ETL_Airflow/dags/tasks/m_supplier_performance_task.py:13,41,48,86,163).
These thin combinators formalize that surface while staying 100% lazy
DataFrame — Catalyst sees exactly the declarative plan, so pushdown,
pruning, join selection and AQE all apply unchanged.

Every combinator returns a plain DataFrame; naming is metadata only (plan
debuggability / lineage logging), never an optimization barrier.
"""

from __future__ import annotations

import logging
from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame

log = logging.getLogger("asritha_metamorphetl_spark.nodes")


def _named(df: DataFrame, name: str) -> DataFrame:
    # `alias` both records the node name for lineage and gives joins an
    # unambiguous qualifier (the reference leans on .alias("AGG")-style
    # disambiguation, m_product_performance_task.py:69-85).
    log.debug("node %s", name)
    return df.alias(name)


def sq_node(df: DataFrame, name: str, columns: Sequence[str] | None = None) -> DataFrame:
    """Source qualifier: optional ordered projection right at the source so
    column pruning reaches the scan (narrow ReadSchema / JDBC pushdown)."""
    if columns is not None:
        df = df.select(*columns)
    return _named(df, name)


def fil_node(df: DataFrame, name: str, condition: Column | str) -> DataFrame:
    """Filter node; accepts a Column or SQL-string predicate."""
    return _named(df.filter(condition), name)


def jnr_node(
    left: DataFrame,
    right: DataFrame,
    name: str,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Joiner node. Physical strategy (broadcast / shuffled hash / sort-merge)
    is left to Catalyst + AQE; callers broadcast() small sides explicitly."""
    return _named(left.join(right, on=on, how=how), name)


def agg_node(
    df: DataFrame,
    name: str,
    group_by: Sequence[str | Column],
    aggs: Iterable[Column],
) -> DataFrame:
    """Aggregator node: hash aggregate with map-side partial aggregation
    (Spark plans partial_* before the shuffle automatically)."""
    return _named(df.groupBy(*group_by).agg(*aggs), name)


def exp_node(df: DataFrame, name: str, **derived: Column) -> DataFrame:
    """Expression node: add/replace derived columns (single projection, so
    N derivations don't stack N plan nodes)."""
    return _named(df.withColumns(dict(derived)), name)


def tgt_node(df: DataFrame, name: str, columns: Sequence[str | Column]) -> DataFrame:
    """Target shortcut: final ordered projection contract before a sink."""
    return _named(df.select(*columns), name)
