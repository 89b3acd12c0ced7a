"""One-pass column profiler: the data-discovery stats every warehouse
tool (dbt docs, Deequ, Great Expectations profilers) computes before
anyone writes a rule — per column: null count, exact distinct count,
and a canonical min/max representation.

Scale shape: ONE scan of the table computes every column's aggregates
in a single aggregate row (Spark evaluates all agg expressions in one
pass; count_distinct per column adds its expand — still one scan of
the parquet), which is then exploded into the long (column, stats)
format. No per-column scans, no driver-side loop over columns.

Min/max are emitted through caller-chosen CANONICAL representations
(``kind``) rather than a blind cast-to-string, because engines format
floats and timestamps differently: ``int``/``str`` cast directly,
``cents`` rounds a money double to integer cents, ``ts_sec`` takes
unix seconds — every representation is an integer or plain string on
any engine, so the profile itself is oracle-hashable.

Reference parity: the reference validates frames with hand-written
per-table asserts (Raptor's expectation helpers); the profiler is the
generic form those asserts read from.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: supported canonical min/max representations
_KINDS = ("int", "str", "cents", "ts_sec")


def _repr_col(col: str, kind: str) -> Column:
    c = F.col(col)
    if kind == "int":
        return c.cast("long")
    if kind == "str":
        return c.cast("string")
    if kind == "cents":
        return F.round(c * 100).cast("long")
    if kind == "ts_sec":
        return F.unix_timestamp(c)
    raise ValueError(f"unknown profile kind {kind!r}; use one of {_KINDS}")


def profile_table(
    df: DataFrame, specs: Sequence[tuple[str, str]]
) -> DataFrame:
    """Profile ``specs`` = [(column, kind), ...]; returns one row per
    column: (column, n_rows, n_nulls, n_distinct, min_repr, max_repr)
    with min/max as strings of the canonical representation.

    Plan shape (round 13): STRING-kind min/max live in a SEPARATE
    keyless aggregate joined back onto the main row. A string
    aggregation buffer is immutable, so one ``min(string)`` anywhere in
    the main aggregate demotes the ENTIRE multi-distinct Expand pipeline
    from HashAggregate to SortAggregate — three full sorts of the
    (columns+1)× expanded frame (measured: the sorts dominated the
    query). Split, the main aggregate's buffer is all longs and hash-
    aggregates through every level, while the string side is a keyless
    single-pass over just the pruned string columns (no grouping ⇒ no
    sort requirement). Two column-pruned scans beat one scan that sorts
    the expanded frame at any scale; the computed values are identical.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    str_aggs = []
    for col, kind in specs:
        rep = _repr_col(col, kind)
        aggs += [
            F.sum(F.col(col).isNull().cast("int"))
            .cast("bigint")
            .alias(f"__nul_{col}"),
            F.count_distinct(F.col(col)).alias(f"__dst_{col}"),
        ]
        mm = [
            F.min(rep).cast("string").alias(f"__min_{col}"),
            F.max(rep).cast("string").alias(f"__max_{col}"),
        ]
        if kind == "str":
            str_aggs += mm
        else:
            aggs += mm
    one = df.agg(*aggs)
    if str_aggs:
        one = one.crossJoin(F.broadcast(df.agg(*str_aggs)))
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nul_{col}").alias("n_nulls"),
                F.col(f"__dst_{col}").alias("n_distinct"),
                F.col(f"__min_{col}").alias("min_repr"),
                F.col(f"__max_{col}").alias("max_repr"),
            )
            for col, _ in specs
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
