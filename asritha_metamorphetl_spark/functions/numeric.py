"""Numeric helpers with cross-engine-deterministic semantics.

Floating-point SUM is order-dependent, and Spark's summation order varies
with partitioning — so a double sum is not reproducible run-to-run at
scale, and cannot be hash-compared against another engine (our DuckDB
oracle harness, or the reference's Raptor reconciler, wheel
Raptor/Raptor.py:552-579, which string-compares values). The fix the
reference itself gestures at with its presentation cast
(Raptor/Raptor.py:460-461, ``cast("decimal(10,2)")``) is done properly
here: quantize each row to a decimal *before* aggregating, so the sum is
exact integer arithmetic — associative, deterministic, engine-independent —
then surface a double.

This is also the right call at 100 TB: a money total that changes with
partition count is a correctness bug, not a rounding detail.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Quantized-cent precision used across the engine's money aggregates.
MONEY = "decimal(18,2)"


def money(expr: Column) -> Column:
    """Quantize a row-level monetary expression to exact cents."""
    return expr.cast(MONEY)


def exact_sum(expr: Column, alias: str) -> Column:
    """Order-independent sum of a monetary expression, surfaced as double.

    sum(decimal) is exact in Spark (and in DuckDB, which makes the oracle
    comparison byte-stable); the final double cast keeps downstream schemas
    simple.
    """
    return F.sum(money(expr)).cast("double").alias(alias)


def exact_resum(expr: Column, alias: str) -> Column:
    """Second-level rollup over already-quantized partial sums."""
    return F.sum(expr.cast(MONEY)).cast("double").alias(alias)


def round2(expr: Column) -> Column:
    """HALF_UP round to cents of a deterministically-computed double.

    Safe cross-engine because the *input* double is bit-identical (products
    and differences of identical doubles are IEEE-exact); only ambient sums
    need the decimal path above.
    """
    return F.round(expr, 2)


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative ints — the
    multi-dimensional clustering key Spark lacks natively.

    Sorting by one column gives perfect parquet min/max locality on it
    and none on any other; sorting by the Morton code bounds BOTH
    columns' value ranges within every row group, so predicates on
    EITHER dimension skip data (Delta/Iceberg Z-ORDER, re-expressed as
    a plain column). Callers bucket/normalize each dimension into
    [0, 2^bits) first — quantile bucketing for skewed domains.

    Pure shift/mask arithmetic: 2·bits codegen'd terms, no UDF.
    """
    if 2 * bits > 62:
        raise ValueError(f"2 cols x {bits} bits overflows a long")
    ix = x.cast("long")
    iy = y.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out.bitwiseOR(F.shiftleft(F.shiftright(ix, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(iy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return out


def morton_key_sql(x: str, y: str, bits: int = 16) -> str:
    """``morton_key`` as ANSI SQL (DuckDB-runnable), bit-for-bit equal —
    x on even bit positions, y on odd. Lets a registered query's oracle
    verify the interleave itself, not just downstream aggregates."""
    if 2 * bits > 62:
        raise ValueError(f"2 cols x {bits} bits overflows a long")
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    terms += [f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return "(" + " | ".join(terms) + ")"


def morton_key_n(cols: Sequence[Column], bits: int = 16) -> Column:
    """N-dimensional Morton interleave: bit i of column j lands at
    position ``i * d + j`` (the 2-column ``morton_key`` is the d=2
    layout). Keep ``d * bits <= 62`` for a LongType code. Use for
    3-4-column clustered layouts (e.g. tenant x day x region); beyond
    that, per-dimension resolution drops too low to prune well."""
    d = len(cols)
    if d == 0:
        raise ValueError("morton_key_n needs at least one column")
    if d * bits > 62:
        raise ValueError(f"{d} cols x {bits} bits overflows a long")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        ic = c.cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(ic, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    return out


def morton_key_n_sql(cols: Sequence[str], bits: int = 16) -> str:
    """``morton_key_n`` as ANSI SQL, bit-for-bit equal. Enforces the
    same ``d * bits <= 62`` long-overflow guard as the Column form —
    generated SQL past that bound would silently shift into the sign
    bit and diverge between engines."""
    d = len(cols)
    if d == 0:
        raise ValueError("morton_key_n_sql needs at least one column")
    if d * bits > 62:
        raise ValueError(f"{d} cols x {bits} bits overflows a long")
    terms = [
        f"((({c} >> {i}) & 1) << {i * d + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"
