"""Distributed second-moment linear algebra over embedding columns.

The missing primitive between "store vectors" and "do ML on vectors" is
the second-moment sweep: Gram matrix ``G = Xᵀ X``, column means, and the
covariance ``C = G/n − m mᵀ`` of a corpus-sized embedding table. At
100 TB the only viable shape is the classic distributed one:

1. **Partition-partial accumulation** — each task streams its Arrow
   batches through a local float64 ``(d × d)`` accumulator (one BLAS
   ``Xᵀ X`` per batch), so the shuffle carries ``O(partitions · d²)``
   moment rows, never ``rows × d²`` exploded pairs. For d = 64 that is
   4 KB of state per task regardless of partition size.
2. **One tiny hash agg** sums the partials — the only shuffle, over a
   bounded frame.
3. **Driver-side dense step** — the d×d matrix is driver-material
   (``O(d²)`` bounded collect, the same budget class as IVF centroids);
   eigen-style work happens there.
4. **Broadcast projection** — the resulting O(d) direction ships back
   as a literal array and the per-row projection is a row-local
   ``zip_with``/``aggregate`` dot product inside whole-stage codegen:
   embarrassingly parallel, zero Python in the scan.

This is exactly how distributed PCA runs in production (partial Gram →
driver eigensolve → broadcast components); the operators here expose
each stage so queries can oracle-check the matrix entries bit-stably
(rounded to 6 decimals — insensitive to summation order across engines).

Reference scope: the reference engine has no linear-algebra surface;
this belongs to the training-data-pipeline additions the build brief
asks for (embedding-column analytics at corpus scale).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gram_moments",
    "covariance_matrix",
    "covariance_from_moments",
    "project_embeddings",
]


def gram_moments(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Summed second moments of ``df[vec_col]`` (array<float|double>,
    fixed length ``dim``): returns a bounded frame ``(i, j, val)`` where

    - ``i >= 0, j >= 0``  → Gram entry ``Σ x_i · x_j``
    - ``i >= 0, j = -1``  → column sum ``Σ x_i``
    - ``i = -1, j = -1``  → row count ``n``

    One ``mapInPandas`` pass emits per-partition partials (the generator
    runs once per partition, so the d×d accumulator lives across that
    partition's batches); one hash agg sums them. Output is
    ``d² + d + 1`` rows total — broadcast-sized for any sane d."""
    idx_i, idx_j = np.indices((dim, dim))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.float64)
        sums = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if x.shape[1] != dim:
                raise ValueError(
                    f"gram_moments: expected dim={dim}, got {x.shape[1]}"
                )
            gram += x.T @ x
            sums += x.sum(axis=0)
            n += len(pdf)
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [idx_i.ravel(), np.arange(dim), np.array([-1])]
                ),
                "j": np.concatenate(
                    [idx_j.ravel(), np.full(dim, -1), np.array([-1])]
                ),
                "val": np.concatenate(
                    [gram.ravel(), sums, np.array([float(n)])]
                ),
            }
        )

    partials = df.select(vec_col).mapInPandas(
        gen, "i int, j int, val double"
    )
    return partials.groupBy("i", "j").agg(F.sum("val").alias("val"))


def covariance_matrix(
    df: DataFrame, vec_col: str, dim: int, decimals: int = 6
) -> DataFrame:
    """Population covariance ``C[i][j] = G[i][j]/n − (s_i/n)(s_j/n)`` of
    the embedding column, as a ``(i, j, cov)`` frame of d² rows, rounded
    to ``decimals`` so the value is summation-order-independent across
    engines."""
    return covariance_from_moments(
        gram_moments(df, vec_col, dim).localCheckpoint(eager=False),
        decimals=decimals,
    )


def covariance_from_moments(m: DataFrame, decimals: int = 6) -> DataFrame:
    """Derive the covariance frame from an already-summed moment frame
    (``gram_moments`` output or any linear fold of such partials — the
    streaming maintenance path lands here too). All joins are over the
    bounded d²+d+1-row frame — broadcast, never a corpus shuffle."""
    n = m.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("val").alias("n")
    )
    sums = m.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("k"), F.col("val").alias("s")
    )
    gram = m.filter(F.col("j") >= 0)
    return (
        gram.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(sums.select(F.col("k").alias("i"), F.col("s").alias("si"))),
            "i",
        )
        .join(
            F.broadcast(sums.select(F.col("k").alias("j"), F.col("s").alias("sj"))),
            "j",
        )
        .select(
            F.col("i").cast("bigint").alias("i"),
            F.col("j").cast("bigint").alias("j"),
            # + 0.0 normalizes IEEE -0.0 to +0.0 (hash-compare stability)
            (
                F.round(
                    F.col("val") / F.col("n")
                    - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n")),
                    decimals,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def project_embeddings(
    df: DataFrame,
    vec_col: str,
    direction: list[float],
    center: list[float] | None = None,
    out_col: str = "proj",
) -> Column | DataFrame:
    """Project every row's vector onto a driver-computed ``direction``
    (optionally after subtracting ``center``): the broadcast-projection
    half of distributed PCA. The direction/center ship as literal arrays
    and the dot product is a row-local ``zip_with`` + ``aggregate`` —
    JVM-side, inside whole-stage codegen, no shuffle, no Python."""
    v = F.array(*[F.lit(float(c)) for c in direction])
    x = F.transform(F.col(vec_col), lambda c: c.cast("double"))
    if center is not None:
        m = F.array(*[F.lit(float(c)) for c in center])
        x = F.zip_with(x, m, lambda a, b: a - b)
    score = F.aggregate(
        F.zip_with(x, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return df.withColumn(out_col, score)
