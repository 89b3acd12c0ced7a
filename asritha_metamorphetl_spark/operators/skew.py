"""Skew mitigation for hot-key joins.

AQE's skew-join handling (on in session.py) splits oversized partitions at
runtime, but it only applies to sort-merge joins and after a shuffle has
already materialized the skew. ``salted_join`` is the explicit fallback
for pathological keys (the classic null-key / celebrity-key cases): the
large side scatters each hot key across ``n_salts`` sub-keys; the small
side replicates per salt. Shuffle partitions then receive ~1/n_salts of
each hot key's rows.

Cost model: small side grows n_salts×, so keep it for genuinely small
build sides; salting a fact-fact join needs targeted salting (only the
known-hot keys), which ``salted_join`` supports via ``hot_keys``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 16,
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Equi-join with the large side's keys salted across ``n_salts``.

    With ``hot_keys``, only those keys are salted (small side replicates
    only for them), so the replication cost is bounded by
    len(hot_keys) × n_salts rows instead of |small| × n_salts.

    Supported join types: inner / left / left_semi / left_anti — the salted
    (replicated) side is the build side, so right/full outer would emit one
    unmatched row PER SALT and are rejected.
    """
    if how.replace("outer", "").strip("_") not in ("inner", "left", "left_semi", "left_anti", "leftsemi", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])

    if hot_keys is None:
        large_s = large.withColumn(
            _SALT, F.floor(F.rand(seed=42) * n_salts).cast("int")
        )
        small_s = small.withColumn(_SALT, F.explode(salts))
    else:
        hot = F.array(*[F.lit(k) for k in hot_keys])
        is_hot = F.array_contains(hot, F.col(on))
        large_s = large.withColumn(
            _SALT,
            F.when(is_hot, F.floor(F.rand(seed=42) * n_salts).cast("int"))
            .otherwise(F.lit(0)),
        )
        # Branch-free generator child (a when()-typed array input drops
        # explode off codegen): slice the full salt array to n for hot
        # keys, 1 (just salt 0) otherwise.
        small_s = small.withColumn(
            _SALT,
            F.explode(
                F.slice(
                    salts, 1, F.when(is_hot, F.lit(n_salts)).otherwise(F.lit(1))
                )
            ),
        )

    out = large_s.join(small_s, on=[on, _SALT], how=how)
    return out.drop(_SALT)
