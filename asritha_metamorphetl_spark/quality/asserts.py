"""Constraint assertions (the reference's D1 operator).

Re-expresses ``Duplicate_check.has_duplicates``
(ETL_Airflow/dags/utils.py:73-86): group by the primary key, count, and
abort the pipeline if any key repeats. Invoked before every warehouse
write in the reference (ingestion_task.py:62-63 etc.).

Improvement over the reference: one aggregate pass that returns the
offending keys (bounded sample) in the error, instead of a bare boolean —
and no second full recompute of the upstream plan when the check passes
(callers are expected to cache when the frame is also written).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DuplicateKeyError(Exception):
    """Primary-key uniqueness violated (reference: DuplicateException,
    ETL_Airflow/dags/utils.py:73-75)."""

    def __init__(self, keys: Sequence[str], sample: list[dict], n_dupes: int):
        self.keys = list(keys)
        self.sample = sample
        self.n_dupes = n_dupes
        super().__init__(
            f"{n_dupes} duplicate key group(s) on {self.keys}; sample: {sample[:5]}"
        )


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key groups occurring more than once: (keys..., cnt)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def assert_unique(df: DataFrame, keys: Sequence[str], sample_size: int = 5) -> DataFrame:
    """Raise DuplicateKeyError if ``keys`` are not unique in ``df``.

    Returns ``df`` unchanged on success so it chains inside pipelines.
    """
    dupes = duplicate_keys(df, keys)
    sample_rows = dupes.limit(sample_size).collect()
    if sample_rows:
        n = dupes.count()
        raise DuplicateKeyError(keys, [r.asDict() for r in sample_rows], n)
    return df
