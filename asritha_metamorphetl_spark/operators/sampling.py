"""Deterministic stratified sampling for training-data curation.

``df.sampleBy`` is seed-driven: the sampled set changes with
partitioning, Spark version, and row order, which makes pipeline reruns
non-reproducible and cross-engine verification impossible. This sampler
derives the keep/drop decision from a content hash of the row's id —
every engine, run, and cluster size selects the same rows, and adding
documents never flips the decision for existing ones (stable under
incremental ingest).

Row-local (no shuffle, no RNG state); the hash is the md5-derived 48-bit
bucket shared with the dedup operators (functions/hashing.py), so the
oracle SQL can reproduce it bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions.hashing import shingle_hash


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Stable [0, buckets) bucket of an id — the sampling coin flip."""
    return shingle_hash(id_col.cast("string")) % buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    pct_by_stratum: Mapping[object, int],
    default_pct: int = 100,
) -> DataFrame:
    """Keep ``pct_by_stratum[stratum]`` percent of each stratum's rows
    (``default_pct`` for unlisted strata), chosen by stable id-hash
    bucket. Typical use: downsample over-represented languages/sources
    to a target mix before training."""
    pct: Column = F.lit(default_pct)
    for stratum, p in pct_by_stratum.items():
        pct = F.when(F.col(strata_col) == stratum, F.lit(p)).otherwise(pct)
    return df.filter(hash_bucket(F.col(id_col)) < pct)
