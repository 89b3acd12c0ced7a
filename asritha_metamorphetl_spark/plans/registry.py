"""Registry of driver-visible queries and their DuckDB oracle SQL.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string the DuckDB oracle runs on the same parquet
tables. Column names/aliases must match exactly (the driver sorts columns
by name before value-hashing). Queries whose semantics aren't
SQL-expressible register with ``oracle=None`` → driver runs a rows-only
check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {q.name: q.fn for q in _REGISTRY.values()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from asritha_metamorphetl_spark.plans import (  # noqa: F401
        catalog_queries,
        corpus_queries,
        curation_queries,
        operator_queries,
        pipeline_queries,
        quality_queries,
        streaming_queries,
        text_queries,
        tpch_deep,
        tpch_queries,
    )

    _LOADED = True
