"""Source dispatcher (reference S8).

The reference routes reconciliation inputs by source type —
``_raptor_data_fetch(source in {"pg_admin","reporting"})`` picks JDBC
pushdown vs parquet+SQL (Raptor wheel Raptor/Raptor.py:113-138). This is
the generalized registry: connectors register under a type name; callers
ask for ``read(spark, "<type>", ...)`` and new connectors plug in without
touching call sites.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Reader = Callable[..., DataFrame]

_READERS: dict[str, Reader] = {}


def register_source(name: str) -> Callable[[Reader], Reader]:
    def deco(fn: Reader) -> Reader:
        _READERS[name] = fn
        return fn

    return deco


def read(spark: SparkSession, source_type: str, **kwargs) -> DataFrame:
    try:
        reader = _READERS[source_type]
    except KeyError:
        raise KeyError(
            f"unknown source type {source_type!r}; registered: {sorted(_READERS)}"
        ) from None
    return reader(spark, **kwargs)


# ---------------------------------------------------------------------------
# Built-in connectors
# ---------------------------------------------------------------------------


@register_source("parquet")
def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    from asritha_metamorphetl_spark.sources.files import read_parquet

    return read_parquet(spark, path)


@register_source("csv")
def _read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    from asritha_metamorphetl_spark.sources.files import read_csv

    return read_csv(spark, path, **options)


@register_source("jsonl")
def _read_jsonl(spark: SparkSession, path: str, **options) -> DataFrame:
    from asritha_metamorphetl_spark.sources.files import read_jsonl

    return read_jsonl(spark, path, **options)


@register_source("sql")
def _read_sql(
    spark: SparkSession, query: str, catalog_root: str, tables=None
) -> DataFrame:
    """Parquet tables as temp views + spark.sql — the reference's
    'reporting' source (Raptor/Raptor.py:89-100). ``tables`` narrows view
    registration to what the query needs so an unreadable unrelated table
    can't fail it."""
    from asritha_metamorphetl_spark.sources.files import Catalog

    Catalog(catalog_root).register_views(spark, tables=tables)
    return spark.sql(query)


@register_source("jdbc")
def _read_jdbc(spark: SparkSession, config, query: str) -> DataFrame:
    """Source-side SQL pushdown — the reference's 'pg_admin' source."""
    from asritha_metamorphetl_spark.sources.jdbc import read_query

    return read_query(spark, config, query)


@register_source("rest")
def _read_rest(spark: SparkSession, url: str, schema, token_provider=None) -> DataFrame:
    from asritha_metamorphetl_spark.sources.rest import read_api

    return read_api(spark, url, schema, token_provider=token_provider)
