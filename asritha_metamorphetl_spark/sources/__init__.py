"""Source connectors: files (parquet/csv/json), REST APIs, JDBC."""

from asritha_metamorphetl_spark.sources.files import Catalog, read_csv, read_parquet

__all__ = ["Catalog", "read_csv", "read_parquet"]
