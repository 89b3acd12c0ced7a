"""JDBC connector (reference S5, S6, K1, K2).

Re-expresses the reference's Postgres I/O (ETL_Airflow/dags/utils.py:90-129
and the Raptor wheel's query-pushdown reader, Raptor/Raptor.py:20-38) with:

- full query pushdown via the ``(query) AS subquery`` dbtable wrapping the
  reference uses — the source database executes the SQL, Spark only
  receives results,
- partitioned parallel reads (partitionColumn/bounds) — the reference
  reads every table on ONE connection; at warehouse scale that is the
  ingest bottleneck,
- credentials from a config object, never hardcoded (the reference embeds
  user/password in code, utils.py:91-103),
- no ``df.count()`` logging per read (utils.py:128 costs a second full
  source-side scan per table).

No Postgres driver jar ships in this container, but Spark's own classpath
carries embedded Apache Derby, so tests/test_jdbc_live.py runs the whole
surface (pushdown extract, partitioned read, DDL bootstrap, overwrite and
append loads) against a real SQL database; Postgres-specific paths remain
covered by option-construction tests.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    url: str  # jdbc:postgresql://host:5432/db
    user: str
    password: str
    driver: str = "org.postgresql.Driver"
    extra: dict[str, str] = field(default_factory=dict)

    def properties(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            **self.extra,
        }


def pushdown_subquery(sql: str, alias: str = "pushdown_query") -> str:
    """Wrap arbitrary SQL so the source database executes it
    (reference wrap at Raptor/Raptor.py:25)."""
    return f"({sql}) AS {alias}"


def read_table(
    spark: SparkSession,
    config: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a table (or pushdown subquery via ``pushdown_subquery``).

    With partition bounds, Spark opens ``num_partitions`` parallel
    connections each reading a key range — required for any fact-sized
    extract."""
    reader = (
        spark.read.format("jdbc")
        .option("url", config.url)
        .option("dbtable", table)
    )
    for key, value in config.properties().items():
        reader = reader.option(key, value)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def read_query(spark: SparkSession, config: JdbcConfig, sql: str) -> DataFrame:
    """Source-side SQL execution (reference S6)."""
    return read_table(spark, config, pushdown_subquery(sql))


def write_table(
    df: DataFrame,
    config: JdbcConfig,
    table: str,
    mode: str = "append",
    truncate: bool = False,
    batch_size: int = 10_000,
    column_types: str | None = None,
) -> None:
    """JDBC write (reference K1). ``truncate=True`` keeps the existing DDL
    on overwrite instead of drop/recreate (SURVEY §7.3 type-drift risk);
    batched inserts bound round-trips. ``column_types`` overrides the
    dialect's default DDL type per column (``"name VARCHAR(64)"``) — e.g.
    Derby maps StringType to CLOB, which the database then refuses to
    compare or index; pinning VARCHAR keeps loaded columns queryable."""
    writer = (
        df.write.format("jdbc")
        .option("url", config.url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("truncate", str(truncate).lower())
        .mode(mode)
    )
    if column_types is not None:
        writer = writer.option("createTableColumnTypes", column_types)
    for key, value in config.properties().items():
        writer = writer.option(key, value)
    writer.save()


def write_table_with_bootstrap(
    df: DataFrame,
    config: JdbcConfig,
    table: str,
    pre_ddl: Sequence[str] = (),
    mode: str = "overwrite",
    truncate: bool = False,
    column_types: str | None = None,
    executor: Callable[[str], None] | None = None,
) -> None:
    """JDBC write with a schema-bootstrap hook (reference K2: Raptor's
    `CREATE SCHEMA IF NOT EXISTS work` via psycopg2 before the overwrite,
    Raptor/Raptor.py:41-57,61-85).

    ``pre_ddl`` statements run on the target before the write. The default
    executor drives them through the JDBC connection of the Spark driver's
    JVM (no extra Python DB client needed) and requires the database's
    JDBC driver jar on the Spark classpath — the same jar the write itself
    needs (the reference ships postgresql-42.7.1.jar,
    ETL_Airflow/Dockerfile:15). Tests inject ``executor`` to observe the
    DDL without a live database.
    """
    for stmt in pre_ddl:
        if executor is not None:
            executor(stmt)
        else:
            _execute_ddl(df.sparkSession, config, stmt)
    write_table(
        df, config, table, mode=mode, truncate=truncate, column_types=column_types
    )


def _execute_ddl(spark: SparkSession, config: JdbcConfig, stmt: str) -> None:
    """Run one DDL statement over a driver-side JVM JDBC connection."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for key, value in config.properties().items():
        props.setProperty(key, value)
    conn = jvm.java.sql.DriverManager.getConnection(config.url, props)
    try:
        st = conn.createStatement()
        try:
            st.execute(stmt)
        finally:
            st.close()
    finally:
        conn.close()
