"""Live JDBC round-trip against embedded Apache Derby.

The reference runs its extract/load against a real Postgres
(ETL_Airflow/dags/utils.py:90-129: read_data_from_db / write_data_to_db);
this container ships no Postgres, but Spark's own classpath carries the
Derby embedded engine (derby-10.16 jars, used by the Hive metastore), so
the full connector surface — pushdown extract, partitioned parallel read,
DDL bootstrap, overwrite and append loads — is exercised against a real
SQL database rather than option-construction stubs.

Dialect note: Spark's JDBC writer quotes column identifiers, so Derby
stores them case-sensitively; pushdown SQL (which is source-dialect SQL
by definition) must quote them too ('SELECT "id" ...'). Table names pass
through Spark's Derby dialect consistently in both directions.
"""

from __future__ import annotations

import datetime as dt

import pytest

from asritha_metamorphetl_spark.sources.jdbc import (
    JdbcConfig,
    read_query,
    read_table,
    write_table,
    write_table_with_bootstrap,
)


@pytest.fixture(scope="module")
def derby(tmp_path_factory):
    root = tmp_path_factory.mktemp("derby")
    return JdbcConfig(
        url=f"jdbc:derby:{root}/db;create=true",
        user="app",
        password="app",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )


@pytest.fixture(scope="module")
def seeded_source(spark, derby):
    """A 'source database' table standing in for the reference's Postgres."""
    rows = [
        (1, "alpha supply", "EUROPE", 120.0),
        (2, "beta traders", "ASIA", 80.5),
        (3, "gamma parts", "EUROPE", 310.25),
        (4, "delta goods", "AMERICA", 55.0),
        (5, "epsilon ltd", "ASIA", 900.75),
    ]
    feed = spark.createDataFrame(
        rows, "supp_id int, supp_name string, region string, balance double"
    )
    write_table(
        feed,
        derby,
        "source_suppliers",
        mode="overwrite",
        column_types="supp_name VARCHAR(64), region VARCHAR(32)",
    )
    return rows


def test_pushdown_extract_executes_on_source(spark, derby, seeded_source):
    """S6 live: the WHERE runs inside Derby, Spark receives only matches."""
    df = read_query(
        spark,
        derby,
        'SELECT "supp_id", "supp_name", "balance" FROM source_suppliers'
        " WHERE \"region\" = 'EUROPE'",
    )
    got = sorted((r.supp_id, r.supp_name, r.balance) for r in df.collect())
    assert got == [(1, "alpha supply", 120.0), (3, "gamma parts", 310.25)]


def test_partitioned_parallel_read(spark, derby, seeded_source):
    """S5 live: bounded partition column fans the scan across connections."""
    df = read_table(
        spark,
        derby,
        "source_suppliers",
        partition_column='"supp_id"',
        lower_bound=1,
        upper_bound=6,
        num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == len(seeded_source)


def test_extract_ingest_load_roundtrip(spark, derby, seeded_source, tmp_path):
    """The reference's full cycle (utils.py:90-129): extract from the
    source DB, dual-write raw/legacy parquet, load the conformed frame
    back into a bootstrapped warehouse schema, re-read and compare."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from asritha_metamorphetl_spark.pipelines.ingestion import (
        Warehouse,
        ingest_entity,
    )

    extracted = read_query(
        spark,
        derby,
        'SELECT "supp_id", "supp_name", "region", "balance"'
        " FROM source_suppliers",
    )
    contract = StructType(
        [
            StructField("supp_id", IntegerType()),
            StructField("supp_name", StringType()),
            StructField("region", StringType()),
            StructField("balance", DoubleType()),
        ]
    )
    warehouse = Warehouse(root=str(tmp_path / "wh"))
    conformed = ingest_entity(
        extracted,
        warehouse,
        "suppliers",
        contract,
        primary_key=["supp_id"],
        day=dt.date(2026, 8, 13),
    )

    # K2 live: CREATE SCHEMA bootstrap runs over a real JDBC connection
    # (reference: Raptor's CREATE SCHEMA IF NOT EXISTS work, Raptor.py:41-57).
    write_table_with_bootstrap(
        conformed,
        derby,
        "wh.suppliers",
        pre_ddl=["CREATE SCHEMA wh"],
        mode="overwrite",
    )
    conformed.unpersist()

    back = read_table(spark, derby, "wh.suppliers")
    got = sorted(
        (r.supp_id, r.supp_name, r.region, r.balance) for r in back.collect()
    )
    assert got == sorted(seeded_source)

    legacy = spark.read.parquet(warehouse.legacy_path("suppliers"))
    assert legacy.count() == len(seeded_source)
    assert legacy.select("DAY_DT").distinct().count() == 1


def test_append_mode_accumulates_snapshots(spark, derby, seeded_source):
    """K1 live: legacy-style daily snapshots accumulate under append."""
    feed = spark.createDataFrame(
        [(10, dt.date(2026, 8, 12)), (11, dt.date(2026, 8, 12))],
        "id int, day_dt date",
    )
    write_table(feed, derby, "snapshots", mode="overwrite")
    next_day = spark.createDataFrame(
        [(10, dt.date(2026, 8, 13)), (11, dt.date(2026, 8, 13))],
        "id int, day_dt date",
    )
    write_table(next_day, derby, "snapshots", mode="append")
    back = read_table(spark, derby, "snapshots")
    assert back.count() == 4
    days = sorted(r.day_dt for r in back.select("day_dt").distinct().collect())
    assert days == [dt.date(2026, 8, 12), dt.date(2026, 8, 13)]
