"""Entity schema contracts (SURVEY.md §1.4-1.5).

The reference has no DDL anywhere: schemas are inferred and columns are
renamed BY POSITION (withColumnRenamed(df.columns[i], ...) chains,
ETL_Airflow/dags/tasks/ingestion_task.py:32-36,97-105,174-179,246-255) —
which silently mislabels columns when a feed drifts (the products feed
did exactly that: 7-column sample vs 8-column rename chain, SURVEY §1.4).

This engine makes contracts explicit StructTypes and keeps positional
renaming as an *adapter* that validates arity instead of mislabeling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


#: Canonical entity contracts, post-rename (SURVEY §1.5).
SUPPLIERS = StructType(
    [_s("SUPPLIER_ID"), _s("SUPPLIER_NAME"), _s("CONTACT_DETAILS"), _s("REGION")]
)

PRODUCTS = StructType(
    [
        _s("PRODUCT_ID"),
        _s("PRODUCT_NAME"),
        _s("CATEGORY"),
        StructField("SELLING_PRICE", DoubleType(), True),
        StructField("COST_PRICE", DoubleType(), True),
        StructField("STOCK_QUANTITY", IntegerType(), True),
        StructField("REORDER_LEVEL", IntegerType(), True),
        _s("SUPPLIER_ID"),
    ]
)

CUSTOMERS = StructType(
    [_s("CUSTOMER_ID"), _s("NAME"), _s("CITY"), _s("EMAIL"), _s("PHONE_NUMBER")]
)

SALES = StructType(
    [
        _s("SALE_ID"),
        _s("CUSTOMER_ID"),
        _s("PRODUCT_ID"),
        StructField("SALE_DATE", DateType(), True),
        StructField("QUANTITY", IntegerType(), True),
        StructField("DISCOUNT", DoubleType(), True),
        StructField("SHIPPING_COST", DoubleType(), True),
        _s("ORDER_STATUS"),
        _s("PAYMENT_MODE"),
    ]
)

#: Primary keys per entity (dup-checked before every warehouse write,
#: reference ingestion_task.py:62-63 etc).
PRIMARY_KEYS: dict[str, list[str]] = {
    "suppliers": ["SUPPLIER_ID"],
    "products": ["PRODUCT_ID"],
    "customers": ["CUSTOMER_ID"],
    "sales": ["SALE_ID"],
}


class SchemaDriftError(Exception):
    """Feed arity does not match the contract (the failure the reference's
    positional renames silently mislabel instead of raising)."""


def rename_positional(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """Positional-rename adapter: df.toDF(*names) with arity validation."""
    if len(df.columns) != len(names):
        raise SchemaDriftError(
            f"feed has {len(df.columns)} columns {df.columns}, contract "
            f"expects {len(names)}: {list(names)}"
        )
    return df.toDF(*names)


def conform(df: DataFrame, contract: StructType) -> DataFrame:
    """Project + cast to the contract (ordered select — the reference's
    projection-as-schema, ingestion_task.py:39-45 — plus explicit casts)."""
    from pyspark.sql import functions as F

    missing = [f.name for f in contract.fields if f.name not in df.columns]
    if missing:
        raise SchemaDriftError(f"missing contract columns: {missing}")
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in contract.fields]
    )
