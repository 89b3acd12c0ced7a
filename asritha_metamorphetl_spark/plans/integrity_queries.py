"""Data-integrity audits: column completeness, key cardinality,
functional-dependency checks, and natural-key duplicate screens.

These are the contract checks an ingestion gate runs on every landing:
exact counts only (no sampling — an integrity audit that samples is an
integrity rumor), each one scan per audited table into O(columns) /
O(tables) / O(violating-groups) aggregates that map-side combine.

Reference scope: extends the reference's PK-duplicate assert
(``quality/asserts.py``, ETL_Airflow's unique-key checks) into the
full audit table a warehouse DQ dashboard shows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

#: (table, column, is_string) audited by the completeness profile.
_COMPLETENESS_COLS = (
    ("orders", "o_orderkey", False),
    ("orders", "o_custkey", False),
    ("orders", "o_orderstatus", True),
    ("orders", "o_totalprice", False),
    ("orders", "o_orderdate", False),
    ("orders", "o_orderpriority", True),
    ("documents", "doc_id", False),
    ("documents", "text", True),
    ("documents", "lang", True),
    ("documents", "source", True),
    ("documents", "n_chars", False),
)

#: (table, pk expression sql, pk column spark) for cardinality audit.
_PK_AUDIT = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey * 100 + l_linenumber"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)

#: Functional dependencies audited: name, table, lhs, rhs.
_FDS = (
    ("nation_to_region", "nation", "n_nationkey", "n_regionkey"),
    ("order_to_customer", "orders", "o_orderkey", "o_custkey"),
    ("doc_to_source", "documents", "doc_id", "source"),
    ("user_to_event_type", "events", "user_id", "event_type"),
)


def _completeness_oracle() -> str:
    rows = []
    for table, col, is_str in _COMPLETENESS_COLS:
        blank = (
            f"CAST(SUM(CASE WHEN {col} IS NOT NULL "
            f"AND length(trim({col})) = 0 THEN 1 ELSE 0 END) AS BIGINT)"
            if is_str
            else "CAST(0 AS BIGINT)"
        )
        rows.append(f"""
SELECT '{table}' AS table_name, '{col}' AS col_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
       {blank} AS n_blank,
       ROUND(1.0 - CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
           AS completeness
FROM {table}""")
    return "\nUNION ALL\n".join(rows)


@register("null_completeness_profile", oracle=_completeness_oracle())
def null_completeness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Null/blank completeness per audited column across two tables —
    the first page of any DQ dashboard, and the drift alarm when an
    upstream schema change starts nulling a field. One scan PER TABLE
    computes every column's counters in a single aggregate row (not
    one scan per column), then unpivots to the audit rows."""
    cat = Catalog(sf_dir)
    out = None
    by_table: dict[str, list] = {}
    for table, col, is_str in _COMPLETENESS_COLS:
        by_table.setdefault(table, []).append((col, is_str))
    for table, cols in by_table.items():
        df = cat.load(spark, table)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for col, is_str in cols:
            aggs.append(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"null_{col}")
            )
            blank = (
                F.sum(
                    F.when(
                        F.col(col).isNotNull()
                        & (F.length(F.trim(F.col(col))) == 0),
                        1,
                    ).otherwise(0)
                ).cast("bigint")
                if is_str
                else F.lit(0).cast("bigint")
            )
            aggs.append(blank.alias(f"blank_{col}"))
        one = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{col}', null_{col}, blank_{col}" for col, _ in cols
        )
        rows = one.selectExpr(
            "n_rows",
            f"stack({len(cols)}, {stack_args})"
            " AS (col_name, n_null, n_blank)",
        ).select(
            F.lit(table).alias("table_name"),
            "col_name",
            "n_rows",
            "n_null",
            "n_blank",
            F.round(
                1.0
                - F.col("n_null").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("completeness"),
        )
        out = rows if out is None else out.unionByName(rows)
    return out


def _pk_oracle() -> str:
    rows = []
    for table, pk in _PK_AUDIT:
        rows.append(f"""
SELECT '{table}' AS table_name, COUNT(*) AS n_rows,
       COUNT(DISTINCT {pk}) AS n_keys,
       COUNT(*) - COUNT(DISTINCT {pk}) AS n_dup_rows,
       COUNT(*) = COUNT(DISTINCT {pk}) AS is_unique
FROM {table}""")
    return "\nUNION ALL\n".join(rows)


@register("key_cardinality_audit", oracle=_pk_oracle())
def key_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key cardinality across every table in the catalog
    (lineitem audits its composite key as orderkey·100+linenumber —
    linenumber is 1-7, so the encoding is collision-free and both
    engines replay it identically): rows vs distinct keys vs the
    uniqueness verdict. This is ``quality/asserts.assert_unique``
    turned from a gate into a report — the difference between "the
    load failed" and "here is which table drifted and by how much"."""
    cat = Catalog(sf_dir)
    out = None
    for table, pk in _PK_AUDIT:
        df = cat.load(spark, table)
        key = F.expr(pk)
        row = df.agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(key).alias("n_keys"),
            (F.count(F.lit(1)) - F.countDistinct(key)).alias(
                "n_dup_rows"
            ),
            (F.count(F.lit(1)) == F.countDistinct(key)).alias(
                "is_unique"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _fd_oracle() -> str:
    rows = []
    for name, table, lhs, rhs in _FDS:
        rows.append(f"""
SELECT '{name}' AS fd, n_lhs, n_violating, max_rhs_variants FROM (
    SELECT COUNT(*) AS n_lhs,
           CAST(SUM(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           CAST(MAX(v) AS BIGINT) AS max_rhs_variants
    FROM (
        SELECT {lhs}, COUNT(DISTINCT {rhs}) AS v
        FROM {table} GROUP BY {lhs}
    )
)""")
    return "\nUNION ALL\n".join(rows)


@register("fd_violation_audit", oracle=_fd_oracle())
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each declared X→Y, how many X
    values map to more than one Y (zero = the dependency holds; the
    deliberately-included user→event_type row SHOWS violations, so a
    reader can tell the auditor works from the auditor being blind).
    The FD check is the schema-inference primitive behind
    normalization and join-key validation; each one is a
    distinct-count per key then a 1-row rollup — no joins at all."""
    cat = Catalog(sf_dir)
    out = None
    for name, table, lhs, rhs in _FDS:
        df = cat.load(spark, table)
        per = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("v"))
        row = per.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs"),
            F.sum(F.when(F.col("v") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
            F.max("v").cast("bigint").alias("max_rhs_variants"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "natural_key_dup_audit",
    oracle="""
WITH keys AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           COUNT(*) AS c
    FROM orders GROUP BY 1, 2, 3 HAVING COUNT(*) > 1
)
SELECT COALESCE(COUNT(*), 0) AS n_dup_groups,
       COALESCE(CAST(SUM(c) AS BIGINT), 0) AS n_dup_rows,
       COALESCE(CAST(MAX(c) AS BIGINT), 0) AS largest_group
FROM keys
""",
)
def natural_key_dup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate screen on the orders NATURAL key (customer, day,
    amount) — surrogate keys hide re-delivered extracts (same business
    event, fresh o_orderkey), and this is the audit that catches them.
    One hash aggregate on the composite; summary row reads zeros on a
    clean table."""
    orders = Catalog(sf_dir).load(spark, "orders")
    groups = (
        orders.groupBy(
            "o_custkey",
            F.to_date("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    return groups.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_dup_groups"),
        F.coalesce(F.sum("c").cast("bigint"), F.lit(0)).alias(
            "n_dup_rows"
        ),
        F.coalesce(F.max("c").cast("bigint"), F.lit(0)).alias(
            "largest_group"
        ),
    )
