"""Driver-visible query catalog (grows with every implemented operator).

Each ``@register`` pairs a Spark plan with its DuckDB oracle SQL — this is
the operator-coverage surface the correctness gate checks (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.pipelines import customer_sales_report as _csr
from asritha_metamorphetl_spark.pipelines import product_performance as _pp
from asritha_metamorphetl_spark.pipelines import supplier_performance as _sp
from asritha_metamorphetl_spark.plans.registry import register
from asritha_metamorphetl_spark.sources.files import Catalog

register("supplier_performance", oracle=_sp.ORACLE_SQL)(_sp.supplier_performance)
register("product_performance", oracle=_pp.ORACLE_SQL)(_pp.product_performance)
register("customer_sales_report", oracle=_csr.ORACLE_SQL)(_csr.customer_sales_report)


# ---------------------------------------------------------------------------
# K3 + partition pruning, proven: the reference's daily-drop layout
# (gs://bucket/YYYYMMDD/..., ingestion_task.py:235-238) as a DAY_DT-
# partitioned legacy table whose single-day read scans ONE partition.
# ---------------------------------------------------------------------------


@register(
    "legacy_day_slice",
    oracle="""
SELECT s_nationkey, COUNT(*) AS n_sup,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM supplier
WHERE s_suppkey % 3 = 1
GROUP BY s_nationkey
""",
)
def legacy_day_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dated legacy layout end-to-end: three daily snapshots (each a
    disjoint supplier slice) append into a DAY_DT-partitioned warehouse
    via the ingestion pipeline, then ONE day is read back. Because
    DAY_DT is a real partition column the day filter prunes at planning
    time — the scan lists only the DAY_DT=2025-01-02 directory (pinned
    by tests/test_plan_quality.py via PartitionFilters + inputFiles);
    the other days' files are never opened. The oracle recomputes day
    2's slice arithmetically from the source table.

    At 100 TB this is the difference between scanning one day and
    scanning all of history — the reference gets the same effect from
    its YYYYMMDD path convention, but only if every reader re-implements
    the path arithmetic; a partition column makes the optimizer do it."""
    import datetime as dt
    import os
    import shutil
    import tempfile

    from asritha_metamorphetl_spark.pipelines.ingestion import (
        Warehouse,
        ingest_entity,
    )

    sup = Catalog(sf_dir).load(spark, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    # Deterministic scratch root, rebuilt per run (append would otherwise
    # accumulate across invocations); keyed by sf_dir so scale factors
    # don't collide.
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(tempfile.gettempdir(), "ametl_legacy_prune", tag)
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(root)
    for i, day in enumerate(
        (dt.date(2025, 1, 1), dt.date(2025, 1, 2), dt.date(2025, 1, 3))
    ):
        feed = sup.filter(F.col("s_suppkey") % 3 == i)
        conformed = ingest_entity(
            feed, wh, "supplier", feed.schema, ["s_suppkey"], day=day
        )
        conformed.unpersist()

    legacy = spark.read.parquet(wh.legacy_path("supplier"))
    day2 = legacy.filter(F.col("DAY_DT") == F.lit("2025-01-02").cast("date"))
    return day2.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_sup"),
        F.sum(F.col("s_acctbal").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_bal"),
    )
