"""Pipeline-runner tests: dependency order, fan-out caching, failure
isolation, cycle detection — plus the full three-mart DAG in one session."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def test_topological_execution_and_fanout_cache(spark):
    from asritha_metamorphetl_spark.plans.runner import Pipeline

    seen = []

    def mk(name):
        def fn(s, deps):
            seen.append(name)
            return name

        return fn

    p = (
        Pipeline()
        .add("a", mk("a"))
        .add("b", mk("b"), deps=["a"])
        .add("c", mk("c"), deps=["a"])
        .add("d", mk("d"), deps=["b", "c"])
    )
    results = p.run(spark)
    assert seen.index("a") == 0 and seen.index("d") == 3
    assert results["d"] == "d"


def test_failure_isolation(spark):
    from asritha_metamorphetl_spark.plans.runner import NodeFailed, Pipeline

    ran = []

    def ok(s, deps):
        ran.append("ok")

    def boom(s, deps):
        raise RuntimeError("kaput")

    p = Pipeline().add("ok", ok).add("boom", boom, deps=["ok"]).add(
        "after", ok, deps=["boom"]
    )
    with pytest.raises(NodeFailed) as e:
        p.run(spark)
    assert e.value.node == "boom"
    assert ran == ["ok"]  # downstream never ran


def test_cycle_detection(spark):
    from asritha_metamorphetl_spark.plans.runner import Pipeline

    p = Pipeline().add("a", lambda s, d: 1)
    p.nodes["a"].deps = ("a",)
    with pytest.raises(ValueError, match="cycle"):
        p.run(spark)


def test_three_mart_dag_single_session(spark):
    """The reference's flagship DAG shape (metamorph_etl_dag.py:20-28) in
    one session: sources fan into marts, all three marts complete."""
    from asritha_metamorphetl_spark.pipelines.customer_sales_report import (
        customer_sales_report,
    )
    from asritha_metamorphetl_spark.pipelines.product_performance import (
        product_performance,
    )
    from asritha_metamorphetl_spark.pipelines.supplier_performance import (
        supplier_performance,
    )
    from asritha_metamorphetl_spark.plans.runner import Pipeline
    from asritha_metamorphetl_spark.quality import assert_unique

    p = (
        Pipeline()
        .add("supplier_perf", lambda s, d: supplier_performance(s, SF_SMOKE))
        .add(
            "product_perf",
            lambda s, d: product_performance(s, SF_SMOKE),
            deps=["supplier_perf"],
        )
        .add(
            "customer_sales",
            lambda s, d: customer_sales_report(s, SF_SMOKE),
            deps=["product_perf"],
        )
        .add(
            "dq_gate",
            lambda s, d: assert_unique(d["supplier_perf"], ["supplier_id"]),
            deps=["supplier_perf"],
        )
    )
    results = p.run(spark)
    assert results["supplier_perf"].count() > 0
    assert results["product_perf"].count() > 0
    assert results["customer_sales"].count() > 0
