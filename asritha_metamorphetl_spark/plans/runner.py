"""Declarative pipeline runner (the reference's Airflow layer, engine-side).

The reference orchestrates with Airflow: one @task per step, each opening
its OWN SparkSession and handing data to the next task through Postgres
tables (SURVEY §2.13, §3.1 — `[suppliers, products, customers] >> sales
>> supplier_perf >> product_perf >> customer_sales`,
ETL_Airflow/dags/metamorph_etl_dag.py:20-28). That costs a JVM spin-up per
step and a full materialize/reload between every step.

This runner keeps the same mental model — named nodes, explicit
dependencies, per-node failure isolation (G1's try/except →
AirflowException) — but executes the whole graph in ONE SparkSession,
passing DataFrames directly; nodes that fan out to multiple consumers are
cached once instead of recomputed (fixing SURVEY §3.1 step 5). Airflow (or
any scheduler) can still sit on top by calling ``Pipeline.run`` from a
single task.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger("asritha_metamorphetl_spark.runner")

#: A node body: (spark, {dep_name: dep_result}) -> result (DataFrame or any).
NodeFn = Callable[[SparkSession, dict[str, object]], object]


class NodeFailed(Exception):
    """A node body raised; carries the node name (G1 semantics — the
    pipeline aborts, downstream nodes never run)."""

    def __init__(self, node: str, cause: Exception):
        self.node = node
        self.cause = cause
        super().__init__(f"node {node!r} failed: {cause}")


@dataclass
class Node:
    name: str
    fn: NodeFn
    deps: Sequence[str] = ()
    #: cache the result DataFrame iff >1 downstream consumer (set by Pipeline)
    cache: bool | None = None


@dataclass
class Pipeline:
    """A named-node DAG. ``>>`` chains are expressed via ``deps``."""

    nodes: dict[str, Node] = field(default_factory=dict)

    def add(self, name: str, fn: NodeFn, deps: Sequence[str] = (),
            cache: bool | None = None) -> "Pipeline":
        if name in self.nodes:
            raise ValueError(f"duplicate node {name!r}")
        unknown = [d for d in deps if d not in self.nodes]
        if unknown:
            raise ValueError(f"node {name!r} depends on unknown nodes {unknown}")
        self.nodes[name] = Node(name, fn, tuple(deps), cache)
        return self

    def _topo_order(self) -> list[Node]:
        order: list[Node] = []
        seen: set[str] = set()

        def visit(node: Node, stack: tuple[str, ...]) -> None:
            if node.name in stack:
                raise ValueError(f"cycle: {' -> '.join(stack + (node.name,))}")
            if node.name in seen:
                return
            for dep in node.deps:
                visit(self.nodes[dep], stack + (node.name,))
            seen.add(node.name)
            order.append(node)

        for node in self.nodes.values():
            visit(node, ())
        return order

    def run(self, spark: SparkSession) -> dict[str, object]:
        """Execute every node in dependency order; returns {name: result}.

        DataFrame results consumed by >1 downstream node are cached before
        fan-out and unpersisted when their last consumer finishes.
        """
        consumers: dict[str, int] = {name: 0 for name in self.nodes}
        for node in self.nodes.values():
            for dep in node.deps:
                consumers[dep] += 1

        results: dict[str, object] = {}
        remaining = dict(consumers)
        cached: set[str] = set()

        for node in self._topo_order():
            dep_results = {d: results[d] for d in node.deps}
            started = time.perf_counter()
            try:
                out = node.fn(spark, dep_results)
            except Exception as exc:  # G1: isolate + abort
                raise NodeFailed(node.name, exc) from exc
            elapsed = time.perf_counter() - started
            log.info("node %s finished in %.2fs", node.name, elapsed)

            should_cache = (
                node.cache if node.cache is not None else consumers[node.name] > 1
            )
            if should_cache and isinstance(out, DataFrame):
                out = out.cache()
                cached.add(node.name)
            results[node.name] = out

            for dep in node.deps:
                remaining[dep] -= 1
                if (
                    remaining[dep] == 0
                    and dep in cached
                    and isinstance(results[dep], DataFrame)
                ):
                    results[dep].unpersist()
        return results
