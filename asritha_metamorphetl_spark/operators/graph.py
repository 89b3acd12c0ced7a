"""Distributed connected components (duplicate-cluster assignment).

Near-duplicate detection (MinHash/SimHash/embedding pairs) emits EDGES;
deduplication needs CLUSTERS — "keep one document per connected
component". This is the canonical follow-on to every pair generator in
``operators/dedup.py``.

Algorithm: iterative min-label propagation. Every vertex starts labeled
with its own id; each round it takes the minimum of its label and its
neighbors' labels; fixpoint = every vertex holds the minimum vertex id of
its component. Each round costs one shuffle join (edges × labels) plus
one aggregation — all DataFrame ops, no driver-side graph. Lineage is
truncated per round with ``localCheckpoint`` so the plan doesn't grow
with iteration count (Spark's iterative-algorithm footgun).

Rounds needed = graph diameter. Dup clusters are near-cliques (diameter
2-4), so this converges in a handful of rounds; for adversarial
long-path graphs the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) drops rounds to
O(log n) at the cost of a more intricate update rule — the hook is the
same labels frame, so it can be swapped in without changing callers.

The convergence check is one ``limit(1).count()`` per round over the
changed-label frame — O(1) rows to the driver, never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Label every vertex of the undirected graph with the minimum vertex
    id reachable from it. Returns (id, label); vertices = every endpoint
    in ``edges``. ``strict=True`` raises if ``max_iter`` rounds didn't
    reach the fixpoint (result would be a refinement, not components).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    sym = sym.localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(sym["a"].alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # The changed flag rides along in the update select, so the round
        # needs no second labels-vs-updated join: a row changed iff a
        # neighbor offered a strictly smaller label.
        updated = (
            labels.alias("l")
            .join(nbr_min.alias("n"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("l.label"),
                    F.coalesce(F.col("n.nbr_label"), F.col("l.label")),
                ).alias("label"),
                F.coalesce(
                    F.col("n.nbr_label") < F.col("l.label"), F.lit(False)
                ).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        # O(1)-row job over the already-materialized checkpoint.
        changed = updated.filter("__changed").limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            converged = True
            break
    if strict and not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds "
            "(graph diameter exceeds max_iter; raise it or switch to the "
            "large-star/small-star update)"
        )
    return labels
