"""Plan gates for the round-9 fixes: the two global top-k spellings
that single-partitioned unbounded tables in round 8 now compile to
TakeOrderedAndProject (per-partition top-N + driver merge), with the
only single-partition exchange downstream of the N-row limit."""

from __future__ import annotations

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(spark, name):
    from asritha_metamorphetl_spark.plans.registry import all_queries

    return all_queries()[name](spark, SF)


def test_zipf_top_n_is_take_ordered(spark):
    """The vocabulary top-N must be TakeOrderedAndProject — a global
    row_number() window would funnel a billion-token web-scale vocab
    through one partition. The only permitted SinglePartition exchange
    is the post-limit rank over exactly ZIPF_TOP_N rows, which Spark
    plans as the window's required child distribution; the pre-limit
    vocabulary table must never hit one."""
    plan = _plan(_q(spark, "zipf_token_slope"))
    assert "TakeOrderedAndProject" in plan
    # The window (rank of the 500 survivors) sits ABOVE the
    # TakeOrderedAndProject in the tree; assert ordering by string
    # position: the take-ordered node must appear BELOW (later in the
    # printed tree than) any single-partition exchange.
    take_pos = plan.index("TakeOrderedAndProject")
    sp = plan.find("Exchange SinglePartition")
    assert sp == -1 or sp < take_pos, (
        "SinglePartition exchange feeds the top-N instead of "
        "consuming its 500-row result"
    )


def test_copurchase_top_k_is_take_ordered(spark):
    """Scored co-purchase pairs are O(orders x basket^2) — the global
    top-50 must be TakeOrderedAndProject, with any SinglePartition
    exchange strictly above it (consuming 50 rows, not billions)."""
    plan = _plan(_q(spark, "copurchase_jaccard_parts"))
    assert "TakeOrderedAndProject" in plan
    take_pos = plan.index("TakeOrderedAndProject")
    sp = plan.find("Exchange SinglePartition")
    assert sp == -1 or sp < take_pos
    # carried from round 8: pairs stay order-local
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
