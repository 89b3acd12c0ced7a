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


def test_percentile_bands_have_no_global_window(spark):
    """The exact percentile bands walk the near-unique cents count
    table with the two-pass cumsum — a SinglePartition exchange before
    the (tiny) quantile join would be the O(rows) window spelling."""
    plan = _plan(_q(spark, "order_value_percentile_bands"))
    assert _single_partition_only_merges_partials(plan)


def test_ks_cdfs_have_no_global_window(spark):
    """Both CDFs come from the two-pass cumsum; the only permissible
    SinglePartition exchanges merge partial aggregates (the max-diff
    and totals rows), never the value tables."""
    plan = _plan(_q(spark, "ks_two_sample_price"))
    assert _single_partition_only_merges_partials(plan)
    assert "CartesianProduct" not in plan


def test_session_deciles_rank_is_two_pass(spark):
    """Global decile rank must be the per-pid window over the range
    repartition, never a whole-frame SinglePartition sort."""
    plan = _plan(_q(spark, "session_duration_deciles"))
    assert _single_partition_only_merges_partials(plan)


def _single_partition_only_merges_partials(plan: str) -> bool:
    """True when every SinglePartition exchange in the plan merges
    map-side-combined partial aggregates (O(partitions) rows — the
    correct global-aggregate shape), never raw data. Checked by
    requiring a partial aggregate immediately below each occurrence."""
    chunks = plan.split("Exchange SinglePartition")
    for below in chunks[1:]:
        if "partial_" not in below[:1200]:
            return False
    return True


def test_event_pareto_rank_is_two_pass(spark):
    plan = _plan(_q(spark, "event_value_pareto"))
    assert _single_partition_only_merges_partials(plan)


def test_cosine_pairs_are_bucket_blocked(spark):
    """Pairwise cosine work joins on the hash bucket — a cartesian or
    nested-loop pair generator is exactly what the blocking avoids."""
    plan = _plan(_q(spark, "cosine_pair_histogram"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_actives_use_equi_joins_only(spark):
    """The 7-day rolling distinct expands user-days into their bounded
    coverage set; a theta/range join against facts would be the
    nested-loop spelling."""
    plan = _plan(_q(spark, "rolling_active_users_7d"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spearman_price_ranks_are_two_pass(spark):
    plan = _plan(_q(spark, "spearman_price_qty"))
    assert _single_partition_only_merges_partials(plan)
