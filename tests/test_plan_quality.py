"""Physical-plan quality gates: these tests pin the *plan shapes* that
matter at 100 TB — pushdown reaching scans, dimension joins broadcasting,
no single-partition stages, top-k not globally sorting. A refactor that
keeps results correct but regresses the plan fails here."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_to_scan(spark):
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["pricing_summary"](spark, SF_CORRECT))
    scan = plan[plan.index("FileScan") :]
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in scan
    # column pruning: the scan must not read unused columns
    read_schema = scan[scan.index("ReadSchema") :].splitlines()[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_supplier_mart_dimension_joins_broadcast_via_aqe(spark):
    """Dimension tables (part/supplier) scale with the data in TPC-H, so
    the mart carries NO static broadcast hint — a 100 TB run could not
    honor one. The gate instead proves AQE's runtime conversion: after
    execution, the final adaptive plan joins the dimensions as broadcast
    (they fit at this SF) while the plan itself would degrade gracefully
    to shuffled joins at sizes where they don't."""
    from asritha_metamorphetl_spark.pipelines.supplier_performance import (
        supplier_performance,
    )

    df = supplier_performance(spark, SF_CORRECT)
    df.write.format("noop").mode("overwrite").save()  # finalize AQE plan
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # no static broadcast hints anywhere in the logical plan
    logical = str(df._jdf.queryExecution().optimizedPlan().toString())
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_no_single_partition_stage_over_raw_rows_in_scalable_rank(spark):
    """SinglePartition may only appear above the collapsed distinct-value
    aggregate — never above the raw parquet scan (the reference's window
    funnels every input row; ours funnels one narrow row per distinct
    value)."""
    from asritha_metamorphetl_spark.operators.ranks import global_percent_rank

    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    ranked = global_percent_rank(
        orders, F.col("o_totalprice"), tiebreak=[F.col("o_orderkey")]
    )
    plan = _plan(ranked)
    for seg in plan.split("SinglePartition")[1:]:
        agg = seg.find("HashAggregate")
        scan = seg.find("FileScan")
        assert agg != -1 and (scan == -1 or agg < scan), plan


def test_reference_style_global_window_flagged(spark):
    """Contrast case: the reference's unpartitioned window DOES produce a
    SinglePartition exchange — documenting why ranks.py exists."""
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    df = orders.withColumn(
        "pr", F.percent_rank().over(Window.orderBy(F.desc("o_totalprice")))
    )
    assert "SinglePartition" in _plan(df)


def test_top5_uses_take_ordered_not_global_sort(spark):
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["top5_orders"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan


def test_mart_aggregates_have_partial_stage(spark):
    """Map-side partial aggregation must exist before the shuffle."""
    from asritha_metamorphetl_spark.pipelines.supplier_performance import (
        supplier_performance,
    )

    plan = _plan(supplier_performance(spark, SF_CORRECT))
    assert "partial_" in plan  # partial_sum / partial_count before exchange


def test_metadata_scan_prunes_unused_columns(spark):
    """Narrow projections reach parquet ReadSchema (SQ_ nodes exist for a
    reason)."""
    from asritha_metamorphetl_spark.pipelines.customer_sales_report import (
        customer_sales_report,
    )

    plan = _plan(customer_sales_report(spark, SF_CORRECT))
    for scan_part in plan.split("FileScan")[1:]:
        header = scan_part.splitlines()[0]
        if "lineitem" in header:
            schema_line = scan_part[scan_part.index("ReadSchema") :].splitlines()[0]
            assert "l_tax" not in schema_line and "l_returnflag" not in schema_line


def test_no_query_funnels_raw_rows_single_partition(spark):
    """Registry-wide scale gate: in EVERY registered query's physical
    plan, any SinglePartition exchange must sit above an aggregation
    (a collapsed frame — bounded rows), never directly above a raw
    FileScan. New queries are covered automatically on registration."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    offenders = []
    for name, fn in all_queries().items():
        plan = _plan(fn(spark, "/root/testdata/sf0.001"))
        for seg in plan.split("SinglePartition")[1:]:
            agg = seg.find("HashAggregate")
            if agg == -1:
                agg = seg.find("SortAggregate")
            if agg == -1:
                agg = seg.find("ObjectHashAggregate")
            scan = seg.find("FileScan")
            if not (agg != -1 and (scan == -1 or agg < scan)):
                offenders.append(name)
                break
    assert not offenders, f"raw-row single-partition stages in: {offenders}"


def test_bucketed_join_skips_shuffle_and_sort(spark, tmp_path):
    """Both sides bucketed+sorted on the join key with equal bucket
    counts → SortMergeJoin with NO Exchange and NO Sort: the write-time
    shuffle is amortized over every later join on that key."""
    from asritha_metamorphetl_spark.sources.files import write_bucketed

    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        path=str(tmp_path / "b_lineitem"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_similar_part_names_blocks_via_equi_join(spark):
    """The fuzzy-name pair join must be a hash equi-join on the length
    block key, never a BroadcastNestedLoopJoin over the theta condition
    (O(n^2) in distinct names — the round-1 scale-killer)."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    df = all_queries()["similar_part_names"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "blk" in plan  # the join key is the length block


def test_asof_join_is_one_sort_no_pair_explosion(spark):
    """The as-of join must compile to union + window (one hash exchange
    per input side, one sort), never the naive range theta-join whose
    BroadcastNestedLoopJoin explodes O(L×R) pairs per key."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["view_purchase_asof"](spark, SF_CORRECT))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Sort") == 1  # the window's in-partition sort
    assert "Window" in plan


def test_clustered_write_enables_partition_pruning_and_pushdown(spark, tmp_path):
    """write_clustered's layout must make both skipping layers visible in
    the read plan: directory-partition pruning (PartitionFilters) and
    parquet predicate pushdown (PushedFilters) on the cluster key."""
    from asritha_metamorphetl_spark.sources.files import write_clustered

    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_clustered")
    write_clustered(
        orders, path, cluster_cols=["o_orderdate"], partition_cols=["o_year"]
    )

    back = spark.read.parquet(path)
    one_year = sorted(
        r["o_year"] for r in back.select("o_year").distinct().collect()
    )[0]
    pruned = back.filter(
        (F.col("o_year") == one_year)
        & (F.col("o_orderdate") < "1993-02-01")
    )
    plan = _plan(pruned)
    scan = plan[plan.index("FileScan") :]
    assert "PartitionFilters: [" in scan and "o_year" in scan.split(
        "PartitionFilters"
    )[1].split("]")[0], "year predicate must prune directories"
    pushed = scan.split("PushedFilters")[1].split("]")[0]
    assert "o_orderdate" in pushed, "date predicate must reach parquet"
    # Pruning is real, not cosmetic: the pruned read touches only the
    # one year directory's files.
    total_files = len(back.inputFiles())
    year_files = [f for f in back.inputFiles() if f"o_year={one_year}" in f]
    assert 0 < len(year_files) < total_files
    # And the filtered result is correct vs the unpartitioned source.
    expect = orders.filter(
        (F.col("o_year") == one_year) & (F.col("o_orderdate") < "1993-02-01")
    ).count()
    assert pruned.count() == expect


def test_legacy_day_read_prunes_to_one_partition(spark, tmp_path):
    """DAY_DT-partitioned legacy reads must prune at planning time: the
    day filter appears as a PartitionFilter (not a post-scan Filter) and
    the scan's input files all live under the requested DAY_DT directory
    — the reference's daily-drop pattern (ingestion_task.py:235-238)
    made provably pruned."""
    import datetime as dt

    from asritha_metamorphetl_spark.pipelines.ingestion import (
        Warehouse,
        ingest_entity,
    )

    sup = spark.read.parquet(f"{SF_CORRECT}/supplier.parquet").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    wh = Warehouse(str(tmp_path / "wh"))
    for i, day in enumerate((dt.date(2025, 1, 1), dt.date(2025, 1, 2))):
        conformed = ingest_entity(
            sup.filter(F.col("s_suppkey") % 2 == i),
            wh,
            "supplier",
            sup.schema,
            ["s_suppkey"],
            day=day,
        )
        conformed.unpersist()

    legacy = spark.read.parquet(wh.legacy_path("supplier"))
    day2 = legacy.filter(F.col("DAY_DT") == F.lit("2025-01-02").cast("date"))
    plan = _plan(day2)
    assert "PartitionFilters" in plan and "DAY_DT" in plan.split(
        "PartitionFilters", 1
    )[1].splitlines()[0], plan[plan.index("FileScan") :][:400]
    # the scan's resolved listing selects exactly ONE of the two day
    # directories (inputFiles() would show the pre-pruning listing).
    listing = (
        day2._jdf.queryExecution()
        .executedPlan()
        .collectLeaves()
        .apply(0)
        .selectedPartitions()
    )
    assert listing.partitionCount() == 1
    # and the pruned read returns exactly day 2's slice
    assert day2.count() == sup.filter(F.col("s_suppkey") % 2 == 1).count()


def test_cdc_apply_anti_join_shape(spark):
    """CDC merge must be (partial-agg max_by) + one anti join — never a
    cartesian or a window sort over the changelog."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    df = all_queries()["cdc_orders_snapshot"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # LWW via max_by aggregate, not row_number
    assert "LeftAnti" in plan
    # the changelog reduction is a real hash agg with a partial stage
    assert plan.count("HashAggregate") >= 2


def test_zorder_profile_stays_jvm_side(spark):
    """The Morton interleave must compile to JVM bit arithmetic — no
    Python evaluation anywhere in the plan."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["zorder_layout_profile"](spark, SF_CORRECT))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the interleave itself is JVM shift/mask arithmetic in the projection
    # (codegen-eligible expressions; no UDF anywhere in the plan)
    assert "shiftleft" in plan and "shiftright" in plan
    assert "pythonUDF" not in plan


def test_incremental_state_merge_has_partial_aggregates(spark):
    """Every aggregate in the state algebra (batch states AND the merge)
    must keep its map-side partial stage — the property that makes the
    daily fold O(delta + state) instead of a full shuffle of raw rows."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["incremental_revenue_state"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    # partial + final pairs: 3 batch states + 1 merge = at least 8 nodes
    assert plan.count("HashAggregate") >= 8


def test_bigram_lm_stays_jvm_side_hash_joins(spark):
    """LM scoring: bigram explosion is a JVM HOF (no Python eval) and
    the model joins are equi-joins — never a cartesian or a broadcast
    of something corpus-sized forced by hint."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    df = all_queries()["bigram_lm_scores"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    logical = str(df._jdf.queryExecution().optimizedPlan().toString())
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_semdedup_pair_test_shuffles_on_cell_never_cartesian(spark):
    """SemDeDup's all-pairs test must be an equi-join on the bounded
    cell id (the clustering IS the blocking) — a cartesian across the
    corpus would be quadratic at scale."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["semdedup_survivors"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "cell" in plan  # pair join keyed on the cluster id


def test_token_budget_cumsum_is_partition_parallel_within_source(spark):
    """The budget cumsum must never give each source a single task: the
    running total is grouped_running_sum's two-phase shape, so every
    Window in the plan partitions by (__pid, source) — a physical range
    partition AND the source — never by source alone (which would
    serialize the dominant source, the '100 B tokens of web' hazard),
    and never by nothing (global single-partition window)."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["token_budget_mix"](spark, SF_CORRECT))
    assert "Window" in plan
    window_lines = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "tokens_before" not in ln and "__local" in ln
    ] or [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    cumsum_lines = [ln for ln in window_lines if "source" in ln]
    assert cumsum_lines, "budget cumsum window not found in plan"
    for ln in cumsum_lines:
        assert "__pid" in ln, (
            "cumsum window partitions by source alone — one task per "
            f"source:\n{ln}"
        )


def test_pq_adc_scoring_is_jvm_side_with_broadcast_queries(spark):
    """The ADC candidate scan must broadcast the per-query LUT frame
    (queries are small by construction) and score with JVM expressions —
    the only Python stages allowed are the Arrow encode UDFs, never a
    per-pair vector kernel. The shortlist re-rank may touch vectors
    again, but no full-corpus cartesian beyond the intended
    broadcast-nested-loop over the bounded query side may appear."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["knn_pq_topk"](spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # the ONLY Python stage is the Arrow encode (codes) — ADC scoring
    # and the exact re-rank are pure JVM expressions, so exactly one
    # ArrowEvalPython may appear in the whole plan
    assert plan.count("ArrowEvalPython") == 1, (
        f"expected exactly the encode UDF, plan has "
        f"{plan.count('ArrowEvalPython')} Python stages"
    )


def test_dup_passage_spans_no_cartesian_and_windows_by_doc(spark):
    """The inverted-index join is an equi-join on the gram key and the
    island merge windows by doc — never a cartesian, never a global
    single-partition window."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["dup_passage_spans"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert "doc_id" in ln, f"window not keyed by doc:\n{ln}"


def test_quality_logit_weights_join_broadcasts(spark):
    """The weights table is O(languages) — it must broadcast; a shuffle
    of the corpus on lang to meet a 5-row table would be absurd at
    scale."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["quality_logit_scores"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_dedup_joins_on_band_key_no_cartesian(spark):
    """The delta-vs-base pair join must be an equi-join on band_key —
    never a cartesian — and the pair filter runs post-join on flags, so
    no plan stage pairs two base rows (the delta side is the build
    side's only source of right-hand rows by construction)."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["incremental_dedup_pairs"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_key" in plan


def test_eval_contamination_broadcasts_eval_grams_into_train_scan(spark):
    """The train-side gram stream must meet the BROADCAST eval gram set
    before any aggregation — the train corpus (the 100 TB side) never
    shuffles; only eval-matching grams do. No cartesian anywhere."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["eval_ngram_contamination"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" in plan  # train grams explode map-side


def test_heavy_hitters_verify_pass_semi_joins_broadcast_candidates(spark):
    """The exact recount must meet the BROADCAST Misra-Gries candidate
    set inside the scan stage, before the count aggregate — the shuffle
    carries candidate postings only, never the vocabulary. No
    vocabulary-wide exchange, no cartesian."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["heavy_hitter_tokens"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # candidate semi/inner join
    # candidate join sits below the final count agg: join -> agg order
    assert plan.index("BroadcastHashJoin") > plan.index("HashAggregate")


def test_ivfpq_routes_by_cell_and_broadcasts_luts(spark):
    """IVF-PQ's candidate generation must be an equi-join on the
    bounded cell id with the query probe side broadcast, and the LUT
    attach an equi-join on query_id — never a corpus-wide nested loop
    (the composed shape inherits both halves' plan guarantees)."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["knn_ivfpq_topk"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell" in plan  # probe join keyed on the cell id
    assert "BroadcastHashJoin" in plan


def test_bm25_postings_semi_join_before_tf_agg(spark):
    """The token explode must meet the broadcast query-term set BEFORE
    the tf aggregation — postings materialize only for queried terms,
    so the shuffle moves O(matching postings), never O(corpus tokens).
    The postings fragment is inspected directly because ``bm25_topk``
    localCheckpoints it (VERDICT r6 #2: one tokenize+explode pass shared
    by dfreq and the scored join) — the checkpoint hides the Generate
    from the final plan, which must instead show the corpus scanned
    exactly once (a single FileScan over documents, the rest reading
    the materialized postings/lens RDDs)."""
    from asritha_metamorphetl_spark.functions import text as T
    from asritha_metamorphetl_spark.operators.retrieval import (
        matched_postings,
    )
    from asritha_metamorphetl_spark.plans.ann_queries import BM25_QUERIES
    from asritha_metamorphetl_spark.plans.registry import all_queries
    from asritha_metamorphetl_spark.sources.files import Catalog

    docs = Catalog(SF_CORRECT).load(spark, "documents")
    toks = docs.select(
        F.col("doc_id"), T.tokens(F.col("text")).alias("t")
    )
    terms = spark.createDataFrame(
        [(qid, t) for qid, ts in BM25_QUERIES for t in ts],
        "query_id int, term string",
    )
    frag = _plan(matched_postings(toks, terms))
    assert "CartesianProduct" not in frag
    assert "BroadcastHashJoin" in frag  # term semi/inner join broadcast
    # the exploded token stream exists (postings come from Generate, not
    # from a pre-aggregated full-vocabulary table)
    assert "Generate explode" in frag
    # BroadcastHashJoin must sit below the final HashAggregate on
    # (doc_id, term): explode -> join -> agg, in that order.
    assert frag.index("BroadcastHashJoin") > frag.index("HashAggregate")

    plan = _plan(all_queries()["bm25_search"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    # no corpus re-scan anywhere in the final plan: postings AND doc
    # lengths are read from their checkpointed RDDs (each tokenizes the
    # corpus exactly once, at materialization)
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan


def test_leakage_free_splits_audit_joins_by_id_no_cartesian(spark):
    """The leak audit joins the O(pairs) frame to the split assignment
    by doc id TWICE — both must be equi-joins; the only nested-loop
    join allowed is the single-row leak-count attach (broadcast of one
    aggregated row). A pair-granularity cartesian would be quadratic in
    the corpus."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["leakage_free_splits"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    # exactly one nested-loop join: the 1-row leaks crossJoin
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_quality_importance_sample_is_row_local_plus_broadcast(spark):
    """The keep decision is a row-local hash compare — the plan must
    show no window over the corpus and no nested-loop join; the only
    small side met is the broadcast per-language weights table inside
    the inherited quality-score fragment."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["quality_importance_sample"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan  # no corpus-wide window anywhere
    assert "BroadcastHashJoin" in plan  # weights join stays broadcast


def test_merge_into_is_one_equi_join_with_delta_side_window(spark):
    """MERGE must move the target exactly once: one full-outer
    SortMergeJoin on the merge keys (the driver hint-free plan at this
    size), zero cartesians, and the ambiguity guard's window must
    partition by the SOURCE image of the key — i.e. ride the delta
    projection, never re-shuffle the target."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["merge_into_orders"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("FullOuter") == 1  # exactly one target-moving join
    # the ambiguity window partitions on the aliased source key image
    assert "__mrg_s_o_orderkey" in plan.split("FullOuter")[1]


def test_weighted_sample_topk_never_globally_sorts(spark):
    """The Efraimidis–Spirakis top-k must run as TakeOrderedAndProject
    (per-partition k-best, driver merge of O(partitions*k) rows) — a
    global Sort over the keyed corpus would be the 100 TB failure. The
    key itself is row-local: no window, no extra join beyond the
    inherited broadcast weights join."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["quality_weighted_sample"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # the only Sort allowed is none: top-k must not plan a global sort
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_skipgram_cooccurrence_is_scan_plus_one_aggregate(spark):
    """Pair generation is a higher-order function inside the scan
    stage: the whole plan must be Generate + ONE partial/final hash
    aggregate pair — no join, no window, exactly one exchange (the
    count shuffle on the pair key)."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["skipgram_cooccurrence"](spark, SF_CORRECT))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") == 1
    assert "Generate explode" in plan


def test_skipgram_pmi_scans_corpus_once(spark):
    """Marginals and the total derive from the aggregated pair table,
    which is localCheckpointed against its FOUR consumers — the final
    plan must re-read the materialized RDD with ZERO parquet re-scans
    (the corpus explodes exactly once, inside the checkpoint's own
    plan); the only nested-loop join allowed is the 1-row total
    attach."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["skipgram_pmi"](spark, SF_CORRECT))
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_countmin_sketch_is_one_bounded_aggregate(spark):
    """The sketch build must be Generate + hash aggregate with a
    partial stage (map-side combine caps the shuffle at depth*width
    rows per task); the estimate side joins the sketch BROADCAST."""
    from asritha_metamorphetl_spark.operators.frequent import countmin_sketch

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    plan = _plan(countmin_sketch(toks, "tok"))
    assert "Generate explode" in plan
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial + final


def test_per_source_sample_shuffles_narrow_rows_only(spark):
    """The per-group rank window must partition by source over the
    narrow (source, doc_id, score, key) projection — the document TEXT
    column must not survive into the exchange feeding the window."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["per_source_weighted_sample"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    win = plan[plan.index("Window") :]
    assert "text#" not in win.splitlines()[0]
    # the window's input exchange carries no text column either
    for line in plan.splitlines():
        if "Exchange hashpartitioning(source" in line:
            assert "text#" not in line


def test_prefix_jaccard_all_equi_joins_one_corpus_pass(spark):
    """The five consumers of the shingle frame must share ONE
    materialization (zero parquet re-scans in the final plan); every
    join is a hash equi-join — a cartesian or nested loop anywhere
    would be corpus² and defeat the prefix filter's whole purpose."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["prefix_jaccard_pairs"](spark, SF_CORRECT))
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_bloom_filter_prunes_probe_side_of_shuffle_join(spark):
    """100 TB shuffle-join hygiene: when a selective dimension filter
    exists, Spark's runtime Bloom filter should be injectable on the
    fact side — the probe rows that cannot join are dropped BEFORE the
    exchange, so the shuffle carries survivors only. The engine keeps
    the feature on (it is threshold-gated in production; thresholds
    are lowered here to exercise the injection at test scale), and
    this gate pins that our plain equi-join shape stays eligible —
    a refactor that blocks injection (e.g. wrapping the join key in a
    non-deterministic expression) fails here."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
        li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
        j = li.join(
            orders.filter(F.col("o_orderstatus") == "P"),
            li.l_orderkey == orders.o_orderkey,
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt  # bloom probe injected on fact side
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_containment_join_prefix_vs_full_index_no_cartesian(spark):
    """Same contract as the Jaccard prefix join: one shingle
    materialization (zero parquet re-scans), hash equi-joins only."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["containment_dup_pairs"](spark, SF_CORRECT))
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_entropy_two_bounded_aggregates_no_window(spark):
    """Entropy is two hash aggregates keyed by (doc, token) then doc —
    both with partial stages; no join, no window, no corpus-wide
    anything."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["token_entropy_scores"](spark, SF_CORRECT))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 2
    assert "partial_" in plan


def test_oov_profile_vocab_joins_broadcast(spark):
    """The top-K vocabulary is a bounded frame — the occurrence stream
    must meet it as a BroadcastHashJoin, never a shuffled join of the
    exploded corpus against 25 rows."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["oov_rate_profile"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_robust_outliers_window_on_narrow_rows(spark):
    """The rank window partitions by lang over (id, lang, len) — the
    text column must not survive into the window input; the quartile
    side re-joins as a broadcast of O(languages) rows."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["robust_length_outliers"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    win = plan[plan.index("Window") :]
    assert "text#" not in win.splitlines()[0]
    assert "BroadcastHashJoin" in plan


def test_quality_dup_calibration_id_joins_only(spark):
    """Both composed fragments join by doc id; the decile is row-local
    (no ntile/rank window over the corpus) — the only window allowed
    is inside the inherited MinHash fragment, which windows per-doc."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["quality_vs_dup_calibration"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "ntile" not in plan and "percent_rank" not in plan


def test_table_profile_is_one_scan_one_collapse(spark):
    """The numeric stats (counts, nulls, distincts, long min/max) must
    come from ONE scan of the table; the round-13 split allows exactly
    one MORE column-pruned scan for the keyless string-min/max side
    (its ReadSchema must list only the string columns) — the price of
    keeping the main multi-distinct Expand pipeline on HashAggregate.
    No standalone Sort may appear anywhere (the old one-scan shape
    sort-aggregated the expanded frame three times), no window, and
    the only join is the broadcast of the one-row string side."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["orders_table_profile"](spark, SF_CORRECT))
    assert plan.count("Scan parquet") == 2
    assert "Sort " not in plan.replace("SortAggregate", "XAggregate")
    assert "Window" not in plan
    # the string side scans ONLY the two string columns
    import re

    # explain() truncates long schemas, so test by exclusion: one scan
    # must NOT read the numeric columns at all.
    schemas = re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
    assert any(
        "o_orderstatus" in s and "o_orderkey" not in s and "o_totalprice" not in s
        for s in schemas
    ), schemas


def test_merged_intervals_windows_per_user_only(spark):
    """Both islands windows (running max of ends, island counter) must
    partition by user_id — never an unpartitioned window — and the
    whole query is windows + two aggregates, no join."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["merged_event_intervals"](spark, SF_CORRECT))
    assert "Join" not in plan
    assert "SinglePartition" not in plan
    for seg in plan.split("Window")[1:]:
        first = seg.splitlines()[0]
        if "partitionBy" in first or "user_id" in first:
            assert "user_id" in first


def test_grouped_percent_rank_never_single_partitions(spark):
    """The per-group rank variant must have NO SinglePartition stage at
    all (its windows partition by the group over the collapsed frame)
    and no window over raw corpus rows — the raw side only joins."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["quality_score_percentiles"](spark, SF_CORRECT))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    # every Window partitions by lang
    for seg in plan.split("Window ")[1:]:
        assert "lang" in seg.splitlines()[0]


def test_gram_moments_one_scan_one_python_stage(spark):
    """The distributed second-moment sweep must read the corpus ONCE
    through exactly one Arrow-batched Python stage (the d×d partial
    accumulator) and never join or explode at row granularity — the
    shuffle above it carries only the O(partitions·d²) moment rows."""
    from asritha_metamorphetl_spark.operators.linalg import gram_moments

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    plan = _plan(gram_moments(emb, "embedding", 64))
    assert plan.count("MapInPandas") == 1
    assert plan.count("FileScan") == 1
    assert "Join" not in plan and "Generate" not in plan


def test_covariance_final_plan_stays_on_bounded_frames(spark):
    """embedding_covariance_matrix: the checkpointed moment frame is the
    only input (no second corpus scan) and every join over it is a
    broadcast — a sort-merge join over a d²-row frame would mean the
    planner lost the boundedness."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["embedding_covariance_matrix"](spark, SF_CORRECT))
    assert plan.count("FileScan") == 0
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan


def test_pca_projection_scan_is_pure_jvm(spark):
    """pca_power_projection's returned frame: the dense algebra already
    happened driver-side, so the scan must be ONE parquet read with the
    centered dot product as JVM expressions (no Python stage of any
    kind) feeding TakeOrderedAndProject — never a global sort."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["pca_power_projection"](spark, SF_CORRECT))
    assert plan.count("FileScan") == 1
    for python_stage in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert python_stage not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_pagerank_query_iterates_behind_checkpoints(spark):
    """part_copurchase_pagerank: lineitem is read only while building
    the checkpointed transition frame; the returned plan reads the
    iterated rank RDD (no parquet re-scan), broadcasts the O(1)-row
    count, and top-ks via TakeOrderedAndProject."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["part_copurchase_pagerank"](spark, SF_CORRECT))
    assert plan.count("FileScan") == 0
    assert "Scan ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_triangle_rank_no_cartesian_and_reused_orientation(spark):
    """copurchase_triangle_rank: wedge generation and closure are hash
    equi-joins (center key, endpoint pair) — a CartesianProduct or
    broadcast nested loop would mean the orientation trick was lost.
    The oriented edge frame is checkpointed once and feeds all three
    consumers, so the lineitem self-join is not replayed per stage."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["copurchase_triangle_rank"](spark, SF_CORRECT))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan


def test_hll_register_table_one_shuffle_partial_max(spark):
    """hll_register_table: the register build is ONE map-side-combining
    MAX aggregate — a partial_max below a single exchange, no Python
    stage anywhere. The shuffle carries at most groups × 64 partial
    rows per task (the sketch state), never the distinct ids — the
    whole point of HLL vs COUNT(DISTINCT) at 100 TB."""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["hll_register_table"](spark, SF_CORRECT))
    assert "partial_max" in plan
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_join_view_broadcasts_deltas(spark):
    """incremental_join_view: every delta-join term broadcasts its
    delta side — three BroadcastHashJoins, so the base-table scans
    never shuffle for the refresh. (The old⋈old term is the stored
    view in production; here it is recomputed only to prove parity.)"""
    from asritha_metamorphetl_spark.plans.registry import all_queries

    plan = _plan(all_queries()["incremental_join_view"](spark, SF_CORRECT))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
