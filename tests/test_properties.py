"""Property-based checks (SURVEY §5 plan, item 5) over small generated
frames: reconcile/dedup/rank invariants that must hold for ANY input."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # id (may repeat)
        st.text(alphabet="abcde ", max_size=8),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-1e6, max_value=1e6)),
    ),
    min_size=0,
    max_size=25,
)

_SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs — keep the loop tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_reconcile_identical_frames_always_match(spark, rows):
    """reconcile(df, df) must report zero mismatches for any keyed frame."""
    from asritha_metamorphetl_spark.quality import reconcile

    df = (
        spark.createDataFrame(rows, "id int, name string, amount double")
        .groupBy("id")
        .agg(F.max("name").alias("name"), F.max("amount").alias("amount"))
    )
    if df.count() == 0:
        return
    r = reconcile(df, df, ["id"])
    s = r.summary.collect()[0]
    assert s.mismatched_rows == 0
    assert s.source_only_rows == 0 and s.target_only_rows == 0
    assert s.matched_rows == s.source_rows == s.target_rows
    r.unpersist()


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_dup_check_equivalent_to_distinct_count(spark, rows):
    """has-duplicates ⇔ count(distinct key) < count(*) (SURVEY §5)."""
    from asritha_metamorphetl_spark.quality import DuplicateKeyError, assert_unique

    df = spark.createDataFrame(rows, "id int, name string, amount double")
    n, nd = df.count(), df.select("id").distinct().count()
    try:
        assert_unique(df, ["id"])
        unique = True
    except DuplicateKeyError:
        unique = False
    assert unique == (n == nd)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_exact_dedup_partition_invariance(spark, rows):
    """Exact dedup groups must be identical at any partition count."""
    from asritha_metamorphetl_spark.operators.dedup import exact_duplicates

    df = spark.createDataFrame(rows, "id int, name string, amount double")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())

    def canon(frame):
        return sorted(
            (r.fp, r.canonical_id, r.n_dupes)
            for r in exact_duplicates(frame, "name", "doc_id").collect()
        )

    assert canon(df.repartition(1)) == canon(df.repartition(7))


def test_approx_count_distinct_within_tolerance(spark):
    """Sketch path for 100 TB cardinalities: HLL++ must land within its
    configured relative error of the exact count (the exact path is the
    oracle-checked default; the sketch is the opt-in for cases where a
    shuffle-free estimate beats an exact Expand)."""
    import pyspark.sql.functions as F

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_exact_sum_partition_invariant(spark, rows):
    """Decimal-quantized money sums must be bit-identical at any
    partition count — the README's core correctness claim (double sums
    are partition-order-dependent; decimal sums are associative)."""
    from asritha_metamorphetl_spark.functions.numeric import exact_sum

    df = spark.createDataFrame(rows, "id int, name string, amount double")

    def total(frame):
        return frame.agg(exact_sum(F.col("amount"), "t")).collect()[0].t

    assert total(df.repartition(1)) == total(df.repartition(13))


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_global_percent_rank_matches_window(spark, rows):
    """The scale-safe distinct-value rewrite must equal the reference's
    unpartitioned percent_rank window for ANY input, including ties and
    NULL-free frames of any size."""
    from pyspark.sql import Window

    from asritha_metamorphetl_spark.operators.ranks import global_percent_rank

    df = spark.createDataFrame(rows, "id int, name string, amount double").filter(
        F.col("amount").isNotNull()
    )
    if df.count() == 0:
        return
    ours = global_percent_rank(df, F.col("amount"), descending=True)
    ref = df.withColumn(
        "ref_pr", F.percent_rank().over(Window.orderBy(F.col("amount").desc()))
    )
    got = sorted((r.id, r.amount, round(r.percent_rank, 12)) for r in ours.collect())
    want = sorted((r.id, r.amount, round(r.ref_pr, 12)) for r in ref.collect())
    assert got == want


cdc_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),    # key
        st.sampled_from(["I", "U", "D"]),          # op
        st.integers(min_value=0, max_value=60),    # payload value
    ),
    min_size=0,
    max_size=20,
)


@given(ops=cdc_strategy)
@settings(**_SETTINGS)
def test_cdc_apply_matches_reference_model(spark, ops):
    """cdc_apply == a sequential dict replay of the changelog (unique
    seqs assigned by position), for any base overlap."""
    from pyspark.sql import Row

    from asritha_metamorphetl_spark.operators.cdc import cdc_apply

    base_rows = [Row(k=k, v=k * 100) for k in range(0, 5)]
    base = spark.createDataFrame(base_rows, schema="k int, v int")
    log_rows = [
        Row(k=k, v=v, op=op, seq=i) for i, (k, op, v) in enumerate(ops)
    ]
    # reference: replay in seq order over a dict
    model = {r.k: r.v for r in base_rows}
    for k, op, v in ops:
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    log = spark.createDataFrame(
        log_rows, schema="k int, v int, op string, seq int"
    )
    got = {
        r.k: r.v for r in cdc_apply(base, log, keys=["k"]).collect()
    }
    assert got == model


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-1000, 1000)),
        min_size=1, max_size=30,
    ),
    cut=st.integers(min_value=0, max_value=30),
)
@settings(**_SETTINGS)
def test_incremental_state_split_invariance(spark, vals, cut):
    """state(all) == merge(state(head), state(tail)) for any split."""
    from asritha_metamorphetl_spark.operators.incremental import (
        agg_state,
        merge_agg_states,
    )

    cut = min(cut, len(vals))
    schema = "k int, v int"
    full = spark.createDataFrame(vals, schema=schema)
    want = sorted(agg_state(full, ["k"], "v").collect())
    head = spark.createDataFrame(vals[:cut] or [], schema=schema)
    tail = spark.createDataFrame(vals[cut:] or [], schema=schema)
    got = sorted(
        merge_agg_states(
            agg_state(head, ["k"], "v"), agg_state(tail, ["k"], "v")
        ).collect()
    )
    assert got == want


snapshot_ops = st.lists(
    st.tuples(
        st.sampled_from(["append", "overwrite"]),
        st.integers(min_value=1, max_value=5),  # batch size
    ),
    min_size=1,
    max_size=5,
)


@given(ops=snapshot_ops)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_snapshot_table_matches_model(spark, ops, tmp_path_factory):
    """Random append/overwrite sequences: every historical version reads
    back exactly what a python list model says it contained."""
    from pyspark.sql import Row

    from asritha_metamorphetl_spark.sources.manifest import SnapshotTable

    root = str(tmp_path_factory.mktemp("snap"))
    t = SnapshotTable(spark, root)
    model: list[list[int]] = []  # model[v-1] = sorted keys at version v
    next_key = 0
    for mode, size in ops:
        keys = list(range(next_key, next_key + size))
        next_key += size
        df = spark.createDataFrame([Row(k=k) for k in keys])
        t.commit(df, mode=mode)
        prev = model[-1] if (model and mode == "append") else []
        model.append(sorted(prev + keys))
    assert t.versions() == list(range(1, len(model) + 1))
    for v, want in enumerate(model, start=1):
        got = sorted(r.k for r in t.read(version=v).collect())
        assert got == want, (v, got, want)


# -- Bucketed CDC table fuzz: random changelog batches through the
# bucketed fold must equal the plain cdc_merge_batch fold, for ANY
# batch split, op mix, and bucket count (layout never changes state).

cdc_batches_strategy = st.lists(  # a history of micro-batches
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),          # key
            st.sampled_from(["I", "U", "D"]),                # op
            st.integers(min_value=0, max_value=50),          # seq
        ),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=4,
)


@given(
    batches=cdc_batches_strategy,
    n_buckets=st.sampled_from([1, 3, 8]),
    rebucket_to=st.sampled_from([None, 1, 2, 5]),
    rebucket_after=st.integers(min_value=0, max_value=3),
)
@settings(**_SETTINGS)
def test_bucketed_fold_equals_plain_fold_for_any_history(
    spark, tmp_path_factory, batches, n_buckets, rebucket_to, rebucket_after
):
    from pyspark.sql import Row

    from asritha_metamorphetl_spark.operators.cdc import cdc_merge_batch
    from asritha_metamorphetl_spark.sources.bucketed import BucketedCdcTable

    root = str(tmp_path_factory.mktemp("fuzz") / "tbl")
    t = BucketedCdcTable(spark, root, keys=["k"], n_buckets=n_buckets)
    model = None
    schema = "k int, val string, op string, seq int"
    for i, batch in enumerate(batches):
        # a mid-history rebucket is layout-only: the fold must be
        # unaffected wherever it lands (including before any data, and
        # to a count equal to the current one)
        if rebucket_to is not None and i == rebucket_after:
            t.rebucket(rebucket_to)
        rows = [Row(k=k, val=f"v{k}.{s}", op=o, seq=s) for k, o, s in batch]
        df = spark.createDataFrame(rows, schema)
        t.merge_delta(df)
        model = cdc_merge_batch(model, df, keys=["k"])

    # duplicate (k, seq) pairs make the max_by winner unspecified — keep
    # only histories where the fold is deterministic for the compare
    from collections import Counter

    pair_counts = Counter((k, s) for b in batches for k, _, s in b)
    if any(v > 1 for v in pair_counts.values()):
        return

    got = {(r.k): (r.op, r.seq) for r in t.read().collect()} if t.versions() and t.read().columns else {}
    want = {(r.k): (r.op, r.seq) for r in model.collect()} if model is not None else {}
    assert got == want
