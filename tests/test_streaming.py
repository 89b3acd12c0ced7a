"""Streaming plumbing tests: drive each transformation with a bounded
in-memory stream (per-file parquet source), process-all, and check results
against the batch twin where one exists."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_stream_factory(spark, tmp_path_factory):
    """readStream over the sf0.001 events parquet (1 file = 1 micro-batch).
    The file-stream source requires a directory, so stage the file."""
    import shutil

    stream_dir = tmp_path_factory.mktemp("event_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", stream_dir / "events.parquet")
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    schema = batch.schema

    def make():
        from asritha_metamorphetl_spark.sources.files import Catalog

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )
        # same ts normalization sources.files.Catalog applies (long nanos
        # or TIMESTAMP_NTZ → session-tz timestamp, whichever the file is)
        return Catalog._normalize_events_ts(stream)

    return make


def _run_to_completion(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.table(name)


def test_hourly_counts_match_batch(spark, event_stream_factory, tmp_path):
    from asritha_metamorphetl_spark.streaming import hourly_event_counts

    got = _run_to_completion(
        hourly_event_counts(event_stream_factory()), tmp_path, "hourly"
    )
    from asritha_metamorphetl_spark.sources.files import Catalog

    want = (
        Catalog(SF_SMOKE).load(spark, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    diff = got.select("window_start", "event_type", "n_events").exceptAll(want)
    assert diff.count() == 0
    assert got.count() == want.count()


def test_sessionized_stream_runs(spark, event_stream_factory, tmp_path):
    from asritha_metamorphetl_spark.streaming import sessionized_stream

    got = _run_to_completion(
        sessionized_stream(event_stream_factory()), tmp_path, "sessions"
    )
    rows = got.collect()
    assert rows
    # session windows must be disjoint per user (checked driver-side: the
    # memory-sink table can't self-join — conflicting attribute refs)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 <= s2, f"overlapping sessions: {(s1, e1)} vs {(s2, _e2)}"


def test_sliding_stats_runs(spark, event_stream_factory, tmp_path):
    from asritha_metamorphetl_spark.streaming import sliding_event_stats

    got = _run_to_completion(
        sliding_event_stats(event_stream_factory()), tmp_path, "sliding"
    )
    # each event lands in 4 overlapping 1h/15m windows → more window rows
    # than tumbling; sanity check bounds only
    assert got.count() > 0
    bad = got.filter(F.col("min_value") > F.col("max_value"))
    assert bad.count() == 0


def test_snapshot_stream_dual_write(spark, event_stream_factory, tmp_path):
    from asritha_metamorphetl_spark.streaming import snapshot_stream

    raw = str(tmp_path / "raw")
    legacy = str(tmp_path / "legacy")
    q = (
        snapshot_stream(event_stream_factory(), raw, legacy)
        .option("checkpointLocation", str(tmp_path / "ckpt_snap"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    raw_df = spark.read.parquet(raw)
    legacy_df = spark.read.parquet(legacy)
    assert raw_df.count() == n_events  # single micro-batch → full overwrite
    assert legacy_df.count() == n_events
    assert "day_dt" in legacy_df.columns  # snapshot column + partition


def test_stateful_user_tracker(spark, event_stream_factory, tmp_path):
    """Portable stateful path: foreachBatch-managed state table, verified
    against a batch groupBy. (The native applyInPandasWithState /
    transformWithStateInPandas paths cannot run in this container:
    google.protobuf is absent and the state-commit path stalls — see
    streaming/stateful.py docstring.)"""
    from asritha_metamorphetl_spark.sources.files import Catalog
    from asritha_metamorphetl_spark.streaming.stateful import batch_managed_tracker

    state_dir = str(tmp_path / "state")
    stream = event_stream_factory().select("user_id", "ts", "value")
    q = (
        batch_managed_tracker(stream, state_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {r.user_id: r for r in spark.read.parquet(state_dir).collect()}
    want = {
        r.user_id: r
        for r in Catalog(SF_SMOKE)
        .load(spark, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        assert got[uid].n_events == w.n
        assert got[uid].total_value == w.total  # exact decimal state


def test_stream_static_enrich(spark, event_stream_factory, tmp_path):
    from asritha_metamorphetl_spark.streaming import stream_static_enrich

    dim = spark.createDataFrame(
        [("click", "interactive"), ("view", "passive")],
        "event_type string, kind string",
    )
    enriched = stream_static_enrich(event_stream_factory(), dim, "event_type")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("enriched")
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert got.count() == batch.count()  # left join keeps every event
    # joined attribute present exactly for the mapped types
    assert got.filter(
        (F.col("event_type") == "click") & (F.col("kind") != "interactive")
    ).count() == 0
    assert got.filter(F.col("kind").isNull()).count() == got.filter(
        ~F.col("event_type").isin("click", "view")
    ).count()


def test_streaming_dedup(spark, event_stream_factory, tmp_path):
    from asritha_metamorphetl_spark.streaming import streaming_dedup

    deduped = streaming_dedup(event_stream_factory(), ["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("deduped")
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    # per-KEY dedup: one row per event_id even when duplicate arrivals
    # carry different timestamps
    want = batch.dropDuplicates(["event_id"]).count()
    assert got.count() == want
    assert got.groupBy("event_id").count().filter("count > 1").count() == 0


def test_transform_with_state_totals_match_batch(spark, tmp_path_factory):
    """transformWithState per-user totals, driven across TWO micro-batches,
    must equal the batch groupBy on the union of both (exact integer-cent
    comparison — state survives batch boundaries)."""
    import shutil

    import pytest

    from asritha_metamorphetl_spark.sources.files import Catalog
    from asritha_metamorphetl_spark.streaming.stateful import (
        tws_available,
        user_totals_tws,
    )

    if not tws_available():
        pytest.skip(
            "transformWithState needs protobuf for its Python runner; "
            "not installed in this environment"
        )

    src = Catalog(SF_SMOKE).load(spark, "events")
    half1 = src.filter(F.col("event_id") % 2 == 0)
    half2 = src.filter(F.col("event_id") % 2 == 1)

    stream_dir = tmp_path_factory.mktemp("tws_stream")
    ckpt = str(tmp_path_factory.mktemp("tws_ckpt"))
    half1.coalesce(1).write.mode("overwrite").parquet(str(stream_dir / "b1"))

    old_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        schema = half1.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stream_dir}/*")
        )
        out = user_totals_tws(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "first tws batch timed out"
        q.stop()
        # second batch lands, resume from the checkpointed state
        half2.coalesce(1).write.mode("overwrite").parquet(str(stream_dir / "b2"))
        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stream_dir}/*")
        )
        out2 = user_totals_tws(stream2)
        q2 = (
            out2.writeStream.format("memory")
            .queryName("tws_totals2")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q2.awaitTermination(120), "second tws batch timed out"
        q2.stop()

        got = {
            r["user_id"]: (r["n_events"], r["total_cents"])
            for r in spark.table("tws_totals2").collect()
        }
        expect = {
            r["user_id"]: (r["n"], r["cents"])
            for r in src.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "cents"
                ),
            )
            .collect()
        }
        assert got, "streaming produced no updates"
        for uid, (n, cents) in got.items():
            assert expect[uid] == (n, cents)
    finally:
        if old_provider is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        shutil.rmtree(ckpt, ignore_errors=True)


def test_foreachbatch_retry_semantics_by_algebra(spark, tmp_path):
    """At-least-once discipline, tested by actually replaying a batch:
    the HLL fold (APPEND + max) absorbs a duplicate partial unchanged,
    while naively APPENDING a sum partial double-counts — which is why
    the sum algebras (Count-Min, Gram) must OVERWRITE their own
    batch_id partition, and replaying one leaves them unchanged too."""
    import pyspark.sql.functions as FF

    from asritha_metamorphetl_spark.operators.frequent import hll_registers

    df = spark.range(1000).select(F.col("id").cast("long").alias("x"))

    # idempotent-max path: append the same partial twice
    hdir = str(tmp_path / "hll")
    part = hll_registers(df, "x")
    part.write.mode("append").parquet(hdir)
    part.write.mode("append").parquet(hdir)  # the retry
    folded = {
        r["bucket"]: r["register"]
        for r in spark.read.parquet(hdir)
        .groupBy("bucket")
        .agg(FF.max("register").alias("register"))
        .collect()
    }
    once = {r["bucket"]: r["register"] for r in part.collect()}
    assert folded == once

    # sum path, overwrite discipline: replaying batch 7 overwrites its
    # own partition — fold unchanged; a plain append would double it
    sdir = str(tmp_path / "sums")
    sums = df.groupBy((F.col("x") % 10).alias("k")).agg(
        F.sum("x").alias("val")
    )
    sums.write.mode("overwrite").parquet(f"{sdir}/batch_id=7")
    sums.write.mode("overwrite").parquet(f"{sdir}/batch_id=7")  # retry
    total = (
        spark.read.parquet(sdir).agg(F.sum("val").alias("t")).first()["t"]
    )
    assert total == df.agg(F.sum("x")).first()[0]


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Kill-and-restart: a second availableNow run over the SAME
    checkpoint processes only files that arrived after the first run —
    no reprocessing (batch partials stay unique) — and the folded state
    equals the one-shot batch answer over everything."""
    import os

    import pyspark.sql.functions as FF

    from asritha_metamorphetl_spark.operators.frequent import hll_registers
    from asritha_metamorphetl_spark.streaming.windows import (
        hll_registers_stream,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    whole = spark.range(3000).select(F.col("id").cast("long").alias("x"))
    for i in range(2):
        whole.filter(F.col("x") % 3 == i).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )

    def run():
        stream = (
            spark.readStream.schema("x long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*/")
        )
        q = (
            hll_registers_stream(stream, state, "x", ())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run()
    n_first = len(
        [f for f in os.listdir(state) if f.endswith(".parquet")]
    )
    whole.filter(F.col("x") % 3 == 2).coalesce(1).write.parquet(f"{src}/f2")
    run()  # restart from the same checkpoint
    n_second = len(
        [f for f in os.listdir(state) if f.endswith(".parquet")]
    )
    assert n_first == 2 and n_second == 3  # only the new file processed

    folded = {
        r["bucket"]: r["register"]
        for r in spark.read.parquet(state)
        .groupBy("bucket")
        .agg(FF.max("register").alias("register"))
        .collect()
    }
    once = {
        r["bucket"]: r["register"]
        for r in hll_registers(whole, "x").collect()
    }
    assert folded == once


def test_last_value_fold_retry_same_batch_id(spark, tmp_path):
    """foreachBatch's at-least-once contract: batch n's state write
    succeeded but the checkpoint commit didn't, so batch n is
    re-delivered. The fold must (a) not lazily read the batch_id=<n>
    partition its own overwrite is deleting (FileNotFound / lost
    state) and (b) reproduce the exact same state. Calling the fold
    twice with the SAME batch_id simulates the retry precisely."""
    from asritha_metamorphetl_spark.streaming.windows import (
        fold_last_value_batch,
    )

    state = str(tmp_path / "state")
    seed = spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 20)], "k string, ord int, v int"
    )
    seed.coalesce(1).write.parquet(f"{state}/batch_id=-1")
    batch = spark.createDataFrame(
        [("a", 2, 11), ("c", 1, 30)], "k string, ord int, v int"
    )
    fold_last_value_batch(batch, 0, state, ["k"], ["ord"])
    first = sorted(
        (r["k"], r["ord"], r["v"])
        for r in spark.read.parquet(f"{state}/batch_id=0").collect()
    )
    # the retry: same batch_df, same batch_id, state already present
    fold_last_value_batch(batch, 0, state, ["k"], ["ord"])
    second = sorted(
        (r["k"], r["ord"], r["v"])
        for r in spark.read.parquet(f"{state}/batch_id=0").collect()
    )
    assert first == second == [("a", 2, 11), ("b", 1, 20), ("c", 1, 30)]


def test_weighted_sample_fold_retry_same_batch_id(spark, tmp_path):
    """Same retry contract for the order-statistics fold: re-running
    batch n folds from batch n-1's state, never its own half-committed
    partition, and lands an identical top-k."""
    import pyspark.sql.functions as FF

    from asritha_metamorphetl_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )
    from asritha_metamorphetl_spark.streaming.windows import (
        fold_weighted_sample_batch,
    )

    state = str(tmp_path / "state")
    base = spark.range(0, 50).select(
        FF.col("id").alias("doc_id"), FF.lit(1.0).alias("w")
    )
    weighted_sample_without_replacement(
        base, "w", "doc_id", 5
    ).coalesce(1).write.parquet(f"{state}/batch_id=-1")
    batch = spark.range(50, 80).select(FF.col("id").alias("doc_id"))

    def wfn(df):
        return df.withColumn("w", FF.lit(1.0))

    fold_weighted_sample_batch(batch, 0, state, wfn, "doc_id", 5)
    first = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{state}/batch_id=0").collect()
    )
    fold_weighted_sample_batch(batch, 0, state, wfn, "doc_id", 5)
    second = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{state}/batch_id=0").collect()
    )
    assert first == second and len(first) == 5


def test_ingest_dedup_fold_backfill_path_matches_broadcast_path(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12: the fold's small-batch fast path (broadcast join +
    coalesce(1) append) is guarded by BROADCAST_MAX_BAND_ROWS; a batch
    over the threshold — a backfill replayed through the streaming
    fold — takes the shuffled join + parallel append instead. Both
    paths must produce the identical accumulated pair set."""
    import pyspark.sql.functions as FF

    from asritha_metamorphetl_spark.operators.dedup import lsh_banded
    from asritha_metamorphetl_spark.streaming import windows as W

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    base = docs.filter(FF.col("doc_id") % 3 == 0)
    batch = docs.filter(FF.col("doc_id") % 3 != 0)

    results = {}
    for label, threshold in (("fast", None), ("backfill", 0)):
        root = tmp_path / label
        band_dir, pairs_dir = str(root / "bands"), str(root / "pairs")
        lsh_banded(base, "text", "doc_id").write.parquet(band_dir)
        spark.createDataFrame(
            [], "doc_lo bigint, doc_hi bigint"
        ).write.parquet(pairs_dir)
        if threshold is not None:
            monkeypatch.setattr(W, "BROADCAST_MAX_BAND_ROWS", threshold)
        else:
            monkeypatch.undo()
        W.fold_incremental_dedup_batch(
            batch, band_dir, pairs_dir, "text", "doc_id"
        )
        results[label] = sorted(
            (r["doc_lo"], r["doc_hi"])
            for r in spark.read.parquet(pairs_dir).distinct().collect()
        )
        band_rows = spark.read.parquet(band_dir).count()
        results[f"{label}_bands"] = band_rows
    assert results["fast"] == results["backfill"]
    assert results["fast_bands"] == results["backfill_bands"]
