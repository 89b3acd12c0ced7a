"""Round-8 operator tests: alpha-by-m HLL bias constants, the capped
Bloom build, and broadcast lifecycle hygiene."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


class TestHllAlpha:
    def test_alpha_tracks_register_count(self):
        from asritha_metamorphetl_spark.operators.frequent import hll_alpha

        assert hll_alpha(16) == 0.673
        assert hll_alpha(32) == 0.697
        assert hll_alpha(64) == 0.709
        # the asymptotic formula from m=128 up
        assert hll_alpha(128) == pytest.approx(0.7213 / (1 + 1.079 / 128))
        assert hll_alpha(1024) == pytest.approx(0.72054, abs=1e-4)
        assert hll_alpha(65536) == pytest.approx(0.7213, abs=1e-4)

    def test_estimate_uses_alpha_for_its_m(self, spark):
        """At p=10 the estimate must be built from alpha_1024, not
        alpha_64 — using alpha_64 biases every estimate ~1.6% low.
        Reconstruct alpha from the emitted (hll_est, inv_numer) pair."""
        from asritha_metamorphetl_spark.operators.frequent import (
            HLL_HASH_BITS,
            hll_alpha,
            hll_estimate,
            hll_registers,
        )

        p = 10
        m = 1 << p
        df = spark.range(0, 20000).select(F.col("id").alias("x"))
        regs = hll_registers(df, "x", p=p)
        row = hll_estimate(regs, (), p=p).first()
        dp = HLL_HASH_BITS - p + 1
        implied_alpha = row["hll_est"] * row["inv_numer"] / (
            (m * m) * (1 << dp)
        )
        assert implied_alpha == pytest.approx(hll_alpha(m), rel=1e-9)
        assert implied_alpha != pytest.approx(0.709, rel=1e-3)


class TestBloomCap:
    def test_build_caps_bitset_and_keeps_no_false_negatives(self, spark):
        """max_bits bounds the driver-side bitset regardless of build
        cardinality; membership stays false-negative-free at the cap."""
        from asritha_metamorphetl_spark.operators.frequent import (
            bloom_build,
            bloom_candidates,
        )

        members = spark.range(0, 5000).select(F.col("id").alias("k"))
        # 16 bits/key * 5000 = 80k bits would be uncapped; force the cap
        words, m, n_build = bloom_build(members, "k", max_bits=1024)
        assert m == 1024 and n_build == 5000
        assert len(words) == 1024 // 64
        probe = spark.range(0, 6000).select(F.col("id").alias("k"))
        kept = {r["k"] for r in bloom_candidates(probe, "k", words, m).collect()}
        # every true member survives; at 5000 keys in 1024 bits the
        # filter is saturated, so pruning (not correctness) degrades
        assert set(range(5000)) <= kept

    def test_uncapped_default_unchanged(self, spark):
        from asritha_metamorphetl_spark.operators.frequent import bloom_build

        members = spark.range(0, 1000).select(F.col("id").alias("k"))
        words, m, n_build = bloom_build(members, "k")
        assert m == 16 * 1000 and n_build == 1000


class TestManagedBroadcasts:
    def test_no_broadcast_accumulation_across_repeated_calls(self, spark):
        """10 successive pq_adc_topk invocations, each scoped: every
        broadcast minted for a call is unpersisted when its scope ends,
        so repeated-invocation sessions hold O(1) broadcast state
        instead of accumulating codebooks (similarity.py lifecycle
        contract)."""
        from asritha_metamorphetl_spark.operators.similarity import (
            managed_broadcasts,
            pq_adc_topk,
        )

        emb = (
            spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .limit(120)
            .cache()
        )
        emb.count()
        queries = emb.filter(F.col("vec_id") < 3)
        first_n = None
        for i in range(10):
            with managed_broadcasts(destroy=True) as scope:
                out = pq_adc_topk(
                    emb, queries, "vec_id", "embedding", k=3, m=2, ncodes=4
                )
                assert out.count() > 0  # action INSIDE the scope
                n = len(scope.handles)
            assert n > 0  # the operator does mint broadcasts
            if first_n is None:
                first_n = n
            assert n == first_n  # per-call, not cumulative
            for h in scope.handles:
                assert not h._jbroadcast.isValid()  # destroyed on exit
        emb.unpersist()

    def test_unregistered_outside_scope(self, spark):
        import numpy as np

        from asritha_metamorphetl_spark.operators.similarity import (
            _collector_stack,
            broadcast_centroids,
        )

        assert _collector_stack() == []
        h = broadcast_centroids(spark, np.eye(2))
        assert h._jbroadcast.isValid()  # no scope -> caller owns it
        h.destroy()


def test_broadcast_scopes_are_thread_local(spark):
    """Spark drivers submit jobs from multiple threads; a scope opened
    on thread B must NOT capture (and later unpersist) a broadcast
    minted by thread A for a still-lazy plan."""
    import threading

    import numpy as np

    from asritha_metamorphetl_spark.operators.similarity import (
        broadcast_centroids,
        managed_broadcasts,
    )

    captured = {}
    ready = threading.Event()
    release = threading.Event()

    def scoped_thread():
        with managed_broadcasts() as scope:
            ready.set()
            release.wait(timeout=30)
            captured["handles"] = list(scope.handles)

    t = threading.Thread(target=scoped_thread)
    t.start()
    ready.wait(timeout=30)
    # main thread mints a broadcast while B's scope is open
    h = broadcast_centroids(spark, np.eye(2))
    release.set()
    t.join(timeout=30)
    assert captured["handles"] == []  # B's scope never saw A's handle
    assert h._jbroadcast.isValid()  # and A's broadcast survived B's exit
    h.destroy()
