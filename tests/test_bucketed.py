"""Bucketed CDC state tables: O(delta) upserts that rewrite only
delta-touched hash buckets, carrying untouched bucket directories
forward untouched — the scale-safe streaming MERGE."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.cdc import cdc_live, cdc_merge_batch
from asritha_metamorphetl_spark.sources.bucketed import BucketedCdcTable


def _log(spark, rows):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("val", StringType()),
            StructField("op", StringType()),
            StructField("seq", IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


B1 = [
    Row(k=1, val="a", op="U", seq=1),
    Row(k=2, val="b", op="U", seq=2),
    Row(k=3, val="c", op="U", seq=3),
    Row(k=4, val="d", op="U", seq=4),
]
B2 = [
    Row(k=1, val="a2", op="U", seq=5),
    Row(k=2, val=None, op="D", seq=6),
]
B3 = [
    Row(k=5, val="e", op="I", seq=7),
    Row(k=3, val="c0", op="U", seq=1),  # stale: must lose to seq=3
]


def _full_merge(spark, *batches):
    state = None
    for rows in batches:
        state = cdc_merge_batch(state, _log(spark, rows), keys=["k"])
    return state


def _state_dict(df):
    return {
        r.k: (r.val, r.op, r.seq) for r in df.collect()
    }


def test_bucketed_merge_equals_full_merge(spark, tmp_path):
    """The headline invariant: folding batches through the bucketed
    table yields byte-for-byte the same state as the unbucketed
    cdc_merge_batch fold — bucketing is layout, not semantics."""
    t = BucketedCdcTable(spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=4)
    for rows in (B1, B2, B3):
        t.merge_delta(_log(spark, rows))
    assert _state_dict(t.read()) == _state_dict(_full_merge(spark, B1, B2, B3))
    # and the live view drops exactly the tombstone
    assert set(r.k for r in cdc_live(t.read()).collect()) == {1, 3, 4, 5}


def test_untouched_buckets_carry_forward_not_rewritten(spark, tmp_path):
    """A batch touching a strict subset of buckets must leave every
    other bucket's directory entry AND files untouched."""
    t = BucketedCdcTable(spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=8)
    v1 = t.merge_delta(_log(spark, B1))
    m1 = t._buckets_map(v1)

    # a single-key delta touches exactly one bucket
    delta = _log(spark, [Row(k=1, val="z", op="U", seq=9)])
    touched_bucket = str(
        delta.select(t.bucket_of(F.col("k")).alias("b")).first().b
    )
    before = {
        bid: sorted(
            (p, os.path.getmtime(p))
            for p in glob.glob(f"{d}/*")
        )
        for bid, d in m1.items()
    }
    v2 = t.merge_delta(delta)
    m2 = t._buckets_map(v2)

    assert m2[touched_bucket] != m1.get(touched_bucket)
    for bid, d in m1.items():
        if bid == touched_bucket:
            continue
        assert m2[bid] == d  # same directory string, carried forward
        after = sorted((p, os.path.getmtime(p)) for p in glob.glob(f"{d}/*"))
        assert after == before[bid]  # same files, same mtimes: not rewritten


def test_changes_feed_converges_downstream_replica(spark, tmp_path):
    """changes(v1, v2) returns rewritten-bucket rows; a replica at v1
    folding the feed with cdc_merge_batch lands on v2's state exactly."""
    t = BucketedCdcTable(spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=4)
    v1 = t.merge_delta(_log(spark, B1))
    t.merge_delta(_log(spark, B2))
    v3 = t.merge_delta(_log(spark, B3))

    replica = t.read(version=v1)
    feed = t.changes(since=v1, until=v3)
    caught_up = cdc_merge_batch(replica, feed, keys=["k"])
    assert _state_dict(caught_up) == _state_dict(t.read(version=v3))


def test_changes_empty_when_no_bucket_rewritten(spark, tmp_path):
    t = BucketedCdcTable(spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=4)
    v1 = t.merge_delta(_log(spark, B1))
    assert t.changes(since=v1, until=v1).count() == 0


def test_time_travel_snapshots_stay_exact(spark, tmp_path):
    t = BucketedCdcTable(spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=4)
    v1 = t.merge_delta(_log(spark, B1))
    t.merge_delta(_log(spark, B2))
    assert _state_dict(t.read(version=v1)) == _state_dict(
        _full_merge(spark, B1)
    )
    assert _state_dict(t.read()) == _state_dict(_full_merge(spark, B1, B2))


def test_plain_commit_is_refused(spark, tmp_path):
    t = BucketedCdcTable(spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=4)
    with pytest.raises(ValueError, match="merge_delta"):
        t.commit(_log(spark, B1))


def test_vacuum_is_bucket_granular(spark, tmp_path):
    """After pruning old manifests, vacuum removes superseded bucket
    dirs but keeps still-referenced buckets inside the same commit."""
    root = str(tmp_path / "tbl")
    t = BucketedCdcTable(spark, root, keys=["k"], n_buckets=8)
    t.merge_delta(_log(spark, B1))
    v2 = t.merge_delta(_log(spark, [Row(k=1, val="z", op="U", seq=9)]))
    live_dirs = set(t._buckets_map(v2).values())

    # prune manifest v1 (history retention expired)
    os.remove(os.path.join(root, "_manifests", "v00001.json"))
    deleted = t.vacuum()

    assert len(deleted) == 1  # only k=1's superseded v1 bucket dir
    assert deleted[0] not in live_dirs
    for d in live_dirs:
        assert os.path.isdir(d)
    assert _state_dict(t.read()) == _state_dict(
        _full_merge(spark, B1, [Row(k=1, val="z", op="U", seq=9)])
    )


def test_streaming_bucketed_upsert_sink(spark, tmp_path):
    """foreachBatch micro-batches through the bucketed sink: final live
    state equals the all-at-once merge, one atomic version per batch,
    and batches never rewrite buckets they don't touch."""
    from asritha_metamorphetl_spark.streaming.windows import (
        cdc_upsert_stream_bucketed,
    )

    src = tmp_path / "changelog"
    src.mkdir()
    _log(spark, B1).write.parquet(str(src / "p1"))
    _log(spark, B2).write.parquet(str(src / "p2"))

    table = BucketedCdcTable(
        spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=8
    )
    schema = _log(spark, B1).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*/")
    )
    q = (
        cdc_upsert_stream_bucketed(stream, table)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    assert len(table.versions()) >= 2
    assert _state_dict(table.read()) == _state_dict(
        _full_merge(spark, B1, B2)
    )


def test_changes_feed_scans_only_rewritten_bucket_dirs(spark, tmp_path):
    """I/O gate: the change feed's scan must list files ONLY under the
    buckets rewritten in the range — at 100 TB this is what keeps an
    incremental consumer from re-reading the state table."""
    t = BucketedCdcTable(spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=8)
    v1 = t.merge_delta(_log(spark, B1))
    delta = _log(spark, [Row(k=1, val="z", op="U", seq=9)])
    v2 = t.merge_delta(delta)
    rewritten = {
        d
        for bid, d in t._buckets_map(v2).items()
        if t._buckets_map(v1).get(bid) != d
    }
    assert len(rewritten) == 1
    files = t.changes(since=v1, until=v2).inputFiles()
    only = rewritten.pop()
    assert files and all(only in f for f in files)


def test_vacuum_tombstones_rewrites_only_affected_buckets(spark, tmp_path):
    """Tombstones below the sequence watermark disappear; live rows and
    young tombstones survive; buckets without expired tombstones keep
    their exact directories."""
    t = BucketedCdcTable(spark, str(tmp_path / "tbl"), keys=["k"], n_buckets=8)
    t.merge_delta(_log(spark, B1))
    v2 = t.merge_delta(
        _log(spark, [
            Row(k=2, val=None, op="D", seq=6),   # expired under wm=10
            Row(k=3, val=None, op="D", seq=12),  # young: survives
        ])
    )
    m2 = t._buckets_map(v2)
    v3 = t.vacuum_tombstones(seq_watermark=10)
    assert v3 == v2 + 1
    state = _state_dict(t.read())
    assert 2 not in state                      # expired tombstone purged
    assert state[3] == (None, "D", 12)         # young tombstone retained
    assert state[1][1] == "U" and state[4][1] == "U"
    # only buckets containing k=2's expired tombstone were rewritten
    m3 = t._buckets_map(v3)
    expired_bucket = (
        _log(spark, [Row(k=2, val=None, op="D", seq=6)])
        .select(t.bucket_of(F.col("k")).alias("b"))
        .first()
        .b
    )
    for bid, d in m2.items():
        if bid == str(expired_bucket):
            assert m3.get(bid) != d
        else:
            assert m3.get(bid) == d
    # idempotent: nothing left to purge
    assert t.vacuum_tombstones(seq_watermark=10) is None


def test_prune_manifests_then_vacuum_reclaims_history(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)
    for rows in (B1, B2, B3):
        t.merge_delta(_log(spark, rows))
    assert t.versions() == [1, 2, 3]
    pruned = t.prune_manifests(keep_last=1)
    assert pruned == [1, 2] and t.versions() == [3]
    deleted = t.vacuum()
    assert deleted  # superseded bucket dirs reclaimed
    assert _state_dict(t.read()) == _state_dict(_full_merge(spark, B1, B2, B3))


# ---------------------------------------------------------------------------
# Layout hardening (r5 directive #4 + advisor findings): constructor
# params are validated against the manifest, seq_col round-trips through
# open_table, and rebucket() is the sanctioned full-rewrite escape hatch.
# ---------------------------------------------------------------------------


def test_layout_mismatch_raises_before_corrupting(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)
    t.merge_delta(_log(spark, B1))
    # wrong n_buckets: bucket_of() would route keys differently
    bad = BucketedCdcTable(spark, root, keys=["k"], n_buckets=8)
    with pytest.raises(ValueError, match="layout mismatch"):
        bad.merge_delta(_log(spark, B2))
    # wrong keys
    bad2 = BucketedCdcTable(spark, root, keys=["val"], n_buckets=4)
    with pytest.raises(ValueError, match="layout mismatch"):
        bad2.vacuum_tombstones(99)
    # matching params stay fine
    ok = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)
    ok.merge_delta(_log(spark, B2))
    assert _state_dict(cdc_live(ok.read())) == _state_dict(
        cdc_live(_full_merge(spark, B1, B2))
    )


def test_seq_col_roundtrips_through_open_table(spark, tmp_path):
    """A custom sequence column must be recorded in the manifest and
    re-adopted by open_table — otherwise merge/vacuum on the reopened
    handle would order by the wrong column."""
    from pyspark.sql import Row

    from asritha_metamorphetl_spark.sources.bucketed import open_table

    root = str(tmp_path / "tbl")
    t = BucketedCdcTable(
        spark, root, keys=["k"], n_buckets=2, seq_col="lsn"
    )
    rows = [Row(k=1, val="a", op="U", lsn=1), Row(k=2, val="b", op="U", lsn=2)]
    t.merge_delta(spark.createDataFrame(rows, "k int, val string, op string, lsn int"))
    reopened = open_table(spark, root)
    assert isinstance(reopened, BucketedCdcTable)
    assert reopened.seq_col == "lsn"
    # stale row must lose under the custom column on the REOPENED handle
    stale = [Row(k=1, val="old", op="U", lsn=0)]
    reopened.merge_delta(
        spark.createDataFrame(stale, "k int, val string, op string, lsn int")
    )
    got = {r.k: r.val for r in cdc_live(reopened.read()).collect()}
    assert got == {1: "a", 2: "b"}


def test_rebucket_preserves_state_exactly(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = BucketedCdcTable(spark, root, keys=["k"], n_buckets=2)
    t.merge_delta(_log(spark, B1))
    t.merge_delta(_log(spark, B2))
    before = _state_dict(t.read())
    v = t.rebucket(7)
    assert v == 3 and t.n_buckets == 7
    assert _state_dict(t.read()) == before  # layout, not semantics
    # the manifest now records 7 buckets and open_table adopts them
    from asritha_metamorphetl_spark.sources.bucketed import open_table

    reopened = open_table(spark, root)
    assert reopened.n_buckets == 7
    # merges keep working under the new layout, old handles at the old
    # count are rejected
    t.merge_delta(_log(spark, B3))
    want = _state_dict(_full_merge(spark, B1, B2, B3))
    assert _state_dict(t.read()) == want
    stale_handle = BucketedCdcTable(spark, root, keys=["k"], n_buckets=2)
    with pytest.raises(ValueError, match="layout mismatch"):
        stale_handle.merge_delta(_log(spark, B1))
    # history before the rebucket stays time-travelable
    assert _state_dict(t.read(version=2)) == before


def test_rebucket_empty_table_adopts_count(spark, tmp_path):
    t = BucketedCdcTable(spark, str(tmp_path / "t"), keys=["k"], n_buckets=2)
    assert t.rebucket(5) is None
    assert t.n_buckets == 5
    t.merge_delta(_log(spark, B1))
    assert t._buckets_map(t.versions()[-1])  # wrote under the adopted count
    assert _state_dict(t.read()) == _state_dict(_full_merge(spark, B1))


def test_streaming_sink_retention_reclaims_while_hash_green(spark, tmp_path):
    """maintain_every wires prune_manifests + bucket-granular vacuum
    into the sink: after the run, history is capped at keep_versions,
    superseded bucket dirs are physically reclaimed, and the live
    state still equals the all-at-once merge (retention is
    maintenance, never semantics)."""
    from asritha_metamorphetl_spark.streaming.windows import (
        cdc_upsert_stream_bucketed,
    )

    src = tmp_path / "changelog"
    src.mkdir()
    _log(spark, B1).write.parquet(str(src / "p1"))
    _log(spark, B2).write.parquet(str(src / "p2"))
    _log(spark, B3).write.parquet(str(src / "p3"))

    root = str(tmp_path / "tbl")
    table = BucketedCdcTable(spark, root, keys=["k"], n_buckets=2)
    schema = _log(spark, B1).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*/")
    )
    q = (
        cdc_upsert_stream_bucketed(stream, table, maintain_every=2,
                                   keep_versions=1)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    # 3 batches published 3 versions; the batch-2 maintenance pruned to
    # keep_versions=1 (later batches may add more on top)
    assert len(table.versions()) <= 2
    # reclaimed: every _b= leaf on disk is referenced by a surviving
    # manifest — superseded bucket dirs are gone
    referenced = set()
    for v in table.versions():
        referenced.update(table._read_manifest(v)["data_dirs"])
    on_disk = {
        p
        for p in glob.glob(f"{root}/data/commit-*/_b=*")
        if os.path.isdir(p)
    }
    assert on_disk, "expected bucket dirs on disk"
    # the final batch ran AFTER the last maintenance tick, so its
    # superseded predecessors may linger until the next tick; anything
    # older must be gone. Run one more maintenance to prove closure.
    table.prune_manifests(keep_last=1)
    table.vacuum()
    referenced = set()
    for v in table.versions():
        referenced.update(table._read_manifest(v)["data_dirs"])
    on_disk = {
        p
        for p in glob.glob(f"{root}/data/commit-*/_b=*")
        if os.path.isdir(p)
    }
    assert on_disk == referenced, (on_disk, referenced)
    # and the state is still exactly the full fold
    assert _state_dict(cdc_live(table.read())) == _state_dict(
        cdc_live(_full_merge(spark, B1, B2, B3))
    )


def test_concurrent_merge_publishers_loser_raises_and_loses_cleanly(
    spark, tmp_path
):
    """Two handles racing merge_delta for the same next version (r6
    directive #7): on a store whose manifest rename does not clobber
    (HDFS) — or, on the local FS, via the commit-token read-back — the
    SECOND publisher must raise, its commit must be invisible to
    readers, and vacuum must reclaim its orphaned bucket directories.
    The interleave is forced deterministically: t2's bucket write hook
    lets t1 publish first."""
    root = str(tmp_path / "tbl")
    t1 = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)
    t1.merge_delta(_log(spark, B1))
    t2 = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)

    orig = t2._write_buckets

    def hooked(df, version, n_tasks):
        written = orig(df, version, n_tasks)
        t1.merge_delta(_log(spark, B2))  # the winner sneaks in
        return written

    t2._write_buckets = hooked
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t2.merge_delta(_log(spark, B3))

    # the table is exactly the winner's state — t2's rows never joined
    expect = _state_dict(_full_merge(spark, B1, B2))
    assert _state_dict(t1.read()) == expect
    # the loser's orphaned commit dir is unreferenced; vacuum reclaims
    # it and the surviving state is untouched
    t1.vacuum()
    assert _state_dict(t1.read()) == expect
    referenced = set()
    for v in t1.versions():
        referenced.update(t1._read_manifest(v)["data_dirs"])
    on_disk = {
        f"{root}/data/{os.path.basename(c)}/{os.path.basename(d)}"
        for c in glob.glob(f"{root}/data/commit-*")
        for d in glob.glob(f"{c}/_b=*")
    }
    assert on_disk == referenced


def test_stale_handle_merge_after_rebucket_raises_not_corrupts(
    spark, tmp_path
):
    """A handle that passed its construction-time layout check and then
    lost a rebucket race must FAIL its next merge_delta on the
    per-merge layout re-check — before it can write old-layout bucket
    directories into the new-layout manifest (silent key-routing
    corruption). open_table() adopts the new layout and proceeds."""
    root = str(tmp_path / "tbl")
    t1 = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)
    t1.merge_delta(_log(spark, B1))

    stale = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)
    stale.merge_delta(_log(spark, B2))  # validates + caches layout n=4

    assert t1.rebucket(8) is not None  # t1 re-checks, wins, adopts n=8

    with pytest.raises(ValueError, match="layout mismatch"):
        stale.merge_delta(_log(spark, B3))

    # nothing from the failed merge leaked into the published state
    expect = _state_dict(_full_merge(spark, B1, B2))
    assert _state_dict(t1.read()) == expect

    from asritha_metamorphetl_spark.sources.bucketed import open_table

    fresh = open_table(spark, root)
    assert fresh.n_buckets == 8
    fresh.merge_delta(_log(spark, B3))
    assert _state_dict(fresh.read()) == _state_dict(
        _full_merge(spark, B1, B2, B3)
    )


def test_rebucket_loser_handle_stays_consistent(spark, tmp_path):
    """If the rebucket itself loses the publish race, the handle must
    NOT adopt the new count (the store never recorded it) — its next
    operation sees the true manifest instead of a phantom layout."""
    root = str(tmp_path / "tbl")
    t1 = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)
    t1.merge_delta(_log(spark, B1))
    t2 = BucketedCdcTable(spark, root, keys=["k"], n_buckets=4)

    orig = t2._write_buckets

    def hooked(df, version, n_tasks):
        written = orig(df, version, n_tasks)
        t1.merge_delta(_log(spark, B2))  # winner takes the version slot
        return written

    t2._write_buckets = hooked
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t2.rebucket(8)
    assert t2.n_buckets == 4  # rolled back: matches what the store says
    # and the handle still works for a plain merge afterwards
    t2._write_buckets = orig
    t2.merge_delta(_log(spark, B3))
    assert _state_dict(t2.read()) == _state_dict(
        _full_merge(spark, B1, B2, B3)
    )
