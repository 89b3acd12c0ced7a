"""Snapshot-manifest tables: atomic publish, time travel, change feed,
vacuum — the metadata layer the reference's dated-directory convention
lacks."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import Row

from asritha_metamorphetl_spark.sources.manifest import SnapshotTable


def _batch(spark, lo, hi):
    return spark.createDataFrame([Row(k=i, v=i * 10) for i in range(lo, hi)])


def test_commit_read_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    v1 = t.commit(_batch(spark, 0, 10))
    v2 = t.commit(_batch(spark, 10, 25))
    assert (v1, v2) == (1, 2)
    assert t.versions() == [1, 2]
    assert t.read(version=1).count() == 10
    assert t.read().count() == 25  # latest
    assert sorted(r.k for r in t.read(version=2).collect()) == list(range(25))


def test_overwrite_replaces_but_history_stays_readable(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_batch(spark, 0, 10))
    t.commit(_batch(spark, 100, 103), mode="overwrite")
    assert t.read().count() == 3
    assert t.read(version=1).count() == 10  # time travel across overwrite


def test_change_feed_yields_only_the_delta(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_batch(spark, 0, 10))
    t.commit(_batch(spark, 10, 18))
    t.commit(_batch(spark, 18, 30))
    delta = t.changes(since=1)
    assert sorted(r.k for r in delta.collect()) == list(range(10, 30))
    assert t.changes(since=1, until=2).count() == 8
    assert t.changes(since=3).count() == 0


def test_change_feed_refuses_overwrite_ranges(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_batch(spark, 0, 5))
    t.commit(_batch(spark, 0, 2), mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        t.changes(since=1)


def test_snapshot_isolation_under_concurrent_commit(spark, tmp_path):
    """A DataFrame resolved from v1 keeps reading v1's files even after
    later commits land — the property directory listings cannot give."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_batch(spark, 0, 10))
    snapshot = t.read(version=1)
    t.commit(_batch(spark, 10, 50))
    assert snapshot.count() == 10


def test_vacuum_reclaims_unreferenced_dirs_only(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.commit(_batch(spark, 0, 10))
    # simulate a crashed writer: data landed, manifest never published
    _batch(spark, 0, 3).write.parquet(f"{root}/data/commit-99999-deadbeef")
    deleted = t.vacuum()
    assert deleted == [f"{root}/data/commit-99999-deadbeef"]
    assert t.read().count() == 10  # referenced data untouched
    assert len(glob.glob(f"{root}/data/commit-*")) == 1


def test_racing_writers_cannot_publish_same_version(spark, tmp_path):
    """Optimistic concurrency: publishing a manifest version that
    already exists must fail (rename refuses to clobber)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_batch(spark, 0, 5))
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t._write_manifest(1, {"version": 1, "mode": "append", "data_dirs": []})


def test_additive_schema_evolution_across_commits(spark, tmp_path):
    """A later commit may add columns; the unified read surfaces them
    with NULLs for older files, and time travel still sees the old
    shape."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_batch(spark, 0, 5))
    from pyspark.sql import functions as F

    widened = _batch(spark, 5, 8).withColumn("src", F.lit("web"))
    t.commit(widened)
    latest = t.read()
    assert set(latest.columns) == {"k", "v", "src"}
    rows = {r.k: r.src for r in latest.collect()}
    assert rows[0] is None and rows[5] == "web"
    assert set(t.read(version=1).columns) == {"k", "v"}


def test_change_feed_valid_after_overwrite_boundary(spark, tmp_path):
    """Mixed histories: the feed is defined across append commits that
    FOLLOW an overwrite; only ranges crossing the overwrite raise."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_batch(spark, 0, 5))                       # v1 append
    t.commit(_batch(spark, 100, 102), mode="overwrite") # v2 overwrite
    t.commit(_batch(spark, 200, 204))                   # v3 append
    # since the overwrite itself: well-defined, yields only v3's rows
    assert sorted(r.k for r in t.changes(since=2).collect()) == [200, 201, 202, 203]
    with pytest.raises(ValueError, match="overwrite"):
        t.changes(since=1, until=3)


def test_prune_manifests_retention(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 10, 20):
        t.commit(_batch(spark, lo, lo + 5))
    assert t.prune_manifests(keep_last=2) == [1]
    assert t.versions() == [2, 3]
    with pytest.raises(FileNotFoundError):
        t.read(version=1)
    assert t.read().count() == 15  # latest still reads all appended dirs
    with pytest.raises(ValueError, match="keep_last"):
        t.prune_manifests(keep_last=0)
