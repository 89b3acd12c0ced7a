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


# ---------------------------------------------------------------------------
# Zone-map data skipping (commit stats_cols + read_skipping)
# ---------------------------------------------------------------------------


def _zoned(spark, lo, hi):
    # one partition -> one file whose k-zone is exactly [lo, hi)
    return spark.createDataFrame(
        [Row(k=i, v=i * 10) for i in range(lo, hi)]
    ).coalesce(1)


def test_skipping_prunes_nonoverlapping_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100, 200, 300):
        t.commit(_zoned(spark, lo, lo + 100), stats_cols=["k"])
    df, rep = t.read_skipping([("k", 120, 180)])
    assert rep == {"files_total": 4, "files_read": 1, "files_skipped": 3}
    assert sorted(r.k for r in df.collect()) == list(range(120, 181))


def test_skipping_equals_plain_filtered_read(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100, 200):
        t.commit(_zoned(spark, lo, lo + 100), stats_cols=["k"])
    df, _ = t.read_skipping([("k", 50, 250)])
    want = sorted(r.k for r in t.read().filter("k BETWEEN 50 AND 250").collect())
    assert sorted(r.k for r in df.collect()) == want


def test_skipping_bounds_are_closed_intervals(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_zoned(spark, 0, 10), stats_cols=["k"])
    t.commit(_zoned(spark, 10, 20), stats_cols=["k"])
    # hi == file min of the second file: zone [10,19] overlaps [5,10]
    df, rep = t.read_skipping([("k", 5, 10)])
    assert rep["files_read"] == 2
    assert sorted(r.k for r in df.collect()) == list(range(5, 11))


def test_files_without_stats_are_never_skipped(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_zoned(spark, 0, 100))  # no stats recorded
    t.commit(_zoned(spark, 100, 200), stats_cols=["k"])
    df, rep = t.read_skipping([("k", 150, 160)])
    # the stats-less file must be read (and filtered), the zoned one pruned
    # only when non-overlapping — here it overlaps, so both are read
    assert rep == {"files_total": 2, "files_read": 2, "files_skipped": 0}
    df2, rep2 = t.read_skipping([("k", 10, 20)])
    assert rep2 == {"files_total": 2, "files_read": 1, "files_skipped": 1}
    assert sorted(r.k for r in df2.collect()) == list(range(10, 21))


def test_skipping_stats_carry_forward_and_reset_on_overwrite(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_zoned(spark, 0, 100), stats_cols=["k"])
    t.commit(_zoned(spark, 100, 200), stats_cols=["k"])
    assert len(t._read_manifest(2)["file_stats"]) == 2  # carried forward
    t.commit(_zoned(spark, 500, 600), mode="overwrite", stats_cols=["k"])
    assert len(t._read_manifest(3)["file_stats"]) == 1  # reset with the list
    df, rep = t.read_skipping([("k", 0, 50)])
    assert rep["files_read"] == 0 and df.count() == 0


def test_skipping_empty_selection_keeps_schema(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_zoned(spark, 0, 10), stats_cols=["k"])
    df, rep = t.read_skipping([("k", 900, 999)])
    assert rep["files_read"] == 0
    assert df.columns == ["k", "v"] and df.count() == 0


def test_skipping_date_zones(spark, tmp_path):
    import datetime as dt

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for m in (1, 2, 3):
        t.commit(
            spark.createDataFrame(
                [Row(d=dt.date(2025, m, day), v=day) for day in (1, 10, 20)]
            ).coalesce(1),
            stats_cols=["d"],
        )
    df, rep = t.read_skipping(
        [("d", dt.date(2025, 2, 1), dt.date(2025, 2, 28))]
    )
    assert rep == {"files_total": 3, "files_read": 1, "files_skipped": 2}
    assert sorted(r.d.month for r in df.collect()) == [2, 2, 2]


def test_skipping_scheduling_reads_only_surviving_files(spark, tmp_path):
    """The pruned DataFrame's input split list holds ONLY the surviving
    files — skipping happens before Spark lists or schedules anything,
    not as a post-scan filter."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100, 200, 300):
        t.commit(_zoned(spark, lo, lo + 100), stats_cols=["k"])
    df, rep = t.read_skipping([("k", 120, 180)])
    assert rep["files_read"] == 1
    assert len(df.inputFiles()) == 1
    full = t.read()
    assert len(full.inputFiles()) == 4


def test_commit_many_matches_sequential_commits(spark, tmp_path):
    """commit_many publishes the exact manifest chain N sequential
    commit() calls would: same version numbers, same per-version
    content, same zone-map skipping behaviour (round-13: the data
    writes + stats scans overlap on a thread pool; only wall-clock may
    differ)."""
    seq = SnapshotTable(spark, str(tmp_path / "seq"))
    par = SnapshotTable(spark, str(tmp_path / "par"))
    batches = [_zoned(spark, lo, lo + 100) for lo in (0, 100, 200, 300)]
    for b in batches:
        seq.commit(b, stats_cols=["k"])
    versions = par.commit_many(batches, stats_cols=["k"])
    assert versions == seq.versions() == [1, 2, 3, 4]
    for v in versions:
        assert sorted(r.k for r in par.read(version=v).collect()) == sorted(
            r.k for r in seq.read(version=v).collect()
        )
    # zone maps must prune identically
    _, rep_seq = seq.read_skipping([("k", 120, 180)])
    _, rep_par = par.read_skipping([("k", 120, 180)])
    assert rep_par == rep_seq == {
        "files_total": 4, "files_read": 1, "files_skipped": 3,
    }


def test_commit_many_appends_after_existing_commits(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit(_zoned(spark, 0, 100), stats_cols=["k"])
    versions = t.commit_many(
        [_zoned(spark, 100, 200), _zoned(spark, 200, 300)],
        stats_cols=["k"],
    )
    assert versions == [2, 3]
    assert t.read().count() == 300
    # carried-forward stats from the pre-existing commit still prune
    _, rep = t.read_skipping([("k", 10, 20)])
    assert rep == {"files_total": 3, "files_read": 1, "files_skipped": 2}


def test_commit_many_empty_list_is_noop(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    assert t.commit_many([]) == []
    assert t.versions() == []
