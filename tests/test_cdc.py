"""CDC changelog apply: last-writer-wins semantics, deletes, inserts,
pass-through — the incremental alternative to full snapshot rewrites."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.operators.cdc import cdc_apply, cdc_latest


def _base(spark):
    return spark.createDataFrame(
        [
            Row(k=1, val="a", amt=10),
            Row(k=2, val="b", amt=20),
            Row(k=3, val="c", amt=30),
            Row(k=4, val="d", amt=40),
        ]
    )


def _changelog(spark):
    # k=1: two competing updates — seq 9 must win over seq 5
    # k=2: an early update then a later delete — delete wins
    # k=3: untouched
    # k=5: brand-new insert
    return spark.createDataFrame(
        [
            Row(k=1, val="a1", amt=11, op="U", seq=5),
            Row(k=1, val="a2", amt=12, op="U", seq=9),
            Row(k=2, val="b1", amt=21, op="U", seq=3),
            Row(k=2, val=None, amt=None, op="D", seq=7),
            Row(k=5, val="e", amt=50, op="I", seq=1),
        ]
    )


def test_cdc_latest_picks_max_seq(spark):
    latest = cdc_latest(_changelog(spark), keys=["k"])
    rows = {r.k: r for r in latest.collect()}
    assert rows[1].seq == 9 and rows[1].val == "a2"
    assert rows[2].op == "D" and rows[2].seq == 7
    assert rows[5].op == "I"


def test_cdc_apply_semantics(spark):
    snap = cdc_apply(_base(spark), _changelog(spark), keys=["k"])
    assert snap.columns == _base(spark).columns  # exact payload schema
    rows = {r.k: r for r in snap.collect()}
    assert set(rows) == {1, 3, 4, 5}  # 2 deleted, 5 inserted
    assert rows[1].val == "a2" and rows[1].amt == 12  # last writer won
    assert rows[3].val == "c" and rows[4].val == "d"  # pass-through
    assert rows[5].amt == 50


def test_cdc_apply_is_idempotent_for_upserts(spark):
    """Re-applying the same changelog to the merged snapshot converges:
    upserts overwrite with identical images, deletes stay gone."""
    base, log = _base(spark), _changelog(spark)
    once = cdc_apply(base, log, keys=["k"])
    twice = cdc_apply(once, log, keys=["k"])
    a = sorted(once.collect(), key=lambda r: r.k)
    b = sorted(twice.collect(), key=lambda r: r.k)
    assert a == b


def test_cdc_empty_changelog_is_identity(spark):
    base = _base(spark)
    empty = _changelog(spark).filter(F.lit(False))
    out = cdc_apply(base, empty, keys=["k"])
    assert sorted(out.collect(), key=lambda r: r.k) == sorted(
        base.collect(), key=lambda r: r.k
    )
