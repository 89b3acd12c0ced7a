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


def test_cdc_merge_batch_is_order_independent_and_idempotent(spark):
    """Tombstone-retaining merge: any batch order (and replays)
    converge; a late lower-seq update cannot resurrect a deleted key."""
    from pyspark.sql import functions as F

    from asritha_metamorphetl_spark.operators.cdc import (
        cdc_live,
        cdc_merge_batch,
    )

    b1 = spark.createDataFrame(
        [Row(k=1, val="x", amt=1, op="U", seq=10),
         Row(k=2, val=None, amt=None, op="D", seq=9)]
    )
    b2 = spark.createDataFrame(
        [Row(k=1, val="y", amt=2, op="U", seq=5),   # older than b1's
         Row(k=2, val="z", amt=3, op="U", seq=4),   # older than delete
         Row(k=3, val="w", amt=4, op="I", seq=1)]
    )

    def final(*batches):
        st = None
        for b in batches:
            st = cdc_merge_batch(st, b, keys=["k"])
        return sorted(
            (r.k, r.val, r.amt) for r in cdc_live(st).drop("op", "seq").collect()
        )

    fwd = final(b1, b2)
    rev = final(b2, b1)
    replay = final(b1, b2, b2, b1)
    assert fwd == rev == replay == [(1, "x", 1), (3, "w", 4)]


def test_cdc_upsert_stream_into_snapshot_table(spark, tmp_path):
    """foreachBatch micro-batches land as atomic snapshot versions; the
    final live table equals the all-at-once merge."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from asritha_metamorphetl_spark.operators.cdc import (
        cdc_live,
        cdc_merge_batch,
    )
    from asritha_metamorphetl_spark.sources.manifest import SnapshotTable
    from asritha_metamorphetl_spark.streaming.windows import cdc_upsert_stream

    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("val", StringType()),
            StructField("op", StringType()),
            StructField("seq", IntegerType()),
        ]
    )
    src = tmp_path / "changelog"
    src.mkdir()
    rows1 = [Row(k=1, val="a", op="U", seq=1), Row(k=2, val="b", op="U", seq=2)]
    rows2 = [Row(k=1, val="a2", op="U", seq=3), Row(k=2, val=None, op="D", seq=4)]
    spark.createDataFrame(rows1, schema).write.parquet(str(src / "p1"))
    spark.createDataFrame(rows2, schema).write.parquet(str(src / "p2"))

    table = SnapshotTable(spark, str(tmp_path / "tbl"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*/")
    )
    q = (
        cdc_upsert_stream(stream, table, keys=["k"])
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    assert len(table.versions()) >= 2  # one atomic version per micro-batch
    live = {r.k: r.val for r in cdc_live(table.read()).collect()}
    want_state = cdc_merge_batch(
        None,
        spark.createDataFrame(rows1 + rows2, schema),
        keys=["k"],
    )
    want = {r.k: r.val for r in cdc_live(want_state).collect()}
    assert live == want == {1: "a2"}
