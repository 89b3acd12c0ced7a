"""Physical-layout evidence: Z-order clustering must bound BOTH
dimensions' per-file min/max ranges (the property row-group skipping
feeds on), where a single-column sort bounds only its own."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions.numeric import morton_key
from asritha_metamorphetl_spark.sources.files import write_clustered
from tests.conftest import SF_CORRECT

BITS = 8
DOM = 1 << BITS


def _coverage(path_glob: str, col: str, lo: float, hi: float) -> float:
    """Mean fraction of the column's domain each file's [min,max] spans."""
    spans = []
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None:
            spans.append((_num(fmax) - _num(fmin)) / (hi - lo))
    assert spans, f"no statistics found for {col}"
    return sum(spans) / len(spans)


def _num(v):
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.toordinal() if isinstance(v, datetime.date) else v.timestamp()
    return float(v)


def test_morton_clustering_bounds_both_dimensions(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    day = F.unix_date(F.to_date("o_orderdate"))
    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min(day), F.max(day)
    ).first()
    ck_lo, ck_hi, d_lo, d_hi = stats

    bx = F.least(
        F.floor((F.col("o_custkey") - ck_lo) * DOM / (ck_hi - ck_lo + 1)),
        F.lit(DOM - 1),
    )
    by = F.least(
        F.floor((day - d_lo) * DOM / (d_hi - d_lo + 1)), F.lit(DOM - 1)
    )
    zed = orders.withColumn("zkey", morton_key(bx, by, bits=BITS))

    z_path = str(tmp_path / "z")
    s_path = str(tmp_path / "s")
    write_clustered(zed, z_path, cluster_cols=["zkey"], num_files=8)
    write_clustered(orders, s_path, cluster_cols=["o_custkey"], num_files=8)

    z_ck = _coverage(f"{z_path}/*.parquet", "o_custkey", ck_lo, ck_hi)
    z_dt = _coverage(f"{z_path}/*.parquet", "o_orderdate", d_lo, d_hi)
    s_dt = _coverage(f"{s_path}/*.parquet", "o_orderdate", d_lo, d_hi)

    # Single-column sort leaves the other dimension unclustered: each
    # file spans essentially the whole date domain.
    assert s_dt > 0.9
    # Z-order bounds both dimensions well below that.
    assert z_ck < 0.7 and z_dt < 0.7, (z_ck, z_dt, s_dt)


def test_morton_key_sql_matches_spark_and_python(spark, tmp_path):
    """The generated SQL interleave (the oracle side of
    zorder_layout_profile) is bit-for-bit the Spark expression — checked
    against an independent pure-python Morton reference."""
    import duckdb

    from asritha_metamorphetl_spark.functions.numeric import morton_key_sql

    def py_morton(x: int, y: int, bits: int) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", morton_key(F.col("x"), F.col("y"), bits=8)
        ).collect()
    }
    con = duckdb.connect()
    expr = morton_key_sql("x", "y", bits=8)
    for x, y in pts:
        want = py_morton(x, y, 8)
        assert got[(x, y)] == want
        (sql_z,) = con.sql(
            f"SELECT {expr} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()
        assert sql_z == want
    con.close()


def test_compact_parquet_reduces_file_count_preserving_data(spark, tmp_path):
    """64 small files -> a handful of target-size files, same rows; the
    swap leaves no temp directory behind."""
    import glob
    import os

    from asritha_metamorphetl_spark.sources.files import compact_parquet

    src = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    path = str(tmp_path / "orders_small")
    src.repartition(64).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*")) == 64
    before = src.count()

    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] == 64
    n_after = len(glob.glob(f"{path}/part-*"))
    assert n_after == stats["files_after"] <= 4
    assert spark.read.parquet(path).count() == before
    assert not os.path.exists(path + ".__compacting__")


def test_compact_parquet_with_sort_recovers_clustering(spark, tmp_path):
    """Compacting with sort_cols re-establishes per-file min/max
    locality destroyed by random small-file appends."""
    from asritha_metamorphetl_spark.sources.files import compact_parquet

    src = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    path = str(tmp_path / "orders_scattered")
    src.repartition(32).write.parquet(path)
    lo, hi = 1, src.agg(F.max("o_custkey")).first()[0]
    scattered = _coverage(f"{path}/part-*.parquet", "o_custkey", lo, hi)
    assert scattered > 0.9  # random appends: every file spans the domain

    import glob as _glob
    import os as _os

    total = sum(
        _os.path.getsize(f) for f in _glob.glob(f"{path}/part-*.parquet")
    )
    stats = compact_parquet(
        spark, path, target_file_bytes=max(1, total // 8),
        sort_cols=["o_custkey"],
    )
    assert stats["files_after"] >= 4
    clustered = _coverage(f"{path}/part-*.parquet", "o_custkey", lo, hi)
    assert clustered < 0.5, (scattered, clustered)


def test_morton_key_n_matches_python_and_sql_at_3d(spark):
    """3-dimensional interleave: Spark expression == pure-python
    reference == generated SQL, and d=2 layout equals morton_key."""
    import duckdb

    from asritha_metamorphetl_spark.functions.numeric import (
        morton_key_n,
        morton_key_n_sql,
    )

    def py_morton_n(vals, bits):
        d = len(vals)
        z = 0
        for j, v in enumerate(vals):
            for i in range(bits):
                z |= ((v >> i) & 1) << (i * d + j)
        return z

    pts = [(0, 0, 0), (1, 2, 3), (7, 5, 6), (7, 7, 7), (3, 0, 7)]
    df = spark.createDataFrame(pts, ["x", "y", "z"])
    got = {
        (r.x, r.y, r.z): r.m
        for r in df.withColumn(
            "m", morton_key_n([F.col("x"), F.col("y"), F.col("z")], bits=3)
        ).collect()
    }
    con = duckdb.connect()
    expr = morton_key_n_sql(["x", "y", "z"], bits=3)
    for x, y, z in pts:
        want = py_morton_n((x, y, z), 3)
        assert got[(x, y, z)] == want
        (sql_m,) = con.sql(
            f"SELECT {expr} FROM (SELECT {x} AS x, {y} AS y, {z} AS z)"
        ).fetchone()
        assert sql_m == want
    con.close()

    # d=2 layout equality with morton_key
    two = spark.createDataFrame([(170, 85)], ["x", "y"])
    a = two.select(morton_key(F.col("x"), F.col("y"), bits=8).alias("m")).first().m
    b = two.select(
        morton_key_n([F.col("x"), F.col("y")], bits=8).alias("m")
    ).first().m
    assert a == b


def test_morton_key_n_overflow_guard(spark):
    import pytest

    from asritha_metamorphetl_spark.functions.numeric import morton_key_n

    with pytest.raises(ValueError, match="overflows"):
        morton_key_n([F.col("a")] * 4, bits=16)
    with pytest.raises(ValueError, match="at least one"):
        morton_key_n([], bits=8)
