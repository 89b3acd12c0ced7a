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
