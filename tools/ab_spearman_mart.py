#!/usr/bin/env python3
"""A/B evidence harness for VERDICT r13 item 4: prove (or refute) the
round-13 spearman rank-attach fusion and the customer-mart pin in
SECONDS, at sf0.1 and at a synthesized 3x scale ("sf0.3").

- The synthetic SF is sf0.1 replicated 3x with shifted join keys
  (l_orderkey / o_orderkey += i * 2^32 per replica; every other column
  byte-identical). It exists ONLY for this timing experiment under the
  session scratch root — never under /root/testdata, never read by any
  registered query, and rebuilt from the sf0.1 parquet on every run
  (no cross-run result reuse; this script times, it does not answer).
- "old" spearman is the pre-48d3fcd spelling (rank maps built from two
  extra fact scans, price rank re-attached with a corpus-sized
  equi-join); "new" is the registered fused spelling.
- "old" mart is the registered pipeline with the round-13
  ``metrics.localCheckpoint(eager=False)`` pin DISABLED (the only
  delta of commit 80aa9f9 on this path); "new" is the registered
  pipeline as-is.
- Each variant runs ``repeat`` times interleaved (A/B/A/B...) against
  the noop sink so container weather hits both variants equally.

Usage: python tools/ab_spearman_mart.py [--repeat 3] [--skip-synth]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.session import create_session
from asritha_metamorphetl_spark.sources.files import Catalog

KEY_SHIFT = 1 << 32


def synthesize_sf03(spark: SparkSession, src: str, dst: str) -> None:
    """3x sf0.1 with disjoint order keys per replica; dimensions copied."""
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(src, "orders.parquet"))

    def shifted(df: DataFrame, key: str):
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * KEY_SHIFT)) for i in range(3)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    shifted(li, "l_orderkey").write.parquet(os.path.join(dst, "lineitem.parquet"))
    shifted(od, "o_orderkey").write.parquet(os.path.join(dst, "orders.parquet"))
    for t in ("customer", "part", "nation", "region", "supplier",
              "events", "documents", "embeddings"):
        p = os.path.join(src, f"{t}.parquet")
        if os.path.isdir(p):
            shutil.copytree(p, os.path.join(dst, f"{t}.parquet"))
        elif os.path.exists(p):
            shutil.copy(p, os.path.join(dst, f"{t}.parquet"))


def spearman_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-fusion (48d3fcd^) spelling, verbatim."""
    from asritha_metamorphetl_spark.operators.ranks import global_cumsum

    li = Catalog(sf_dir).load(spark, "lineitem")
    enc = li.select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    qc = enc.groupBy("qty").agg(F.count(F.lit(1)).alias("c"))
    wq = Window.orderBy(F.col("qty").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qr = qc.select("qty", (2 * F.sum("c").over(wq) - F.col("c") + 1).alias("rq2"))
    pc = enc.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    pcum = global_cumsum(pc, [F.col("cents").asc()], "c", out_col="cum")
    pr = pcum.select("cents", (2 * F.col("cum") - F.col("c") + 1).alias("rp2"))
    ranked = (
        enc.join(F.broadcast(qr), "qty")
        .join(pr, "cents")
        .select(
            F.col("rq2").cast("decimal(38,0)").alias("x"),
            F.col("rp2").cast("decimal(38,0)").alias("y"),
        )
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return sums.select(
        "n",
        F.round(
            (n * F.col("sxy").cast("double") - sx * sy)
            / (
                F.sqrt(n * F.col("sx2").cast("double") - sx * sx)
                * F.sqrt(n * F.col("sy2").cast("double") - sy * sy)
            ),
            6,
        ).alias("spearman_rho"),
    )


def mart(spark: SparkSession, sf_dir: str, pinned: bool) -> DataFrame:
    """Registered customer_sales_report with the metrics pin toggled."""
    import asritha_metamorphetl_spark.pipelines.customer_sales_report as m

    if pinned:
        return m.customer_sales_report(spark, sf_dir)
    # Unpinned: identity out the one localCheckpoint on the metrics
    # frame (the sole pipeline-level pin; global_percent_rank's internal
    # machinery is shared by both variants and untouched).
    real = DataFrame.localCheckpoint
    calls = {"n": 0}

    def fake(self, eager=True):
        calls["n"] += 1
        return self

    src = open(m.__file__).read()
    assert src.count("localCheckpoint") == 1, "pin count drifted; update harness"
    DataFrame.localCheckpoint = fake
    try:
        # rebuild the plan up to (and including) the metrics frame with
        # the pin neutralized, then restore for everything downstream
        # (global_percent_rank keeps its own pins in both variants).
        # Simplest faithful approach: patch only while the pipeline
        # function builds its plan, intercepting ONLY the first call
        # (the metrics pin is the first localCheckpoint the pipeline
        # itself issues; ranks-machinery pins happen inside
        # global_percent_rank which runs after metrics is built).
        def selective(self, eager=True):
            if calls["n"] == 0:
                calls["n"] += 1
                return self
            return real(self, eager=eager)

        DataFrame.localCheckpoint = selective
        return m.customer_sales_report(spark, sf_dir)
    finally:
        DataFrame.localCheckpoint = real


def time_noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--skip-synth", action="store_true")
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = create_session(
        app_name="ab-spearman-mart",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    synth = os.path.join(tempfile.gettempdir(), "sf03synth")
    if not args.skip_synth or not os.path.exists(synth):
        spark.sparkContext.setJobDescription("synthesize sf0.3")
        synthesize_sf03(spark, args.sf01, synth)

    from asritha_metamorphetl_spark.plans.stats_queries import spearman_price_qty

    variants = {
        "spearman_old": lambda d: spearman_old(spark, d),
        "spearman_new": lambda d: spearman_price_qty(spark, d),
        "mart_unpinned": lambda d: mart(spark, d, pinned=False),
        "mart_pinned": lambda d: mart(spark, d, pinned=True),
    }
    results: dict[str, dict[str, list[float]]] = {}
    for sf_label, sf_dir in (("sf0.1", args.sf01), ("sf0.3synth", synth)):
        for _ in range(args.repeat):
            for vname, fn in variants.items():
                spark.sparkContext.setJobDescription(f"{vname}@{sf_label}")
                sec = time_noop(fn(sf_dir))
                results.setdefault(sf_label, {}).setdefault(vname, []).append(
                    round(sec, 3)
                )
                spark.catalog.clearCache()
    # sanity: old and new spearman agree on the synthetic data too
    a = spearman_old(spark, synth).collect()
    b = spearman_price_qty(spark, synth).collect()
    results["spearman_rows_equal"] = str(a) == str(b)
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
