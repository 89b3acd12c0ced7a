#!/usr/bin/env python3
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as plan-build + execution to completion. Results are
materialized with a cheap count-style action (``write.format("noop")``)
so measured time is engine work, not driver-side pandas conversion.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from asritha_metamorphetl_spark.plans.registry import all_queries
    from asritha_metamorphetl_spark.session import create_session

    spark = create_session(
        app_name="metamorph-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    warmup_dir = "/root/testdata/sf0.001"
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in all_queries().items():
        # Warm-up at tiny SF: same plan structure → whole-stage-codegen
        # compile + JIT happen outside the timed region, so the number
        # reflects steady-state engine throughput.
        try:
            fn(spark, warmup_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        start = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # one broken query must not sink the run
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        elapsed = time.perf_counter() - start
        timings[name] = round(elapsed, 3)
        total += elapsed
        # keep queries independent: no cached frames leaking across runs
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "total wall-clock over all registered queries",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
