#!/usr/bin/env python3
"""Per-query profiling harness for the optimization rounds.

Times individual registered queries exactly the way bench.py does
(same session factory, same warmup-at-sf0.001, same noop sink) but for
an arbitrary subset, with optional repeats and .explain("formatted")
dumps. Usage:

    python tools/profile_queries.py SF_DIR [--repeat N] [--explain DIR] \
        [--suffix TAG] query [query ...]

Prints one JSON object {query: [sec, ...]} to stdout; Spark chatter
goes to stderr. With --explain DIR, writes DIR/<query>_<TAG>.txt
containing the formatted physical plan (the deliverable format for
plans/r13/).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    json_fd = os.dup(1)
    os.dup2(2, 1)

    from asritha_metamorphetl_spark.plans.registry import all_queries
    from asritha_metamorphetl_spark.session import create_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = create_session(
        app_name="metamorph-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from asritha_metamorphetl_spark.sources.files import Catalog

    cat = Catalog(args.sf_dir)
    for table in cat.tables:
        if os.path.exists(cat.path(table)):
            cat.load(spark, table).write.format("noop").mode("overwrite").save()

    registry = all_queries()
    warmup_dir = "/root/testdata/sf0.001"
    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = registry[name]
        if not args.no_warmup:
            try:
                fn(spark, warmup_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
            spark.catalog.clearCache()
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf_dir)
            with open(
                os.path.join(
                    args.explain, f"{name}_{args.suffix}.txt"
                ),
                "w",
            ) as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
            spark.catalog.clearCache()
        runs = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            start = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - start, 3))
            spark.catalog.clearCache()
        out[name] = runs
    spark.stop()
    os.write(json_fd, (json.dumps(out, indent=1) + "\n").encode())
    os.close(json_fd)


if __name__ == "__main__":
    main()
