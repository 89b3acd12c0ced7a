#!/usr/bin/env python3
"""Time the shared dedup/ANN fixture builds the way the bench pays
them: a fresh session touches each fixture accessor in sequence (the
first consumer of each fixture in registry order does exactly this)
and reports per-label build seconds plus the total wall of the touch
sequence. Set METAMORPH_SEQ_FIXTURES=1 for the pre-r14 sequential
build-on-first-touch control.

    python tools/time_fixture_suite.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from asritha_metamorphetl_spark import session as session_mod
    from asritha_metamorphetl_spark.session import create_session

    spark = create_session(
        app_name="time-fixture-suite",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    from asritha_metamorphetl_spark.plans import fixtures as fx

    session_mod.CURRENT_CONSUMER = "fixture-suite-timer"
    accessors = (
        fx.minhash_pairs,
        fx.minhash_cluster_labels,
        fx.ngram_jaccard_scored,
        fx.cosine_truth_topk,
        fx.l2_truth_topk_gated,
        fx.semdedup_assignment,
        fx.ivf_centroids_knn,
        fx.ivfpq_centroids,
        fx.pq_codebooks_raw,
        fx.ivfpq_residual_books,
    )
    t0 = time.perf_counter()
    for fn in accessors:
        fn(spark, sf_dir)
    wall = time.perf_counter() - t0
    out = {
        "seq_mode": bool(os.environ.get("METAMORPH_SEQ_FIXTURES")),
        "wall_seconds": round(wall, 2),
        "builds": {
            k: v["seconds"] for k, v in session_mod.FIXTURE_BUILD_LOG.items()
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
