#!/usr/bin/env python3
"""Time the full streaming-parity fixture suite build (all 8 families)
exactly as the first bench consumer pays it: one fresh session, one
_parity_suite call, wall-clock + per-family attributed seconds printed
as JSON. Usage:

    python tools/time_parity_suite.py [sf_dir]

Set METAMORPH_SEQ_SEED_WRITES=1 to force each family's independent
seed/delta writes back to sequential (the A/B control for the r14
intra-family overlap change).
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
        app_name="time-parity-suite",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    from asritha_metamorphetl_spark.plans.streaming_queries import (
        _parity_suite,
    )

    session_mod.CURRENT_CONSUMER = "suite-timer"
    t0 = time.perf_counter()
    _parity_suite(spark, sf_dir, "trilogy")
    wall = time.perf_counter() - t0
    out = {
        "seq_mode": bool(os.environ.get("METAMORPH_SEQ_SEED_WRITES")),
        "wall_seconds": round(wall, 2),
        "families": {
            k: v["seconds"] for k, v in session_mod.FIXTURE_BUILD_LOG.items()
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
