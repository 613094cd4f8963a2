"""Dedicated idle-session re-measure of bench rows flagged as
possible drift (the r11/r12 VERDICT #3 playbook, kept as a script):
one warm local[$SPARK_GRAFT_CPUS] session, N samples per query with
the session cache cleared before each, per-sample walls + median/min
and the 1-minute load average printed as one JSON line per query —
enough for SCALING.md to record FLAT or name the regression.

Run:  python scripts/remeasure.py layout_zorder corpus_hll_distinct \
          [--samples 5] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from swarm_spark.queries import all_queries
    from swarm_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="swarm-remeasure", master=f"local[{cpus}]"
    )
    reg = all_queries()
    spark.range(1000).count()
    for name in args.queries:
        fn = reg[name][0]
        fn(spark, args.sf_dir).collect()  # untimed plan/codegen warm-up
        walls = []
        for _ in range(args.samples):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            walls.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "samples": walls,
                    "median": sorted(walls)[len(walls) // 2],
                    "min": min(walls),
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
