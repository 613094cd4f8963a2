"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]
  tag   e.g. r14 — writes plans/r14/<query>_<suffix>.txt
  SPARK_GRAFT_PLAN_SUFFIX=before|after (default before)

Plan capture is driver-only (no execution of the returned frame), but
queries whose builders run gate actions (the pruned rankers) or stored
fixture builds do execute those side jobs — run on an otherwise idle
host for comparable gate timings.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    only = set(sys.argv[2:])
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from swarm_spark.session import get_spark

    spark = get_spark(app_name="swarm-plan-capture", master=f"local[{cpus}]")

    from swarm_spark.queries import all_queries

    core = all_queries()
    # the bench headline list, kept in sync with bench.py
    import bench

    src = open(os.path.join(os.path.dirname(bench.__file__), "bench.py")).read()
    names = [n for n in core if f'"{n}"' in src]
    if only:
        # explicit names may be ANY registry query, not just bench rows
        # (r15: the positional-rewrite restamps touch registry-only rows
        # like text_gopher_repetition whose plans the log must evidence)
        names = [n for n in core if n in only]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = core[name][0](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"ERROR building {name}: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
