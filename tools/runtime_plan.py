"""Dump the AQE FINAL executed plan (after running the query) for named
queries — r13 VERDICT #5: static explains show `AdaptiveSparkPlan
isFinalPlan=false`, so runtime-only effects (ReusedExchange, AQE
coalescing, skew splits) are invisible in the plans/ dumps. This tool
executes the query through the noop sink first, then prints the
re-optimized final plan.

Usage: python tools/runtime_plan.py [--sf-dir DIR] [--out-dir DIR] name...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out_dir or os.path.join(repo, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("runtime_plan")
    for name in args.names:
        df = harness.ALL_QUERIES[name](spark, args.sf_dir)
        # collect() (NOT a noop write): the write wraps the plan in its
        # own QueryExecution, so df's AdaptiveSparkPlanExec would never
        # finalize — collect executes THIS object's plan in place. Only
        # use on queries with small results.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_runtime_after.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        reused = plan.count("ReusedExchange")
        print(f"{name}: isFinalPlan={'isFinalPlan=true' in plan}"
              f" ReusedExchange x{reused} -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
