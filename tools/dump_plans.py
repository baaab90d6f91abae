"""Dump .explain("formatted") for registered queries to plans/r12/.

Usage:
    python tools/dump_plans.py [--suffix _before] [--sf-dir DIR] [name ...]

With no names, dumps every bench headline query plus every bench extra.
Plans are static (pre-AQE) formatted explains at the bench SF so the
committed files match what bench.py actually runs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out_dir or os.path.join(repo, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    names = args.names or list(harness.ALL_QUERIES)
    spark = get_spark("dump_plans")
    n_ok = 0
    for name in names:
        if name not in harness.ALL_QUERIES:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = harness.ALL_QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{name}{args.suffix}.txt"), "w") as f:
            f.write(plan)
        n_ok += 1
    print(f"wrote {n_ok}/{len(names)} plans to {out_dir}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
