"""Scale-growth probe runner: time ALL_QUERIES entries at a base SF dir
and at a gen_scale.py-generated multiple of it, print one JSON line per
query plus a summary — the reusable form of the r8 100x flagship probe
(PERF.md "100x scale probe"; methodology: one warm JVM, single run per
query per size, base first).

Run:  python tools/probe_scale.py <base_sf_dir> <scaled_dir> <query...>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from azeroth_data_platform_spark import harness  # noqa: E402


def main() -> None:
    base_dir, scaled_dir, *names = sys.argv[1:]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = harness.ALL_QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, base_dir).write.format("noop").mode("overwrite").save()
        base_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, scaled_dir).write.format("noop").mode("overwrite").save()
        big_s = time.perf_counter() - t0
        rec = {
            "base_sec": round(base_s, 2),
            "scaled_sec": round(big_s, 2),
            "growth": round(big_s / base_s, 2) if base_s > 0 else None,
        }
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"probe": {"base": base_dir, "scaled": scaled_dir, "queries": out}}))
    spark.stop()


if __name__ == "__main__":
    main()
