"""Alternating in-session A/B for the r12b shingle/fps checkpoints on the
INDIRECT consumers (clean_corpus, neardup_clusters, dup_stats...).

The base arm shadows .localCheckpoint on the shingles()/fingerprints()
output with a no-op instance attribute — reverting exactly the new
checkpoints without touching any other checkpoint in the same queries.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azeroth_data_platform_spark import harness  # noqa: E402
from azeroth_data_platform_spark.operators import dedup  # noqa: E402
from azeroth_data_platform_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(os.environ.get("AB_PAIRS", "6"))

_ORIG_SHINGLES = dedup.shingles
_ORIG_FPS = dedup.simhash_fingerprints


def _no_ck_shingles(documents, n=dedup.SHINGLE_N):
    df = _ORIG_SHINGLES(documents, n)
    df.localCheckpoint = lambda eager=True: df
    return df


def _no_ck_fps(documents):
    df = _ORIG_FPS(documents)
    df.localCheckpoint = lambda eager=True: df
    return df


def set_base() -> None:
    dedup.shingles = _no_ck_shingles
    dedup.simhash_fingerprints = _no_ck_fps


def set_new() -> None:
    dedup.shingles = _ORIG_SHINGLES
    dedup.simhash_fingerprints = _ORIG_FPS


def run_once(spark, name: str) -> float:
    gc.collect()
    t0 = time.perf_counter()
    harness.ALL_QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    queries = sys.argv[1:] or [
        "tp_clean_corpus",
        "tp_train_sample",
        "dd_cluster_sizes",
        "dd_dup_stats_by_source",
        "dd_neardup_clusters",
    ]
    spark = get_spark("ab_indirect")
    harness.ALL_QUERIES["a8_distinct_items"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for q in queries:
        base, var = [], []
        set_base(); run_once(spark, q)
        set_new(); run_once(spark, q)
        for i in range(PAIRS):
            set_base()
            spark.sparkContext.setJobDescription(f"{q}/base/{i}")
            base.append(run_once(spark, q))
            set_new()
            spark.sparkContext.setJobDescription(f"{q}/new/{i}")
            var.append(run_once(spark, q))
        deltas = [v - b for b, v in zip(base, var)]
        out[q] = {
            "base_median": statistics.median(base),
            "new_median": statistics.median(var),
            "pair_delta_median": statistics.median(deltas),
            "base": base,
            "new": var,
        }
        print(
            f"{q:24s} base={statistics.median(base):6.3f} "
            f"new={statistics.median(var):6.3f} "
            f"median pair delta={statistics.median(deltas):+.3f}",
            flush=True,
        )
    set_new()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
