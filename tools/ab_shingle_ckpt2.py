"""Tighter A/B for the shingle localCheckpoint: alternating runs.

For each query, 2 discarded warm-ups (one per arm), then N alternating
(base, variant) pairs in the same session — pairwise deltas cancel the
host drift that made the block A/B/A ambiguous. Reports per-query median
of each arm plus the median pairwise delta.
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


def _ck_shingles(documents, n=dedup.SHINGLE_N):
    return _ORIG_SHINGLES(documents, n).localCheckpoint()


def run_once(spark, name: str) -> float:
    gc.collect()
    t0 = time.perf_counter()
    harness.ALL_QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    queries = sys.argv[1:] or [
        "dd_minhash_lsh",
        "dd_ngram_jaccard",
        "dd_jaccard_histogram",
        "dd_containment",
        "dd_recall_report",
    ]
    spark = get_spark("ab_shingle_ckpt2")
    harness.ALL_QUERIES["a8_distinct_items"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for q in queries:
        base, var = [], []
        # one discarded warm-up per arm (plan compile)
        dedup.shingles = _ORIG_SHINGLES
        run_once(spark, q)
        dedup.shingles = _ck_shingles
        run_once(spark, q)
        for i in range(PAIRS):
            dedup.shingles = _ORIG_SHINGLES
            spark.sparkContext.setJobDescription(f"{q}/base/{i}")
            base.append(run_once(spark, q))
            dedup.shingles = _ck_shingles
            spark.sparkContext.setJobDescription(f"{q}/ckpt/{i}")
            var.append(run_once(spark, q))
        deltas = [v - b for b, v in zip(base, var)]
        out[q] = {
            "base_median": statistics.median(base),
            "ckpt_median": statistics.median(var),
            "pair_delta_median": statistics.median(deltas),
            "base": base,
            "ckpt": var,
        }
        print(
            f"{q:22s} base={statistics.median(base):6.3f} "
            f"ckpt={statistics.median(var):6.3f} "
            f"median pair delta={statistics.median(deltas):+.3f}",
            flush=True,
        )
    dedup.shingles = _ORIG_SHINGLES
    print(json.dumps(out))


if __name__ == "__main__":
    main()
