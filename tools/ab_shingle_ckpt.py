"""A/B: materialize multi-consumer shingle/fingerprint relations?

PRE-r12-ONLY (r12 ADVICE #3): this script's 'base' arm assumed the
operators did NOT materialize internally. Since r12 the operators fold
these relations themselves (r13: via functions/lifecycle.materialize), so
'base' is no longer the no-materialization configuration and 'variant'
double-materializes — re-running it now yields a misleading ~0 delta.
Kept for the historical record of the r12 decision; use tools/
ab_indirect.py's no-op-shadow methodology for post-merge re-measures.

Measures, with the bench's exact methodology (noop sink, gc.collect before
each timed run, 4 consecutive runs per query, first discarded, median of 3):

  base   - HEAD code as-is
  shck   - dedup.shingles output localCheckpoint'ed (affects minhash/ngram:
           every consumer branch reads the materialized relation)
  fpck   - simhash fingerprints localCheckpoint'ed (doc-sized pin; both
           self-join sides of dd_simhash / dd_simhash_banded read it)

Run order is A/B/A per experiment (base, variant, base again) so host drift
shows up as disagreement between the two base blocks.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azeroth_data_platform_spark import harness  # noqa: E402
from azeroth_data_platform_spark.operators import dedup  # noqa: E402
from azeroth_data_platform_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def time_query(spark, name: str) -> float:
    times = []
    for _ in range(4):
        gc.collect()
        t0 = time.perf_counter()
        harness.ALL_QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(round(time.perf_counter() - t0, 3))
    return sorted(times[1:])[1], times


_ORIG_SHINGLES = dedup.shingles
_ORIG_FPS = dedup.simhash_fingerprints


def patch_shingles_ckpt() -> None:
    def ck(documents, n=dedup.SHINGLE_N):
        return _ORIG_SHINGLES(documents, n).localCheckpoint()

    dedup.shingles = ck


def patch_fps_ckpt() -> None:
    def ck(documents):
        return _ORIG_FPS(documents).localCheckpoint()

    dedup.simhash_fingerprints = ck


def unpatch() -> None:
    dedup.shingles = _ORIG_SHINGLES
    dedup.simhash_fingerprints = _ORIG_FPS


def main() -> None:
    spark = get_spark("ab_shingle_ckpt")
    # warm-up (same as bench)
    harness.ALL_QUERIES["a8_distinct_items"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    experiments = [
        ("minhash+ngram shingle ckpt", ["dd_minhash_lsh", "dd_ngram_jaccard", "dd_lsh_tuning", "dd_incremental"], patch_shingles_ckpt),
        ("simhash fps ckpt", ["dd_simhash", "dd_simhash_banded"], patch_fps_ckpt),
    ]
    out: dict[str, dict] = {}
    for label, queries, patcher in experiments:
        res: dict[str, dict] = {}
        for phase, setup in (("base1", unpatch), ("variant", patcher), ("base2", unpatch)):
            setup()
            for q in queries:
                spark.sparkContext.setJobDescription(f"{label}/{phase}/{q}")
                med, raw = time_query(spark, q)
                res.setdefault(q, {})[phase] = {"median": med, "raw": raw}
                print(f"{label:28s} {phase:8s} {q:22s} median={med:7.3f} raw={raw}", flush=True)
        out[label] = res
    unpatch()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
