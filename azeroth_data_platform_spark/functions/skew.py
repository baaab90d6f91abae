"""Skew-mitigation helpers.

AQE's skew-join handling (on in session.py) covers joins; for *aggregations*
over pathologically hot keys (one item_id holding 10% of 100 TB), a salted
two-phase aggregate bounds any single task's input: phase 1 groups by
(key, salt) — the hot key fans out over `buckets` tasks — phase 2 merges the
partials. With the engine's decimal/integer-space accumulators
(functions/numerics.py) the two-phase result is bit-identical to the direct
aggregate, so salting is a pure physical rewrite.

Spark's built-in partial aggregation already does map-side combining; the
salt matters when a hot key's *reduce side* exceeds one executor — i.e.
extreme skew, where even combined partials for one key overflow a task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    buckets: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for additive aggregates.

    `sums` maps output column name → aggregate Column usable in both
    phases (sum-like: decomposable as sum-of-partials). `salt_source`
    defaults to a hash of the full row (deterministic, uniform).
    """
    salt = F.pmod(
        salt_source if salt_source is not None else F.xxhash64(*df.columns),
        F.lit(buckets),
    )
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in sums.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in sums]
    )
