"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the most recent right row (same key, right.ts <=
left.ts). The classic distributed implementation: union both sides tagged,
sort within key by (ts, side) with the right side winning ties, and
forward-fill the right columns with `last(..., ignorenulls=True)` over a
running frame — one shuffle on the key, one sort, no range explosion and
no per-row probing. This is how quote/trade alignment, SCD lookups, and
sensor alignment run at 100 TB.

DuckDB has a native ASOF JOIN, which makes the oracle an independent
implementation — the strongest kind of differential check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Interval join: all right rows with right.ts ∈ [left.ts − window, left.ts].

    Spark would plan a raw inequality join as a cross product per key; the
    scale pattern is time-bucketing: both sides get bucket = ts div window,
    the left probes its own and the previous bucket (any in-window right
    row lives in one of the two), and the exact predicate filters after the
    equi-join. Turns an O(n·m)-per-key nested loop into two hash-join
    lookups per row.

    Returns left columns + right columns suffixed `_r` (right's key/ts
    renamed), one output row per qualifying pair.
    """
    win_us = window_seconds * 1_000_000
    bucket_l = F.expr(f"unix_micros({left_ts}) DIV {win_us}")  # integer div: no float boundary drift
    bucket_r = F.expr(f"unix_micros(_rts) DIV {win_us}")
    r = right.select(
        F.col(key).alias("_rkey"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c not in (key, right_ts)],
    ).withColumn("_rbucket", bucket_r)
    l = left.withColumn("_bucket", bucket_l).withColumn(
        "_probe", F.explode(F.array(F.col("_bucket"), F.col("_bucket") - 1))
    )
    joined = l.join(
        r, (F.col(key) == F.col("_rkey")) & (F.col("_probe") == F.col("_rbucket"))
    )
    in_window = (F.col("_rts") <= F.col(left_ts)) & (
        F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_rts"))
        <= window_seconds * 1_000_000
    )
    return joined.where(in_window).drop("_bucket", "_probe", "_rbucket", "_rkey")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: tuple[str, ...] = ("price",),
    right_id: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the latest right values at-or-before
    its timestamp (NULLs when no right row precedes it).

    When several right rows share the same (key, ts), pass `right_id` (a
    unique right-side column) — it joins the window ordering so the winner
    is deterministic (highest id, i.e. latest-arriving) instead of
    partition-order-dependent. Without it, callers should pre-deduplicate
    the right side to one row per (key, ts).
    """
    lcols = [c for c in left.columns]
    rid_type = right.schema[right_id].dataType if right_id is not None else None
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_rv_{v}") for v in right_values],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *([F.lit(None).cast(rid_type).alias("_rid")] if right_id is not None else []),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"_rv_{v}") for v in right_values],
        F.col(right_ts).alias("_rts"),
        *([F.col(right_id).alias("_rid")] if right_id is not None else []),
    ).select(*l.columns)  # align column order for the union
    u = l.unionByName(r)
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if right_id is not None:
        # right rows (_side=0) sort before left rows at equal ts; among tied
        # right rows the highest id lands last and wins the forward fill
        order.insert(1, F.col("_rid").asc_nulls_last())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *lcols,
        "_side",
        *[
            F.last(f"_rv_{v}", ignorenulls=True).over(w).alias(f"asof_{v}")
            for v in right_values
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    return filled.where(F.col("_side") == 1).drop("_side")
