"""Bitmap presence sketches: per-key activity masks in pure bit algebra.

The reference answers "is this item currently listed / how fresh is its
history" by scanning daily rows (reference main.py:31-79 date filters);
at 100 TB the same questions want a BITMAP INDEX: one integer per key
whose bit i says "active i days before the anchor". This module builds
that mask with a single `bit_or` aggregate — a commutative idempotent
monoid, so partial (map-side) aggregation is free and duplicate rows are
harmless — and derives the activity metrics (total days, last-7 window,
current and longest streaks) as row-local integer expressions that never
leave whole-stage codegen. The mask column itself is the product: 28
day-rows compressed to one BIGINT per key, the fixed-width cousin of a
roaring bitmap, joinable/filterable by any downstream query
(`mask & 127 <> 0` = "active this week") without touching the fact table.

Streak extraction without windows or loops, in portable arithmetic
(DuckDB's `^` is exponentiation and its xor is a function, so the twins
avoid xor entirely):

* current streak (trailing ones): ``m - (m & (m + 1))`` isolates the
  trailing-ones mask (adding 1 carries through exactly those bits);
  popcount gives the length.
* longest streak: chain ``c_k = c_{k-1} & (c_{k-1} << 1)`` — after k
  steps a bit survives iff it heads a run of length > k, so the longest
  run is the number of nonzero links in the chain. ACTIVITY_DAYS-1
  fixed steps, data-independent, exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTIVITY_DAYS = 28  # trailing window width (bits in the mask)


def activity_bitmap(silver: DataFrame, days: int = ACTIVITY_DAYS) -> DataFrame:
    """Per-item activity mask over the trailing `days` days (bit i = any
    auction i days before the global max date) plus the derived metrics:
    days_active, active_last7, current_streak, longest_streak."""
    anchor = silver.agg(F.max("snapshot_date").alias("d1"))
    masked = (
        silver.select("item_id", "snapshot_date")
        .crossJoin(F.broadcast(anchor))
        .withColumn("idx", F.expr("datediff(d1, snapshot_date)"))
        .where((F.col("idx") >= 0) & (F.col("idx") < days))
        .groupBy("item_id")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), idx)")).alias("mask"))
    )
    # longest-run chain: c_k = c_{k-1} & (c_{k-1} << 1), k = 1..days-1
    out = masked.withColumn("c0", F.col("mask"))
    for k in range(1, days):
        out = out.withColumn(
            f"c{k}", F.expr(f"c{k - 1} & shiftleft(c{k - 1}, 1)")
        )
    longest = " + ".join(
        f"(CASE WHEN c{k} <> 0 THEN 1 ELSE 0 END)" for k in range(days)
    )
    return out.select(
        "item_id",
        "mask",
        F.expr("bit_count(mask)").cast("bigint").alias("days_active"),
        F.expr("bit_count(mask & 127)").cast("bigint").alias("active_last7"),
        F.expr("bit_count(mask - (mask & (mask + 1)))")
        .cast("bigint")
        .alias("current_streak"),
        F.expr(f"CAST({longest} AS BIGINT)").alias("longest_streak"),
    ).orderBy("item_id")


def activity_bitmap_sql(silver_sql_cte: str, days: int = ACTIVITY_DAYS) -> str:
    """DuckDB twin of :func:`activity_bitmap` (expects `silver` CTE)."""
    chain = ",\n  ".join(
        f"s{k} AS (SELECT *, c{k - 1} & (c{k - 1} << 1) AS c{k} FROM s{k - 1})"
        for k in range(1, days)
    )
    longest = " + ".join(
        f"(CASE WHEN c{k} <> 0 THEN 1 ELSE 0 END)" for k in range(days)
    )
    return f"""{silver_sql_cte},
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM silver),
  idxed AS (SELECT s.item_id, (anchor.d1 - s.snapshot_date) AS idx
            FROM silver s, anchor
            WHERE (anchor.d1 - s.snapshot_date) >= 0
              AND (anchor.d1 - s.snapshot_date) < {days}),
  s0 AS (SELECT item_id, bit_or(CAST(1 AS BIGINT) << idx) AS mask,
                bit_or(CAST(1 AS BIGINT) << idx) AS c0
         FROM idxed GROUP BY item_id),
  {chain}
SELECT item_id, mask,
       CAST(bit_count(mask) AS BIGINT) AS days_active,
       CAST(bit_count(mask & 127) AS BIGINT) AS active_last7,
       CAST(bit_count(mask - (mask & (mask + 1))) AS BIGINT) AS current_streak,
       CAST({longest} AS BIGINT) AS longest_streak
FROM s{days - 1} ORDER BY item_id"""
