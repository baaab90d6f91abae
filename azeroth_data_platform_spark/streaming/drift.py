"""Streaming drift-monitor state: the daily value histogram as a
Structured Streaming windowed aggregation.

operators/drift.py factors day-over-day PSI into (histogram state) +
(cheap read-off) precisely so the state can be STREAM-MAINTAINED: the
per-(event_type, day, bin) count is a commutative monoid, i.e. exactly
what a tumbling 1-day event-time window with a watermark materializes in
append mode. A micro-batch ingest keeps the histogram current; the PSI
read-off (psi_day_over_day's paired groupBy) runs over the materialized
state table on whatever cadence the monitor wants — never re-scanning
raw events.

Day alignment contract (r9): F.window(ts, "1 day") is UTC-EPOCH-
aligned regardless of session timezone — deterministic across sessions,
the right call for a shared monitor state; the batch operator labels
days by session-local calendar date, and the two coincide under the UTC
production session. Late-row admission uses the previous batch's
committed watermark while eviction uses the updated one (measured), so
drops are guaranteed only from the batch after next — both pinned in
tests/test_streaming.py test_streaming_psi_histogram_hostile_conditions.

State scale: one aggregation row per (type, day, bin) ≤ #types × 64 per
day, pruned by the watermark — independent of event volume. Batch/stream
bit-equality is pinned in tests/test_streaming.py (same bin expression,
same counts, the ohlc "no silver fork" property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numerics import int_units

WATERMARK = "2 days"


def streaming_value_histogram(events: DataFrame) -> DataFrame:
    """events: streaming frame (event_type, ts, value, ...) →
    (event_type, day, bin, c) finalized daily histogram rows, append mode
    after the watermark closes each day."""
    binned = events.select(
        "event_type",
        "ts",
        int_units("value").cast("bigint").alias("xu"),
    ).select(
        "event_type",
        "ts",
        F.expr("CASE WHEN xu <= 0 THEN 0 ELSE length(bin(xu)) END").alias("bin"),
    )
    return (
        binned.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "event_type",
            F.col("w.start").cast("date").alias("day"),
            "bin",
            "c",
        )
    )
