"""Streaming hourly OHLC (SURVEY.md §2.9).

The reference is batch-only micro-snapshot, but its gold_price_history table
has hourly grain (/root/reference/backend_api/app/models.py:50) — implying a
continuous feed. This is the Structured Streaming expression of operator A2:
tumbling 1-hour event-time windows with a 2-hour watermark for late ticks,
emitting append-mode finalized candles.

State scale: one aggregation state row per (item_key, hour window), pruned
by the watermark — bounded by (#items × watermark/1h), independent of tick
volume. For the batch variant see operators/gold.py::hourly_ohlc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WATERMARK = "2 hours"


def streaming_hourly_ohlc(ticks: DataFrame) -> DataFrame:
    """ticks: streaming frame (tick_id, item_key, ts, price, quantity) →
    per (item_key, hour) OHLC candles, append mode after watermark close.

    open/close use min_by/max_by on (ts, tick_id) exactly like the batch
    operator, so a backfill and the stream produce identical candles —
    the medallion "no silver fork" property.
    """
    order_key = F.struct(F.col("ts"), F.col("tick_id"))
    return (
        ticks.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "item_key")
        .agg(
            F.min_by("price", order_key).alias("open_price"),
            F.max_by("price", order_key).alias("close_price"),
            F.max("price").alias("high_price"),
            F.min("price").alias("low_price"),
            (
                F.sum(F.col("price").cast("decimal(28,2)")).cast("double")
                / F.count("price")
            ).alias("average_price"),
            F.sum("quantity").alias("volume"),
        )
        .select(F.col("w.start").alias("snapshot_hour"), "*")
        .drop("w")
    )
