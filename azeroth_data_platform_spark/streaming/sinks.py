"""Streaming → gold sinks with exactly-once semantics.

Structured Streaming gives at-least-once delivery to arbitrary sinks; the
standard exactly-once recipe is `foreachBatch` + an idempotent write keyed
by the batch's natural keys. Here the hourly OHLC stream lands in a
parquet gold table via the same append-if-absent merge as the batch
pipeline (S6 semantics) keyed on (item_key, snapshot_hour) — a replayed
micro-batch after failure re-merges to a no-op, so the gold table sees each
candle exactly once.

On a cluster with Delta this collapses to `MERGE INTO` per micro-batch
with the txn log providing the idempotency ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources import merge


def candle_sink(target_path: str):
    """foreachBatch function: append-if-absent on the candle's composite
    natural key — streaming-written gold has exactly the batch hourly_ohlc
    schema (no synthetic key column is persisted)."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        # prune_col: a micro-batch spans a narrow snapshot_hour range, so
        # the anti-join probes only that slice of the (ever-growing) gold
        # table instead of every key it has ever written.
        merge.insert_if_absent(
            batch_df.sparkSession,
            target_path,
            batch_df,
            key=["item_key", "snapshot_hour"],
            prune_col="snapshot_hour",
        )

    return _write


def start_candle_stream(candles: DataFrame, target_path: str, checkpoint: str):
    """Wire a streaming OHLC frame (streaming/ohlc.py) to the exactly-once
    gold sink."""
    return (
        candles.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(candle_sink(target_path))
        .start()
    )
