"""Stream-stream joins with watermark-bounded state.

The one Structured-Streaming surface the rest of the streaming layer
doesn't exercise: joining two UNBOUNDED inputs. The canonical shape is the
interval join — match a tick to the dimension-update (or campaign, or
session annotation) stream within a bounded event-time window. Spark keeps
both sides' state until the watermark proves no further match can arrive;
the join-time bound is therefore REQUIRED (an unbounded-time stream-stream
join would hold both streams forever), and state is bounded by
(rate × (watermark + interval)) per side.

Scale notes: the join is an equi-join on the key plus a time-range
predicate — it shuffles both streams on the key (skew class of the key,
AQE does not apply to streaming, so hot keys need pre-salting upstream);
state eviction is driven by BOTH watermarks (min of the two).

Batch parity is the correctness contract: the same join expression run as
a plain batch join over the full inputs must equal the stream-final result
(pinned in tests/test_streaming.py) — the batch/stream unification theme
the ingest/scoring/packing operators already follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_HORIZON_MIN = 10  # a tick matches updates up to this many minutes BEFORE it


def enrich_ticks_with_updates(
    ticks: DataFrame,
    updates: DataFrame,
    horizon_min: int = JOIN_HORIZON_MIN,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Interval join: each tick pairs with every update of the same
    item_key whose event time lies in (tick_ts − horizon, tick_ts].

    Works identically on two readStreams (watermark-bounded state) and on
    two batch frames (the watermark column calls are no-ops for batch) —
    one definition, both execution modes.

    ticks:   (item_key, ts, price)
    updates: (item_key, upd_ts, payload)
    """
    t = ticks.withWatermark("ts", watermark).alias("t")
    u = updates.withWatermark("upd_ts", watermark).alias("u")
    cond = (
        (F.col("t.item_key") == F.col("u.item_key"))
        & (F.col("u.upd_ts") <= F.col("t.ts"))
        & (F.col("u.upd_ts") > F.col("t.ts") - F.expr(f"INTERVAL {horizon_min} MINUTES"))
    )
    return t.join(u, cond, "inner").select(
        F.col("t.item_key").alias("item_key"),
        F.col("t.ts").alias("ts"),
        F.col("t.price").alias("price"),
        F.col("u.upd_ts").alias("upd_ts"),
        F.col("u.payload").alias("payload"),
    )
