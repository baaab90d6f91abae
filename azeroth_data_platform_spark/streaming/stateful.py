"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's escape hatch for operators Structured Streaming's
declarative aggregates can't express: here, a per-item running price
anomaly detector that maintains (count, mean, M2) Welford state across
micro-batches and emits ticks deviating more than K·σ from the running
mean — the streaming cousin of the A3 z-score gold table.

State is one small tuple per item_key — bounded, partitioned by key,
checkpointed by the engine. At 100 TB/day of ticks this scales with
distinct keys, not volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

K_SIGMA = 3.0
MIN_OBSERVATIONS = 5

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("item_key", T.StringType()),
        T.StructField("tick_id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("running_mean", T.DoubleType()),
        T.StructField("running_std", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def _detect(
    key: tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out_rows: list[dict[str, Any]] = []
    for pdf in batches:
        # process in deterministic event order within the batch
        pdf = pdf.sort_values(["ts", "tick_id"])
        for row in pdf.itertuples():
            if n >= MIN_OBSERVATIONS:
                std = (m2 / (n - 1)) ** 0.5 if n > 1 else 0.0
                if std > 0.0:
                    z = (row.price - mean) / std
                    if abs(z) >= K_SIGMA:
                        out_rows.append(
                            {
                                "item_key": key[0],
                                "tick_id": row.tick_id,
                                "price": row.price,
                                "running_mean": mean,
                                "running_std": std,
                                "z": z,
                            }
                        )
            # Welford update AFTER scoring: each tick is judged against
            # strictly-prior history
            n += 1
            delta = row.price - mean
            mean += delta / n
            m2 += delta * (row.price - mean)
    state.update((n, mean, m2))
    if out_rows:
        yield pd.DataFrame(out_rows)


def streaming_anomalies(ticks: DataFrame) -> DataFrame:
    """ticks (streaming or batch-with-groupBy): (tick_id, item_key, ts,
    price, ...) → anomalous ticks with running stats."""
    return ticks.groupBy("item_key").applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
