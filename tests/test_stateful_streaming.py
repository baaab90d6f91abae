"""applyInPandasWithState anomaly detector: state persists across
micro-batches and flags only true outliers."""

from __future__ import annotations

import datetime as dt

from azeroth_data_platform_spark.streaming.stateful import streaming_anomalies

SCHEMA = "tick_id long, item_key string, ts timestamp, price double, quantity bigint"
T0 = dt.datetime(2024, 1, 1, 9, 0, 0)


def test_anomaly_state_spans_micro_batches(spark, tmp_path):
    src = tmp_path / "ticks"
    src.mkdir()
    # batch 1: 8 calm ticks around 100
    calm = [
        (i, "ore", T0 + dt.timedelta(minutes=i), 100.0 + (i % 3) - 1, 1) for i in range(8)
    ]
    spark.createDataFrame(calm, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        str(src / "*")
    )
    q = (
        streaming_anomalies(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("anomalies")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM anomalies").count() == 0  # calm baseline

        # batch 2: one wild spike + one calm tick — state carried over must
        # flag only the spike
        b2 = [
            (100, "ore", T0 + dt.timedelta(minutes=20), 500.0, 1),
            (101, "ore", T0 + dt.timedelta(minutes=21), 100.0, 1),
        ]
        spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM anomalies").collect()
    finally:
        q.stop()

    assert [r.tick_id for r in rows] == [100]
    [spike] = rows
    assert spike.z > 3.0 and abs(spike.running_mean - 100.0) < 1.0
