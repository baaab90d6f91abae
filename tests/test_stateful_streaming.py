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


def test_session_timeout_evicts_idle_keys(spark, tmp_path):
    """A key that never speaks again must still close its session: the
    event-time timeout evicts it once the watermark passes its idle
    deadline ('timeout'), while keys with later data close by 'gap'."""
    from azeroth_data_platform_spark.streaming.stateful import streaming_sessions

    schema = "user_id long, ts timestamp"
    src = tmp_path / "events"
    src.mkdir()
    b1 = [
        (1, T0),
        (1, T0 + dt.timedelta(minutes=1)),
        (2, T0 + dt.timedelta(minutes=2)),  # user 2 never speaks again
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(src / "*")
    )
    q = (
        streaming_sessions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM sessions").count() == 0  # all sessions open

        # batch 2: user 1 reappears 2h later → watermark jumps to ~1h50m,
        # far past both idle deadlines (last_event + 30min gap)
        b2 = [(1, T0 + dt.timedelta(hours=2))]
        spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        # one more empty-ish batch so timed-out state is surfaced
        b3 = [(3, T0 + dt.timedelta(hours=2, minutes=1))]
        spark.createDataFrame(b3, schema).coalesce(1).write.parquet(str(src / "b3"))
        q.processAllAvailable()

        rows = {
            (r.user_id, r.closed_by): r
            for r in spark.sql("SELECT * FROM sessions").collect()
        }
        gap = rows[(1, "gap")]  # user 1's first session closed by its own later event
        assert gap.n_events == 2 and gap.session_end == T0 + dt.timedelta(minutes=1)
        timeout = rows[(2, "timeout")]  # user 2 evicted by the state timeout
        assert timeout.n_events == 1
        assert timeout.session_end == T0 + dt.timedelta(minutes=2)
    finally:
        q.stop()
