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


def test_streaming_pack_continues_layout_across_batches(spark, tmp_path):
    """The streaming packer must (a) match the batch pack_sequences layout
    when a batch arrives in doc_id order, and (b) CONTINUE the per-shard
    running totals into later micro-batches instead of restarting."""
    from azeroth_data_platform_spark.operators import corpus
    from azeroth_data_platform_spark.streaming.stateful import streaming_pack

    schema = "doc_id long, band string, n_tokens long, lang_pred string, shard long"
    b1 = [(1, "hi", 60, "en", 0), (2, "hi", 50, "en", 0), (3, "lo", 10, "en", 1)]
    b2 = [(4, "hi", 30, "en", 0), (5, "lo", 95, "en", 1)]
    src = tmp_path / "sampled"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(src / "*")
    )
    q = (
        streaming_pack(stream, budget=100)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("packed")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            r.doc_id: r for r in spark.sql("SELECT * FROM packed").collect()
        }
        # (a) batch equivalence on the first batch
        batch = {
            r.doc_id: r
            for r in corpus.pack_sequences(
                spark.createDataFrame(b1, schema), budget=100
            ).collect()
        }
        for d, r in batch.items():
            s = got1[d]
            assert (s.pack_id, s.pack_offset, s.crosses_boundary) == (
                r.pack_id,
                r.pack_offset,
                r.crosses_boundary,
            ), d

        spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        got2 = {r.doc_id: r for r in spark.sql("SELECT * FROM packed").collect()}
    finally:
        q.stop()

    # (b) shard 0 had 110 tokens → doc 4 starts at 110: pack 1, offset 10
    assert (got2[4].pack_id, got2[4].pack_offset) == (1, 10)
    # shard 1 had 10 tokens → doc 5 starts at 10 and spills past 100
    assert (got2[5].pack_id, got2[5].pack_offset, got2[5].crosses_boundary) == (
        0,
        10,
        True,
    )


def test_streaming_attribution_matches_batch(spark, tmp_path):
    """Last-touch attribution on a stream is bit-equal to the batch
    window operator, with the decisive touch and its conversion split
    ACROSS micro-batches (the case a per-batch window cannot see), a
    same-microsecond tie, and an out-of-lookback purchase."""
    import pandas as pd

    from azeroth_data_platform_spark.operators.windows import (
        last_touch_attribution,
    )
    from azeroth_data_platform_spark.streaming.stateful import (
        streaming_attribution,
    )

    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    h = dt.timedelta(hours=1)
    d = dt.timedelta(days=1)
    b1 = [
        (1, 1, T0, "view", 1.0),            # user 1 touch (batch 1)...
        (2, 2, T0, "click", 1.0),
        (3, 2, T0 + h, "purchase", 7.5),    # same-batch attribution
        (4, 3, T0, "signup", 1.0),          # will fall out of lookback
        (5, 4, T0, "view", 1.0),
        (6, 4, T0, "click", 1.0),           # same-us tie -> event_id wins
    ]
    b2 = [
        (7, 1, T0 + 2 * h, "purchase", 5.0),   # ...conversion in batch 2
        (8, 3, T0 + 8 * d, "purchase", 2.0),   # > 7 days -> direct
        (9, 4, T0 + h, "purchase", 3.25),      # tie resolved to click
        (10, 5, T0, "purchase", 1.0),          # no touch ever -> direct
    ]
    src = tmp_path / "attr_events"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "unix_micros(ts) AS us",
            "CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT) AS xu",
        )
    )
    q = (
        streaming_attribution(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM attr").toPandas()
    finally:
        q.stop()

    # fold the per-conversion stream rows into the channel report and
    # compare against the batch operator over the union of both batches
    stream_report = (
        got.groupby("channel")
        .agg(
            n_conversions=("event_id", "size"),
            n_users=("user_id", "nunique"),
            value_units=("xu", "sum"),
        )
        .sort_index()
    )
    batch = (
        last_touch_attribution(spark.createDataFrame(b1 + b2, schema))
        .toPandas()
        .set_index("channel")
        .sort_index()
    )
    assert list(stream_report.index) == list(batch.index)
    assert (stream_report["n_conversions"] == batch["n_conversions"]).all()
    assert (stream_report["n_users"] == batch["n_users"]).all()
    got_value = stream_report["value_units"].astype("int64") / 100.0
    assert (got_value == batch["attributed_value"]).all()
    # and the semantic pins themselves
    per_event = got.set_index("event_id")["channel"].to_dict()
    assert per_event == {3: "click", 7: "view", 8: "direct", 9: "click", 10: "direct"}


def test_streaming_multitouch_matches_batch(spark, tmp_path):
    """Multi-touch Hamilton credit on a stream is bit-equal to the batch
    operator, with touches and their conversion split ACROSS
    micro-batches and a touch pruned by the lookback."""
    from azeroth_data_platform_spark.operators.windows import (
        multitouch_attribution,
    )
    from azeroth_data_platform_spark.streaming.stateful import (
        streaming_multitouch,
    )

    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    h = dt.timedelta(hours=1)
    d = dt.timedelta(days=1)
    b1 = [
        (1, 1, T0, "view", 1.0),
        (2, 1, T0 + h, "click", 1.0),
        (3, 1, T0 + 2 * h, "signup", 1.0),  # three touches in batch 1
        (4, 2, T0 - 8 * d, "view", 1.0),    # will be out of lookback
        (5, 2, T0, "click", 1.0),
    ]
    b2 = [
        (6, 1, T0 + 3 * h, "purchase", 9.0),   # 3-way split across batches
        (7, 2, T0 + h, "purchase", 2.0),       # old view pruned -> click only
        (8, 3, T0, "purchase", 4.0),           # never any touch -> direct
    ]
    src = tmp_path / "mt_events"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "unix_micros(ts) AS us",
            "CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT) AS xu",
        )
    )
    q = (
        streaming_multitouch(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mt_attr")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM mt_attr").toPandas()
    finally:
        q.stop()

    stream_report = (
        got.assign(vc=lambda f: f["xu"] * f["credit_ppm"])
        .groupby("channel")
        .agg(
            n_touchpoints=("conv_eid", "size"),
            n_conversions=("conv_eid", "nunique"),
            credit_sum_ppm=("credit_ppm", "sum"),
            vc=("vc", "sum"),
        )
        .assign(value_credit_units=lambda f: f["vc"] // 1_000_000)
        .drop(columns="vc")
        .sort_index()
    )
    batch = (
        multitouch_attribution(spark.createDataFrame(b1 + b2, schema))
        .toPandas()
        .set_index("channel")
        .sort_index()
    )
    assert list(stream_report.index) == list(batch.index)
    for col in ("n_touchpoints", "n_conversions", "credit_sum_ppm", "value_credit_units"):
        assert (stream_report[col].astype("int64") == batch[col]).all(), col
    # credit conservation on the stream: 1e6 per conversion, 3 conversions
    assert int(got["credit_ppm"].sum()) == 3_000_000


def test_multitouch_state_pruned_on_conversions_and_timeout():
    """ADVICE r8: (a) a burst of touches followed by ONLY conversions must
    still shrink state to the lookback (prune fires on conversion arrival,
    not just touch arrival); (b) a timed-out idle user's state is removed.
    Pure-Python probe of the state function — no stream needed."""
    import pandas as pd

    from azeroth_data_platform_spark.streaming.stateful import (
        ATTR_IDLE_TIMEOUT_US,
        ATTR_LOOKBACK_US,
        _make_attribution_state,
        _make_multitouch_state,
    )

    class FakeState:
        def __init__(self, value=None, timed_out=False):
            self._v = value
            self.hasTimedOut = timed_out
            self.removed = False
            self.timeout_ts_ms = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v, self.removed = None, True

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ms):
            self.timeout_ts_ms = ms

    _multitouch_state = _make_multitouch_state(evict=True)
    _attribution_state = _make_attribution_state(evict=True)

    day_us = 86_400 * 1_000_000
    # 3 touches on days 0-2, then conversions only on days 1 and 12: the
    # day-12 conversion must prune all three stale touches from state
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "us": [0, day_us, 2 * day_us, 1 * day_us + 1, 12 * day_us],
            "event_type": ["view", "click", "view", "purchase", "purchase"],
            "xu": [0, 0, 0, 500, 700],
        }
    )
    st = FakeState()
    out = list(_multitouch_state((1,), iter([events]), st))
    rows = pd.concat(out, ignore_index=True)
    # day-1 conversion splits over the 2 touches seen so far; day-12 is direct
    assert int(rows["credit_ppm"].sum()) == 2_000_000
    assert set(rows.loc[rows["conv_eid"] == 5, "channel"]) == {"direct"}
    channels, uss, eids = st.get
    assert uss == [], "conversion-side prune must empty the stale touch list"
    # eviction registered at last-event-time + 2x lookback (event-time ms)
    assert st.timeout_ts_ms == (12 * day_us + ATTR_IDLE_TIMEOUT_US) // 1000
    assert ATTR_IDLE_TIMEOUT_US == 2 * ATTR_LOOKBACK_US

    # timed-out invocation: state dropped, nothing emitted
    st2 = FakeState(value=(["view"], [0], [1]), timed_out=True)
    assert list(_multitouch_state((1,), iter([]), st2)) == []
    assert st2.removed

    st3 = FakeState(value=("view", 0), timed_out=True)
    assert list(_attribution_state((1,), iter([]), st3)) == []
    assert st3.removed

    # r10 (ADVICE #3): in evict=False (no-watermark, disorder-tolerant)
    # mode the conversion-side prune is SKIPPED — an out-of-order EARLIER
    # conversion arriving in a later batch must still find its in-lookback
    # touches, not be misattributed 'direct' because a newer conversion's
    # cutoff already dropped them.
    _mt_unbounded = _make_multitouch_state(evict=False)
    st4 = FakeState()
    batch1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "us": [0, 12 * day_us],  # touch day 0, conversion day 12
            "event_type": ["view", "purchase"],
            "xu": [0, 900],
        }
    )
    out1 = pd.concat(list(_mt_unbounded((1,), iter([batch1]), st4)))
    assert set(out1["channel"]) == {"direct"}  # day-12 conv: touch too old
    # touch must SURVIVE in state (no conversion-side prune without a
    # watermark bounding disorder)
    assert st4.get[1] == [0]
    batch2 = pd.DataFrame(
        {
            "event_id": [3],
            "us": [5 * day_us],  # out-of-order EARLIER conversion
            "event_type": ["purchase"],
            "xu": [100],
        }
    )
    out2 = pd.concat(list(_mt_unbounded((1,), iter([batch2]), st4)))
    assert list(out2["channel"]) == ["view"], (
        "disorder-tolerant mode must attribute the late-arriving earlier "
        "conversion to its in-lookback touch"
    )

    # r11 (r10 ADVICE #1): the TOUCH-side prune must also be skipped in
    # no-watermark mode — a NEWER touch arriving first would otherwise
    # prune the old touch, and an out-of-order EARLIER conversion in a
    # later batch would be misattributed 'direct' (touch-then-conversion
    # disorder, the half the r10 fix left open).
    st5 = FakeState()
    batch_a = pd.DataFrame(
        {
            "event_id": [1, 2],
            "us": [0, 12 * day_us],  # touch day 0, NEWER touch day 12
            "event_type": ["view", "click"],
            "xu": [0, 0],
        }
    )
    assert list(_mt_unbounded((1,), iter([batch_a]), st5)) == []
    assert st5.get[1] == [0, 12 * day_us], (
        "no-watermark mode must keep the day-0 touch: a newer touch's "
        "cutoff must not prune the disorder-tolerant store"
    )
    batch_b = pd.DataFrame(
        {
            "event_id": [3],
            "us": [5 * day_us],  # out-of-order EARLIER conversion
            "event_type": ["purchase"],
            "xu": [700],
        }
    )
    out_b = pd.concat(list(_mt_unbounded((1,), iter([batch_b]), st5)))
    assert list(out_b["channel"]) == ["view"], (
        "touch-then-conversion disorder: the late-arriving earlier "
        "conversion must still find the day-0 touch"
    )
    # and the bounded mode still prunes on touch arrivals (the contract)
    st6 = FakeState()
    _mt_bounded = _make_multitouch_state(evict=True)
    assert list(_mt_bounded((1,), iter([batch_a]), st6)) == []
    assert st6.get[1] == [12 * day_us], (
        "evict mode must prune the out-of-lookback touch on touch arrival"
    )


def test_streaming_attribution_event_time_eviction(spark, tmp_path):
    """With evict_watermark set, a user idle past 2x the lookback is
    dropped from the state store once the watermark passes their horizon
    (state scales with ACTIVE users); results are unaffected because an
    expired touch could never be credited anyway."""
    from azeroth_data_platform_spark.streaming.stateful import (
        streaming_attribution,
    )

    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    d = dt.timedelta(days=1)
    batches = [
        [(1, 1, T0, "view", 1.0)],
        [(2, 2, T0 + 40 * d, "click", 1.0)],
        # third batch: watermark is now ~T0+40d, far past user 1's
        # T0+14d horizon -> user 1 evicted during this batch
        [(3, 3, T0 + 41 * d, "view", 1.0)],
    ]
    src = tmp_path / "evict_events"
    src.mkdir()
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "unix_micros(ts) AS us",
            "CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT) AS xu",
        )
    )
    q = (
        streaming_attribution(stream, evict_watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("evict_attr")
        .start()
    )
    try:
        q.processAllAvailable()
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    # users 2 and 3 remain; user 1 (idle > 14 days of event time) evicted
    assert state_rows == 2
    assert spark.sql("SELECT * FROM evict_attr").count() == 0  # no conversions
