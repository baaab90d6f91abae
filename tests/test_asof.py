"""As-of join unit semantics: no-predecessor NULLs, equal-ts inclusivity,
key isolation."""

from __future__ import annotations

import datetime as dt

from azeroth_data_platform_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_asof_join_semantics(spark):
    trades = spark.createDataFrame(
        [
            (1, "ore", T0 - dt.timedelta(minutes=5), 99.0),  # before any quote → NULL
            (2, "ore", T0 + dt.timedelta(minutes=1), 100.0),
            (3, "ore", T0 + dt.timedelta(minutes=10), 101.0),  # same ts as a quote → inclusive
            (4, "herb", T0 + dt.timedelta(minutes=2), 50.0),  # other key: own quotes only
        ],
        "trade_id long, item_key string, ts timestamp, trade_price double",
    )
    quotes = spark.createDataFrame(
        [
            ("ore", T0, 10.0),
            ("ore", T0 + dt.timedelta(minutes=10), 12.0),
            ("herb", T0, 7.0),
        ],
        "item_key string, ts timestamp, quote_price double",
    )
    out = {
        r.trade_id: r
        for r in asof_join(trades, quotes, key="item_key", right_values=("quote_price",)).collect()
    }
    assert len(out) == 4
    assert out[1].asof_quote_price is None and out[1].asof_ts is None
    assert out[2].asof_quote_price == 10.0 and out[2].asof_ts == T0
    assert out[3].asof_quote_price == 12.0  # ts == quote ts → matches (>=)
    assert out[4].asof_quote_price == 7.0  # herb never sees ore quotes


def test_range_join_window_edges(spark):
    from azeroth_data_platform_spark.operators.asof import range_join

    trades = spark.createDataFrame(
        [(1, "ore", T0)], "trade_id long, item_key string, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [
            ("ore", T0 - dt.timedelta(seconds=301), 1.0),  # just outside window
            ("ore", T0 - dt.timedelta(seconds=300), 2.0),  # exactly at edge → in
            ("ore", T0 - dt.timedelta(seconds=1), 3.0),
            ("ore", T0, 4.0),  # equal ts → in
            ("ore", T0 + dt.timedelta(seconds=1), 5.0),  # future → out
            ("herb", T0, 9.0),  # other key → out
        ],
        "item_key string, ts timestamp, quote_price double",
    )
    got = sorted(
        r.quote_price_r
        for r in range_join(trades, quotes, key="item_key", window_seconds=300).collect()
    )
    assert got == [2.0, 3.0, 4.0]


def test_asof_join_tied_right_ts_deterministic(spark):
    """Multiple right rows at the same (key, ts): with right_id the highest
    id (latest-arriving quote) wins, regardless of partition order."""
    trades = spark.createDataFrame(
        [(1, "ore", T0 + dt.timedelta(minutes=1))],
        "trade_id long, item_key string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [("ore", T0, 10.0, 7), ("ore", T0, 11.0, 9), ("ore", T0, 12.0, 8)],
        "item_key string, ts timestamp, quote_price double, quote_id long",
    )
    for parts in (1, 8):
        out = asof_join(
            trades,
            quotes.repartition(parts),
            key="item_key",
            right_values=("quote_price",),
            right_id="quote_id",
        ).collect()
        assert len(out) == 1
        assert out[0].asof_quote_price == 11.0  # quote_id 9 wins the tie
