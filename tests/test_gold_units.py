"""Unit tests for gold operators on tiny literal frames (SURVEY.md §5.2).

Edge cases the oracle corpus can't isolate: first-day lag NULLs, floor
ties, gap days in the 7-day calendar frame, single-observation stddev,
zero-stddev z-score guard, empty input.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azeroth_data_platform_spark.operators import gold

D = dt.date


def _silver(spark, rows):
    return spark.createDataFrame(
        rows, "id long, item_id long, quantity bigint, unit_price double, snapshot_date date"
    )


def test_daily_summary_single_group(spark):
    df = _silver(
        spark,
        [
            (1, 10, 2, 100.0, D(2024, 1, 1)),
            (2, 10, 3, 200.0, D(2024, 1, 1)),
            (3, 10, 1, 300.0, D(2024, 1, 1)),
        ],
    )
    [r] = gold.daily_market_summary(df).collect()
    assert r.min_buyout == 100.0 and r.max_buyout == 300.0
    assert r.median_buyout == 200.0
    assert r.quantity_available == 6
    assert r.market_cap == 100.0 * 2 + 200.0 * 3 + 300.0 * 1
    assert abs(r.price_volatility - 100.0) < 1e-9
    assert r.auction_count == 3


def test_daily_summary_stddev_null_for_singleton(spark):
    df = _silver(spark, [(1, 10, 2, 100.0, D(2024, 1, 1))])
    [r] = gold.daily_market_summary(df).collect()
    assert r.price_volatility is None


def test_rolling_zscore_gap_days_calendar_frame(spark):
    # days 1..7 present except a gap; the frame is calendar-based, so day 9
    # only sees days 3..9, not "last 7 rows".
    rows = [(i, 1, 1, float(100 + i), D(2024, 1, i)) for i in (1, 2, 3, 9)]
    df = _silver(spark, rows)
    out = {r.snapshot_date.day: r for r in gold.rolling_zscore(df).collect()}
    # day 9's window covers days 3..9 → only days 3 and 9 present
    assert out[9].avg_price_7d == (103.0 + 109.0) / 2
    # day 1 is a singleton window → stddev NULL → z NULL → HOLD
    assert out[1].std_dev_7d is None and out[1].z_score is None
    assert out[1].recommendation == "HOLD"


def test_rolling_zscore_zero_std_guard(spark):
    rows = [(i, 1, 1, 50.0, D(2024, 1, i)) for i in (1, 2, 3)]
    out = gold.rolling_zscore(_silver(spark, rows)).collect()
    assert all(r.z_score is None for r in out)  # identical prices → std 0 → NULL z


def test_sales_velocity_first_day_null_and_floor_at_zero(spark):
    rows = [
        (1, 1, 10, 5.0, D(2024, 1, 1)),
        (2, 1, 4, 5.0, D(2024, 1, 2)),  # stock dropped 10→4 → sales 6
        (3, 1, 9, 5.0, D(2024, 1, 3)),  # stock rose → sales floored at 0
    ]
    out = {r.snapshot_date.day: r for r in gold.sales_velocity(_silver(spark, rows)).collect()}
    assert out[1].estimated_daily_sales is None and out[1].turnover_percentage is None
    assert out[2].estimated_daily_sales == 6
    assert out[3].estimated_daily_sales == 0


def test_concentration_counts_all_floor_ties(spark):
    rows = [
        (1, 1, 2, 10.0, D(2024, 1, 1)),
        (2, 1, 3, 10.0, D(2024, 1, 1)),  # tied at floor
        (3, 1, 5, 20.0, D(2024, 1, 1)),
    ]
    [r] = gold.market_concentration(_silver(spark, rows)).collect()
    assert r.quantity_at_floor == 5 and r.total_market_quantity == 10
    assert r.floor_concentration_pct == 50.0
    assert r.market_status == "CONCENTRATED"


def test_market_index_first_day_inflation_null(spark):
    rows = [
        (1, 1, 1, 100.0, D(2024, 1, 1)),
        (2, 2, 1, 200.0, D(2024, 1, 1)),
        (3, 1, 1, 150.0, D(2024, 1, 2)),
        (4, 2, 1, 150.0, D(2024, 1, 2)),
    ]
    out = {r.snapshot_date.day: r for r in gold.market_index(_silver(spark, rows)).collect()}
    assert out[1].index_value == 150.0 and out[1].inflation_pct_daily is None
    assert out[2].index_value == 150.0 and out[2].inflation_pct_daily == 0.0
    assert out[1].items_in_index == 2


def test_sector_trends_unknown_items_fall_through(spark):
    silver = _silver(spark, [(1, 1, 1, 100.0, D(2024, 1, 1)), (2, 99, 2, 50.0, D(2024, 1, 1))])
    dim = spark.createDataFrame(
        [(1, "Copper Ore", "B1", "Trade Goods", "Metal", 1.0)],
        "item_id long, name string, quality string, item_class string, "
        "item_subclass string, vendor_price double",
    )
    out = {r.item_class: r for r in gold.sector_trends(silver, dim).collect()}
    assert out["Trade Goods"].total_quantity == 1
    assert None in out  # left join keeps unknown item under NULL class


def test_ohlc_open_close_tie_break_on_tick_id(spark):
    ts = dt.datetime(2024, 1, 1, 10, 0, 0)
    ticks = spark.createDataFrame(
        [
            (2, "ore", ts, 30.0, 1),  # same ts as tick 1 → id breaks tie
            (1, "ore", ts, 10.0, 1),
            (3, "ore", ts.replace(minute=30), 20.0, 2),
        ],
        "tick_id long, item_key string, ts timestamp, price double, quantity bigint",
    )
    [r] = gold.hourly_ohlc(ticks).collect()
    assert r.open_price == 10.0 and r.close_price == 20.0
    assert r.high_price == 30.0 and r.low_price == 10.0
    assert r.volume == 4


def test_empty_input_yields_empty_gold(spark):
    df = _silver(spark, [])
    assert gold.daily_market_summary(df).isEmpty()
    assert gold.rolling_zscore(df).isEmpty()
    assert gold.market_index(df).isEmpty()


def test_mad_outliers_flags_planted_spike(spark):
    """A flat series with one spike: the spike day (and only it) flags;
    median/MAD are immune to the spike itself."""
    from azeroth_data_platform_spark.operators import timeseries

    rows = []
    for d in range(1, 21):
        price = 10.00 if d != 7 else 99.99
        rows.append((1, f"2024-06-{d:02d}", price))
        rows.append((2, f"2024-06-{d:02d}", 10.00 + (d % 3) * 0.01))
    silver = spark.createDataFrame(
        rows, "item_id int, snapshot_date string, unit_price double"
    ).withColumn("snapshot_date", F.to_date("snapshot_date"))
    out = timeseries.mad_outliers(silver).collect()
    flagged = {(r["item_id"], str(r["snapshot_date"])) for r in out}
    assert (1, "2024-06-07") in flagged
    assert all(i != 1 or d == "2024-06-07" for i, d in flagged)
    spike = [r for r in out if r["item_id"] == 1][0]
    assert spike["median_units"] == 1000 and spike["mad_units"] == 0
    assert spike["dev_units"] == 8999 and spike["dev_over_mad_ppm"] is None


def test_mad_outliers_partition_invariant(spark):
    """Same result under adversarial repartitioning (exact-integer rule)."""
    from azeroth_data_platform_spark.operators import timeseries

    rows = [
        (i % 5, f"2024-06-{(i % 28) + 1:02d}", float((i * 37) % 100) + 0.5)
        for i in range(300)
    ]
    silver = spark.createDataFrame(
        rows, "item_id int, snapshot_date string, unit_price double"
    ).withColumn("snapshot_date", F.to_date("snapshot_date"))
    a = sorted(map(tuple, timeseries.mad_outliers(silver).collect()))
    b = sorted(map(tuple, timeseries.mad_outliers(silver.repartition(7)).collect()))
    assert a == b and len(a) > 0
