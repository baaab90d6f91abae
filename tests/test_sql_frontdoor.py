"""SQL front-door parity for the SEVEN reference serving endpoints
(backend_api/app/main.py:31-79 + the dashboard argmin, app.py:96-98).

The reference serves each endpoint as a thin SQL SELECT over a gold
table. This module pins that the engine offers the same two front doors
over the same gold relations — `operators/serving.py` DataFrame forms and
plain SQL over `sql_catalog.register_catalog` views — and that they
return IDENTICAL rows in IDENTICAL order. Both doors share the gold view
as input, so any drift is a front-door bug, not a gold-layer diff.

Also pins that a predicate written in endpoint SQL still pushes through
the logical view to the parquet scan (the view must never act as an
optimization fence)."""

from __future__ import annotations

import pytest

from azeroth_data_platform_spark import sql_catalog
from azeroth_data_platform_spark.operators import serving


@pytest.fixture(scope="module")
def catalog(spark, sf_dir):
    sql_catalog.register_catalog(spark, sf_dir)
    return spark


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_o1_latest_daily_summaries_sql(catalog):
    spark = catalog
    df = serving.latest_daily_summaries(
        spark.table("gold_daily_market_summary"), limit=100
    )
    sql = spark.sql(
        """SELECT * FROM gold_daily_market_summary
           ORDER BY snapshot_date DESC, item_id ASC LIMIT 100"""
    )
    assert _rows(df) == _rows(sql)


def test_o2_item_price_history_sql(catalog):
    spark = catalog
    df = serving.item_price_history(
        spark.table("gold_hourly_ohlc"), item_key="purchase", candles=48
    )
    sql = spark.sql(
        """SELECT * FROM gold_hourly_ohlc WHERE item_key = 'purchase'
           ORDER BY snapshot_hour DESC LIMIT 48"""
    )
    assert _rows(df) == _rows(sql)


def test_o3_opportunities_sql(catalog):
    spark = catalog
    df = serving.opportunities(
        spark.table("gold_rolling_zscore"), recommendation="sell"
    )
    sql = spark.sql(
        """SELECT * FROM gold_rolling_zscore
           WHERE recommendation = upper('sell')
           ORDER BY z_score ASC NULLS LAST, item_id ASC, snapshot_date ASC"""
    )
    assert _rows(df) == _rows(sql)


def test_o5_top_concentration_sql(catalog):
    spark = catalog
    df = serving.top_concentration(
        spark.table("gold_market_concentration"),
        market_status="MONOPOLIZED",
        limit=100,
    )
    sql = spark.sql(
        """SELECT * FROM gold_market_concentration
           WHERE market_status = 'MONOPOLIZED'
           ORDER BY floor_concentration_pct DESC, item_id ASC,
                    snapshot_date ASC
           LIMIT 100"""
    )
    assert _rows(df) == _rows(sql)


def test_o6_latest_index_sql(catalog):
    spark = catalog
    df = (
        spark.table("gold_market_index")
        .orderBy("snapshot_date", ascending=False)
        .limit(30)
    )
    sql = spark.sql(
        "SELECT * FROM gold_market_index ORDER BY snapshot_date DESC LIMIT 30"
    )
    assert _rows(df) == _rows(sql)


def test_o7_paginate_items_sql(catalog):
    spark = catalog
    df = serving.paginate_items(spark.table("dim_items"), skip=100, limit=50)
    sql = spark.sql(
        "SELECT * FROM dim_items ORDER BY item_id LIMIT 50 OFFSET 100"
    )
    assert _rows(df) == _rows(sql)
    assert len(_rows(sql)) == 50


def test_o9_best_opportunity_sql(catalog):
    spark = catalog
    df = serving.best_opportunity(spark.table("gold_rolling_zscore"))
    sql = spark.sql(
        """SELECT * FROM gold_rolling_zscore WHERE z_score IS NOT NULL
           ORDER BY z_score ASC, item_id ASC, snapshot_date ASC LIMIT 1"""
    )
    assert _rows(df) == _rows(sql)
    assert len(_rows(sql)) == 1


def test_endpoint_sql_pushes_predicate_through_view(catalog):
    """The O2 endpoint's item_key predicate must reach the parquet scan
    through the gold_hourly_ohlc view — views are logical, never fences."""
    spark = catalog
    plan = (
        spark.sql(
            "SELECT * FROM gold_hourly_ohlc WHERE item_key = 'purchase'"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_filtered = [
        line
        for line in plan.splitlines()
        if "FileScan" in line and "purchase" in line
    ]
    assert scan_filtered, plan
