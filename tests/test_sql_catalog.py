"""SQL front door (sql_catalog): views equal the DataFrame API exactly,
and predicates written in SQL against a gold view push down THROUGH the
view into the parquet scan (views are logical, never materialized)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azeroth_data_platform_spark import harness, sql_catalog


def test_views_register_and_match_dataframe_api(spark, sf_dir):
    names = sql_catalog.register_catalog(spark, sf_dir)
    assert "gold_daily_market_summary" in names and "lineitem" in names

    got = spark.sql(
        "SELECT * FROM gold_daily_market_summary"
    ).collect()
    want = harness.QUERIES["a1_daily_market_summary"](spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # an ad-hoc SQL join across layers runs too
    n = spark.sql(
        """SELECT s.item_class, COUNT(*) AS n
           FROM gold_sector_trends s JOIN dim_items d
             ON s.item_class = d.item_class
           GROUP BY s.item_class"""
    ).count()
    assert n > 0


def test_sql_predicate_pushes_through_gold_view(spark, sf_dir):
    sql_catalog.register_catalog(spark, sf_dir)
    df = spark.sql(
        "SELECT item_id, snapshot_date, min_buyout "
        "FROM gold_daily_market_summary WHERE item_id = 42"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the item_id predicate must reach the parquet scans as a data filter
    # (silver maps item_id onto the lineitem/part keys — the filter lands
    # on the scan as l_partkey/p_partkey = 42, shown in DataFilters)
    scan_filters = [
        line for line in plan.splitlines()
        if "FileScan" in line and "= 42" in line.split("DataFilters:")[-1]
    ]
    assert scan_filters, plan
    got = {r.item_id for r in df.collect()}
    assert got <= {42}


def test_view_registration_is_lazy(spark, sf_dir):
    """Registration runs no jobs: a view over an aggregation registers in
    well under the time the aggregation itself takes to execute."""
    import time

    t0 = time.perf_counter()
    sql_catalog.register_catalog(spark, sf_dir)
    assert time.perf_counter() - t0 < 5.0
