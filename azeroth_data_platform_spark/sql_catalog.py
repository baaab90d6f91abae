"""SQL surface: register the whole medallion as temp views.

The reference's consumers query gold TABLES in SQL (FastAPI endpoints are
thin SELECTs over Postgres — backend_api/app/main.py:28-113). This module
gives the Spark engine the same front door: after `register_catalog`,
`spark.sql("SELECT ... FROM gold_daily_market_summary WHERE ...")` works
for every raw, silver, and gold relation.

Views are LOGICAL: nothing materializes at registration. A predicate
written in SQL against a gold view flows through Catalyst into the
underlying plan — filter pushdown reaches the parquet scan exactly as if
the DataFrame API had been used (pinned in tests/test_sql_catalog.py).
At 100 TB that's the difference between an ad-hoc analyst query costing a
partition read vs a full gold rebuild: the view recomputes only what the
query's filters demand, and a production deployment swaps these views for
materialized gold tables (plans/pipeline.py writes them) with the SAME
names, so the SQL is portable between the two.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

RAW_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_catalog(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every relation as a temp view; returns the view names.

    Layers:
      * raw: the ten driver parquet tables, verbatim;
      * silver: `silver_auctions` (typed fact), `dim_items`, `price_ticks`;
      * gold: the seven reference gold tables (models.py:30-105) as
        logical views over silver.
    """
    from . import harness
    from .operators import adapters, gold

    names: list[str] = []

    def reg(df, name: str) -> None:
        df.createOrReplaceTempView(name)
        names.append(name)

    harness._prep(spark)
    for t in RAW_TABLES:
        reg(adapters.read_table(spark, sf_dir, t), t)

    silver = adapters.silver_auctions(spark, sf_dir)
    dim = harness._dim(spark, sf_dir)
    ticks = harness._ticks(spark, sf_dir)
    reg(silver, "silver_auctions")
    reg(dim, "dim_items")
    reg(ticks, "price_ticks")

    reg(gold.daily_market_summary(silver, dim=dim), "gold_daily_market_summary")
    reg(gold.hourly_ohlc(ticks, dim=harness._ticks_dim(spark, sf_dir)), "gold_hourly_ohlc")
    reg(gold.rolling_zscore(silver, dim=dim), "gold_rolling_zscore")
    reg(gold.sales_velocity(silver, dim=dim), "gold_sales_velocity")
    reg(gold.market_concentration(silver, dim=dim), "gold_market_concentration")
    reg(gold.market_index(silver), "gold_market_index")
    reg(gold.sector_trends(silver, dim), "gold_sector_trends")
    return names
