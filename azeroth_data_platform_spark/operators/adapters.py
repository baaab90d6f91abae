"""Domain-analog adapters: driver test tables → canonical auction-domain frames.

The engine's gold operators (operators/gold.py) work on the reference's
canonical silver schema (/root/reference/data_pipeline/utils/database.py:10-22).
The driver's standing corpus is TPC-H-ish (TESTDATA.md); FIXTURES.md §A fixes
the analog mapping used by the correctness harness:

  lineitem ≈ silver_auctions   (l_partkey→item_id, l_quantity→quantity,
                                l_extendedprice→unit_price,
                                l_shipdate→snapshot_date)
  part     ≈ dim_items         (p_name→name, p_type→item_class,
                                p_brand→item_subclass)
  events   ≈ hourly price ticks (value→price, ts→event time)

Each adapter is a pure projection (no shuffle); Catalyst collapses it into
the parquet scan so only the referenced columns are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table

# Shared SQL prefixes so every oracle query sees the exact same adapter.
SILVER_SQL = (
    "SELECT l_orderkey * 8 + l_linenumber AS id, l_partkey AS item_id, "
    "CAST(l_quantity AS BIGINT) AS quantity, l_extendedprice AS unit_price, "
    "CAST(l_shipdate AS DATE) AS snapshot_date, l_returnflag AS time_left "
    "FROM lineitem"
)

DIM_SQL = (
    "SELECT p_partkey AS item_id, p_name AS name, p_brand AS quality, "
    "p_type AS item_class, p_brand AS item_subclass, p_retailprice AS vendor_price, "
    "'icons/' || CAST(p_partkey AS VARCHAR) || '.png' AS icon_url "
    "FROM part"
)

TICKS_SQL = (
    "SELECT event_id AS tick_id, event_type AS item_key, ts, value AS price, "
    "CAST(event_id % 10 + 1 AS BIGINT) AS quantity "
    "FROM events"
)


def silver_auctions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → canonical silver_auctions frame."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
        F.col("l_partkey").alias("item_id"),
        F.col("l_quantity").cast("bigint").alias("quantity"),
        F.col("l_extendedprice").alias("unit_price"),
        F.col("l_shipdate").cast("date").alias("snapshot_date"),
        F.col("l_returnflag").alias("time_left"),
    )


def dim_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → canonical dim_items frame."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("item_id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("quality"),
        F.col("p_type").alias("item_class"),
        F.col("p_brand").alias("item_subclass"),
        F.col("p_retailprice").alias("vendor_price"),
        # icon_url analog (dim_items carries icon_url — database.py:37; the
        # reference enrichment leaves it NULL, dimensions.py:50 — a
        # deterministic derived path keeps the column exercised end-to-end)
        F.concat(F.lit("icons/"), F.col("p_partkey").cast("string"), F.lit(".png")).alias(
            "icon_url"
        ),
    )


def price_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical intra-day price-tick frame (for hourly OHLC)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("tick_id"),
        F.col("event_type").alias("item_key"),
        F.col("ts"),
        F.col("value").alias("price"),
        (F.col("event_id") % 10 + 1).cast("bigint").alias("quantity"),
    )
