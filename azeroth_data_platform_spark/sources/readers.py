"""Batch sources.

Reference surface covered here (SURVEY.md §2.1):
  S4  JSON blob source (bronze read)   — /root/reference/data_pipeline/utils/minio_client.py:69-84
  S5  JSON → table normalization       — /root/reference/data_pipeline/assets/silver/transformation.py:23-30
  S12 table fetch for serving reads    — /root/reference/backend_api/app/main.py:31-79

The reference reads one JSON dump at a time into a single pandas frame (an
OOM cliff at scale); here bronze is a path-partitioned ``spark.read.json``
with an explicit schema (no inference pass over 100 TB), and tabular reads
are columnar parquet scans with Catalyst pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Lazy DataFrame HANDLES, keyed by (session, dir, table) — NOT results:
# a DataFrame is a query plan; every action on it recomputes from the
# parquet files. What the memo skips is the per-call driver work of
# spark.read.parquet (file listing + footer/schema read, ~0.13 s per
# call here — guide §5 "the driver should do almost no data work"),
# which Spark already treats as session-cacheable state
# (spark.sql.hive.filesourcePartitionFileCacheSize). Keyed by
# applicationId so a new session never sees another session's handles.
_TABLE_HANDLES: dict[tuple[str, str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one driver-provided parquet table."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    df = _TABLE_HANDLES.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _TABLE_HANDLES[key] = df
    return df


# Bronze auction-dump schema: the shape produced by the reference's ingestion
# (ingestion.py:23-40) — a single JSON document per day holding an
# ``auctions`` array. Explicit StructType: bronze stays schema-on-read but
# with a declared schema so a 100 TB backfill never runs JSON inference.
BRONZE_AUCTION_SCHEMA = T.StructType(
    [
        T.StructField(
            "auctions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField(
                            "item",
                            T.StructType(
                                [
                                    T.StructField("id", T.LongType()),
                                    T.StructField(
                                        "modifiers",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("type", T.IntegerType()),
                                                    T.StructField("value", T.IntegerType()),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            ),
                        ),
                        # unit_price/buyout arrive as strings sometimes
                        # (reference coerces with errors='coerce',
                        # transformation.py:49-51) — read as string, try_cast
                        # downstream.
                        T.StructField("unit_price", T.StringType()),
                        T.StructField("buyout", T.StringType()),
                        T.StructField("quantity", T.StringType()),
                        T.StructField("time_left", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_bronze_auctions(spark: SparkSession, path: str) -> DataFrame:
    """S4+S5: read bronze dump(s) and normalize the ``auctions`` array to rows.

    One row per auction. Files missing the ``auctions`` key produce a null
    array → zero rows (the reference raises, transformation.py:23-24; at
    scale skip-and-log is the only sane choice, and the empty-batch guard F5
    becomes a no-op plan).
    """
    raw = spark.read.schema(BRONZE_AUCTION_SCHEMA).option("multiLine", True).json(path)
    return raw.select(F.explode_outer("auctions").alias("a")).select("a.*").where(
        F.col("id").isNotNull()
    )
