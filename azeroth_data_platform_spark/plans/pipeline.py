"""End-to-end pipeline composition (SURVEY.md §2.11 X1–X5, §3.1).

Replaces the reference's Dagster asset graph
(/root/reference/data_pipeline/definitions.py:6-11 and the dependency edges
transformation.py:13-15, dimensions.py:11) with plain composed jobs:
lineage is the DataFrame plan, run metadata is the returned dict, and
idempotency comes from the merge semantics (sources/merge.py).

One run = the reference's materialization order:
  bronze ingest (edge, optional) → silver merge → dim enrichment →
  gold materializations → retention.
"""

from __future__ import annotations

import datetime as dt
import logging
import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators import gold, joins, silver
from ..sources import merge, rest
from ..sources.readers import read_bronze_auctions

log = logging.getLogger(__name__)

GOLD_JOBS = {
    "gold_market_summary": lambda s, dim: gold.daily_market_summary(s),
    "gold_safe_investments": lambda s, dim: gold.rolling_zscore(s, decimals=0),
    "gold_sales_velocity": lambda s, dim: gold.sales_velocity(s),
    "gold_market_concentration": lambda s, dim: gold.market_concentration(s),
    "gold_market_index": lambda s, dim: gold.market_index(s),
    "gold_sector_trends": gold.sector_trends,
}


def run_pipeline(
    spark: SparkSession,
    bronze_path: str,
    warehouse: str,
    snapshot_date: dt.date,
    item_fetch: rest.Fetch | None = None,
    retention_days: int = 30,
) -> dict[str, Any]:
    """Materialize one snapshot end-to-end; returns run metadata (the
    reference emits the same counts as Dagster metadata —
    ingestion.py:44-51, transformation.py:77-84)."""
    meta: dict[str, Any] = {"snapshot_date": str(snapshot_date)}
    silver_path = os.path.join(warehouse, "silver_auctions")
    dim_path = os.path.join(warehouse, "dim_items")

    # --- silver (S5 + P* + S6 idempotent merge) ---
    bronze = read_bronze_auctions(spark, bronze_path)
    batch = silver.silver_transform(bronze, snapshot_date)
    if batch.isEmpty():  # F5 empty-input guard (transformation.py:28-30)
        log.warning("empty bronze batch for %s — skipping", snapshot_date)
        meta["silver_inserted"] = 0
        return meta
    # The reference's conflict target is `id` ALONE (on_conflict_do_nothing,
    # postgres_client.py:39) — a composite (id, snapshot_date) key would
    # re-insert persisting auctions daily, changing semantics. So the
    # scale-safe bounded probe prunes on `id` itself: exact (id IS the key),
    # and the existing-side scan reads only row groups whose id min/max
    # stats overlap the batch's id range — a bounded probe, not a
    # full-table pass, since auction ids correlate with write order.
    meta["silver_inserted"] = merge.insert_if_absent(
        spark, silver_path, batch, key="id", prune_col="id"
    )
    silver_df = spark.read.parquet(silver_path)
    # One silver scan feeds every gold job in this run (reference re-reads
    # Postgres per asset; SURVEY.md §4 caching row).
    silver_df.cache()

    # --- dim enrichment (J1 → S11 → S7), driver-side by design ---
    if item_fetch is not None:
        dim = (
            spark.read.parquet(dim_path)
            if os.path.exists(dim_path)
            else spark.createDataFrame(
                [],
                "item_id long, name string, quality string, item_class string, "
                "item_subclass string, icon_url string, last_updated timestamp",
            )
        )
        missing = [
            r.item_id
            for r in joins.missing_item_ids(silver_df, dim, limit=100).collect()
        ]
        enriched = rest.enrich_items(item_fetch, missing)
        meta["dim_enriched"] = len(enriched)
        if enriched:
            batch_dim = spark.createDataFrame(enriched, schema=dim.schema)
            merge.upsert(spark, dim_path, batch_dim, key="item_id")

    # --- gold materializations ---
    dim_df = (
        spark.read.parquet(dim_path)
        if os.path.exists(dim_path)
        else None
    )
    for name, job in GOLD_JOBS.items():
        if name == "gold_sector_trends" and dim_df is None:
            continue
        out = job(silver_df, dim_df)
        merge.overwrite_partitions(
            spark,
            os.path.join(warehouse, name),
            out.withColumn("p_date", F.col("snapshot_date")),
            "p_date",
        )
        meta[name] = "materialized"

    # --- retention (S9) ---
    cutoff = snapshot_date - dt.timedelta(days=retention_days)
    meta["retention_deleted"] = merge.retention_delete(
        spark, silver_path, f"snapshot_date < DATE '{cutoff}'"
    )
    silver_df.unpersist()
    return meta
