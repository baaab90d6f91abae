"""Join operators (SURVEY.md §2.3).

  J1 missing/incomplete-dim probe  /root/reference/data_pipeline/utils/postgres_client.py:73-84
  J2 dim-enrichment broadcast join /root/reference/backend_api/app/models.py:36-37
                                   + /root/reference/data_pipeline/utils/database.py:29-38
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_item_ids(silver: DataFrame, dim_items: DataFrame, limit: int | None = 100) -> DataFrame:
    """J1: item_ids present in facts but missing or incomplete in the dim.

    Faithful to the reference SQL (postgres_client.py:74-80): a LEFT join
    with ``dim.item_id IS NULL OR dim.name IS NULL`` — deliberately NOT a
    pure anti-join, because the OR arm re-selects matched-but-incomplete
    rows. The dim side is broadcast; distinct runs on item_id only, so the
    shuffle carries one small column.

    The reference caps the result (API rate limit); a LIMIT without ORDER BY
    is nondeterministic, so callers needing reproducibility pass
    ``limit=None`` and cap downstream, or sort first.
    """
    d = dim_items.select(
        F.col("item_id").alias("d_item_id"), F.col("name").alias("d_name")
    )
    out = (
        silver.join(F.broadcast(d), silver["item_id"] == d["d_item_id"], "left")
        .where(F.col("d_item_id").isNull() | F.col("d_name").isNull())
        .select("item_id")
        .distinct()
    )
    if limit is not None:
        out = out.orderBy("item_id").limit(limit)
    return out


def enrich_with_dim(silver: DataFrame, dim_items: DataFrame) -> DataFrame:
    """J2: fact ⋈ dim broadcast-hash join — every gold table carries
    item_name/item_class copied from dim_items (models.py:36-37).

    LEFT join: facts for not-yet-enriched items survive with null name
    (the reference backfills them later via S11).
    """
    return silver.join(
        F.broadcast(dim_items.select("item_id", "name", "item_class", "item_subclass")),
        "item_id",
        "left",
    )
