"""Bronze → silver transformation (SURVEY.md §2.2, operators S5 + P1–P10).

Re-expresses /root/reference/data_pipeline/assets/silver/transformation.py:17-84
as one declarative projection. The reference runs six pandas passes
(row-wise .apply for nested extraction, per-column to_numeric, fillna,
replace) over an in-memory frame — a single-process OOM cliff. Here the
whole transform is one Catalyst plan over the exploded bronze scan: no
intermediate materialization, columnar end-to-end, and every defensive
behavior is an expression:

  P1/P2  nested extraction      col("item.id"), col("item.modifiers")
                                (null-safe by construction — transformation.py:32-39)
  P3     defensive column add   explicit bronze schema ⇒ absent fields read
                                as NULL (transformation.py:40-47)
  P4     lossy numeric cast     try_cast: invalid → NULL under ANSI
                                (transformation.py:49-51, errors='coerce')
  P5     quantity default 1     coalesce (transformation.py:51)
  P6     price imputation       unit_price ← buyout/quantity for item-style
                                auctions (transformation.py:53)
  P7     snapshot stamp         parameterized date (current_date in prod;
                                explicit in tests for determinism)
  P8     8-column projection    transformation.py:57-66
  P9     NaN→NULL               native nulls, nothing to do (transformation.py:68)
  P10    created_at             current_timestamp (database.py:22)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SILVER_COLUMNS = (
    "id",
    "item_id",
    "quantity",
    "unit_price",
    "buyout",
    "time_left",
    "modifiers",
    "snapshot_date",
    "created_at",
)


def silver_transform(
    bronze: DataFrame, snapshot_date: dt.date | None = None
) -> DataFrame:
    """Normalize one (or many) exploded bronze auction batches to the silver
    schema. Prices are integer copper (LongType — SURVEY.md §1.3: monetary
    arithmetic must stay exact)."""
    snap = F.lit(snapshot_date) if snapshot_date is not None else F.current_date()
    unit_price = F.expr("try_cast(unit_price AS BIGINT)")
    buyout = F.expr("try_cast(buyout AS BIGINT)")
    quantity = F.coalesce(F.expr("try_cast(quantity AS BIGINT)"), F.lit(1))
    return bronze.select(
        F.col("id"),
        F.col("item.id").alias("item_id"),
        quantity.alias("quantity"),
        # buyout DIV quantity: integer copper. coalesce only covers NULL
        # quantity; an explicit 0 must also clamp to 1 (greatest) or ANSI
        # mode raises DIVIDE_BY_ZERO.
        F.coalesce(
            unit_price,
            F.expr(
                "try_cast(buyout AS BIGINT)"
                " DIV greatest(coalesce(try_cast(quantity AS BIGINT), 1), 1)"
            ),
        ).alias("unit_price"),
        buyout.alias("buyout"),
        F.col("time_left"),
        F.col("item.modifiers").alias("modifiers"),
        snap.cast("date").alias("snapshot_date"),
        F.current_timestamp().alias("created_at"),
    ).where(F.col("item_id").isNotNull())
