"""Physical-layout planning: z-order (Morton) clustering report.

The reference serves point lookups by item and range scans by date from
one row-ordered Postgres table (reference main.py:31-79 filters on either
key); at 100 TB the same duality becomes a FILE-LAYOUT problem — a layout
sorted by date prunes nothing for an item filter and vice versa. Z-order
interleaves the bits of both keys so every file covers a small rectangle
of (item, day) space and min/max file statistics prune BOTH predicates —
the Delta/Iceberg `OPTIMIZE ZORDER BY (item_id, snapshot_date)` strategy,
expressed here as a pure-projection curve assignment plus the per-shard
clustering report a table optimizer reads to decide whether a rewrite
pays.

Everything is integer-exact: the Morton code is a fixed 16-bit-per-
dimension bit interleave (a deterministic projection — no ranking pass,
no sampling), shards are the top bits of the curve, and the report is
min/max/count per shard. The item_span/day_span columns ARE the evidence:
on z-ordered shards both spans are small rectangles; a date-sorted layout
would show full-width item spans in every shard.

Scale (100 TB): the curve value is a row-local expression (whole-stage
codegen, zero exchanges); the report is one map-combinable groupBy over
at most 2^(32-SHARD_SHIFT) shards. A production rewrite would
`repartitionByRange(z)` and write — the assignment computed here is
exactly that partitioner's key. For key domains wider than 16 bits,
production normalizes each dimension to 2^16 buckets with
approx-quantile range boundaries first (rank-based, scan-resident); the
fixed bit-mask variant here keeps the operator oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension (32-bit curve)
Z_SHARD_SHIFT = 16  # shard = top 16 curve bits -> <= 65536 shards
Z_EPOCH = "1992-01-01"  # day-index origin (first TPC-H ship date)


def morton_expr(a: str, b: str, bits: int = Z_BITS, duck: bool = False) -> str:
    """Bit-interleave SQL: bit i of `a` -> curve bit 2i+1, bit i of `b` ->
    curve bit 2i. Emitted as a sum of disjoint single-bit terms — pure
    integer arithmetic, identical values in both dialects (Spark spells
    shifts as functions, DuckDB as operators)."""
    terms = []
    for i in range(bits):
        if duck:
            terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
            terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
        else:
            terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1})")
            terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    silver: DataFrame, bits: int = Z_BITS, shard_shift: int = Z_SHARD_SHIFT
) -> DataFrame:
    """Per-shard clustering report of the (item_id, snapshot_date) z-order
    layout: row volume, both key rectangles (lo/hi/span), and the curve
    range each shard owns. See module docstring for the 100 TB story."""
    mask = (1 << bits) - 1
    z = morton_expr("item16", "day16", bits)
    base = silver.select(
        "item_id",
        "snapshot_date",
        F.expr(f"CAST(item_id & {mask} AS BIGINT)").alias("item16"),
        F.expr(
            f"CAST(datediff(snapshot_date, DATE'{Z_EPOCH}') & {mask} AS BIGINT)"
        ).alias("day16"),
    ).withColumn("z", F.expr(z))
    return (
        base.withColumn("zorder_shard", F.expr(f"shiftright(z, {shard_shift})"))
        .groupBy("zorder_shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("item_id").alias("item_lo"),
            F.max("item_id").alias("item_hi"),
            (F.max("item_id") - F.min("item_id")).alias("item_span"),
            F.min("snapshot_date").alias("date_lo"),
            F.max("snapshot_date").alias("date_hi"),
            F.datediff(F.max("snapshot_date"), F.min("snapshot_date"))
            .cast("bigint")
            .alias("day_span"),
            F.min("z").alias("z_lo"),
            F.max("z").alias("z_hi"),
        )
        .orderBy("zorder_shard")
    )


def zorder_layout_sql(
    silver_sql_cte: str, bits: int = Z_BITS, shard_shift: int = Z_SHARD_SHIFT
) -> str:
    """DuckDB twin of :func:`zorder_layout` (expects `silver` CTE)."""
    mask = (1 << bits) - 1
    z = morton_expr("item16", "day16", bits, duck=True)
    return f"""{silver_sql_cte},
  keyed AS (SELECT item_id, snapshot_date,
                   CAST(item_id & {mask} AS BIGINT) AS item16,
                   CAST((snapshot_date - DATE '{Z_EPOCH}') & {mask} AS BIGINT)
                     AS day16
            FROM silver),
  curved AS (SELECT item_id, snapshot_date, {z} AS z FROM keyed)
SELECT (z >> {shard_shift}) AS zorder_shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(item_id) AS item_lo, MAX(item_id) AS item_hi,
       MAX(item_id) - MIN(item_id) AS item_span,
       MIN(snapshot_date) AS date_lo, MAX(snapshot_date) AS date_hi,
       CAST(MAX(snapshot_date) - MIN(snapshot_date) AS BIGINT) AS day_span,
       MIN(z) AS z_lo, MAX(z) AS z_hi
FROM curved GROUP BY 1 ORDER BY 1"""
