"""Incremental gold maintenance: delta-merge aggregation state.

At 100 TB you never recompute gold from scratch — a day's batch arrives and
the store merges it into yesterday's materialized state. The reference runs
the same daily cadence (its Dagster assets recompute per schedule,
/root/reference/data_pipeline/assets/gold/gold_sector_trends.py:1 — the
gold layer's three stubs, with gold_safe_investments.py and
gold_sales_velocity.py);
this module is that cadence made *incremental*: gold summaries maintained
as a mergeable partial-aggregate state table, so each batch costs
O(batch + touched-partitions), not O(history).

Design (classic incremental view maintenance, algebraic aggregates only):

  summary_state(batch)   -> per-(item_id, snapshot_date) partial state
  merge_summary_state(*) -> union + one groupBy: states are a commutative
                            monoid, so merging is associative and any
                            arrival order / batching yields the same state
  finalize_summary(state)-> the gold columns (A1's algebraic subset)

Bit-exactness is the load-bearing property: every partial is an exact
decimal/integer sum (functions/numerics.py), so merge order, partition
count, and batch boundaries cannot perturb the result — the incremental
output is HASH-IDENTICAL to a from-scratch recompute, which is exactly what
the oracle checks (the Spark side computes state(base) ⊕ state(delta); the
DuckDB side recomputes the summary over base ∪ delta in one pass).

Holistic aggregates (exact median) are deliberately out of scope: they
need unbounded per-group state. A1's serving shape keeps its exact median
via full recompute of touched partitions; this operator maintains the
algebraic columns (min/max/avg/sum/stddev/count), which is the
industry-standard split (e.g. Materialize/Flink maintain algebraic
aggregates incrementally and re-window holistic ones).

Scale notes: state is keyed (item_id, snapshot_date) — the natural
partition key; a daily batch touches one date partition, so the merge
rewrite prunes to that partition under the hive layout
(sources/merge.py::overwrite_partitions). The merge groupBy shuffles only
|batch-state| + |touched-state| rows, both bounded by key cardinality, not
row volume.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numerics import dec, dstddev_samp_sql, int_units

STATE_KEYS = ("item_id", "snapshot_date")

# Partial-state columns, all exact (decimal / integer / min / max):
#   n        BIGINT        COUNT(*)
#   s_price  DECIMAL sum   Σ price at scale 2           (avg_price)
#   min_p/max_p DOUBLE     MIN/MAX price                (min/max_buyout)
#   s_qty    BIGINT        Σ quantity                   (quantity_available)
#   s_cap    DECIMAL sum   Σ price×quantity             (market_cap)
#   s_x0     DECIMAL sum   Σ price·10² (integer units)  (volatility)
#   s_x0sq   DECIMAL sum   Σ (price·10²)²               (volatility)


def summary_state(silver: DataFrame) -> DataFrame:
    """Partial-aggregate state for one batch: one shuffle on the state key,
    map-side partial aggregation, every column an exact sum/min/max."""
    x0 = int_units("unit_price", 2)
    return silver.groupBy(*STATE_KEYS).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("unit_price", 2)).alias("s_price"),
        F.min("unit_price").alias("min_p"),
        F.max("unit_price").alias("max_p"),
        F.sum("quantity").alias("s_qty"),
        F.sum(
            F.col("unit_price").cast("decimal(18,2)") * F.col("quantity").cast("decimal(10,0)")
        ).alias("s_cap"),
        F.sum(x0).alias("s_x0"),
        F.sum(x0 * x0).alias("s_x0sq"),
    )


def merge_summary_state(*states: DataFrame) -> DataFrame:
    """Merge any number of state frames: union + one groupBy of exact sums.

    The state is a commutative monoid — merge(a, merge(b, c)) ≡
    merge(a, b, c) bit-for-bit (decimal sums are associative), pinned by
    tests/test_incremental.py. Column types are normalized first so the
    union never widens partials differently per branch.
    """
    normed = [
        s.select(
            *STATE_KEYS,
            F.col("n").cast("bigint").alias("n"),
            F.col("s_price").cast("decimal(38,2)").alias("s_price"),
            F.col("min_p").cast("double").alias("min_p"),
            F.col("max_p").cast("double").alias("max_p"),
            F.col("s_qty").cast("bigint").alias("s_qty"),
            F.col("s_cap").cast("decimal(38,2)").alias("s_cap"),
            F.col("s_x0").cast("decimal(38,0)").alias("s_x0"),
            F.col("s_x0sq").cast("decimal(38,0)").alias("s_x0sq"),
        )
        for s in states
    ]
    unioned = reduce(DataFrame.unionByName, normed)
    return unioned.groupBy(*STATE_KEYS).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s_price").cast("decimal(38,2)").alias("s_price"),
        F.min("min_p").alias("min_p"),
        F.max("max_p").alias("max_p"),
        F.sum("s_qty").cast("bigint").alias("s_qty"),
        F.sum("s_cap").cast("decimal(38,2)").alias("s_cap"),
        F.sum("s_x0").cast("decimal(38,0)").alias("s_x0"),
        F.sum("s_x0sq").cast("decimal(38,0)").alias("s_x0sq"),
    )


def finalize_summary(state: DataFrame) -> DataFrame:
    """State → gold columns. The arithmetic mirrors operators/gold.py's
    daily_market_summary (davg / market_cap / dstddev_samp) term for term,
    so finalize(merge(states)) is bit-identical to the one-pass gold."""
    n = F.col("n").cast("double")
    sx = F.col("s_x0").cast("double")
    sxx = F.col("s_x0sq").cast("double")
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    return state.select(
        "item_id",
        "snapshot_date",
        F.col("min_p").alias("min_buyout"),
        F.col("max_p").alias("max_buyout"),
        (F.col("s_price").cast("double") / n).alias("avg_price"),
        F.col("s_qty").alias("quantity_available"),
        F.col("s_cap").cast("double").alias("market_cap"),
        F.when(F.col("n") >= 2, F.sqrt(F.greatest(var, F.lit(0.0))) / F.lit(100.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("price_volatility"),
        F.col("n").alias("auction_count"),
    )


def incremental_summary(base: DataFrame, delta: DataFrame) -> DataFrame:
    """The end-to-end maintenance step: merge a new batch's state into the
    standing state and finalize. Equivalent to a full recompute over
    base ∪ delta (oracle-checked)."""
    return finalize_summary(merge_summary_state(summary_state(base), summary_state(delta)))


def incremental_gold_sql(
    silver_sql: str,
    key_expr: str = "snapshot_date",
    key_name: str = "snapshot_date",
) -> str:
    """Oracle: FULL RECOMPUTE over the whole silver relation — deliberately
    not incremental, so hash-equality proves incremental ≡ from-scratch.
    `key_expr`/`key_name` select the date grain (daily by default; the
    monthly-rollup twin passes date_trunc)."""
    return f"""WITH silver AS ({silver_sql})
      SELECT item_id, {key_expr} AS {key_name},
             MIN(unit_price) AS min_buyout,
             MAX(unit_price) AS max_buyout,
             CAST(SUM(CAST(unit_price AS DECIMAL(28,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avg_price,
             CAST(SUM(quantity) AS BIGINT) AS quantity_available,
             CAST(SUM(CAST(unit_price AS DECIMAL(18,2)) * CAST(quantity AS DECIMAL(10,0)))
                  AS DOUBLE) AS market_cap,
             {dstddev_samp_sql("unit_price")} AS price_volatility,
             COUNT(*) AS auction_count
      FROM silver
      GROUP BY item_id, {key_expr}"""


# ---------------------------------------------------------------------------
# SCD Type-2 version history — the warehouse's OTHER canonical merge shape
# next to sources/merge.py's type-1 upsert: instead of overwriting, every
# attribute change opens a new version row with a validity interval
# (valid_from, valid_to, is_current). Built from a snapshot series by
# change detection: lag() marks run starts, a running sum numbers the
# runs (the gaps-and-islands device dedup.py uses for span merge), one
# groupBy collapses each run to its interval, and lead() closes it against
# the next version's start. Two window passes + one groupBy, all on the
# same entity-key partitioning — one shuffle at scale.


def scd2_history(
    snapshots: DataFrame,
    key: str = "item_id",
    ts: str = "snapshot_date",
    attr: str = "market_status",
) -> DataFrame:
    """(key, version, attr, valid_from, valid_to, is_current) from a
    per-(key, ts) snapshot series: consecutive equal `attr` values collapse
    into one version; `valid_to` is the next version's start (NULL for the
    open current version)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts)
    changed = (
        F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr))
    ).cast("bigint")
    versioned = snapshots.select(key, ts, attr).withColumn(
        "version",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = versioned.groupBy(key, "version").agg(
        F.max(attr).alias(attr),  # constant within the run
        F.min(ts).alias("valid_from"),
    )
    wv = Window.partitionBy(key).orderBy("valid_from")
    # warehouse convention: the open version carries a far-future sentinel
    # instead of NULL — range predicates (BETWEEN valid_from AND valid_to)
    # then need no NULL branch, and engines agree on the representation
    sentinel = F.lit("9999-12-31").cast("date")
    nxt = F.lead("valid_from").over(wv)
    return runs.select(
        key,
        "version",
        attr,
        "valid_from",
        F.coalesce(nxt, sentinel).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_history_sql(
    base_sql: str,
    key: str = "item_id",
    ts: str = "snapshot_date",
    attr: str = "market_status",
) -> str:
    """DuckDB twin over `base_sql` (a full SELECT producing the snapshots)."""
    return f"""
  WITH base AS (SELECT {key}, {ts}, {attr} FROM ({base_sql}) t),
  flagged AS (
    SELECT *, CASE WHEN lag({attr}) OVER w IS NULL
                     OR lag({attr}) OVER w <> {attr} THEN 1 ELSE 0 END AS chg
    FROM base WINDOW w AS (PARTITION BY {key} ORDER BY {ts})),
  versioned AS (
    SELECT *, CAST(SUM(chg) OVER (PARTITION BY {key} ORDER BY {ts}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS version
    FROM flagged),
  runs AS (
    SELECT {key}, version, MAX({attr}) AS {attr}, MIN({ts}) AS valid_from
    FROM versioned GROUP BY {key}, version)
  SELECT {key}, version, {attr}, valid_from,
         COALESCE(lead(valid_from) OVER wv, DATE '9999-12-31') AS valid_to,
         lead(valid_from) OVER wv IS NULL AS is_current
  FROM runs WINDOW wv AS (PARTITION BY {key} ORDER BY valid_from)"""


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    key: str = "item_id",
    ts: str = "snapshot_date",
    attr: str = "market_status",
) -> DataFrame:
    """Fold ONE new snapshot date into a standing SCD2 history — the
    incremental maintenance step (cost O(|batch| + |current versions|),
    never O(history)): changed keys close their current version at the
    batch date and open a new one; unchanged keys pass through untouched;
    unseen keys open version 1. Folding snapshots date-by-date reproduces
    `scd2_history` of the full series exactly (pinned in
    tests/test_incremental.py — the incremental ≡ from-scratch law again).

    `batch` must carry one row per key at a single `ts` later than every
    `valid_from` in `history` (the daily-batch contract).
    """
    sentinel = F.lit("9999-12-31").cast("date")
    cur = history.where(F.col("is_current"))
    closed_history = history.where(~F.col("is_current"))
    b = batch.select(key, F.col(ts).alias("_bts"), F.col(attr).alias("_battr"))
    j = cur.join(b, key, "full")
    changed = j.where(
        F.col(attr).isNotNull()
        & F.col("_battr").isNotNull()
        & (F.col(attr) != F.col("_battr"))
    )
    unchanged = j.where(
        F.col(attr).isNotNull()
        & (F.col("_battr").isNull() | (F.col(attr) == F.col("_battr")))
    )
    new_keys = j.where(F.col(attr).isNull())
    hist_cols = [key, "version", attr, "valid_from", "valid_to", "is_current"]
    keep_unchanged = unchanged.select(
        key, "version", attr, "valid_from", "valid_to", "is_current"
    )
    close_changed = changed.select(
        key,
        "version",
        attr,
        "valid_from",
        F.col("_bts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    open_changed = changed.select(
        key,
        (F.col("version") + 1).alias("version"),
        F.col("_battr").alias(attr),
        F.col("_bts").alias("valid_from"),
        sentinel.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    open_new = new_keys.select(
        key,
        F.lit(1).cast("bigint").alias("version"),
        F.col("_battr").alias(attr),
        F.col("_bts").alias("valid_from"),
        sentinel.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out = (
        closed_history.select(*hist_cols)
        .unionByName(keep_unchanged)
        .unionByName(close_changed)
        .unionByName(open_changed)
        .unionByName(open_new)
    )
    return out
