"""Serving-layer query operators (SURVEY.md §2.4 filters, §2.6 sorts/limits).

These reproduce the FastAPI read paths (/root/reference/backend_api/app/
main.py:31-79) as DataFrame transforms over materialized gold frames. Each
is trivially Catalyst-optimal (filter+sort+limit push into one TakeOrdered
physical op); they exist so the serving surface is a tested, named part of
the engine.

Determinism note: the reference's ORDER BY ... LIMIT endpoints order by
non-unique keys (snapshot_date, z_score) — ties make row selection
planner-dependent in ANY engine. Every operator here appends the natural
unique key as a tie-break so results are stable across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_daily_summaries(gold_daily: DataFrame, limit: int = 100) -> DataFrame:
    """O1 (main.py:39-42): newest daily summaries, optionally per item (F1)."""
    return gold_daily.orderBy(
        F.col("snapshot_date").desc(), F.col("item_id").asc()
    ).limit(limit)


def item_price_history(gold_ohlc: DataFrame, item_key, candles: int = 48) -> DataFrame:
    """O2+F1 (main.py:44-49): last N hourly candles for one item."""
    return (
        gold_ohlc.where(F.col("item_key") == F.lit(item_key))
        .orderBy(F.col("snapshot_hour").desc())
        .limit(candles)
    )


def opportunities(gold_zscore: DataFrame, recommendation: str | None = None) -> DataFrame:
    """O3+F2+F7 (main.py:51-57): best BUYs first (z ascending, NULLs last).

    The filter argument is upper-cased like the API does (main.py:55).
    """
    out = gold_zscore
    if recommendation is not None:
        out = out.where(F.col("recommendation") == F.upper(F.lit(recommendation)))
    return out.orderBy(
        F.col("z_score").asc_nulls_last(),
        F.col("item_id").asc(),
        F.col("snapshot_date").asc(),
    )


def top_concentration(
    gold_concentration: DataFrame, market_status: str | None = None, limit: int = 100
) -> DataFrame:
    """O5+F2 (main.py:67-73): most concentrated markets first, optionally
    filtered to one market_status enum value (main.py:70-71). pct ties are
    common (many 100% floors) → full deterministic tie-break."""
    out = gold_concentration
    if market_status is not None:
        out = out.where(F.col("market_status") == F.lit(market_status))
    return out.orderBy(
        F.col("floor_concentration_pct").desc(),
        F.col("item_id").asc(),
        F.col("snapshot_date").asc(),
    ).limit(limit)


def best_opportunity(gold_zscore: DataFrame) -> DataFrame:
    """O9 (dashboard argmin, app.py:96-98): the single lowest-z row."""
    return (
        gold_zscore.where(F.col("z_score").isNotNull())
        .orderBy(F.col("z_score").asc(), F.col("item_id").asc(), F.col("snapshot_date").asc())
        .limit(1)
    )


def paginate_items(dim_items: DataFrame, skip: int = 0, limit: int = 100) -> DataFrame:
    """O7 (main.py:31-34): offset/limit pagination, stabilized by ordering on
    the unique key (the reference paginates an unordered heap scan —
    nondeterministic; SURVEY.md §2.6 note)."""
    return dim_items.orderBy("item_id").offset(skip).limit(limit)


def retention_candidates(silver: DataFrame, keep_days: int = 30) -> DataFrame:
    """F4 (postgres_client.py:52-66): rows older than the retention window.

    Anchored on the dataset's max date rather than the wall clock so results
    are reproducible; production retention passes the run date explicitly.
    """
    anchor = silver.agg(F.max("snapshot_date").alias("max_date"))
    return (
        silver.crossJoin(F.broadcast(anchor))
        .where(F.col("snapshot_date") < F.date_sub(F.col("max_date"), keep_days))
        .drop("max_date")
    )


def keyset_paginate_items(
    dim_items: DataFrame, after_item_id: int = 0, limit: int = 50
) -> DataFrame:
    """Keyset (seek) pagination — the scale-correct twin of
    `paginate_items`: OFFSET pagination costs O(offset) rows per page
    (every deep page re-scans and re-sorts the prefix — at catalog scale
    the last page costs a full sort), while a keyset cursor on the unique
    ordering key turns each page into an index-range read: the predicate
    prunes at the scan (PushedFilters on item_id — pinned in
    tests/test_plan_shapes.py) and the sort handles `limit` rows, total.
    Cursor = the last item_id of the previous page."""
    return (
        dim_items.where(F.col("item_id") > F.lit(after_item_id))
        .orderBy("item_id")
        .limit(limit)
    )


def search_after_page(
    orders: DataFrame,
    after_date: str = "1995-06-15",
    after_key: int = 0,
    limit: int = 100,
) -> DataFrame:
    """Composite-cursor keyset page over a TWO-key sort order — the form
    every date-desc feed (o1/o4/o6's shape) needs once a single day
    holds more rows than a page: ORDER BY (o_orderdate DESC, o_orderkey
    ASC) continued from the cursor (after_date, after_key), i.e. rows
    with date < cursor_date OR (date = cursor_date AND key >
    cursor_key). The whole continuation predicate is scan-pushable
    (PushedFilters shows the Or(LessThan, And(EqualTo, GreaterThan))
    tree — pinned), so a deep page reads only the cursor's date
    neighborhood plus `limit` rows instead of re-sorting the prefix —
    the elasticsearch `search_after` / Postgres row-comparison
    `(o_orderdate, o_orderkey) < (d, k)` idiom, spelled as the boolean
    expansion because row-value comparison pushdown is not a Parquet
    filter. Cursor for the next page = (last row's date, last row's
    key); the (date, key) pair is unique, so pages never skip or repeat
    under concurrent appends of NEWER dates (the offset-pagination
    failure mode)."""
    d = F.to_date(F.lit(after_date))
    return (
        orders.where(
            (F.col("o_orderdate") < d)
            | ((F.col("o_orderdate") == d) & (F.col("o_orderkey") > F.lit(after_key)))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(limit)
    )


def facet_counts(
    dim_items: DataFrame, facets: tuple[str, ...] = ("quality", "item_class")
) -> DataFrame:
    """(facet, value, n_items): the sidebar counts of a faceted catalog
    page — for each facet column, how many items carry each value — in
    ONE scan via GROUPING SETS of the single-column cuts (Expand node;
    no per-facet re-aggregation, no union of N groupBys re-reading the
    table N times). The serving-side instance of the grouping-sets
    device (windows.grouping_sets_summary is the OLAP general form);
    every search UI issues exactly this query next to its result page.

    grouping() flags (not NULL-ness) decide which facet a row belongs
    to, so genuine NULL facet values still count — the sector_rollup
    trap. Ordered (facet, n_items desc, value NULLS LAST) for a
    deterministic page: NULL placement is EXPLICIT in both twins because
    the engine defaults diverge (Spark sorts NULLS FIRST ascending,
    DuckDB NULLS LAST), and a genuine NULL facet value tying on
    (facet, n_items) would otherwise order differently cross-engine
    (r10 ADVICE #4). Cites reference main.py:31-34 (the catalog page
    this decorates)."""
    sets = [[c] for c in facets]
    gs = dim_items.groupingSets(sets, *facets).agg(
        *[F.grouping(c).cast("int").alias(f"_g_{c}") for c in facets],
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )
    facet_expr = "CASE " + " ".join(
        f"WHEN _g_{c} = 0 THEN '{c}'" for c in facets
    ) + " END"
    value_expr = "CASE " + " ".join(
        f"WHEN _g_{c} = 0 THEN CAST({c} AS STRING)" for c in facets
    ) + " END"
    return (
        gs.select(
            F.expr(facet_expr).alias("facet"),
            F.expr(value_expr).alias("value"),
            "n_items",
        )
        .orderBy("facet", F.col("n_items").desc(), F.col("value").asc_nulls_last())
    )


def facet_counts_sql(dim_sql: str, facets: tuple[str, ...] = ("quality", "item_class")) -> str:
    """DuckDB twin of :func:`facet_counts` (same GROUPING SETS shape)."""
    sets = ", ".join(f"({c})" for c in facets)
    facet_expr = "CASE " + " ".join(
        f"WHEN GROUPING({c}) = 0 THEN '{c}'" for c in facets
    ) + " END"
    value_expr = "CASE " + " ".join(
        f"WHEN GROUPING({c}) = 0 THEN CAST({c} AS VARCHAR)" for c in facets
    ) + " END"
    return f"""
  WITH dim AS ({dim_sql})
SELECT {facet_expr} AS facet, {value_expr} AS value,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM dim GROUP BY GROUPING SETS ({sets})
ORDER BY facet, n_items DESC, value ASC NULLS LAST"""
