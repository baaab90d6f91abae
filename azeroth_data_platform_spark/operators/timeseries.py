"""Time-series repair and smoothing over the daily price series.

Three operators the reference's market-history consumers ask for as soon as
the series is used for modeling (the reference stores raw daily rows —
/root/reference/data_pipeline/utils/database.py:40-52 — and leaves gaps to
the reader):

* ``gapfill_forward``  — calendar densification + forward fill (the
  classic "resample('1D').ffill()" expressed relationally).
* ``ewma_halflife``    — exponentially-weighted moving average with
  α = 1/2, computed in closed form so the "recursive" smoother is one
  window sum (no iterative state, no UDF).
* ``rolling_beta``     — trailing-window beta/correlation of each item's
  price against the market-wide aggregate.

Determinism strategy (the repo invariant, functions/numerics.py): every
accumulation happens in exact integer/decimal space; doubles appear only in
final single-rounding conversions and identical-expression-tree rational
arithmetic, so results are bit-identical across partitionings and engines.

Scale notes (100 TB): all three are one groupBy(item, day) pre-aggregation
(map-side combinable) followed by per-item window work — a single shuffle
keyed by item_id, state bounded by the calendar span, never by row count.
The calendar explode in gapfill is row-local (sequence + explode) and
bounded by GAPFILL_WINDOW_DAYS, so densification adds at most
items × window rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numerics import int_units, int_units_sql

# Gap-fill and EWMA operate on the trailing window below (anchored at the
# corpus max date). For EWMA this doubles as the exactness bound: with
# α = 1/2 the closed-form coefficient 2^(rn-2) must stay inside a BIGINT
# shift (rn ≤ 60 « 63), and lags beyond ~53 days contribute below one ulp
# of the double result anyway — the window IS the full-precision EWMA.
GAPFILL_WINDOW_DAYS = 90
EWMA_WINDOW_DAYS = 60
BETA_WINDOW_DAYS = 6  # RANGE 6 PRECEDING → 7-day trailing window, as a3


def _daily(silver: DataFrame) -> DataFrame:
    """Per-(item, day) observed price — MIN like the a3 daily stage, so all
    series operators share one definition of "the day's price"."""
    return silver.groupBy("item_id", "snapshot_date").agg(
        F.min("unit_price").alias("price")
    )


def _window_anchor(daily: DataFrame, days: int) -> DataFrame:
    """Restrict the daily series to the trailing `days` window ending at the
    global max date. The anchor is a one-row broadcast — no driver collect."""
    anchor = daily.agg(F.max("snapshot_date").alias("d1"))
    return (
        daily.crossJoin(F.broadcast(anchor))
        .where(F.col("snapshot_date") >= F.expr(f"date_sub(d1, {days})"))
    )


def gapfill_forward(silver: DataFrame, days: int = GAPFILL_WINDOW_DAYS) -> DataFrame:
    """Calendar gap-fill + forward fill over the trailing `days` window.

    Each item's series is densified from its first in-window observation to
    the corpus max date (one row per calendar day), then missing days take
    the latest preceding observed price (`last(..., ignorenulls=True)` —
    whole-stage window, no UDF). `is_imputed` keeps the provenance visible
    so downstream consumers can weight real vs filled observations.

    Plan shape: groupBy(item, day) → broadcast anchor → per-item span
    groupBy → row-local sequence/explode → equi-join back → one item-keyed
    window. Two shuffles total (daily agg, span agg share the item key).
    """
    w = _window_anchor(_daily(silver), days)
    span = w.groupBy("item_id", "d1").agg(F.min("snapshot_date").alias("d0"))
    cal = span.select(
        "item_id",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
    )
    j = cal.join(
        w.select("item_id", F.col("snapshot_date").alias("day"), "price"),
        ["item_id", "day"],
        "left",
    )
    fill = Window.partitionBy("item_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.select(
        "item_id",
        "day",
        F.last("price", ignorenulls=True).over(fill).alias("price_filled"),
        F.col("price").isNull().alias("is_imputed"),
    )


def gapfill_sql(silver_sql_cte: str, days: int = GAPFILL_WINDOW_DAYS) -> str:
    """DuckDB twin of :func:`gapfill_forward` (expects `silver` CTE bound)."""
    return f"""{silver_sql_cte},
  daily AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
            FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily),
  w AS (SELECT d.* , anchor.d1 FROM daily d, anchor
        WHERE d.snapshot_date >= anchor.d1 - INTERVAL {days} DAY),
  span AS (SELECT item_id, d1, MIN(snapshot_date) AS d0 FROM w GROUP BY item_id, d1),
  cal AS (SELECT item_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                                      CAST(d1 AS TIMESTAMP),
                                                      INTERVAL 1 DAY)) AS DATE) AS day
          FROM span),
  j AS (SELECT cal.item_id, cal.day, w.price
        FROM cal LEFT JOIN w ON cal.item_id = w.item_id AND cal.day = w.snapshot_date)
SELECT item_id, day,
       last_value(price IGNORE NULLS) OVER (
         PARTITION BY item_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price_filled,
       price IS NULL AS is_imputed
FROM j"""


def ewma_halflife(silver: DataFrame, days: int = EWMA_WINDOW_DAYS) -> DataFrame:
    """EWMA with α = 1/2 (half-life one step) over each item's daily series.

    The recursion e_t = (e_{t-1} + x_t)/2, e_1 = x_1 has the closed form
    e_t = C_t / 2^(t-1) with C_t = x_1 + Σ_{j=2..t} 2^(j-2)·x_j — so the
    "stateful" smoother becomes ONE cumulative window sum of exact decimal
    terms (price in integer units × an exact power-of-two coefficient),
    divided by an exact power of two. No iteration, no driver loop, and the
    result is bit-identical at any parallelism because every intermediate
    is exact; α = 1/2 is precisely the choice that keeps the coefficients
    representable. rn ≤ 61 is guaranteed by the {days}-day anchor window.
    """
    w = _window_anchor(_daily(silver), days)
    order = Window.partitionBy("item_id").orderBy("snapshot_date")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rn = F.row_number().over(order)
    coef = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(greatest(rn - 2, 0) AS INT)) AS DECIMAL(20,0))"
    )
    x0 = int_units("price").cast("decimal(18,0)")
    return (
        w.withColumn("rn", rn)
        .withColumn("term", (x0 * coef).cast("decimal(38,0)"))
        .select(
            "item_id",
            "snapshot_date",
            "price",
            (
                F.sum("term").over(cum).cast("double")
                / F.expr(
                    "CAST(shiftleft(CAST(1 AS BIGINT), CAST(rn - 1 AS INT)) AS DOUBLE)"
                )
                / F.lit(100.0)
            ).alias("ewma"),
        )
    )


def ewma_sql(silver_sql_cte: str, days: int = EWMA_WINDOW_DAYS) -> str:
    """DuckDB twin of :func:`ewma_halflife`. DuckDB's `<<` on BIGINT matches
    Spark shiftleft for shifts ≤ 62 (corpus._duck_bit_mask covers the
    bit-63 edge we never reach here)."""
    return f"""{silver_sql_cte},
  daily AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
            FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily),
  w AS (SELECT d.* FROM daily d, anchor
        WHERE d.snapshot_date >= anchor.d1 - INTERVAL {days} DAY),
  seq AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY item_id ORDER BY snapshot_date) AS rn
          FROM w),
  terms AS (SELECT *,
      CAST(CAST({int_units_sql('price')} AS DECIMAL(18,0))
           * CAST(CAST(1 AS BIGINT) << CAST(GREATEST(rn - 2, 0) AS INTEGER) AS DECIMAL(20,0))
        AS DECIMAL(38,0)) AS term
    FROM seq)
SELECT item_id, snapshot_date, price,
       CAST(SUM(term) OVER (PARTITION BY item_id ORDER BY rn
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(CAST(1 AS BIGINT) << CAST(rn - 1 AS INTEGER) AS DOUBLE)
         / 100.0 AS ewma
FROM terms"""


def rolling_beta(silver: DataFrame, days: int = BETA_WINDOW_DAYS) -> DataFrame:
    """Trailing-window beta + correlation of each item's daily price against
    the market-wide daily price total.

    x = Σ_items price (integer units — a SUM, not an average, so the market
    series stays exactly integer-valued), y = the item's price. All five
    window sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate exact decimals; the
    final beta/corr combine those sums in double arithmetic with an
    identical expression tree on both engines (every IEEE op is correctly
    rounded, so identical trees ⇒ identical bits). beta is scale-invariant,
    so integer units cancel and the result is in price space directly.

    Plan: one groupBy(item, day), one groupBy(day) for the market series
    (broadcast back — day cardinality is calendar-bounded), one item-keyed
    RANGE window. Σdeg-style skew doesn't apply: group keys are (item, day).
    """
    daily = _daily(silver).withColumn("y0", int_units("price").cast("decimal(18,0)"))
    market = daily.groupBy("snapshot_date").agg(
        F.sum("y0").cast("decimal(18,0)").alias("x0")
    )
    j = daily.join(F.broadcast(market), "snapshot_date")
    w = (
        Window.partitionBy("item_id")
        .orderBy(F.expr("datediff(snapshot_date, DATE '1970-01-01')"))
        .rangeBetween(-days, 0)
    )
    n = F.count("y0").over(w).cast("double")
    sx = F.sum("x0").over(w).cast("decimal(28,0)").cast("double")
    sy = F.sum("y0").over(w).cast("decimal(28,0)").cast("double")
    sxy = F.sum((F.col("x0") * F.col("y0")).cast("decimal(38,0)")).over(w).cast("double")
    sxx = F.sum((F.col("x0") * F.col("x0")).cast("decimal(38,0)")).over(w).cast("double")
    syy = F.sum((F.col("y0") * F.col("y0")).cast("decimal(38,0)")).over(w).cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    return j.select(
        "item_id",
        "snapshot_date",
        "price",
        n.cast("bigint").alias("n_obs"),
        F.when((n >= 2) & (varx_n > 0), cov_n / varx_n).alias("beta"),
        F.when(
            (n >= 2) & (varx_n > 0) & (vary_n > 0),
            cov_n / F.sqrt(varx_n * vary_n),
        ).alias("corr"),
    )


def rolling_beta_sql(silver_sql_cte: str, days: int = BETA_WINDOW_DAYS) -> str:
    """DuckDB twin of :func:`rolling_beta`."""
    iu = int_units_sql("price")
    return f"""{silver_sql_cte},
  daily AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
            FROM silver GROUP BY item_id, snapshot_date),
  daily_x AS (SELECT *, CAST({iu} AS DECIMAL(18,0)) AS y0 FROM daily),
  market AS (SELECT snapshot_date, CAST(SUM(y0) AS DECIMAL(18,0)) AS x0
             FROM daily_x GROUP BY snapshot_date),
  j AS (SELECT d.item_id, d.snapshot_date, d.price, d.y0, m.x0
        FROM daily_x d JOIN market m USING (snapshot_date)),
  sums AS (SELECT item_id, snapshot_date, price,
      CAST(COUNT(y0) OVER w AS DOUBLE) AS n,
      CAST(CAST(SUM(x0) OVER w AS DECIMAL(28,0)) AS DOUBLE) AS sx,
      CAST(CAST(SUM(y0) OVER w AS DECIMAL(28,0)) AS DOUBLE) AS sy,
      CAST(SUM(CAST(x0 * y0 AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sxy,
      CAST(SUM(CAST(x0 * x0 AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sxx,
      CAST(SUM(CAST(y0 * y0 AS DECIMAL(38,0))) OVER w AS DOUBLE) AS syy
    FROM j
    WINDOW w AS (PARTITION BY item_id
                 ORDER BY date_diff('day', DATE '1970-01-01', snapshot_date)
                 RANGE BETWEEN {days} PRECEDING AND CURRENT ROW))
SELECT item_id, snapshot_date, price,
       CAST(n AS BIGINT) AS n_obs,
       CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
            THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS beta,
       CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS corr
FROM sums"""


# --- CUSUM changepoint detection --------------------------------------------

CUSUM_WINDOW_DAYS = GAPFILL_WINDOW_DAYS


def cusum_changepoint(
    silver: DataFrame, days: int = CUSUM_WINDOW_DAYS
) -> DataFrame:
    """Per-item CUSUM regime-change profile over the trailing daily price
    series: where (and how hard) did the price level shift?

    Page's CUSUM against the series' own mean, in EXACT integer space so
    the statistic is engine- and partitioning-identical: with x_t the
    day's price in integer units (int_units, 2 decimals) and S = Σx over
    the item's n-day series, the mean-centered prefix is

        cum_t = n·prefix_t − t·S        (all BIGINT, exact)

    drawup_t = cum_t − min(cum_≤t) spikes when the level shifts UP,
    drawdown_t = max(cum_≤t) − cum_t when it shifts DOWN; the changepoint
    is the argmax of the combined deviation (earliest date on ties —
    row_number, not max_by, which breaks ties differently across
    engines). Values are n-scaled (document: divide by n·100 for price
    units) — consumers threshold against n·σ, exactly as reported.

    Scale: one (item, day) pre-aggregation (map-side combinable), then
    per-item window passes riding ONE item_id shuffle (the gold modules'
    repartition-on-prefix trick: hashpartitioning(item_id) satisfies the
    (item_id, day) grouping AND every item window — plan-pinned); series
    length is calendar-bounded (`days`), so BIGINT headroom holds at any
    corpus size: |cum| ≤ n²·max_price_units ≈ 90²·1e9 ≪ 2⁶³."""
    # anchor from RAW silver (same max as over daily) so the scalar branch
    # never pays the item_id repartition the main path needs
    anchor = silver.agg(F.max("snapshot_date").alias("d1"))
    daily = (
        _daily(silver.repartition("item_id"))
        .crossJoin(F.broadcast(anchor))
        .where(F.col("snapshot_date") >= F.expr(f"date_sub(d1, {days})"))
        .select(
            "item_id",
            "snapshot_date",
            # int_units yields DECIMAL(18,0); BIGINT keeps every downstream
            # sum/product integer-typed (DuckDB's HUGEINT sums cast back in
            # the twin) — headroom documented above
            int_units("price").cast("bigint").alias("xu"),
        )
    )
    wi = Window.partitionBy("item_id")
    wo = wi.orderBy("snapshot_date")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        F.col("n") * F.sum("xu").over(wrun) - F.row_number().over(wo) * F.col("s")
    )
    scored = (
        daily.withColumn("n", F.count(F.lit(1)).over(wi))
        .withColumn("s", F.sum("xu").over(wi))
        .withColumn("cum", cum)
        .withColumn("drawup", F.col("cum") - F.min("cum").over(wrun))
        .withColumn("drawdown", F.max("cum").over(wrun) - F.col("cum"))
        .withColumn(
            "dev", F.greatest("drawup", "drawdown")
        )
    )
    wpick = wi.orderBy(F.col("dev").desc(), F.col("snapshot_date").asc())
    return (
        scored.withColumn("_r", F.row_number().over(wpick))
        .where(F.col("_r") == 1)
        .select(
            "item_id",
            F.col("n").alias("n_days"),
            F.col("snapshot_date").alias("cp_date"),
            F.col("dev").alias("max_dev"),
            "drawup",
            "drawdown",
        )
    )


def cusum_sql(silver_sql_cte: str, days: int = CUSUM_WINDOW_DAYS) -> str:
    """DuckDB twin of :func:`cusum_changepoint` (expects `silver` CTE)."""
    return f"""{silver_sql_cte},
  daily AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
            FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily),
  w AS (SELECT d.item_id, d.snapshot_date, {int_units_sql('d.price')} AS xu
        FROM daily d, anchor
        WHERE d.snapshot_date >= anchor.d1 - INTERVAL {days} DAY),
  st AS (SELECT item_id, snapshot_date, xu,
                COUNT(*) OVER (PARTITION BY item_id) AS n,
                SUM(xu) OVER (PARTITION BY item_id) AS s,
                SUM(xu) OVER (PARTITION BY item_id ORDER BY snapshot_date
                              ROWS UNBOUNDED PRECEDING) AS prefix,
                row_number() OVER (PARTITION BY item_id
                                   ORDER BY snapshot_date) AS t
         FROM w),
  c AS (SELECT item_id, snapshot_date, n,
               n * prefix - t * s AS cum
        FROM st),
  dev AS (SELECT item_id, snapshot_date, n,
                 cum - MIN(cum) OVER (PARTITION BY item_id
                                      ORDER BY snapshot_date
                                      ROWS UNBOUNDED PRECEDING) AS drawup,
                 MAX(cum) OVER (PARTITION BY item_id
                                ORDER BY snapshot_date
                                ROWS UNBOUNDED PRECEDING) - cum AS drawdown
          FROM c),
  pick AS (SELECT *, GREATEST(drawup, drawdown) AS dev,
                  row_number() OVER (PARTITION BY item_id
                                     ORDER BY GREATEST(drawup, drawdown) DESC,
                                               snapshot_date ASC) AS _r
           FROM dev)
SELECT item_id, CAST(n AS BIGINT) AS n_days, snapshot_date AS cp_date,
       CAST(dev AS BIGINT) AS max_dev,
       CAST(drawup AS BIGINT) AS drawup, CAST(drawdown AS BIGINT) AS drawdown
FROM pick WHERE _r = 1"""


# --- naive-seasonal forecast backtest ---------------------------------------

SEASONAL_LAG_DAYS = 7


def forecast_backtest(
    silver: DataFrame, lag_days: int = SEASONAL_LAG_DAYS
) -> DataFrame:
    """Per-item backtest of the naive-seasonal forecaster (predict day t
    with day t−7's price) — the baseline every model must beat before it
    ships, and the op a warehouse runs nightly to monitor drift.

    The lag is CALENDAR-aware: a (item, date) equi-join against the series
    shifted by `lag_days` (gap days simply produce no scored row — no
    forward-fill contamination of the error metric). Errors accumulate in
    exact integer units (int_units): mae/bias are exact-integer sums
    divided once into DOUBLE (single correctly-rounded op, engine-safe).
    One (item, day) pre-aggregation + one equi-join + one groupBy —
    everything keyed on item_id."""
    daily = _daily(silver).select(
        "item_id", "snapshot_date", int_units("price").cast("bigint").alias("xu")
    )
    cur = daily.alias("cur")
    past = daily.select(
        "item_id",
        F.date_add("snapshot_date", lag_days).alias("snapshot_date"),
        F.col("xu").alias("pu"),
    ).alias("past")
    scored = cur.join(past, ["item_id", "snapshot_date"]).select(
        "item_id", (F.col("xu") - F.col("pu")).alias("err")
    )
    return (
        scored.groupBy("item_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.sum(F.abs("err")).cast("bigint").alias("sae"),
            F.sum("err").cast("bigint").alias("se"),
        )
        .select(
            "item_id",
            "n_scored",
            (F.col("sae").cast("double") / F.col("n_scored") / 100.0).alias("mae"),
            (F.col("se").cast("double") / F.col("n_scored") / 100.0).alias("bias"),
        )
    )


def forecast_backtest_sql(
    silver_sql_cte: str, lag_days: int = SEASONAL_LAG_DAYS
) -> str:
    """DuckDB twin of :func:`forecast_backtest`."""
    return f"""{silver_sql_cte},
  daily AS (SELECT item_id, snapshot_date,
                   CAST({int_units_sql('MIN(unit_price)')} AS BIGINT) AS xu
            FROM silver GROUP BY item_id, snapshot_date),
  scored AS (
    SELECT cur.item_id, cur.xu - past.xu AS err
    FROM daily cur JOIN daily past
      ON cur.item_id = past.item_id
     AND cur.snapshot_date = past.snapshot_date + INTERVAL {lag_days} DAY)
SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(abs(err)) AS DOUBLE) / COUNT(*) / 100.0 AS mae,
       CAST(SUM(err) AS DOUBLE) / COUNT(*) / 100.0 AS bias
FROM scored GROUP BY item_id"""


# --- MAD robust outliers ------------------------------------------------------

MAD_K = 3  # flag |x - median| > K · MAD


def mad_outliers(
    silver: DataFrame, days: int = GAPFILL_WINDOW_DAYS, k: int = MAD_K
) -> DataFrame:
    """Median/MAD robust outlier days per item over the trailing daily
    price series — the robust twin of a3's mean/σ z-score: a single
    spike inflates σ and hides itself, but cannot move the median, so
    MAD flags exactly the days a curation run should quarantine.

    EXACT by construction: prices in integer units (int_units, 2
    decimals), median = the LOWER median (element at rank (n+1) DIV 2 —
    deterministic for even n, no averaging), MAD = lower median of
    |x − med|, flag rule dev > k·MAD in pure BIGINT. A constant series
    has MAD 0, so ANY deviation from the median flags — the right
    degenerate behavior for a quarantine gate. dev_over_mad_ppm is the
    exact-ppm robust score (NULL when MAD = 0; multiply by 1.4826e-6
    for a σ-comparable scale).

    Scale: one (item, day) map-combinable pre-aggregation, then all four
    window passes ride ONE item_id exchange (two in-partition sorts:
    by value, by deviation). State is bounded by the calendar span."""
    daily = _window_anchor(_daily(silver), days)
    w_item = Window.partitionBy("item_id")
    st = (
        daily.select(
            "item_id",
            "snapshot_date",
            # BIGINT from stage 1: DuckDB's `//` on DECIMAL operands is
            # executed as DOUBLE (ADVICE r7) — integer types keep both
            # engines in exact integer division throughout
            int_units("price").cast("bigint").alias("x"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("item_id").orderBy("x", "snapshot_date")
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(w_item))
        .withColumn(
            "med",
            F.max(F.expr("CASE WHEN rn = (n + 1) DIV 2 THEN x END")).over(
                w_item
            ),
        )
        .withColumn("dev", F.abs(F.col("x") - F.col("med")))
        .withColumn(
            "rn2",
            F.row_number().over(
                Window.partitionBy("item_id").orderBy("dev", "snapshot_date")
            ),
        )
        .withColumn(
            "mad",
            F.max(F.expr("CASE WHEN rn2 = (n + 1) DIV 2 THEN dev END")).over(
                w_item
            ),
        )
    )
    return (
        st.where(F.expr(f"dev > {k} * mad"))
        .select(
            "item_id",
            "snapshot_date",
            F.col("x").alias("price_units"),
            F.col("med").alias("median_units"),
            F.col("mad").alias("mad_units"),
            F.col("dev").alias("dev_units"),
            F.expr(
                "CASE WHEN mad > 0 THEN"
                " CAST(CAST(1000000 AS DECIMAL(38,0)) * dev DIV mad"
                " AS BIGINT) END"
            ).alias("dev_over_mad_ppm"),
        )
        .orderBy("item_id", "snapshot_date")
    )


def mad_outliers_sql(
    silver_sql_cte: str, days: int = GAPFILL_WINDOW_DAYS, k: int = MAD_K
) -> str:
    """DuckDB twin of :func:`mad_outliers` (expects `silver` CTE)."""
    return f"""{silver_sql_cte},
  daily AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
            FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily),
  w AS (SELECT d.item_id, d.snapshot_date,
               CAST({int_units_sql('d.price')} AS BIGINT) AS x
        FROM daily d, anchor
        WHERE d.snapshot_date >= anchor.d1 - INTERVAL {days} DAY),
  st AS (SELECT item_id, snapshot_date, x,
                row_number() OVER (PARTITION BY item_id
                                   ORDER BY x, snapshot_date) AS rn,
                COUNT(*) OVER (PARTITION BY item_id) AS n
         FROM w),
  med AS (SELECT *, MAX(CASE WHEN rn = (n + 1) // 2 THEN x END)
                      OVER (PARTITION BY item_id) AS med
          FROM st),
  dv AS (SELECT *, ABS(x - med) AS dev,
                row_number() OVER (PARTITION BY item_id
                                   ORDER BY ABS(x - med), snapshot_date)
                  AS rn2
         FROM med),
  md AS (SELECT *, MAX(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
                     OVER (PARTITION BY item_id) AS mad
         FROM dv)
SELECT item_id, snapshot_date,
       CAST(x AS BIGINT) AS price_units,
       CAST(med AS BIGINT) AS median_units,
       CAST(mad AS BIGINT) AS mad_units,
       CAST(dev AS BIGINT) AS dev_units,
       CASE WHEN mad > 0 THEN
         CAST(CAST(1000000 AS HUGEINT) * dev // mad AS BIGINT) END
         AS dev_over_mad_ppm
FROM md WHERE dev > {k} * mad
ORDER BY item_id, snapshot_date"""


# --- autocorrelation (exact-ppm ACF) ------------------------------------------

ACF_MAX_LAG = 3


def autocorrelation(
    silver: DataFrame, days: int = GAPFILL_WINDOW_DAYS, max_lag: int = ACF_MAX_LAG
) -> DataFrame:
    """Lag-1..`max_lag` autocorrelation of each item's trailing daily price
    series — the "is yesterday informative about today" diagnostic that
    decides whether a forecast (a14) or a smoother (a11) is even worth
    running, and the standard residual check after either.

    Definition: the textbook sample ACF r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)²
    with μ over the FULL window and the numerator over the n−k observed
    row-lag pairs (gaps are skipped, not imputed — compose with
    gapfill_forward when calendar-lag semantics are wanted).

    EXACT in integer arithmetic: with x in int_units and S = Σx, multiply
    through by n² so every term is an integer —
        num_k = n²·Σx_t·x_{t+k} − n·S·(Σ'x_t + Σ'x_{t+k}) + (n−k)·S²
        den   = n²·Σx² − n·S²
    (Σ' over the pair range). acf_ppm is the exact rational 1e6·num/den
    truncated toward zero via |num| DIV den with the sign reapplied —
    the sign split keeps the convention explicit and both divisions on
    non-negative operands (r9 correction: DuckDB integer // actually
    truncates toward zero like Spark DIV — measured — so the split is
    convention-pinning, not a divergence fix).
    Headroom: n ≤ 10⁴ days and x ≤ 10⁸ units put 1e6·|num| ≤ ~1e34,
    inside DECIMAL(38,0) (Spark) and HUGEINT (DuckDB).

    Scale: one (item, day) map-combinable pre-aggregation, then the lead
    windows AND the per-item aggregate ride ONE item_id exchange (the
    groupBy key equals the window partition key, so the hash partitioning
    is reused). State per item is bounded by the calendar span."""
    daily = _window_anchor(_daily(silver), days)
    w = Window.partitionBy("item_id").orderBy("snapshot_date")
    base = daily.select(
        "item_id",
        "snapshot_date",
        int_units("price").cast("bigint").alias("x"),
    )
    for k in range(1, max_lag + 1):
        base = base.withColumn(f"x{k}", F.lead("x", k).over(w))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")).alias(
            "sxx"
        ),
    ]
    for k in range(1, max_lag + 1):
        xk = F.col(f"x{k}")
        aggs += [
            F.sum(F.col("x").cast("decimal(38,0)") * xk.cast("decimal(38,0)")).alias(
                f"p{k}"
            ),
            F.sum(F.when(xk.isNotNull(), F.col("x"))).cast("bigint").alias(f"sa{k}"),
            F.sum(xk).cast("bigint").alias(f"sb{k}"),
            F.count(xk).cast("bigint").alias(f"c{k}"),
        ]
    g = base.groupBy("item_id").agg(*aggs)
    g = g.withColumn(
        "den",
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * n * sxx - CAST(n AS DECIMAL(38,0)) * s * s"
        ),
    )
    for k in range(1, max_lag + 1):
        g = g.withColumn(
            f"num{k}",
            F.expr(
                f"CAST(n AS DECIMAL(38,0)) * n * p{k}"
                f" - CAST(n AS DECIMAL(38,0)) * s"
                f"   * (CAST(sa{k} AS DECIMAL(38,0)) + sb{k})"
                f" + CAST(c{k} AS DECIMAL(38,0)) * s * s"
            ),
        )
    stack_args = ", ".join(f"{k}, num{k}, c{k}" for k in range(1, max_lag + 1))
    return (
        g.select(
            "item_id",
            F.col("n").alias("n_days"),
            "den",
            F.expr(f"stack({max_lag}, {stack_args}) AS (lag, num, n_pairs)"),
        )
        .where((F.col("n_pairs") >= 2) & (F.col("den") > 0))
        .select(
            "item_id",
            F.col("lag").cast("int").alias("lag"),
            "n_days",
            "n_pairs",
            F.expr(
                "CASE WHEN num >= 0 THEN"
                " CAST(CAST(1000000 AS DECIMAL(38,0)) * num DIV den AS BIGINT)"
                " ELSE -CAST(CAST(1000000 AS DECIMAL(38,0)) * (-num) DIV den"
                " AS BIGINT) END"
            ).alias("acf_ppm"),
        )
        .orderBy("item_id", "lag")
    )


def autocorrelation_sql(
    silver_sql_cte: str, days: int = GAPFILL_WINDOW_DAYS, max_lag: int = ACF_MAX_LAG
) -> str:
    """DuckDB twin of :func:`autocorrelation` (expects `silver` CTE)."""
    lag_aggs = ",\n               ".join(
        f"SUM(CAST(x AS HUGEINT) * x{k}) AS p{k},"
        f" SUM(CASE WHEN x{k} IS NOT NULL THEN x END) AS sa{k},"
        f" SUM(x{k}) AS sb{k}, COUNT(x{k}) AS c{k}"
        for k in range(1, max_lag + 1)
    )
    leads = ", ".join(
        f"lead(x, {k}) OVER (PARTITION BY item_id ORDER BY snapshot_date) AS x{k}"
        for k in range(1, max_lag + 1)
    )
    nums = ",\n             ".join(
        f"CAST(n AS HUGEINT) * n * p{k}"
        f" - CAST(n AS HUGEINT) * s * (CAST(sa{k} AS HUGEINT) + sb{k})"
        f" + CAST(c{k} AS HUGEINT) * s * s AS num{k}"
        for k in range(1, max_lag + 1)
    )
    per_lag = "\n  UNION ALL\n".join(
        f"""  SELECT item_id, CAST({k} AS INT) AS lag, n_days, c{k} AS n_pairs,
         CASE WHEN num{k} >= 0
              THEN CAST(CAST(1000000 AS HUGEINT) * num{k} // den AS BIGINT)
              ELSE -CAST(CAST(1000000 AS HUGEINT) * (-num{k}) // den AS BIGINT)
         END AS acf_ppm
  FROM nums WHERE c{k} >= 2 AND den > 0"""
        for k in range(1, max_lag + 1)
    )
    return f"""{silver_sql_cte},
  daily AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
            FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily),
  w AS (SELECT d.item_id, d.snapshot_date,
               CAST({int_units_sql('d.price')} AS BIGINT) AS x
        FROM daily d, anchor
        WHERE d.snapshot_date >= anchor.d1 - INTERVAL {days} DAY),
  led AS (SELECT item_id, snapshot_date, x, {leads} FROM w),
  agg AS (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               {lag_aggs}
        FROM led GROUP BY item_id),
  nums AS (SELECT item_id, n AS n_days,
             {", ".join(f"c{k}" for k in range(1, max_lag + 1))},
             CAST(n AS HUGEINT) * n * sxx - CAST(n AS HUGEINT) * s * s AS den,
             {nums}
      FROM agg)
{per_lag}
ORDER BY item_id, lag"""


# --- day-of-week seasonal baseline --------------------------------------------

DOW_EPOCH_MONDAY = "1992-01-06"  # a Monday: dow 0=Mon..6=Sun in both engines
DOW_MIN_SAMPLES = 4
DOW_FLAG_QUARTER = 4  # flag |x - dow_mean| > dow_mean / 4 (25%)


def dow_baseline(
    silver: DataFrame, dim_items: DataFrame, days: int = GAPFILL_WINDOW_DAYS
) -> DataFrame:
    """Day-of-week seasonal outliers per SECTOR: each day's sector floor
    price judged against that sector's OWN weekday baseline — the
    seasonality a3's global z-score and a15's global median both wash out
    (a market that is always 20% hotter on Saturdays flags every Saturday
    under a global baseline and no Saturday under this one). Sector grain
    (item_class via the broadcast dim) rather than item grain because a
    weekday baseline needs several same-weekday samples per key — a
    90-day window gives ≤13 per sector-weekday but at most ~2 per
    item-weekday on sparse items (measured on the test corpus: max
    per-(item, dow) count 4), so the per-item variant is data-starved by
    construction.

    dow is computed as days-since-a-known-Monday mod 7 — pure date
    arithmetic, immune to the engines' conflicting dayofweek()
    conventions (Spark 1=Sun..7=Sat, DuckDB 0=Sun..6=Sat).

    EXACT in BIGINT end-to-end: x in int_units, per-(sector, dow) count
    and sum from one window pass, deviation as the cross-multiplied
    integer num = n_d·x − s_d (never a mean-of-double), flag rule
    4·|num| > s_d in pure integers, dev_ppm the sign-split truncated
    rational 1e6·num/s_d. BIGINT headroom: 1e6·|num| ≤ 1e6·n_d·x_max
    needs n_d·x_max < 9.2e12 — at x ≤ 10⁸ units that is >1700 years of
    one weekday's samples. BIGINT (not DECIMAL) from stage 1 is
    deliberate: DuckDB executes DECIMAL `//` as DOUBLE (the ADVICE-r7
    class). Unmatched items drop at the inner broadcast join (a floor
    price needs a sector to baseline against).

    Scale: broadcast dim join, one (sector, day) map-combinable
    pre-aggregation, one (sector, dow) window exchange; state bounded by
    sectors × calendar span."""
    joined = silver.join(
        F.broadcast(dim_items.select("item_id", "item_class")), "item_id"
    )
    daily = joined.groupBy("item_class", "snapshot_date").agg(
        F.min("unit_price").alias("price")
    )
    anchor = daily.agg(F.max("snapshot_date").alias("d1"))
    windowed = daily.crossJoin(F.broadcast(anchor)).where(
        F.col("snapshot_date") >= F.expr(f"date_sub(d1, {days})")
    )
    base = windowed.select(
        "item_class",
        "snapshot_date",
        int_units("price").cast("bigint").alias("x"),
    ).withColumn(
        "dow",
        F.expr(
            f"CAST(pmod(datediff(snapshot_date, DATE\'{DOW_EPOCH_MONDAY}\'), 7) AS INT)"
        ),
    )
    w = Window.partitionBy("item_class", "dow")
    st = (
        base.withColumn("n_d", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("s_d", F.sum("x").over(w).cast("bigint"))
        .withColumn("num", F.expr("n_d * x - s_d"))
    )
    return (
        st.where(
            (F.col("n_d") >= DOW_MIN_SAMPLES)
            & F.expr(f"{DOW_FLAG_QUARTER} * abs(num) > s_d")
        )
        .select(
            "item_class",
            "snapshot_date",
            "dow",
            F.col("x").alias("price_units"),
            F.col("n_d").alias("dow_n"),
            F.expr("s_d DIV n_d").alias("dow_mean_units"),
            F.expr(
                "CASE WHEN num >= 0 THEN (1000000 * num) DIV s_d"
                " ELSE -((1000000 * -num) DIV s_d) END"
            ).alias("dev_ppm"),
        )
        .orderBy("item_class", "snapshot_date")
    )


def dow_baseline_sql(
    silver_dim_cte: str, days: int = GAPFILL_WINDOW_DAYS
) -> str:
    """DuckDB twin of :func:`dow_baseline` (expects `silver` + `dim` CTEs)."""
    return f"""{silver_dim_cte},
  daily AS (SELECT dim.item_class, s.snapshot_date,
                   MIN(s.unit_price) AS price
            FROM silver s JOIN dim ON s.item_id = dim.item_id
            GROUP BY dim.item_class, s.snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily),
  w AS (SELECT d.item_class, d.snapshot_date,
               CAST({int_units_sql('d.price')} AS BIGINT) AS x,
               CAST(((d.snapshot_date - DATE '{DOW_EPOCH_MONDAY}') % 7 + 7) % 7
                    AS INT) AS dow
        FROM daily d, anchor
        WHERE d.snapshot_date >= anchor.d1 - INTERVAL {days} DAY),
  st AS (SELECT *,
                CAST(COUNT(*) OVER (PARTITION BY item_class, dow) AS BIGINT) AS n_d,
                CAST(SUM(x) OVER (PARTITION BY item_class, dow) AS BIGINT) AS s_d
         FROM w)
SELECT item_class, snapshot_date, dow,
       x AS price_units, n_d AS dow_n,
       s_d // n_d AS dow_mean_units,
       CASE WHEN (n_d * x - s_d) >= 0 THEN (1000000 * (n_d * x - s_d)) // s_d
            ELSE -((1000000 * (s_d - n_d * x)) // s_d) END AS dev_ppm
FROM st
WHERE n_d >= {DOW_MIN_SAMPLES} AND {DOW_FLAG_QUARTER} * abs(n_d * x - s_d) > s_d
ORDER BY item_class, snapshot_date"""


# --- Theil–Sen robust trend ------------------------------------------------
# Median-of-pairwise-slopes trend per item — the 29%-breakdown robust
# alternative to an OLS fit (a12's cov/var device): one wild price day
# cannot flip the verdict. Key scale fact: the pair relation is built
# from the per-(item, day) AGGREGATE, so its size is items × C(days, 2)
# — days are CALENDAR-bounded, independent of fact-table volume, which
# is what makes an O(days²) estimator safe at 100 TB (the same argument
# as the dow-baseline/ACF family).

THEIL_MIN_DAYS = 3  # below this a "trend" is a line through noise
THEIL_WINDOW_DAYS = 365  # trailing window: bounds pairs at C(366,2)/item


def theil_sen_trend(
    silver: DataFrame,
    min_days: int = THEIL_MIN_DAYS,
    window_days: int = THEIL_WINDOW_DAYS,
) -> DataFrame:
    """(item_id, n_days, n_pairs, slope_uc_per_day, slope_lo_uc,
    slope_hi_uc, trend): Theil–Sen trend of each item's daily price
    series — the exact LOWER MEDIAN of all pairwise slopes
    (p_j − p_i)/(d_j − d_i), i < j, in integer arithmetic — plus Sen's
    rank-based ~95% confidence band (the slopes at ranks
    floor((n'∓C)/2){,+1}, C = 1.96·√(n(n−1)(2n+5)/18) — order
    statistics again, so the quantization argument below covers the
    band too).

    Exactness: each slope is a rational of integers (day price in cents
    via int_units; day index an integer datediff). It is quantized by the
    sign-split floor of 10⁶·Δp/Δd — a MONOTONE NON-DECREASING map, and
    monotone maps commute with order statistics (f(x)₍ₖ₎ = f(x₍ₖ₎)), so
    the lower median of quantized slopes IS the quantized lower median of
    the true rationals: no averaging of middle elements, no doubles
    anywhere. Numerators stage through DECIMAL(38,0)/HUGEINT; both
    engines' integer division truncates toward zero (measured r9), so
    floor is the same sign-split CASE in both dialects.

    Plan shape: one (item, day) groupBy (map-combinable) → trailing
    `window_days` anchor (the shared _window_anchor device — the pair
    count is then CALENDAR-BOUNDED at C(window+1, 2) per item regardless
    of history length, which is the 100 TB contract for an O(days²)
    estimator) → item-keyed equi self-join of that aggregate (never a
    CartesianProduct) → one item-keyed window for the median rank. Cites
    reference models.py:30-105 (the gold trend tables this family
    extends)."""
    daily = (
        _window_anchor(_daily(silver), window_days)
        .select(
            "item_id",
            F.expr("datediff(snapshot_date, DATE'1970-01-01')").alias("d"),
            int_units("price").cast("bigint").alias("p"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slope = (
        "CASE WHEN b.p - a.p >= 0 THEN CAST(CAST(1000000 AS DECIMAL(38,0))"
        " * (b.p - a.p) DIV (b.d - a.d) AS BIGINT)"
        " ELSE -CAST((CAST(1000000 AS DECIMAL(38,0)) * (a.p - b.p)"
        " + (b.d - a.d) - 1) DIV (b.d - a.d) AS BIGINT) END"
    )
    n_days = daily.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    pairs = (
        a.join(b, (F.col("a.item_id") == F.col("b.item_id")) & (F.col("b.d") > F.col("a.d")))
        .select(F.col("a.item_id").alias("item_id"), F.expr(slope).alias("slope_uc"))
        .join(n_days, "item_id")
    )
    wcnt = Window.partitionBy("item_id")
    wrank = Window.partitionBy("item_id").orderBy("slope_uc")
    # Sen's rank-based ~95% band: C = 1.96·sqrt(n(n−1)(2n+5)/18), band =
    # slopes at ranks floor((n'−C)/2) and floor((n'+C)/2)+1 (clamped).
    # The sqrt/multiply tree is IDENTICAL text in both dialects, so the
    # floor()ed rank is bit-identical cross-engine (the welch_t_raw
    # argument); everything after is integer rank selection.
    cz = (
        "1.96 * sqrt(CAST(n_days AS DOUBLE) * (n_days - 1)"
        " * (2 * n_days + 5) / 18.0)"
    )
    ranked = (
        pairs.withColumn("n_pairs", F.count(F.lit(1)).over(wcnt).cast("bigint"))
        .withColumn("_rn", F.row_number().over(wrank))
        .withColumn("_k", F.expr("(n_pairs + 1) DIV 2"))
        .withColumn(
            "_m1",
            F.expr(
                f"GREATEST(CAST(1 AS BIGINT),"
                f" CAST(floor((n_pairs - {cz}) / 2) AS BIGINT))"
            ),
        )
        .withColumn(
            "_m2",
            F.expr(
                f"LEAST(n_pairs,"
                f" CAST(floor((n_pairs + {cz}) / 2) AS BIGINT) + 1)"
            ),
        )
    )
    return (
        ranked.where(F.col("n_days") >= min_days)
        .groupBy("item_id", "n_days", "n_pairs")
        .agg(
            F.max(F.expr("CASE WHEN _rn = _k THEN slope_uc END"))
            .cast("bigint")
            .alias("slope_uc_per_day"),
            F.max(F.expr("CASE WHEN _rn = _m1 THEN slope_uc END"))
            .cast("bigint")
            .alias("slope_lo_uc"),
            F.max(F.expr("CASE WHEN _rn = _m2 THEN slope_uc END"))
            .cast("bigint")
            .alias("slope_hi_uc"),
        )
        .select(
            "item_id",
            "n_days",
            "n_pairs",
            "slope_uc_per_day",
            "slope_lo_uc",
            "slope_hi_uc",
            F.expr(
                "CASE WHEN slope_uc_per_day > 0 THEN 'up'"
                " WHEN slope_uc_per_day < 0 THEN 'down' ELSE 'flat' END"
            ).alias("trend"),
        )
    )


def theil_sen_sql(
    silver_sql_cte: str,
    min_days: int = THEIL_MIN_DAYS,
    window_days: int = THEIL_WINDOW_DAYS,
) -> str:
    """DuckDB twin of :func:`theil_sen_trend` (expects `silver` CTE)."""
    return f"""{silver_sql_cte},
  daily0 AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
             FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily0),
  daily AS (SELECT item_id,
                   CAST(snapshot_date - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST({int_units_sql('price')} AS BIGINT) AS p
            FROM daily0, anchor
            WHERE snapshot_date >= d1 - INTERVAL {window_days} DAY),
  nd AS (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_days
         FROM daily GROUP BY item_id),
  pairs AS (
    SELECT a.item_id, nd.n_days,
           CASE WHEN b.p - a.p >= 0
                THEN CAST(CAST(1000000 AS HUGEINT) * (b.p - a.p)
                          // (b.d - a.d) AS BIGINT)
                ELSE -CAST((CAST(1000000 AS HUGEINT) * (a.p - b.p)
                            + (b.d - a.d) - 1) // (b.d - a.d) AS BIGINT)
           END AS slope_uc
    FROM daily a JOIN daily b
      ON a.item_id = b.item_id AND b.d > a.d
    JOIN nd ON nd.item_id = a.item_id),
  ranked AS (
    SELECT item_id, n_days, slope_uc,
           CAST(COUNT(*) OVER (PARTITION BY item_id) AS BIGINT) AS n_pairs,
           ROW_NUMBER() OVER (PARTITION BY item_id ORDER BY slope_uc) AS rn
    FROM pairs),
  marked AS (
    SELECT *,
           (n_pairs + 1) // 2 AS k,
           GREATEST(CAST(1 AS BIGINT),
             CAST(floor((n_pairs - 1.96 * sqrt(CAST(n_days AS DOUBLE)
                  * (n_days - 1) * (2 * n_days + 5) / 18.0)) / 2)
               AS BIGINT)) AS m1,
           LEAST(n_pairs,
             CAST(floor((n_pairs + 1.96 * sqrt(CAST(n_days AS DOUBLE)
                  * (n_days - 1) * (2 * n_days + 5) / 18.0)) / 2)
               AS BIGINT) + 1) AS m2
    FROM ranked)
SELECT item_id, n_days, n_pairs,
       CAST(MAX(CASE WHEN rn = k THEN slope_uc END) AS BIGINT)
         AS slope_uc_per_day,
       CAST(MAX(CASE WHEN rn = m1 THEN slope_uc END) AS BIGINT)
         AS slope_lo_uc,
       CAST(MAX(CASE WHEN rn = m2 THEN slope_uc END) AS BIGINT)
         AS slope_hi_uc,
       CASE WHEN MAX(CASE WHEN rn = k THEN slope_uc END) > 0 THEN 'up'
            WHEN MAX(CASE WHEN rn = k THEN slope_uc END) < 0 THEN 'down'
            ELSE 'flat' END AS trend
FROM marked
WHERE n_days >= {min_days}
GROUP BY item_id, n_days, n_pairs"""


# ---------------------------------------------------------------------------
# Mann–Kendall trend test + Kendall's tau-b (round 11)

MK_MIN_DAYS = THEIL_MIN_DAYS
MK_WINDOW_DAYS = THEIL_WINDOW_DAYS


def mann_kendall(
    silver: DataFrame,
    min_days: int = MK_MIN_DAYS,
    window_days: int = MK_WINDOW_DAYS,
) -> DataFrame:
    """(item_id, n_days, n_pairs, s_stat, n_concordant, n_discordant,
    n_tied_price, tau_b, trend): the Mann–Kendall trend TEST for each
    item's daily price series — S = Σ_{i<j} sgn(p_j − p_i) over day-
    ordered pairs — plus Kendall's tau-b, the tie-corrected rank
    correlation of price vs time. The significance-test companion of
    a18_theil_sen (which estimates the slope this tests): S, the pair
    counts, and the tie correction are EXACT BIGINTs; tau_b is the one
    final double, computed from those integers by an expression tree
    kept textually identical in both dialects (the welch_t device).

    tau_b = (C − D) / sqrt(n0 · (n0 − n2)) with n0 = n(n−1)/2 pairs,
    n2 = Σ t(t−1)/2 over tied-price groups; the time axis has no ties
    (one row per (item, day)), so its correction term is zero by
    construction.

    Plan shape: identical to theil_sen — one map-combinable (item, day)
    groupBy, the shared trailing-window anchor (pair count calendar-
    bounded at C(window+1, 2) per item — the 100 TB contract for the
    O(days²) pair family), then an item-keyed equi self-join and one
    aggregate. Zero windows, zero UDFs. Cites reference models.py:30-105
    (the gold trend family this extends)."""
    daily = (
        _window_anchor(_daily(silver), window_days)
        .select(
            "item_id",
            F.expr("datediff(snapshot_date, DATE'1970-01-01')").alias("d"),
            int_units("price").cast("bigint").alias("p"),
        )
    )
    n_days = daily.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.item_id") == F.col("b.item_id"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .select(
            F.col("a.item_id").alias("item_id"),
            F.expr(
                "CASE WHEN b.p > a.p THEN 1 WHEN b.p < a.p THEN -1 ELSE 0 END"
            ).alias("sgn"),
        )
    )
    agg = pairs.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("sgn").cast("bigint").alias("s_stat"),
        F.sum(F.expr("CASE WHEN sgn = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_concordant"),
        F.sum(F.expr("CASE WHEN sgn = -1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_discordant"),
        F.sum(F.expr("CASE WHEN sgn = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_tied_price"),
    )
    tau = (
        "CASE WHEN n_pairs > n_tied_price THEN"
        " CAST(s_stat AS DOUBLE)"
        " / sqrt(CAST(n_pairs AS DOUBLE) * CAST(n_pairs - n_tied_price AS DOUBLE))"
        " END"
    )
    return (
        agg.join(n_days, "item_id")
        .where(F.col("n_days") >= min_days)
        .select(
            "item_id",
            "n_days",
            "n_pairs",
            "s_stat",
            "n_concordant",
            "n_discordant",
            "n_tied_price",
            F.expr(tau).alias("tau_b"),
            F.expr(
                "CASE WHEN s_stat > 0 THEN 'up'"
                " WHEN s_stat < 0 THEN 'down' ELSE 'flat' END"
            ).alias("trend"),
        )
    )


def mann_kendall_sql(
    silver_sql_cte: str,
    min_days: int = MK_MIN_DAYS,
    window_days: int = MK_WINDOW_DAYS,
) -> str:
    """DuckDB twin of :func:`mann_kendall` (expects `silver` CTE)."""
    return f"""{silver_sql_cte},
  daily0 AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
             FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily0),
  daily AS (SELECT item_id,
                   CAST(snapshot_date - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST({int_units_sql('price')} AS BIGINT) AS p
            FROM daily0, anchor
            WHERE snapshot_date >= d1 - INTERVAL {window_days} DAY),
  nd AS (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_days
         FROM daily GROUP BY item_id),
  pairs AS (
    SELECT a.item_id,
           CASE WHEN b.p > a.p THEN 1 WHEN b.p < a.p THEN -1 ELSE 0 END AS sgn
    FROM daily a JOIN daily b
      ON a.item_id = b.item_id AND b.d > a.d),
  agg AS (
    SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(sgn) AS BIGINT) AS s_stat,
           CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_concordant,
           CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_discordant,
           CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tied_price
    FROM pairs GROUP BY item_id)
SELECT agg.item_id, nd.n_days, n_pairs, s_stat, n_concordant, n_discordant,
       n_tied_price,
       CASE WHEN n_pairs > n_tied_price THEN
         CAST(s_stat AS DOUBLE)
         / sqrt(CAST(n_pairs AS DOUBLE) * CAST(n_pairs - n_tied_price AS DOUBLE))
       END AS tau_b,
       CASE WHEN s_stat > 0 THEN 'up'
            WHEN s_stat < 0 THEN 'down' ELSE 'flat' END AS trend
FROM agg JOIN nd ON agg.item_id = nd.item_id
WHERE nd.n_days >= {min_days}"""


# ---------------------------------------------------------------------------
# Pettitt changepoint test (round 11)

PETTITT_MIN_DAYS = 5  # below this every split is noise
PETTITT_WINDOW_DAYS = THEIL_WINDOW_DAYS


def pettitt_changepoint(
    silver: DataFrame,
    min_days: int = PETTITT_MIN_DAYS,
    window_days: int = PETTITT_WINDOW_DAYS,
) -> DataFrame:
    """(item_id, n_days, k_stat, u_at_max, t_at_max, changepoint_day,
    significant_05): the Pettitt nonparametric changepoint test per item — the
    rank-based single-changepoint locator (where did the price level
    SHIFT?), the distribution-free companion of a13_cusum (which needs a
    baseline mean) and a19_mann_kendall (monotone trend vs level break).

    Exactness device — NO pairwise join, unlike the naive
    U_t = Σ_{i≤t} Σ_{j>t} sgn(X_j − X_i) definition: the prefix-vs-
    suffix sign sum collapses to ranks because Σ_j sgn(X_j − X_i) =
    n + 1 − 2·r_i (midranks; tie groups cancel exactly) and the within-
    prefix pair sum is antisymmetric → zero, so
        U_t = t·(n+1) − Σ_{i≤t} R_i,   R_i = 2·midrank (INTEGER:
        R = 2·RANK() + tie_count − 1).
    Everything is BIGINT window arithmetic: a rank window over price, a
    cumulative sum over day order, an argmax (first-t tiebreak, pinned).
    K = max|U_t| over t < n. The significance DECISION
    p ≈ 2·exp(−6K²/(n³+n²)) < 0.05 is emitted as the equivalent exact
    comparison 6·K² > ln(40)·(n³+n²) — integers against one
    correctly-rounded double product, deterministic cross-engine,
    because exp() itself is NOT correctly rounded identically in the
    JVM and DuckDB's libm (measured: last-ulp p divergence at sf0.001;
    the welch_t decision/display lesson applied at authoring time).

    Plan shape: one map-combinable (item, day) groupBy → trailing-window
    anchor → three item-keyed windows + one aggregate. O(days·log days)
    per item, state bounded by the calendar — the 100 TB contract WITHOUT
    the pair family's O(days²) term."""
    daily = (
        _window_anchor(_daily(silver), window_days)
        .select(
            "item_id",
            F.col("snapshot_date").alias("day"),
            F.expr("datediff(snapshot_date, DATE'1970-01-01')").alias("d"),
            int_units("price").cast("bigint").alias("p"),
        )
    )
    wrank = Window.partitionBy("item_id").orderBy("p")
    wtie = Window.partitionBy("item_id", "p")
    wday = Window.partitionBy("item_id").orderBy("d")
    wcum = wday.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("item_id")
    scored = (
        daily.withColumn(
            "r2",
            (2 * F.rank().over(wrank) + F.count(F.lit(1)).over(wtie) - 1)
            .cast("bigint"),
        )
        .withColumn("t", F.row_number().over(wday).cast("bigint"))
        .withColumn("cum_r2", F.sum("r2").over(wcum).cast("bigint"))
        .withColumn("n_days", F.count(F.lit(1)).over(wall).cast("bigint"))
        # cum_r2 sums the DOUBLED midranks (Σ R_i = 2·Σ r_i), so
        # U_t = t·(n+1) − Σ 2·r_i = t·(n+1) − cum_r2 — already the exact
        # integer Pettitt statistic, no halving needed (probe-pinned
        # against the O(n²) sign-sum definition in tests).
        .withColumn(
            "u",
            (F.col("t") * (F.col("n_days") + 1) - F.col("cum_r2")).cast("bigint"),
        )
    )
    return (
        scored.where((F.col("t") < F.col("n_days")) & (F.col("n_days") >= min_days))
        .withColumn(
            "_pick",
            F.row_number().over(
                Window.partitionBy("item_id").orderBy(
                    F.abs(F.col("u")).desc(), F.col("t").asc()
                )
            ),
        )
        .where(F.col("_pick") == 1)
        .select(
            "item_id",
            "n_days",
            F.abs(F.col("u")).cast("bigint").alias("k_stat"),
            F.col("u").alias("u_at_max"),
            F.col("t").alias("t_at_max"),
            F.col("day").alias("changepoint_day"),
            # p = 2·exp(−6K²/(n³+n²)) < 0.05  ⟺  6K² > ln(40)·(n³+n²);
            # K² and n³+n² are exactly-representable integers (< 2^53),
            # the literal·product is one correctly-rounded double op —
            # deterministic cross-engine where exp() is not
            F.expr(
                "CAST(6 * abs(u) * abs(u) AS DOUBLE)"
                " > 3.6888794541139363 * (CAST(n_days AS DOUBLE) * n_days * n_days"
                " + CAST(n_days AS DOUBLE) * n_days)"
            ).alias("significant_05"),
        )
    )


def pettitt_sql(
    silver_sql_cte: str,
    min_days: int = PETTITT_MIN_DAYS,
    window_days: int = PETTITT_WINDOW_DAYS,
) -> str:
    """DuckDB twin of :func:`pettitt_changepoint` (expects `silver` CTE)."""
    return f"""{silver_sql_cte},
  daily0 AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
             FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily0),
  daily AS (SELECT item_id, snapshot_date AS day,
                   CAST(snapshot_date - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST({int_units_sql('price')} AS BIGINT) AS p
            FROM daily0, anchor
            WHERE snapshot_date >= d1 - INTERVAL {window_days} DAY),
  scored AS (
    SELECT item_id, day,
           CAST(2 * RANK() OVER (PARTITION BY item_id ORDER BY p)
                + COUNT(*) OVER (PARTITION BY item_id, p) - 1 AS BIGINT) AS r2,
           CAST(ROW_NUMBER() OVER (PARTITION BY item_id ORDER BY d) AS BIGINT)
             AS t,
           CAST(COUNT(*) OVER (PARTITION BY item_id) AS BIGINT) AS n_days
    FROM daily),
  cum AS (
    SELECT *,
           CAST(SUM(r2) OVER (PARTITION BY item_id ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_r2
    FROM scored),
  u AS (
    SELECT item_id, day, t, n_days,
           CAST(t * (n_days + 1) - cum_r2 AS BIGINT) AS u
    FROM cum
    WHERE t < n_days AND n_days >= {min_days}),
  pick AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY item_id
                                 ORDER BY ABS(u) DESC, t ASC) AS pk
    FROM u)
SELECT item_id, n_days, CAST(ABS(u) AS BIGINT) AS k_stat, u AS u_at_max,
       t AS t_at_max, day AS changepoint_day,
       CAST(6 * abs(u) * abs(u) AS DOUBLE)
         > 3.6888794541139363 * (CAST(n_days AS DOUBLE) * n_days * n_days
                                 + CAST(n_days AS DOUBLE) * n_days)
         AS significant_05
FROM pick WHERE pk = 1"""


# ---------------------------------------------------------------------------
# Seasonal Mann–Kendall (Hirsch–Slack) trend test (round 11, legacy registry)

SMK_MIN_DAYS = THEIL_MIN_DAYS
SMK_WINDOW_DAYS = THEIL_WINDOW_DAYS


def seasonal_mann_kendall(
    silver: DataFrame,
    min_days: int = SMK_MIN_DAYS,
    window_days: int = SMK_WINDOW_DAYS,
) -> DataFrame:
    """(item_id, n_days, n_seasons_active, n_pairs, s_stat, var18,
    significant_05, trend): the SEASONAL Mann–Kendall test (Hirsch–
    Slack) per item — a19's S statistic computed WITHIN each day-of-week
    season and summed, so a strong weekly cycle cannot masquerade as (or
    mask) a trend: only same-weekday pairs are compared. An item meeting
    min_days with NO same-season pair (every in-window day on a distinct
    weekday) still reports — as an n_pairs=0 / s_stat=0 / var18=0 'flat'
    row (r11 ADVICE #1: it used to be silently dropped by an inner join).

    Exactness: S' = Σ_g S_g and the tie-corrected variance
    18·VAR' = Σ_g [n_g(n_g−1)(2n_g+5) − Σ_t t(t−1)(2t+5)] are exact
    BIGINTs (the /18 stays un-divided). The |Z| > 1.96 decision with the
    standard continuity correction, Z = (S−sgn(S))/√VAR', ships as the
    integer-vs-literal comparison (|S|−1)²·18 > 3.8416·var18 (and
    |S| > 1) — 1.96² = 3.8416 is EXACT in binary-scaled decimal terms of
    the literal, and literal×exact-int is one correctly-rounded double
    op, deterministic cross-engine (the exp()-free device a20
    established). Seasons key on days-since-a-known-Monday mod 7 — the
    dayofweek() convention clash is avoided by construction.

    Plan shape: the a19 equi self-join with (item, dow) in the key —
    the pair count is STRICTLY SMALLER than a19's (seasons partition the
    days: Σ C(n_g,2) ≤ C(n,2)) — plus two map-combinable tie/size
    aggregates. Calendar-bounded at the same trailing window."""
    daily = (
        _window_anchor(_daily(silver), window_days)
        .select(
            "item_id",
            F.expr("datediff(snapshot_date, DATE'1970-01-01')").alias("d"),
            int_units("price").cast("bigint").alias("p"),
        )
        .withColumn("dow", F.expr("((d % 7) + 7) % 7"))
    )
    n_days = daily.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.countDistinct("dow").cast("bigint").alias("n_seasons_active"),
    )
    # per-season sizes and per-(season, value) tie groups → 18·VAR terms
    szs = daily.groupBy("item_id", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng")
    )
    ties = daily.groupBy("item_id", "dow", "p").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    var_n = szs.groupBy("item_id").agg(
        F.sum(F.expr("ng * (ng - 1) * (2 * ng + 5)")).cast("bigint").alias("v_n")
    )
    var_t = ties.groupBy("item_id").agg(
        F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).cast("bigint").alias("v_t")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.item_id") == F.col("b.item_id"))
        & (F.col("a.dow") == F.col("b.dow"))
        & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.item_id").alias("item_id"),
        F.expr(
            "CASE WHEN b.p > a.p THEN 1 WHEN b.p < a.p THEN -1 ELSE 0 END"
        ).alias("sgn"),
    )
    agg = pairs.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("sgn").cast("bigint").alias("s_stat"),
    )
    # LEFT join from n_days (r11 ADVICE #1): an item meeting min_days whose
    # in-window days all fall on distinct weekdays has ZERO same-season
    # pairs — it must still appear, as the honest n_pairs=0/s_stat=0/
    # var18=0 'flat' row, not silently vanish from the report.
    return (
        n_days.join(agg, "item_id", "left")
        .join(var_n, "item_id")
        .join(var_t, "item_id")
        .where(F.col("n_days") >= min_days)
        .select(
            "item_id",
            "n_days",
            "n_seasons_active",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.col("s_stat"), F.lit(0)).cast("bigint").alias("s_stat"),
            (F.col("v_n") - F.col("v_t")).cast("bigint").alias("var18"),
            F.expr(
                "abs(coalesce(s_stat, 0)) > 1 AND"
                " CAST((abs(coalesce(s_stat, 0)) - 1)"
                " * (abs(coalesce(s_stat, 0)) - 1) * 18 AS DOUBLE)"
                " > 3.8416 * CAST(var18 AS DOUBLE)"
            ).alias("significant_05"),
            F.expr(
                "CASE WHEN coalesce(s_stat, 0) > 0 THEN 'up'"
                " WHEN coalesce(s_stat, 0) < 0 THEN 'down' ELSE 'flat' END"
            ).alias("trend"),
        )
    )


def seasonal_mann_kendall_sql(
    silver_sql_cte: str,
    min_days: int = SMK_MIN_DAYS,
    window_days: int = SMK_WINDOW_DAYS,
) -> str:
    """DuckDB twin of :func:`seasonal_mann_kendall` (expects `silver`)."""
    return f"""{silver_sql_cte},
  daily0 AS (SELECT item_id, snapshot_date, MIN(unit_price) AS price
             FROM silver GROUP BY item_id, snapshot_date),
  anchor AS (SELECT MAX(snapshot_date) AS d1 FROM daily0),
  daily AS (SELECT item_id,
                   CAST(snapshot_date - DATE '1970-01-01' AS BIGINT) AS d,
                   ((CAST(snapshot_date - DATE '1970-01-01' AS BIGINT) % 7) + 7) % 7 AS dow,
                   CAST({int_units_sql('price')} AS BIGINT) AS p
            FROM daily0, anchor
            WHERE snapshot_date >= d1 - INTERVAL {window_days} DAY),
  nd AS (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_days,
                CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_seasons_active
         FROM daily GROUP BY item_id),
  vn AS (SELECT item_id, CAST(SUM(ng * (ng - 1) * (2 * ng + 5)) AS BIGINT) AS v_n
         FROM (SELECT item_id, dow, CAST(COUNT(*) AS BIGINT) AS ng
               FROM daily GROUP BY item_id, dow) s GROUP BY item_id),
  vt AS (SELECT item_id, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS v_t
         FROM (SELECT item_id, dow, p, CAST(COUNT(*) AS BIGINT) AS t
               FROM daily GROUP BY item_id, dow, p) s GROUP BY item_id),
  agg AS (
    SELECT a.item_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN b.p > a.p THEN 1 WHEN b.p < a.p THEN -1
                         ELSE 0 END) AS BIGINT) AS s_stat
    FROM daily a JOIN daily b
      ON a.item_id = b.item_id AND a.dow = b.dow AND b.d > a.d
    GROUP BY a.item_id)
SELECT nd.item_id, nd.n_days, nd.n_seasons_active,
       CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(s_stat, 0) AS BIGINT) AS s_stat,
       CAST(v_n - v_t AS BIGINT) AS var18,
       abs(COALESCE(s_stat, 0)) > 1 AND
         CAST((abs(COALESCE(s_stat, 0)) - 1)
              * (abs(COALESCE(s_stat, 0)) - 1) * 18 AS DOUBLE)
         > 3.8416 * CAST(v_n - v_t AS DOUBLE) AS significant_05,
       CASE WHEN COALESCE(s_stat, 0) > 0 THEN 'up'
            WHEN COALESCE(s_stat, 0) < 0 THEN 'down' ELSE 'flat' END AS trend
FROM nd LEFT JOIN agg ON agg.item_id = nd.item_id
JOIN vn ON nd.item_id = vn.item_id
JOIN vt ON nd.item_id = vt.item_id
WHERE nd.n_days >= {min_days}"""
