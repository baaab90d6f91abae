"""Table profiling: ANALYZE-style per-column statistics + histogram sketches.

A 100 TB store runs ANALYZE continuously — null fractions, NDVs, min/max
and value distributions feed the cost-based optimizer, data-quality
monitors, and partition-layout decisions (the reference's serving store
gets this for free from Postgres' autovacuum/analyze; an engine owns it
explicitly). Two surfaces:

* `table_stats` — exact per-column profile, one column-pruned aggregate
  per profiled column UNION'd into a long-format stats table. Each
  aggregate is a single map-side-combining pass over ONLY that column
  (column pruning reaches the parquet scan), so profiling k columns costs
  k cheap scans, embarrassingly parallel — the same shape ANALYZE uses.
  The sketch alternative for NDV at scale is operators/sketches.py's HLL
  (one pass, mergeable) — these are the exact reference values.

* `histogram_quantiles` — the third sketch pillar next to HLL (distinct)
  and CMS (frequency): a fixed-grid histogram sketch for quantiles.
  Bucket = floor(value · SCALE) clamped into [0, BINS): multiplying by a
  power of two is exact in IEEE doubles, so bucketing is deterministic and
  IDENTICAL across engines — the approximate structure hash-checks
  exactly, like the Bloom/HLL/CMS siblings. The histogram is a mergeable
  state (per-bucket counts sum); quantile read-off is the smallest bucket
  whose running count reaches ceil(q·n), reported as the bucket's upper
  edge — error bounded by one bucket width (pinned in tests against the
  exact percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.lifecycle import materialize

from ..functions.numerics import int_units, int_units_sql

# (column, kind) spec for the lineitem profile; kinds: num | str | date
TABLE_STATS_COLS = (
    ("l_partkey", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
)


def table_stats(df: DataFrame, cols: tuple[tuple[str, str], ...] = TABLE_STATS_COLS) -> DataFrame:
    """Long-format exact profile: one row per profiled column with
    (column, n_rows, n_nulls, null_frac, n_distinct, min_num, max_num,
    avg_str_len). Numeric min/max are NULL for strings and vice versa, so
    the output schema is static."""
    from functools import reduce

    parts = []
    for name, kind in cols:
        c = F.col(name)
        is_num = kind == "num"
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("bigint").alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                (F.min(c.cast("double")) if is_num else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.max(c.cast("double")) if is_num else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
                (
                    F.lit(None).cast("double")
                    if is_num
                    else F.sum(F.length(c).cast("decimal(28,0)")).cast("double")
                    / F.count(c)
                ).alias("avg_str_len"),
            ).select(
                F.lit(name).alias("column"),
                "n_rows",
                "n_nulls",
                (F.col("n_nulls").cast("double") / F.col("n_rows")).alias("null_frac"),
                "n_distinct",
                "min_num",
                "max_num",
                "avg_str_len",
            )
        )
    return reduce(DataFrame.unionByName, parts)


def table_stats_sql(
    table: str = "lineitem", cols: tuple[tuple[str, str], ...] = TABLE_STATS_COLS
) -> str:
    selects = []
    for name, kind in cols:
        is_num = kind == "num"
        min_num = f"CAST(MIN(CAST({name} AS DOUBLE)) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        max_num = f"CAST(MAX(CAST({name} AS DOUBLE)) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        avg_len = (
            "CAST(NULL AS DOUBLE)"
            if is_num
            else f"CAST(SUM(CAST(length({name}) AS DECIMAL(28,0))) AS DOUBLE) / COUNT({name})"
        )
        selects.append(
            f"""SELECT '{name}' AS "column", COUNT(*) AS n_rows,
              CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
              CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*) AS null_frac,
              COUNT(DISTINCT {name}) AS n_distinct,
              {min_num} AS min_num, {max_num} AS max_num,
              {avg_len} AS avg_str_len
            FROM {table}"""
        )
    return " UNION ALL ".join(selects)


# --- histogram quantile sketch ---------------------------------------------

HIST_BINS = 4096  # covers [0, 2048) — the tick-value domain with headroom
HIST_SCALE = 2.0  # power of two: value·2 is EXACT in doubles → portable bins
HIST_QS = (0.5, 0.9, 0.99)


def _bucket_expr() -> str:
    return (
        f"CAST(least(greatest(floor(value * {HIST_SCALE!r}), 0.0),"
        f" {HIST_BINS - 1}.0) AS BIGINT)"
    )


def histogram_quantiles(
    events: DataFrame, qs: tuple[float, ...] = HIST_QS
) -> DataFrame:
    """(event_type, n_events, q50, q90, q99) read off a fixed-grid
    histogram of `value` per event type. Two small shuffles: per-(group,
    bucket) counts, then the read-off over the bucket CDF (a per-group
    window on ≤ HIST_BINS rows). Estimates are bucket UPPER EDGES:
    upward-biased by < 1/SCALE, mergeable, deterministic."""
    from pyspark.sql import Window

    hist = (
        events.select("event_type", F.expr(_bucket_expr()).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("event_type")
    cdf = hist.select(
        "event_type",
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    aggs = [F.max("n").alias("n_events")]
    for q in qs:
        rank = f"CAST(ceil({q!r} * n) AS BIGINT)"
        aggs.append(
            F.min(
                F.expr(
                    f"CASE WHEN cum >= {rank} THEN"
                    f" CAST(bucket + 1 AS DOUBLE) / CAST({HIST_SCALE!r} AS DOUBLE) END"
                )
            ).alias(f"q{int(q * 100)}")
        )
    return cdf.groupBy("event_type").agg(*aggs)


def histogram_quantiles_sql(qs: tuple[float, ...] = HIST_QS) -> str:
    cols = ", ".join(
        f"MIN(CASE WHEN cum >= CAST(ceil({q!r} * n) AS BIGINT)"
        f" THEN CAST(bucket + 1 AS DOUBLE) / CAST({HIST_SCALE!r} AS DOUBLE) END)"
        f" AS q{int(q * 100)}"
        for q in qs
    )
    return f"""
  WITH b AS (
    SELECT event_type,
           CAST(least(greatest(floor(value * {HIST_SCALE!r}), 0.0),
                      {HIST_BINS - 1}.0) AS BIGINT) AS bucket
    FROM events),
  hist AS (SELECT event_type, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
  cdf AS (
    SELECT event_type, bucket,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(cnt) OVER (PARTITION BY event_type) AS n
    FROM hist)
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events, {cols}
  FROM cdf GROUP BY event_type"""


# ---------------------------------------------------------------------------
# Declarative data-quality checks — the dbt-tests / Great-Expectations
# surface: a fixed battery of assertions over the silver table evaluated
# as ONE result row per check (check, metric, threshold, passed), so a
# scheduler can gate downstream assets on `bool_and(passed)` and an
# operator can read WHICH expectation broke. Each check is a small
# column-pruned aggregate (or an anti-join for referential integrity);
# at scale the battery costs one scan per independent column set and the
# orphan check is the usual broadcast-dim anti-join.

DQ_MAX_PRICE = 1e6
DQ_MAX_ORPHAN_FRAC = 0.05


def dq_checks(silver: DataFrame, dim_items: DataFrame) -> DataFrame:
    """(check, metric, threshold, passed) — fail-closed data-quality gate
    over the silver table."""
    from functools import reduce

    def row(name: str, metric, threshold: float, op: str):
        agg = silver.agg(metric.cast("double").alias("metric"))
        passed = (
            F.col("metric") <= threshold if op == "le" else F.col("metric") >= threshold
        )
        return agg.select(
            F.lit(name).alias("check"),
            "metric",
            F.lit(float(threshold)).alias("threshold"),
            passed.alias("passed"),
        )

    n = F.count(F.lit(1))
    checks = [
        row(
            "unit_price_null_frac",
            F.sum(F.when(F.col("unit_price").isNull(), 1).otherwise(0)) / n,
            0.01,
            "le",
        ),
        row(
            "item_id_null_frac",
            F.sum(F.when(F.col("item_id").isNull(), 1).otherwise(0)) / n,
            0.0,
            "le",
        ),
        row("quantity_min", F.min("quantity"), 1.0, "ge"),
        row("unit_price_max", F.max("unit_price"), DQ_MAX_PRICE, "le"),
        row(
            "id_duplicate_frac",
            (n - F.countDistinct("id")).cast("double") / n,
            0.0,
            "le",
        ),
    ]
    orphans = (
        silver.join(
            F.broadcast(dim_items.select("item_id")), "item_id", "left_anti"
        ).agg(F.count(F.lit(1)).alias("_orphans"))
        .crossJoin(F.broadcast(silver.agg(F.count(F.lit(1)).alias("_n"))))
        .select(
            F.lit("orphan_item_frac").alias("check"),
            (F.col("_orphans").cast("double") / F.col("_n")).alias("metric"),
            F.lit(DQ_MAX_ORPHAN_FRAC).alias("threshold"),
            (F.col("_orphans").cast("double") / F.col("_n") <= DQ_MAX_ORPHAN_FRAC).alias(
                "passed"
            ),
        )
    )
    return reduce(DataFrame.unionByName, checks + [orphans])


def dq_checks_sql(silver_sql: str, dim_sql: str) -> str:
    return f"""
  WITH silver AS ({silver_sql}), dim AS ({dim_sql}),
  base AS (SELECT COUNT(*) AS n FROM silver)
  SELECT 'unit_price_null_frac' AS "check",
         CAST(SUM(CASE WHEN unit_price IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS metric, 0.01 AS threshold,
         CAST(SUM(CASE WHEN unit_price IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) <= 0.01 AS passed
  FROM silver
  UNION ALL
  SELECT 'item_id_null_frac',
         CAST(SUM(CASE WHEN item_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*),
         0.0,
         CAST(SUM(CASE WHEN item_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
           <= 0.0
  FROM silver
  UNION ALL
  SELECT 'quantity_min', CAST(MIN(quantity) AS DOUBLE), 1.0,
         CAST(MIN(quantity) AS DOUBLE) >= 1.0 FROM silver
  UNION ALL
  SELECT 'unit_price_max', CAST(MAX(unit_price) AS DOUBLE), {DQ_MAX_PRICE!r},
         CAST(MAX(unit_price) AS DOUBLE) <= {DQ_MAX_PRICE!r} FROM silver
  UNION ALL
  SELECT 'id_duplicate_frac',
         CAST(COUNT(*) - COUNT(DISTINCT id) AS DOUBLE) / COUNT(*), 0.0,
         CAST(COUNT(*) - COUNT(DISTINCT id) AS DOUBLE) / COUNT(*) <= 0.0
  FROM silver
  UNION ALL
  SELECT 'orphan_item_frac',
         CAST((SELECT COUNT(*) FROM silver s
               WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.item_id = s.item_id))
              AS DOUBLE) / base.n,
         {DQ_MAX_ORPHAN_FRAC!r},
         CAST((SELECT COUNT(*) FROM silver s
               WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.item_id = s.item_id))
              AS DOUBLE) / base.n <= {DQ_MAX_ORPHAN_FRAC!r}
  FROM base"""


# --- join-key skew profiler --------------------------------------------------

SKEW_TOP_K = 10


def skew_report(silver: DataFrame, k: int = SKEW_TOP_K) -> DataFrame:
    """Heavy-hitter profile of the engine's hottest join/aggregation key
    (item_id): the pre-flight check an operator runs BEFORE choosing a
    salting factor or trusting AQE's skew split — which keys carry what
    share of the rows, and how far the head sits above a uniform spread.

    Output per top-k key: row count, share in ppm (exact integer:
    1e6·c DIV total — no float ratio in the hash path), and the
    skew multiple vs the uniform expectation in ppm of the mean
    (1e6·c·n_keys DIV total). ONE map-combinable count groupBy + a
    scalar broadcast + TakeOrderedAndProject.

    Headroom: 1e6·c·n_keys is staged through 128-bit integers in BOTH
    engines — in BIGINT it overflows 2^63 once c·n_keys > ~9.2e12
    (e.g. a 1e7-row hot key over 1e6 keys, squarely the 100 TB regime),
    where Spark (non-ANSI) would wrap silently while DuckDB raises.
    Spark stages through DECIMAL(38,0) with integer `DIV` (exact up to
    c·n_keys ≤ 1e32); DuckDB stages through native HUGEINT with `//`
    (exact up to c·n_keys ≤ ~1.7e32). floor(decimal / bigint) is NOT
    used: Spark's decimal division rounds HALF_UP to the result scale
    BEFORE floor, so floor is off by one whenever the true fractional
    part is ≥ 1 − 5e-7; and DuckDB executes DECIMAL/BIGINT as DOUBLE,
    losing exactness past 2^53. Integer division avoids both."""
    # key-dim count table with fact-scan lineage, two consumers (totals +
    # final projection): materialize once per execution (r12; guide §3.3).
    # Fact scans 2 → 1.
    counts = materialize(
        silver.groupBy("item_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "item_id",
            F.col("c").cast("bigint").alias("n_rows"),
            F.expr("CAST(1000000 * c DIV total AS BIGINT)").alias("share_ppm"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * c * n_keys"
                " DIV total AS BIGINT)"
            ).alias("x_uniform_ppm"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("item_id").asc())
        .limit(k)
    )


def skew_report_sql(silver_sql_cte: str, k: int = SKEW_TOP_K) -> str:
    """DuckDB twin of :func:`skew_report`."""
    return f"""{silver_sql_cte},
  counts AS (SELECT item_id, COUNT(*) AS c FROM silver GROUP BY item_id),
  totals AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                    CAST(COUNT(*) AS BIGINT) AS n_keys FROM counts)
SELECT item_id, CAST(c AS BIGINT) AS n_rows,
       CAST(1000000 * c // total AS BIGINT) AS share_ppm,
       CAST(CAST(1000000 AS HUGEINT) * c * n_keys
            // total AS BIGINT) AS x_uniform_ppm
FROM counts, totals
ORDER BY n_rows DESC, item_id ASC LIMIT {k}"""


# --- Benford first-digit check ----------------------------------------------

# Frozen expected first-digit distribution, ppm (round(1e6*log10(1+1/d))):
# python-computed ONCE and embedded as integer literals in BOTH engines'
# texts, so no engine ever evaluates a transcendental.
BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910,
               5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757}


def benford_check(silver: DataFrame) -> DataFrame:
    """First-digit distribution of prices vs Benford's law — the
    fraud/synthetic-data smell test a DQ suite runs over any financial
    column. Digits come from the INTEGER-UNITS price (first char of the
    bigint's string — exact, no float formatting); observed shares are
    exact integer ppm; expected shares are the frozen constants above.
    One map-combinable groupBy over 9 groups + a scalar broadcast."""
    exp_map = ", ".join(f"{d}, {p}" for d, p in BENFORD_PPM.items())
    counts = materialize(
        silver.select(int_units("unit_price").cast("bigint").alias("xu"))
        .where(F.col("xu") >= 1)
        .select(F.expr("CAST(substr(CAST(xu AS STRING), 1, 1) AS INT)").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        # 9-row digit histogram, two consumers (total + projection):
        # materialize once per execution (r12; guide §3.3). Scans 2 → 1.
    )
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr("CAST(1000000 * n DIV total AS BIGINT)").alias("obs_ppm"),
            F.expr(f"element_at(map({exp_map}), digit)").cast("bigint").alias(
                "exp_ppm"
            ),
        )
        .orderBy("digit")
    )


def benford_sql(silver_sql_cte: str) -> str:
    """DuckDB twin of :func:`benford_check`."""
    exp_map = ", ".join(f"{d}, {p}" for d, p in BENFORD_PPM.items())
    return f"""{silver_sql_cte},
  units AS (SELECT CAST({int_units_sql('unit_price')} AS BIGINT) AS xu
            FROM silver),
  digits AS (SELECT CAST(substr(CAST(xu AS VARCHAR), 1, 1) AS INTEGER) AS digit
             FROM units WHERE xu >= 1),
  counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
             FROM digits GROUP BY digit),
  total AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT digit, n,
       CAST(1000000 * n // total AS BIGINT) AS obs_ppm,
       CAST(map_extract(MAP {{{", ".join(f"{d}: {p}" for d, p in BENFORD_PPM.items())}}}, digit)[1] AS BIGINT) AS exp_ppm
FROM counts, total ORDER BY digit"""


# --- Spearman rank correlation ----------------------------------------------
#
# The monotonic-association profiler: "is price actually related to
# quantity inside each return class?" — the DQ/feature-screening question
# Pearson answers wrongly for non-linear-but-monotone relations and
# outlier-heavy money columns. Spearman = Pearson over midranks, and
# midranks over a quantized domain are computable WITHOUT a row-level sort:
#
#   * values quantize to integer cents (int_units) — bounded support;
#   * per-column rank tables aggregate counts per (group, value), then a
#     distinct-value window gives the tie-midrank: with cum = cumulative
#     count through v and c = count at v, the midrank of v is
#     cum - c + (c+1)/2, carried DOUBLED (r2 = 2*cum - 2*c + c + 1) so it
#     stays an exact BIGINT; the 2x factors cancel in the correlation.
#   * the joint distribution aggregates once to (group, x, y) -> n_xy, so
#     every moment sum is over DISTINCT PAIRS, weighted by n_xy — at 100 TB
#     the join/window inputs are value-domain-sized, not row-sized, and the
#     three groupBys are all map-combinable single shuffles.
#
# Moment sums stage through DECIMAL(38,0) (Spark) / HUGEINT (DuckDB):
# with r2 <= 2n, n*Sxx <= 4n^4 keeps every intermediate inside 38 digits up
# to n ~ 1.2e9 rows per group — beyond that the sums saturate decimal
# overflow (Spark non-ANSI nulls, DuckDB raises loudly), they never wrap
# silently. rho itself is sqrt-derived (irrational), so the output uses
# the q12-of-double quantizer — safe for 17-significant-digit shortest
# reprs, the welch_t argument; degenerate groups (zero variance in either
# column, n < 2) return NULL via the guarded CASE, identically in both
# engines.

SPEARMAN_GROUP = "l_returnflag"


def spearman_rank_corr(lineitem: DataFrame) -> DataFrame:
    """(l_returnflag, n_pairs, rho_spearman): exact-midrank Spearman
    correlation of l_extendedprice vs l_quantity per return class."""
    base = lineitem.select(
        F.col(SPEARMAN_GROUP).alias("g"),
        int_units("l_extendedprice").cast("bigint").alias("xu"),
        int_units("l_quantity").cast("bigint").alias("yu"),
    )
    # r12 single-scan restructure (guide §2.2 shuffle-fewer-bytes +
    # §3.3): the old form scanned the fact THREE times (pairs, per-x
    # counts, per-y counts). The distinct value-pair relation `pairs`
    # already determines both marginals exactly — cx(g, xu) = Σ_yu n_xy
    # and cy(g, yu) = Σ_xu n_xy are the same integers as COUNT(*) over
    # the raw rows — so rx/ry now aggregate the (much smaller) pairs
    # relation instead of re-scanning lineitem. `pairs` feeds three
    # consumers and Spark does not CSE across branches, so it is
    # localCheckpointed (the midrank method's materialized value-pair
    # table; ≪ fact-sized at any scale). Fact scans: 3 → 1. Midranks,
    # 128-bit moment sums and rho are unchanged — bit-identical.
    pairs = materialize(
        base.groupBy("g", "xu", "yu")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
    )
    wx = (
        Window.partitionBy("g")
        .orderBy("xu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rx = (
        pairs.groupBy("g", "xu")
        .agg(F.sum("n_xy").cast("bigint").alias("cx"))
        .select(
            "g",
            "xu",
            (2 * F.sum("cx").over(wx) - 2 * F.col("cx") + F.col("cx") + 1)
            .cast("bigint")
            .alias("rx2"),
        )
    )
    wy = (
        Window.partitionBy("g")
        .orderBy("yu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ry = (
        pairs.groupBy("g", "yu")
        .agg(F.sum("n_xy").cast("bigint").alias("cy"))
        .select(
            "g",
            "yu",
            (2 * F.sum("cy").over(wy) - 2 * F.col("cy") + F.col("cy") + 1)
            .cast("bigint")
            .alias("ry2"),
        )
    )
    d38 = lambda e: f"CAST({e} AS DECIMAL(38,0))"  # noqa: E731
    sums = (
        pairs.join(rx, ["g", "xu"])
        .join(ry, ["g", "yu"])
        .groupBy("g")
        .agg(
            F.sum("n_xy").cast("bigint").alias("n"),
            F.sum(F.expr(f"{d38('n_xy')} * rx2")).alias("sx"),
            F.sum(F.expr(f"{d38('n_xy')} * ry2")).alias("sy"),
            F.sum(F.expr(f"{d38('n_xy')} * rx2 * ry2")).alias("sxy"),
            F.sum(F.expr(f"{d38('n_xy')} * rx2 * rx2")).alias("sxx"),
            F.sum(F.expr(f"{d38('n_xy')} * ry2 * ry2")).alias("syy"),
        )
    )
    num = f"({d38('n')} * sxy - sx * sy)"
    dx = f"({d38('n')} * sxx - sx * sx)"
    dy = f"({d38('n')} * syy - sy * sy)"
    rho = (
        f"CASE WHEN n >= 2 AND {dx} > 0 AND {dy} > 0 THEN"
        f" CAST(CAST(CAST({num} AS DOUBLE)"
        f" / (sqrt(CAST({dx} AS DOUBLE)) * sqrt(CAST({dy} AS DOUBLE)))"
        f" AS DECIMAL(18,12)) AS DOUBLE) END"
    )
    return sums.select(
        F.col("g").alias(SPEARMAN_GROUP),
        F.col("n").alias("n_pairs"),
        F.expr(rho).alias("rho_spearman"),
    ).orderBy(SPEARMAN_GROUP)


def spearman_rank_corr_sql() -> str:
    """DuckDB twin of :func:`spearman_rank_corr`."""
    xu = int_units_sql("l_extendedprice")
    yu = int_units_sql("l_quantity")
    h = lambda e: f"CAST({e} AS HUGEINT)"  # noqa: E731
    num = f"({h('n')} * sxy - sx * sy)"
    dx = f"({h('n')} * sxx - sx * sx)"
    dy = f"({h('n')} * syy - sy * sy)"
    rho = (
        f"CASE WHEN n >= 2 AND {dx} > 0 AND {dy} > 0 THEN"
        f" CAST(CAST(CAST({num} AS DOUBLE)"
        f" / (sqrt(CAST({dx} AS DOUBLE)) * sqrt(CAST({dy} AS DOUBLE)))"
        f" AS DECIMAL(18,12)) AS DOUBLE) END"
    )
    return f"""
  WITH base AS (
    SELECT {SPEARMAN_GROUP} AS g,
           CAST({xu} AS BIGINT) AS xu,
           CAST({yu} AS BIGINT) AS yu
    FROM lineitem),
  pairs AS (
    SELECT g, xu, yu, CAST(COUNT(*) AS BIGINT) AS n_xy
    FROM base GROUP BY g, xu, yu),
  rx AS (
    SELECT g, xu,
           CAST(2 * SUM(cx) OVER (PARTITION BY g ORDER BY xu
                                  ROWS UNBOUNDED PRECEDING)
                - 2 * cx + cx + 1 AS BIGINT) AS rx2
    FROM (SELECT g, xu, CAST(COUNT(*) AS BIGINT) AS cx
          FROM base GROUP BY g, xu)),
  ry AS (
    SELECT g, yu,
           CAST(2 * SUM(cy) OVER (PARTITION BY g ORDER BY yu
                                  ROWS UNBOUNDED PRECEDING)
                - 2 * cy + cy + 1 AS BIGINT) AS ry2
    FROM (SELECT g, yu, CAST(COUNT(*) AS BIGINT) AS cy
          FROM base GROUP BY g, yu)),
  sums AS (
    SELECT p.g,
           CAST(SUM(n_xy) AS BIGINT) AS n,
           SUM({h('n_xy')} * rx2) AS sx,
           SUM({h('n_xy')} * ry2) AS sy,
           SUM({h('n_xy')} * rx2 * ry2) AS sxy,
           SUM({h('n_xy')} * rx2 * rx2) AS sxx,
           SUM({h('n_xy')} * ry2 * ry2) AS syy
    FROM pairs p
    JOIN rx ON p.g = rx.g AND p.xu = rx.xu
    JOIN ry ON p.g = ry.g AND p.yu = ry.yu
    GROUP BY p.g)
SELECT g AS {SPEARMAN_GROUP}, n AS n_pairs,
       {rho} AS rho_spearman
FROM sums
ORDER BY {SPEARMAN_GROUP}"""


# --- Cramér's V (categorical association) -----------------------------------
#
# The categorical twin of spearman_rank_corr: "is the event mix independent
# of the client property, or does one drive the other?" — chi-square over
# the full r x c contingency table (INCLUDING zero-observed cells, which
# still carry expected mass), normalized to Cramér's V in [0,1]. The
# second categorical is the props JSON k-quartile (TRY_CAST of $.k DIV 25)
# — same extraction path as pj_json_kpis, so the JSON surface gets an
# association-level consumer too.
#
# Numeric discipline: cell terms of phi^2 = chi^2/n are computed as
# (o - ri*cj/n)^2 / (ri*cj) in doubles whose inputs (o, ri, cj, n) are
# int->double exact below 2^53 (documented bound: n <= 9e15 rows) with
# IDENTICAL expression trees in both engines, then floored at 1e-15 and
# summed in BIGINT — the PSI rule: no float ever crosses an aggregation
# boundary, so partial-aggregation order cannot wobble the result.
# phi^2 <= min(r-1, c-1) keeps every q15 term under ~4e15; V itself is
# sqrt-derived -> q12 quantizer.
#
# Scale shape: ONE map-combinable groupBy on (event_type, quartile) to the
# r x c cell table (tiny), margins via windows over it, the zero-cell
# completion a broadcast cross of the two distinct margins — nothing
# row-sized past the first aggregate.


def cramers_v(events: DataFrame) -> DataFrame:
    """Single-row association report between event_type and the props
    k-quartile: (n, n_rows, n_cols, phi2_q15, chi2, cramers_v)."""
    cells = (
        events.select(
            "event_type",
            F.expr(
                "TRY_CAST(get_json_object(props, '$.k') AS BIGINT) DIV 25"
            ).alias("kq"),
        )
        .where(F.col("kq").isNotNull())
        .groupBy("event_type", "kq")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rows = cells.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("ri"))
    cols = cells.groupBy("kq").agg(F.sum("o").cast("bigint").alias("cj"))
    full = (
        rows.crossJoin(F.broadcast(cols))
        .join(cells, ["event_type", "kq"], "left")
        .select(
            "event_type",
            "kq",
            "ri",
            "cj",
            F.coalesce("o", F.lit(0)).cast("bigint").alias("o"),
        )
    )
    term = (
        "(CAST(o AS DOUBLE) - CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)"
        " / CAST(n AS DOUBLE))"
    )
    phi2_term = (
        f"({term} * {term} / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)))"
    )
    totals = (
        full.crossJoin(
            F.broadcast(
                cells.agg(
                    F.sum("o").cast("bigint").alias("n"),
                    F.countDistinct("event_type").cast("bigint").alias("n_rows"),
                    F.countDistinct("kq").cast("bigint").alias("n_cols"),
                )
            )
        )
        .select(
            "n",
            "n_rows",
            "n_cols",
            F.expr(f"CAST(floor({phi2_term} * 1e15) AS BIGINT)").alias("tq"),
        )
        .groupBy("n", "n_rows", "n_cols")
        .agg(F.sum("tq").alias("phi2_q15"))
    )
    k = "CAST(LEAST(n_rows - 1, n_cols - 1) AS DOUBLE)"
    v = (
        f"CASE WHEN n_rows >= 2 AND n_cols >= 2 AND phi2_q15 >= 0 THEN"
        f" CAST(CAST(sqrt((CAST(phi2_q15 AS DOUBLE) / 1e15) / {k})"
        f" AS DECIMAL(18,12)) AS DOUBLE) END"
    )
    return totals.select(
        "n",
        "n_rows",
        "n_cols",
        "phi2_q15",
        F.expr("CAST(phi2_q15 AS DOUBLE) / 1e15 * CAST(n AS DOUBLE)").alias("chi2"),
        F.expr(v).alias("cramers_v"),
    )


def cramers_v_sql() -> str:
    """DuckDB twin of :func:`cramers_v`."""
    term = (
        "(CAST(o AS DOUBLE) - CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)"
        " / CAST(n AS DOUBLE))"
    )
    phi2_term = f"({term} * {term} / (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)))"
    k = "CAST(LEAST(n_rows - 1, n_cols - 1) AS DOUBLE)"
    v = (
        f"CASE WHEN n_rows >= 2 AND n_cols >= 2 AND phi2_q15 >= 0 THEN"
        f" CAST(CAST(sqrt((CAST(phi2_q15 AS DOUBLE) / 1e15) / {k})"
        f" AS DECIMAL(18,12)) AS DOUBLE) END"
    )
    return f"""
  WITH cells AS (
    SELECT event_type, kq, CAST(COUNT(*) AS BIGINT) AS o
    FROM (SELECT event_type,
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) // 25
                   AS kq
          FROM events)
    WHERE kq IS NOT NULL
    GROUP BY event_type, kq),
  rmarg AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS ri
            FROM cells GROUP BY event_type),
  cmarg AS (SELECT kq, CAST(SUM(o) AS BIGINT) AS cj FROM cells GROUP BY kq),
  tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows,
                 CAST(COUNT(DISTINCT kq) AS BIGINT) AS n_cols
          FROM cells),
  full_cells AS (
    SELECT r.event_type, c.kq, r.ri, c.cj, COALESCE(cl.o, 0) AS o
    FROM rmarg r CROSS JOIN cmarg c
    LEFT JOIN cells cl ON cl.event_type = r.event_type AND cl.kq = c.kq),
  summed AS (
    SELECT n, n_rows, n_cols,
           SUM(CAST(floor({phi2_term} * 1e15) AS BIGINT)) AS phi2_q15
    FROM full_cells, tot
    GROUP BY n, n_rows, n_cols)
SELECT n, n_rows, n_cols, CAST(phi2_q15 AS BIGINT) AS phi2_q15,
       CAST(phi2_q15 AS DOUBLE) / 1e15 * CAST(n AS DOUBLE) AS chi2,
       {v} AS cramers_v
FROM summed"""


# --- winsorized statistics ----------------------------------------------------

WINSOR_LO_PCT = 1  # clip below the exact discrete p01
WINSOR_HI_PCT = 99  # and above the exact discrete p99


def winsorized_stats(events: DataFrame) -> DataFrame:
    """Per event_type winsorized profile of `value`: EXACT discrete
    p01/p99 (the smallest value whose cumulative count reaches
    ceil(q·n/100) — percentile_disc semantics, no interpolation), clip
    counts on each side, and the winsorized mean as an exact integer
    quantization (1e4·Σclamp DIV n, value in cents → mean_q4 is
    cent·1e-4 units). The outlier clamp every stats/training stage runs
    before trusting a mean — and because the quantiles are DISCRETE
    ranks over integer units, the whole report is engine- and
    partitioning-identical (no double percentile interpolation).

    Scale shape: one map-combinable groupBy to (type, distinct cents),
    one per-type window over the distinct-value frame (value-domain-
    sized, NOT row-sized), a type-domain quantile read-off broadcast
    back, one final groupBy. Headroom: 1e4·Σclamp in DECIMAL(38,0) to
    ~1e34 cent-rows."""
    from ..functions.numerics import int_units

    counts = events.select(
        "event_type", int_units("value").cast("bigint").alias("xu")
    ).groupBy("event_type", "xu").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wtyp = Window.partitionBy("event_type")
    wcum = wtyp.orderBy("xu").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = counts.select(
        "event_type",
        "xu",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtyp).alias("n"),
    )
    lo = f"(n * {WINSOR_LO_PCT} + 99) DIV 100"
    hi = f"(n * {WINSOR_HI_PCT} + 99) DIV 100"
    qs = staged.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.min(F.expr(f"CASE WHEN cum >= {lo} THEN xu END")).alias("p01_units"),
        F.min(F.expr(f"CASE WHEN cum >= {hi} THEN xu END")).alias("p99_units"),
    )
    joined = counts.join(F.broadcast(qs), "event_type")
    clamp = "LEAST(GREATEST(xu, p01_units), p99_units)"
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("n_distinct").alias("n_distinct"),
            F.max("p01_units").alias("p01_units"),
            F.max("p99_units").alias("p99_units"),
            F.sum(F.expr("CASE WHEN xu < p01_units THEN c ELSE 0 END"))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.expr("CASE WHEN xu > p99_units THEN c ELSE 0 END"))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.sum(F.expr(f"CAST({clamp} AS DECIMAL(38,0)) * c")).alias("_s"),
        )
        .select(
            "event_type",
            "n",
            "n_distinct",
            "p01_units",
            "p99_units",
            "n_clipped_low",
            "n_clipped_high",
            F.expr(
                "CAST(CAST(10000 AS DECIMAL(38,0)) * _s DIV n AS BIGINT)"
            ).alias("winsorized_mean_q4"),
        )
        .orderBy("event_type")
    )


def winsorized_stats_sql(xu_sql: str | None = None) -> str:
    """DuckDB twin of :func:`winsorized_stats`."""
    from ..functions.numerics import int_units_sql

    xu = xu_sql or int_units_sql("value")
    lo = f"(n * {WINSOR_LO_PCT} + 99) // 100"
    hi = f"(n * {WINSOR_HI_PCT} + 99) // 100"
    return f"""
  WITH counts AS (
    SELECT event_type, CAST({xu} AS BIGINT) AS xu,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2),
  staged AS (
    SELECT event_type, xu, c,
           CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY xu
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM counts),
  qs AS (
    SELECT event_type, MAX(n) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           MIN(CASE WHEN cum >= {lo} THEN xu END) AS p01_units,
           MIN(CASE WHEN cum >= {hi} THEN xu END) AS p99_units
    FROM staged GROUP BY event_type)
SELECT c.event_type, MAX(q.n) AS n, MAX(q.n_distinct) AS n_distinct,
       MAX(q.p01_units) AS p01_units, MAX(q.p99_units) AS p99_units,
       CAST(SUM(CASE WHEN c.xu < q.p01_units THEN c.c ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(SUM(CASE WHEN c.xu > q.p99_units THEN c.c ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       CAST(CAST(10000 AS HUGEINT)
            * SUM(CAST(LEAST(GREATEST(c.xu, q.p01_units), q.p99_units)
                       AS HUGEINT) * c.c)
            // MAX(q.n) AS BIGINT) AS winsorized_mean_q4
FROM counts c JOIN qs q USING (event_type)
GROUP BY c.event_type
ORDER BY c.event_type"""


# --- self-join density probe ---------------------------------------------------

DENSITY_TOP_K = 10


def selfjoin_density(silver: DataFrame, k: int = DENSITY_TOP_K) -> DataFrame:
    """EXACT equi-self-join cardinality on the hot key BEFORE running the
    join: a key with c rows contributes c² output pairs (c·(c−1)/2
    unordered distinct pairs), so the pre-flight number every dedup
    verify join / similarity bucket join needs is Σc² — computed from
    the count table alone, never by joining. The 100 TB failure this
    catches: a verify join that looks linear at sample SF but whose Σc²
    is 1000× n at production skew.

    Output per top-k key (by pair mass): n_rows, pairs (= c·(c−1)/2,
    exact BIGINT), pair_share_ppm of the total pair mass, plus the same
    total per key carried on every row (total_pairs, expansion_q4 =
    1e4·Σc² DIV n — output rows per input row if you self-join,
    in 1e-4 units). One map-combinable groupBy + a broadcast scalar +
    TakeOrderedAndProject. Headroom: Σc² ≤ 1e38 via 128-bit staging
    (c ≤ 1e19-row keys)."""
    # Same two-consumer count-table shape as skew_report: materialize the
    # key-dim relation once (r12; guide §3.3). Fact scans 2 → 1.
    counts = materialize(
        silver.groupBy("item_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    totals = counts.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sum_c2"),
        F.sum(
            F.expr("CAST(c AS DECIMAL(38,0)) * (c - 1) DIV 2")
        ).alias("total_pairs"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "item_id",
            F.col("c").alias("n_rows"),
            F.expr("CAST(CAST(c AS DECIMAL(38,0)) * (c - 1) DIV 2 AS BIGINT)").alias(
                "pairs"
            ),
            F.expr(
                "CASE WHEN total_pairs > 0 THEN"
                " CAST(CAST(1000000 AS DECIMAL(38,0))"
                " * (CAST(c AS DECIMAL(38,0)) * (c - 1) DIV 2)"
                " DIV total_pairs AS BIGINT) END"
            ).alias("pair_share_ppm"),
            F.expr("CAST(total_pairs AS BIGINT)").alias("total_pairs"),
            F.expr(
                "CAST(CAST(10000 AS DECIMAL(38,0)) * sum_c2 DIV n AS BIGINT)"
            ).alias("expansion_q4"),
        )
        .orderBy(F.col("pairs").desc(), F.col("item_id").asc())
        .limit(k)
    )


def selfjoin_density_sql(silver_sql_cte: str, k: int = DENSITY_TOP_K) -> str:
    """DuckDB twin of :func:`selfjoin_density`."""
    return f"""{silver_sql_cte},
  counts AS (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS c
             FROM silver GROUP BY item_id),
  totals AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
           SUM(CAST(c AS HUGEINT) * c) AS sum_c2,
           SUM(CAST(c AS HUGEINT) * (c - 1) // 2) AS total_pairs
    FROM counts)
SELECT item_id, c AS n_rows,
       CAST(CAST(c AS HUGEINT) * (c - 1) // 2 AS BIGINT) AS pairs,
       CASE WHEN total_pairs > 0 THEN
         CAST(CAST(1000000 AS HUGEINT)
              * (CAST(c AS HUGEINT) * (c - 1) // 2)
              // total_pairs AS BIGINT) END AS pair_share_ppm,
       CAST(total_pairs AS BIGINT) AS total_pairs,
       CAST(CAST(10000 AS HUGEINT) * sum_c2 // n AS BIGINT) AS expansion_q4
FROM counts, totals
ORDER BY pairs DESC, item_id ASC
LIMIT {k}"""


# --- burstiness (Fano factor / index of dispersion) ---------------------------


def fano_burstiness(events: DataFrame) -> DataFrame:
    """Index of dispersion of the daily event-count series per event_type:
    Fano = sample variance / mean of counts over OBSERVED days (a type
    absent a whole day contributes no row — compose with a calendar
    gapfill for include-zero semantics). Fano ≈ 1 is Poisson arrival,
    > 1 is bursty (clumped traffic — the thing a rate limiter or an
    ingest autoscaler needs to know), < 1 is more regular than chance.

    EXACT: with n observed days, S = Σc, Q = Σc², the dispersion is the
    rational (n·Q − S²) / ((n−1)·S) — non-negative by Cauchy-Schwarz, so
    one unsigned truncating division suffices. Staged in DECIMAL(38,0) /
    HUGEINT: 1e6·n·Q overflows BIGINT already at ~30 days × 100k-event
    days. mean_per_day_milli is the exact 1e3-truncated mean.

    Shape: one (event_type, day) map-combinable pre-aggregation, one
    |event_type|-key rollup; both exchanges tiny after map-side combine."""
    daily = (
        events.select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")).alias(
            "q"
        ),
        F.max("c").cast("bigint").alias("max_day"),
    )
    return (
        g.where(F.col("n_days") >= 2)
        .select(
            "event_type",
            "n_days",
            F.col("s").alias("n_events"),
            "max_day",
            F.expr(
                "CAST(CAST(1000 AS DECIMAL(38,0)) * s DIV n_days AS BIGINT)"
            ).alias("mean_per_day_milli"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0))"
                " * (CAST(n_days AS DECIMAL(38,0)) * q"
                "    - CAST(s AS DECIMAL(38,0)) * s)"
                " DIV (CAST(n_days - 1 AS DECIMAL(38,0)) * s) AS BIGINT)"
            ).alias("fano_ppm"),
        )
        .orderBy("event_type")
    )


def fano_burstiness_sql() -> str:
    """DuckDB twin of :func:`fano_burstiness` (reads `events`)."""
    return """
  WITH daily AS (
    SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE)),
  g AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(c) AS BIGINT) AS s,
           SUM(CAST(c AS HUGEINT) * c) AS q,
           CAST(MAX(c) AS BIGINT) AS max_day
    FROM daily GROUP BY event_type)
SELECT event_type, n_days, s AS n_events, max_day,
       CAST(CAST(1000 AS HUGEINT) * s // n_days AS BIGINT)
         AS mean_per_day_milli,
       CAST(CAST(1000000 AS HUGEINT)
            * (CAST(n_days AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
            // (CAST(n_days - 1 AS HUGEINT) * s) AS BIGINT) AS fano_ppm
FROM g WHERE n_days >= 2 ORDER BY event_type"""


# --- exact distributed quantiles (round 12) ----------------------------------

QUANTILE_PCTS = (25, 50, 75, 90, 99)


def exact_quantiles(lineitem: DataFrame, pcts: tuple[int, ...] = QUANTILE_PCTS) -> DataFrame:
    """(metric, pct, n_rows, rank, value_units): EXACT percentile_disc
    quantiles of three lineitem measures — the ANALYZE-grade statistic a
    100 TB optimizer/skew report needs, computed with NO row-sized sort:
    the two-level radix selection (functions/ranks.exact_rank_values,
    the w_rfm_segments de-weak device) bounds every window partition by
    max(value_domain/2^18, 2^18) ≈ √domain, independent of row count —
    where x_histogram_quantiles' sketch gives approximate quantiles
    cheaply, this gives the exact ones scalably.

    Metrics (all monotone integer quantizations, so quantile-of-quantized
    = quantized-quantile — order statistics commute with monotone maps):
    extended_cents (int_units), qty (floor), disc_bp (floor(x·10⁴);
    floor of the shared double is computed identically by both engines).
    rank = ceil(pct·n/100); value_units = smallest value whose cumulative
    count reaches it. Cites reference main.py:31-79 (the stats surface
    its dashboards summarize)."""
    from ..functions.ranks import exact_rank_values

    vals = lineitem.select(
        F.explode(
            F.create_map(
                F.lit("extended_cents"),
                int_units("l_extendedprice").cast("bigint"),
                F.lit("qty"),
                F.expr("CAST(floor(l_quantity) AS BIGINT)"),
                F.lit("disc_bp"),
                F.expr("CAST(floor(l_discount * 10000) AS BIGINT)"),
            )
        ).alias("metric", "_xu")
    )
    bounds = exact_rank_values(vals, [(p, p, 100) for p in pcts])
    return bounds.select(
        "metric",
        F.col("_b").alias("pct"),
        F.col("_n").alias("n_rows"),
        F.col("_rank").alias("rank"),
        F.col("_q").alias("value_units"),
    ).orderBy("metric", "pct")


def exact_quantiles_sql(pcts: tuple[int, ...] = QUANTILE_PCTS) -> str:
    """DuckDB twin of :func:`exact_quantiles` — single-node needs no radix
    split: the one-level form of the same ceil-rank rule over the value
    histogram (integer counts throughout, bit-equal twins)."""
    values = ", ".join(f"({p})" for p in pcts)
    return f"""
  WITH vals AS (
    SELECT 'extended_cents' AS metric,
           CAST({int_units_sql('l_extendedprice')} AS BIGINT) AS xu
    FROM lineitem
    UNION ALL SELECT 'qty', CAST(floor(l_quantity) AS BIGINT) FROM lineitem
    UNION ALL SELECT 'disc_bp', CAST(floor(l_discount * 10000) AS BIGINT)
    FROM lineitem),
  hist AS (
    SELECT metric, xu, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2),
  cums AS (
    SELECT metric, xu,
           CAST(SUM(c) OVER (PARTITION BY metric ORDER BY xu) AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY metric) AS BIGINT) AS n
    FROM hist),
  pcts(pct) AS (VALUES {values})
SELECT metric, CAST(pct AS BIGINT) AS pct,
       MAX(n) AS n_rows,
       CAST((MAX(n) * pct + 99) // 100 AS BIGINT) AS rank,
       MIN(CASE WHEN cum >= (n * pct + 99) // 100 THEN xu END) AS value_units
FROM cums CROSS JOIN pcts
GROUP BY metric, pct
ORDER BY metric, pct"""


def group_quantiles_radix(
    events: DataFrame, pcts: tuple[int, ...] = QUANTILE_PCTS
) -> DataFrame:
    """(event_type, pct, n_rows, rank, value_units): exact per-group
    percentile_disc of `value` (integer cents) — the scale-correct form
    of the per-group percentile report: x_group_percentiles row-ranks
    inside each group, so a window partition is sized by the GROUP'S ROW
    COUNT (fine for eval SFs, a single-task sort for a hot group at
    100 TB); here the group label rides the radix selector's metric key
    (functions/ranks.exact_rank_values), so every partition stays
    value-domain-bounded no matter how many rows a group has. Ties share
    the value (percentile_disc); NULL values are excluded explicitly."""
    from ..functions.ranks import exact_rank_values

    vals = events.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("metric"),
        int_units("value").cast("bigint").alias("_xu"),
    )
    bounds = exact_rank_values(vals, [(p, p, 100) for p in pcts])
    return bounds.select(
        F.col("metric").alias("event_type"),
        F.col("_b").alias("pct"),
        F.col("_n").alias("n_rows"),
        F.col("_rank").alias("rank"),
        F.col("_q").alias("value_units"),
    ).orderBy("event_type", "pct")


def group_quantiles_radix_sql(pcts: tuple[int, ...] = QUANTILE_PCTS) -> str:
    """DuckDB twin of :func:`group_quantiles_radix` (one-level histogram
    form of the same ceil-rank rule; integer counts, bit-equal twins)."""
    values = ", ".join(f"({p})" for p in pcts)
    return f"""
  WITH vals AS (
    SELECT event_type AS metric,
           CAST({int_units_sql('value')} AS BIGINT) AS xu
    FROM events WHERE value IS NOT NULL),
  hist AS (
    SELECT metric, xu, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2),
  cums AS (
    SELECT metric, xu,
           CAST(SUM(c) OVER (PARTITION BY metric ORDER BY xu) AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY metric) AS BIGINT) AS n
    FROM hist),
  pcts(pct) AS (VALUES {values})
SELECT metric AS event_type, CAST(pct AS BIGINT) AS pct,
       MAX(n) AS n_rows,
       CAST((MAX(n) * pct + 99) // 100 AS BIGINT) AS rank,
       MIN(CASE WHEN cum >= (n * pct + 99) // 100 THEN xu END) AS value_units
FROM cums CROSS JOIN pcts
GROUP BY metric, pct
ORDER BY event_type, pct"""


def group_quantiles_from_counts(hist: DataFrame, pcts: tuple[int, ...] = QUANTILE_PCTS) -> DataFrame:
    """:func:`group_quantiles_radix`'s read-off over a PRE-COUNTED
    (event_type, value_units, c) histogram — the live-monitor path: a
    watermarked stream folds per-day value counts (streaming/mleval.
    streaming_value_counts), and this turns the folded state into the
    same (event_type, pct, n_rows, rank, value_units) report, bit-equal
    to the batch operator over the same rows (test-pinned under the
    hostile trio + checkpoint recovery)."""
    from ..functions.ranks import exact_rank_values_from_counts

    h = hist.select(
        F.col("event_type").alias("metric"),
        F.col("value_units").cast("bigint").alias("_xu"),
        F.col("c").cast("bigint").alias("_c"),
    )
    bounds = exact_rank_values_from_counts(h, [(p, p, 100) for p in pcts])
    return bounds.select(
        F.col("metric").alias("event_type"),
        F.col("_b").alias("pct"),
        F.col("_n").alias("n_rows"),
        F.col("_rank").alias("rank"),
        F.col("_q").alias("value_units"),
    ).orderBy("event_type", "pct")
