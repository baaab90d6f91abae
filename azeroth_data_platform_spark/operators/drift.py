"""Distribution-drift detectors: two-sample Kolmogorov–Smirnov and PSI.

The reference platform's DQ surface stops at schema checks and the
z-score flag (reference: data_pipeline/transformation.py:17-84's defensive
casts; gold z-scores in models.py:70-78). A 100 TB training-data pipeline
additionally needs DISTRIBUTION-level regression tests — "did this week's
crawl shift against last week's?", "do the A and B assignment cohorts see
the same value distribution?" — i.e. the monitors a feature-store or
data-quality suite runs per partition-drop. This module adds the two
standard ones, both engine-exact:

Two-sample Kolmogorov–Smirnov (`ks_test`): D = max_x |F_a(x) − F_b(x)|
between the user-parity cohorts, per event_type (the same deterministic
cohort split as windows.abtest_welch — parity is the stand-in for an
assignment column). Exactness comes from never leaving integer space
until the final display division:

  * values quantize to integer cents (`int_units`), so the support is a
    bounded integer domain;
  * per-cohort counts aggregate FIRST (one map-combinable groupBy on
    (event_type, cents)) — the ECDF window then runs over DISTINCT
    VALUES, not rows: at 100 TB the window input is ≤ #distinct cents
    (bounded by the price domain, ~1e5 here), not the row count, and the
    per-type partition skew that a row-level cumulative sort would hit is
    gone by construction;
  * the ECDF difference is cross-multiplied: |ca·n_b − cb·n_a| in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — no fraction, no float.
    ks_d is the exact rational m/(n_a·n_b) truncated at 1e-12 in 128-bit
    integer space (m·10^12 DIV (n_a·n_b); headroom: needs
    m·10^12 ≤ 1e38 ⇒ n_a·n_b ≤ 1e26 — two 10^13-row cohorts), then one
    exact int→double + one correctly-rounded /1e12, the
    abtest_welch/zipf quantizer rule.

The α=0.05 rejection bound c(α)·sqrt((n_a+n_b)/(n_a·n_b)) is
sqrt-derived (irrational), so it uses the q12-of-double quantizer — safe
for 17-significant-digit shortest reprs, the same argument as welch_t —
and BOTH engines build it from the identical expression tree of
correctly-rounded IEEE ops (int→double casts ≤ 2^53-exact per factor,
one divide, one sqrt, one multiply), so the comparison is deterministic
by construction. `reject_05` compares the DISPLAYED columns (exact ks_d
vs q12 crit), so flag and values can never disagree.

Population Stability Index (`psi_drift`): the industry drift score
Σ (p_i − q_i)·ln(p_i/q_i) between the first and second halves of the
time range, per event_type. Engine-portable construction:

  * the split point is (t_min + t_max)/2 in epoch micros — ONE 1-row
    global aggregate, broadcast (the same scalar-broadcast shape as
    profiling.skew_report);
  * bins are the cents value's most-significant-bit index
    (length(bin(xu)) — the plog2/HLL idiom): log2-spaced bins, bounded
    domain (≤ 64 bins ever), zero configuration, exact integers;
  * proportions are Laplace-smoothed ((c+1)/(n+B), B = bins observed for
    the type) so empty bins never hit log(0) — the standard PSI zero
    fix, here also what keeps every log argument an integer ≥ 1;
  * ln(p/q) in BITS via the portable plog2 polynomial:
    plog2(c0+1) − plog2(n0+B) − plog2(c1+1) + plog2(n1+B) — identical
    double trees in both engines;
  * each bin's term is floored at 1e-15 (floor(term·1e15) — floor is
    exact on doubles and identical cross-engine, unlike the
    double→BIGINT cast, which truncates in Spark but rounds in DuckDB)
    and the SUM runs over BIGINTs — exact, associative, partition-order
    independent. A raw SUM(double) over bins would wobble with Spark's
    partial-aggregation order; this is the decimal-sum rule from
    functions/numerics.py applied at 1e-15 fixed point.
  * drift flags compare the INTEGER sum against frozen integer
    thresholds (0.10 and 0.25 nats, the conventional PSI bands,
    converted to 1e-15-bits literals below) — no float in the flag path.

Both detectors: one wide-table scan, one map-combinable groupBy, one
distinct-value-sized window/join — scan-bound at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numerics import int_units, int_units_sql, plog2_sql

# --- two-sample KS ----------------------------------------------------------

# c(alpha) for the two-sample KS rejection bound D > c·sqrt((na+nb)/(na·nb));
# frozen display constant (alpha = 0.05).
KS_C_05 = 1.358


def _q12(e: str) -> str:
    return f"CAST(CAST({e} AS DECIMAL(18,12)) AS DOUBLE)"


def ks_test(events: DataFrame) -> DataFrame:
    """Per-event-type two-sample KS statistic between user-parity cohorts.

    Output: (event_type, n_a, n_b, ks_d, ks_crit_05, reject_05) — ks_d
    exact-rational-truncated at 1e-12, crit q12-quantized, flag computed
    from the displayed pair. See module docstring for the exactness and
    scale argument.
    """
    counts = (
        events.select(
            "event_type",
            (F.col("user_id") % 2).alias("grp"),
            int_units("value").cast("bigint").alias("xu"),
        )
        .groupBy("event_type", "xu")
        .agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("c0"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("xu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    ecdf = counts.select(
        "event_type",
        F.sum("c0").over(wcum).alias("ca"),
        F.sum("c1").over(wcum).alias("cb"),
        F.sum("c0").over(wall).alias("n_a"),
        F.sum("c1").over(wall).alias("n_b"),
    )
    per_type = (
        ecdf.select(
            "event_type",
            "n_a",
            "n_b",
            F.expr(
                "abs(CAST(ca AS DECIMAL(38,0)) * n_b"
                " - CAST(cb AS DECIMAL(38,0)) * n_a)"
            ).alias("diff"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max("diff").alias("m"),
        )
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    ks_d = (
        "CAST(CAST(CAST(1000000000000 AS DECIMAL(38,0)) * m"
        " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) AS DOUBLE) / 1e12"
    )
    crit = (
        f"{KS_C_05!r} * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
    )
    return per_type.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr(ks_d).alias("ks_d"),
        F.expr(_q12(crit)).alias("ks_crit_05"),
        F.expr(f"({ks_d}) > ({_q12(crit)})").alias("reject_05"),
    ).orderBy("event_type")


def ks_test_sql(xu_sql: str | None = None) -> str:
    """DuckDB twin of :func:`ks_test` (identical arithmetic trees;
    HUGEINT where Spark stages DECIMAL(38,0))."""
    xu = xu_sql or int_units_sql("value")
    ks_d = (
        "CAST(CAST(CAST(1000000000000 AS HUGEINT) * m"
        " // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS DOUBLE) / 1e12"
    )
    crit = (
        f"{KS_C_05!r} * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
    )
    q12crit = f"CAST(CAST({crit} AS DECIMAL(18,12)) AS DOUBLE)"
    return f"""
  WITH ev AS (SELECT event_type, user_id % 2 AS grp,
                     CAST({xu} AS BIGINT) AS xu FROM events),
  counts AS (
    SELECT event_type, xu,
           CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
           CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
    FROM ev GROUP BY event_type, xu),
  ecdf AS (
    SELECT event_type,
           CAST(SUM(c0) OVER (PARTITION BY event_type ORDER BY xu
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
           CAST(SUM(c1) OVER (PARTITION BY event_type ORDER BY xu
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb,
           CAST(SUM(c0) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
           CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
    FROM counts),
  per_type AS (
    SELECT event_type, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
           MAX(abs(CAST(ca AS HUGEINT) * n_b
                   - CAST(cb AS HUGEINT) * n_a)) AS m
    FROM ecdf GROUP BY event_type
    HAVING MAX(n_a) > 0 AND MAX(n_b) > 0)
SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       {ks_d} AS ks_d,
       {q12crit} AS ks_crit_05,
       ({ks_d}) > ({q12crit}) AS reject_05
FROM per_type
ORDER BY event_type"""


# --- PSI --------------------------------------------------------------------

# 0.10 / 0.25 nats (the conventional "investigate" / "drifted" PSI bands)
# in 1e-15-bits integer units: floor(band / ln 2 * 1e15). Frozen literals —
# neither engine ever evaluates the transcendental.
PSI_WARN_Q15 = 144269504088896  # floor(0.10 / ln2 * 1e15)
PSI_DRIFT_Q15 = 360673760222240  # floor(0.25 / ln2 * 1e15)
assert PSI_WARN_Q15 == math.floor(0.10 / math.log(2.0) * 1e15)
assert PSI_DRIFT_Q15 == math.floor(0.25 / math.log(2.0) * 1e15)


def _psi_term_q15(duck: bool) -> str:
    """The per-bin PSI term over columns (c0, c1, n0, n1, nb), Laplace-
    smoothed, in bits, floored at 1e-15 — shared by every PSI variant so
    the half-split, day-over-day, and streaming read-offs are the same
    arithmetic tree by construction."""
    p = "(CAST(c0 + 1 AS DOUBLE) / CAST(n0 + nb AS DOUBLE))"
    q = "(CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE))"
    logdiff = (
        f"(({plog2_sql('(c0 + 1)', duck=duck)}) - ({plog2_sql('(n0 + nb)', duck=duck)})"
        f" - ({plog2_sql('(c1 + 1)', duck=duck)}) + ({plog2_sql('(n1 + nb)', duck=duck)}))"
    )
    return f"CAST(floor((({p}) - ({q})) * ({logdiff}) * 1e15) AS BIGINT)"


def psi_drift(events: DataFrame) -> DataFrame:
    """Per-event-type PSI between the first and second halves of the
    global time range (split at the epoch-micros midpoint).

    Output: (event_type, n_first, n_second, n_bins, psi_q15, psi_bits,
    warn_010, drift_025) — psi_q15 is the exact integer Σfloor(term·1e15),
    psi_bits its display double, flags integer-vs-literal. See module
    docstring.
    """
    ev = events.select(
        "event_type",
        F.expr("unix_micros(ts)").alias("t"),
        int_units("value").cast("bigint").alias("xu"),
    )
    bounds = ev.agg(
        F.min("t").alias("tmin"), F.max("t").alias("tmax")
    )
    binned = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.expr("CASE WHEN t <= tmin + (tmax - tmin) DIV 2 THEN 0 ELSE 1 END").alias(
                "half"
            ),
            F.expr("CASE WHEN xu <= 0 THEN 0 ELSE length(bin(xu)) END").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("bigint").alias("c0"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
        )
    )
    wall = Window.partitionBy("event_type")
    staged = binned.select(
        "event_type",
        "c0",
        "c1",
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
        F.count(F.lit(1)).over(wall).alias("nb"),
    )
    term_q = _psi_term_q15(duck=False)
    return (
        staged.select(
            "event_type",
            "n0",
            "n1",
            "nb",
            F.expr(term_q).alias("tq"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n0").alias("n_first"),
            F.max("n1").alias("n_second"),
            F.max("nb").alias("n_bins"),
            F.sum("tq").alias("psi_q15"),
        )
        .select(
            "event_type",
            "n_first",
            "n_second",
            "n_bins",
            "psi_q15",
            F.expr("CAST(psi_q15 AS DOUBLE) / 1e15").alias("psi_bits"),
            F.expr(f"psi_q15 > {PSI_WARN_Q15}").alias("warn_010"),
            F.expr(f"psi_q15 > {PSI_DRIFT_Q15}").alias("drift_025"),
        )
        .orderBy("event_type")
    )


def psi_drift_sql(xu_sql: str | None = None) -> str:
    """DuckDB twin of :func:`psi_drift`."""
    xu = xu_sql or int_units_sql("value")
    term_q = _psi_term_q15(duck=True)
    return f"""
  WITH ev AS (SELECT event_type,
                     epoch_us(CAST(ts AS TIMESTAMP)) AS t,
                     CAST({xu} AS BIGINT) AS xu FROM events),
  bounds AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM ev),
  binned AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           bin
    FROM (SELECT event_type,
                 CASE WHEN t <= tmin + (tmax - tmin) // 2 THEN 0 ELSE 1 END AS half,
                 CASE WHEN xu <= 0 THEN 0 ELSE length(bin(xu)) END AS bin
          FROM ev, bounds)
    GROUP BY event_type, bin),
  staged AS (
    SELECT event_type, c0, c1,
           CAST(SUM(c0) OVER (PARTITION BY event_type) AS BIGINT) AS n0,
           CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nb
    FROM binned),
  summed AS (
    SELECT event_type,
           MAX(n0) AS n_first, MAX(n1) AS n_second, MAX(nb) AS n_bins,
           SUM({term_q}) AS psi_q15
    FROM staged GROUP BY event_type)
SELECT event_type, CAST(n_first AS BIGINT) AS n_first,
       CAST(n_second AS BIGINT) AS n_second,
       CAST(n_bins AS BIGINT) AS n_bins,
       CAST(psi_q15 AS BIGINT) AS psi_q15,
       CAST(psi_q15 AS DOUBLE) / 1e15 AS psi_bits,
       psi_q15 > {PSI_WARN_Q15} AS warn_010,
       psi_q15 > {PSI_DRIFT_Q15} AS drift_025
FROM summed
ORDER BY event_type"""


# --- Wasserstein-1 (earth mover's) distance ---------------------------------
#
# KS is a MAX over the ECDF gap — insensitive to how much mass moved, only
# to the worst single point. The Wasserstein-1 distance is its integral
# twin, W1 = integral |F_a(x) - F_b(x)| dx: "how many dollar-units of work
# moves one distribution onto the other" — the drift score embedding/
# feature monitors alert on. Same distinct-value scaffold as ks_test, and
# FULLY integer-exact (no sqrt anywhere): the step integral is
# sum |ca*n_b - cb*n_a| * dx over consecutive support cents, staged in
# DECIMAL(38,0)/HUGEINT, and the output is the exact rational
# S / (n_a*n_b) cents reported in integer MICRO-DOLLARS
# (S*10^4 DIV (n_a*n_b)); headroom: S*10^4 <= 1e38 holds through
# n_a*n_b*range_cents <= 1e34 — two 10^12-row cohorts over the full 1e8-
# cent price domain. The display double is one exact int->double
# (micro-dollars <= ~1e12 < 2^53) and one correctly-rounded /1e6.

def emd_drift(events: DataFrame) -> DataFrame:
    """Per-event-type Wasserstein-1 distance between user-parity cohort
    value distributions, exact in integer micro-dollars."""
    counts = (
        events.select(
            "event_type",
            (F.col("user_id") % 2).alias("grp"),
            int_units("value").cast("bigint").alias("xu"),
        )
        .groupBy("event_type", "xu")
        .agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("c0"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("xu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlead = Window.partitionBy("event_type").orderBy("xu")
    wall = Window.partitionBy("event_type")
    stepped = counts.select(
        "event_type",
        F.sum("c0").over(wcum).alias("ca"),
        F.sum("c1").over(wcum).alias("cb"),
        F.sum("c0").over(wall).alias("n_a"),
        F.sum("c1").over(wall).alias("n_b"),
        (F.coalesce(F.lead("xu").over(wlead), F.col("xu")) - F.col("xu")).alias("dx"),
    )
    per_type = (
        stepped.select(
            "event_type",
            "n_a",
            "n_b",
            F.expr(
                "abs(CAST(ca AS DECIMAL(38,0)) * n_b"
                " - CAST(cb AS DECIMAL(38,0)) * n_a) * dx"
            ).alias("step"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.sum("step").alias("s"),
        )
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    micro = (
        "CAST(CAST(10000 AS DECIMAL(38,0)) * s"
        " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
    )
    return per_type.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr(micro).alias("emd_microdollars"),
        F.expr(f"CAST({micro} AS DOUBLE) / 1e6").alias("emd_dollars"),
    ).orderBy("event_type")


def emd_drift_sql(xu_sql: str | None = None) -> str:
    """DuckDB twin of :func:`emd_drift`."""
    xu = xu_sql or int_units_sql("value")
    micro = (
        "CAST(CAST(10000 AS HUGEINT) * s"
        " // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)"
    )
    return f"""
  WITH ev AS (SELECT event_type, user_id % 2 AS grp,
                     CAST({xu} AS BIGINT) AS xu FROM events),
  counts AS (
    SELECT event_type, xu,
           CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
           CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
    FROM ev GROUP BY event_type, xu),
  stepped AS (
    SELECT event_type,
           CAST(SUM(c0) OVER (PARTITION BY event_type ORDER BY xu
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
           CAST(SUM(c1) OVER (PARTITION BY event_type ORDER BY xu
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb,
           CAST(SUM(c0) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
           CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n_b,
           COALESCE(lead(xu) OVER (PARTITION BY event_type ORDER BY xu), xu)
             - xu AS dx
    FROM counts),
  per_type AS (
    SELECT event_type, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
           SUM(abs(CAST(ca AS HUGEINT) * n_b
                   - CAST(cb AS HUGEINT) * n_a) * dx) AS s
    FROM stepped GROUP BY event_type
    HAVING MAX(n_a) > 0 AND MAX(n_b) > 0)
SELECT event_type, n_a, n_b,
       {micro} AS emd_microdollars,
       CAST({micro} AS DOUBLE) / 1e6 AS emd_dollars
FROM per_type
ORDER BY event_type"""


# --- Mann-Whitney U ----------------------------------------------------------
#
# The rank-sum twin of abtest_welch: Welch's t compares MEANS and assumes
# rough normality; Mann-Whitney asks the distribution-free question "does
# one cohort stochastically dominate the other?" — the robust default for
# heavy-tailed money metrics. Midranks over the COMBINED sample come from
# the same distinct-value scaffold as spearman_rank_corr (doubled, exact
# BIGINT: r2 = 2*cum - ct + 1); 2*R_a = sum c0*r2 accumulates in
# DECIMAL(38,0)/HUGEINT, and u2 = 2*U_a = 2*R_a - n_a*(n_a+1) stays an
# EXACT integer (U itself can end in .5 under ties, so the output column
# is u2). The z statistic uses the tie-corrected variance
# sigma^2 = (n_a*n_b/12) * ((n+1) - T/(n*(n-1))), T = sum(ct^3 - ct) in
# 128-bit (headroom: a single value tied across 2.1e12 rows); z is
# sqrt-derived -> q12 quantizer, flag compares the displayed value, the
# welch/KS convention.

MW_Z_CRIT = 1.96


def mannwhitney_u(events: DataFrame) -> DataFrame:
    """Per-event-type Mann-Whitney U between user-parity cohorts:
    (event_type, n_a, n_b, u2, z_mw, significant)."""
    counts = (
        events.select(
            "event_type",
            (F.col("user_id") % 2).alias("grp"),
            int_units("value").cast("bigint").alias("xu"),
        )
        .groupBy("event_type", "xu")
        .agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("c0"),
            F.sum(F.lit(1)).cast("bigint").alias("ct"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("xu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = counts.select(
        "event_type",
        "c0",
        "ct",
        (2 * F.sum("ct").over(wcum) - F.col("ct") + 1).alias("r2"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.sum("c0").cast("bigint").alias("n_a"),
        F.sum(F.col("ct") - F.col("c0")).cast("bigint").alias("n_b"),
        F.sum(F.expr("CAST(c0 AS DECIMAL(38,0)) * r2")).alias("r2a"),
        F.sum(
            F.expr("CAST(ct AS DECIMAL(38,0)) * ct * ct - ct")
        ).alias("ties"),
    )
    u2 = "(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1))"
    n = "(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    sigma2 = (
        f"(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)"
        f" * (({n} + 1.0) - CAST(ties AS DOUBLE) / ({n} * ({n} - 1.0)))"
    )
    z = (
        f"(CAST({u2} AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
        f" / (2.0 * sqrt({sigma2}))"
    )
    zq = _q12(z)
    guard = f"n_a >= 1 AND n_b >= 1 AND {sigma2} > 0"
    return (
        sums.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.expr(f"CAST({u2} AS BIGINT)").alias("u2"),
            F.expr(f"CASE WHEN {guard} THEN {zq} END").alias("z_mw"),
            F.expr(
                f"CASE WHEN {guard} THEN abs({zq}) > {MW_Z_CRIT} END"
            ).alias("significant"),
        )
        .orderBy("event_type")
    )


def mannwhitney_u_sql(xu_sql: str | None = None) -> str:
    """DuckDB twin of :func:`mannwhitney_u`."""
    xu = xu_sql or int_units_sql("value")
    u2 = "(r2a - CAST(n_a AS HUGEINT) * (n_a + 1))"
    n = "(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    sigma2 = (
        f"(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)"
        f" * (({n} + 1.0) - CAST(ties AS DOUBLE) / ({n} * ({n} - 1.0)))"
    )
    z = (
        f"(CAST({u2} AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
        f" / (2.0 * sqrt({sigma2}))"
    )
    zq = f"CAST(CAST({z} AS DECIMAL(18,12)) AS DOUBLE)"
    guard = f"n_a >= 1 AND n_b >= 1 AND {sigma2} > 0"
    return f"""
  WITH ev AS (SELECT event_type, user_id % 2 AS grp,
                     CAST({xu} AS BIGINT) AS xu FROM events),
  counts AS (
    SELECT event_type, xu,
           CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM ev GROUP BY event_type, xu),
  ranked AS (
    SELECT event_type, c0, ct,
           CAST(2 * SUM(ct) OVER (PARTITION BY event_type ORDER BY xu
                                  ROWS UNBOUNDED PRECEDING)
                - ct + 1 AS BIGINT) AS r2
    FROM counts),
  sums AS (
    SELECT event_type,
           CAST(SUM(c0) AS BIGINT) AS n_a,
           CAST(SUM(ct - c0) AS BIGINT) AS n_b,
           SUM(CAST(c0 AS HUGEINT) * r2) AS r2a,
           SUM(CAST(ct AS HUGEINT) * ct * ct - ct) AS ties
    FROM ranked GROUP BY event_type)
SELECT event_type, n_a, n_b,
       CAST({u2} AS BIGINT) AS u2,
       CASE WHEN {guard} THEN {zq} END AS z_mw,
       CASE WHEN {guard} THEN abs({zq}) > {MW_Z_CRIT} END AS significant
FROM sums
WHERE n_a > 0 AND n_b > 0
ORDER BY event_type"""


# --- daily histogram state + day-over-day PSI --------------------------------
#
# The PSI monitor a production pipeline actually runs is not "first half vs
# second half of all time" — it is "each day vs the day before", over a
# MAINTAINABLE state. Factored accordingly, mirroring the HLL weekly-rollup
# architecture (sketches.py): the state is the per-(event_type, day, bin)
# count histogram — a commutative monoid (counts sum), so it is exactly
# what a Structured Streaming windowed aggregation materializes
# (streaming/drift.py streaming_value_histogram is the stream twin,
# pinned bit-identical to value_histogram_daily) — and day-over-day PSI is
# a cheap batch read-off over that state, never a re-scan of the raw
# events. At 100 TB: the histogram is ≤ #types × #days × 64 rows; the
# read-off joins consecutive days with a SHIFT-UNION (next-day counts
# re-keyed onto the anchor day) so pairing is one map-combinable groupBy,
# no self-join, no window over raw data.


# Small-sample null bias of PSI: under H0 (same distribution), PSI is
# asymptotically chi-square-distributed with E[PSI] ~ (B-1)*(1/n0 + 1/n1)/2
# nats — at 70 events/day over ~10 bins that is ~0.1 nats of pure noise,
# which would trip the conventional bands on perfectly iid days. The
# day-over-day monitor therefore reports the bias as an integer column and
# flags on the EXCESS (psi_q15 - bias_q15). Constant below =
# floor(1e15 / (2*ln 2)): converts the (B-1)*(1/n0+1/n1)/2-nats bias into
# 1e-15-bit integer units via two exact integer divisions.
PSI_BIAS_C_Q15 = 721347520444481
assert PSI_BIAS_C_Q15 == math.floor(1e15 / (2.0 * math.log(2.0)))


def value_histogram_daily(events: DataFrame) -> DataFrame:
    """(event_type, day, bin, c): the mergeable daily log2-bin histogram
    of `value` — the PSI monitor's state table."""
    return (
        events.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            int_units("value").cast("bigint").alias("xu"),
        )
        .select(
            "event_type",
            "day",
            F.expr("CASE WHEN xu <= 0 THEN 0 ELSE length(bin(xu)) END").alias("bin"),
        )
        .groupBy("event_type", "day", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def psi_day_over_day(events: DataFrame) -> DataFrame:
    """Per (event_type, day): PSI of day vs the NEXT calendar day, from
    the daily histogram state. Output (event_type, day, n_day, n_next,
    n_bins, psi_q15, psi_bits, warn_010, drift_025); a day appears only
    if the next calendar day has data (gaps score no row — the
    forecast_backtest convention)."""
    hist = value_histogram_daily(events)
    # shift-union: next-day counts re-keyed onto the anchor day, so the
    # (day, day+1) pair — including bins present on only one side —
    # collapses into one groupBy on (type, day, bin)
    side0 = hist.select("event_type", "day", "bin", F.col("c").alias("c0"), F.lit(0).alias("c1"))
    side1 = hist.select(
        "event_type",
        F.date_sub("day", 1).alias("day"),
        "bin",
        F.lit(0).alias("c0"),
        F.col("c").alias("c1"),
    )
    paired = (
        side0.unionByName(side1)
        .groupBy("event_type", "day", "bin")
        .agg(
            F.sum("c0").cast("bigint").alias("c0"),
            F.sum("c1").cast("bigint").alias("c1"),
        )
    )
    wall = Window.partitionBy("event_type", "day")
    staged = paired.select(
        "event_type",
        "day",
        "c0",
        "c1",
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
        F.count(F.lit(1)).over(wall).alias("nb"),
    )
    term_q = _psi_term_q15(duck=False)
    return (
        staged.select("event_type", "day", "n0", "n1", "nb", F.expr(term_q).alias("tq"))
        .groupBy("event_type", "day")
        .agg(
            F.max("n0").alias("n_day"),
            F.max("n1").alias("n_next"),
            F.max("nb").alias("n_bins"),
            F.sum("tq").alias("psi_q15"),
        )
        .where((F.col("n_day") > 0) & (F.col("n_next") > 0))
        .select(
            "event_type",
            "day",
            "n_day",
            "n_next",
            "n_bins",
            "psi_q15",
            F.expr("CAST(psi_q15 AS DOUBLE) / 1e15").alias("psi_bits"),
            F.expr(
                f"(n_bins - 1) * ({PSI_BIAS_C_Q15} DIV n_day)"
                f" + (n_bins - 1) * ({PSI_BIAS_C_Q15} DIV n_next)"
            ).alias("bias_q15"),
        )
        .select(
            "*",
            F.expr(f"psi_q15 - bias_q15 > {PSI_WARN_Q15}").alias("warn_010"),
            F.expr(f"psi_q15 - bias_q15 > {PSI_DRIFT_Q15}").alias("drift_025"),
        )
        .orderBy("event_type", "day")
    )


def psi_day_over_day_sql(xu_sql: str | None = None) -> str:
    """DuckDB twin of :func:`psi_day_over_day`."""
    xu = xu_sql or int_units_sql("value")
    term_q = _psi_term_q15(duck=True)
    return f"""
  WITH ev AS (SELECT event_type,
                     CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                     CAST({xu} AS BIGINT) AS xu FROM events),
  hist AS (
    SELECT event_type, day,
           CASE WHEN xu <= 0 THEN 0 ELSE length(bin(xu)) END AS bin,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2, 3),
  paired AS (
    SELECT event_type, day, bin,
           CAST(SUM(c0) AS BIGINT) AS c0, CAST(SUM(c1) AS BIGINT) AS c1
    FROM (
      SELECT event_type, day, bin, c AS c0, 0 AS c1 FROM hist
      UNION ALL
      SELECT event_type, day - 1, bin, 0, c FROM hist)
    GROUP BY event_type, day, bin),
  staged AS (
    SELECT event_type, day, c0, c1,
           CAST(SUM(c0) OVER (PARTITION BY event_type, day) AS BIGINT) AS n0,
           CAST(SUM(c1) OVER (PARTITION BY event_type, day) AS BIGINT) AS n1,
           CAST(COUNT(*) OVER (PARTITION BY event_type, day) AS BIGINT) AS nb
    FROM paired),
  summed AS (
    SELECT event_type, day,
           MAX(n0) AS n_day, MAX(n1) AS n_next, MAX(nb) AS n_bins,
           SUM({term_q}) AS psi_q15
    FROM staged GROUP BY event_type, day)
SELECT event_type, day,
       CAST(n_day AS BIGINT) AS n_day, CAST(n_next AS BIGINT) AS n_next,
       CAST(n_bins AS BIGINT) AS n_bins,
       CAST(psi_q15 AS BIGINT) AS psi_q15,
       CAST(psi_q15 AS DOUBLE) / 1e15 AS psi_bits,
       CAST((n_bins - 1) * ({PSI_BIAS_C_Q15} // n_day)
            + (n_bins - 1) * ({PSI_BIAS_C_Q15} // n_next) AS BIGINT) AS bias_q15,
       psi_q15 - ((n_bins - 1) * ({PSI_BIAS_C_Q15} // n_day)
                  + (n_bins - 1) * ({PSI_BIAS_C_Q15} // n_next))
         > {PSI_WARN_Q15} AS warn_010,
       psi_q15 - ((n_bins - 1) * ({PSI_BIAS_C_Q15} // n_day)
                  + (n_bins - 1) * ({PSI_BIAS_C_Q15} // n_next))
         > {PSI_DRIFT_Q15} AS drift_025
FROM summed
WHERE n_day > 0 AND n_next > 0
ORDER BY event_type, day"""
