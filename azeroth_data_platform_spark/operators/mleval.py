"""Classifier evaluation, relationally: exact AUC + decile lift table.

A quality/language classifier gates what enters a training corpus
(corpus.hash_classifier, textstats.language_id are this repo's two), so
the pipeline needs the evaluation side: "how well does this score rank
positives above negatives?" (ROC AUC) and "what does thresholding at the
top-k% actually buy?" (the decile lift/calibration table). Both are
usually computed with sklearn on a sample; at 100 TB they are relational
statistics, and both are EXACTLY computable with the distinct-value rank
scaffold this repo already uses (drift.mannwhitney_u, spearman):

AUC via the rank-sum identity: AUC = U_pos / (n_pos * n_neg) with
U_pos = R_pos - n_pos(n_pos+1)/2, midranks for score ties (ties
contribute 1/2 — exactly the trapezoidal ROC tie handling). Doubled
midranks over DISTINCT scores keep everything in exact BIGINT:
u2 = 2*U accumulates in DECIMAL(38,0)/HUGEINT and auc_ppm is the exact
rational u2 / (2 * n_pos * n_neg) truncated at 1e-6 (headroom:
u2 * 1e6 <= 1e38 holds to n_pos * n_neg ~ 5e31). The Gini display
(2*AUC - 1) derives from the SAME truncated integer.

Decile lift: deciles are assigned on the distinct-score CDF ordered by
score DESCENDING (decile 0 = best-scored) with a whole tie-group landing
in the decile of its FIRST position — deterministic, engine-identical,
and the honest way to bucket ties (a tie-group cannot be split by a
threshold either). Per decile: row count, positives, positive rate and
cumulative capture rate in exact ppm, and lift vs the base rate as the
exact rational n_pos_d * n / (n_d * n_pos) in ppm (128-bit staged).

Scale shape: ONE map-combinable groupBy to distinct scores, one
distinct-value window per statistic — identical cost profile to the KS
scaffold; nothing row-sized past the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_exact(scored: DataFrame) -> DataFrame:
    """scored: (score BIGINT, label INT 0/1) → single row
    (n_pos, n_neg, u2, auc_ppm, auc, gini). Exact rank-sum AUC with
    midrank tie handling; NULL auc when a class is empty."""
    counts = scored.groupBy("score").agg(
        F.sum("label").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("ct"),
    )
    wcum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = counts.select(
        "c1",
        "ct",
        (2 * F.sum("ct").over(wcum) - F.col("ct") + 1).alias("r2"),
    )
    sums = ranked.agg(
        F.sum("c1").cast("bigint").alias("n_pos"),
        F.sum(F.col("ct") - F.col("c1")).cast("bigint").alias("n_neg"),
        F.sum(F.expr("CAST(c1 AS DECIMAL(38,0)) * r2")).alias("r2pos"),
    )
    u2 = "(r2pos - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))"
    auc_ppm = (
        f"CAST(CAST(1000000 AS DECIMAL(38,0)) * {u2}"
        f" DIV (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)"
    )
    guard = "n_pos > 0 AND n_neg > 0"
    return sums.select(
        "n_pos",
        "n_neg",
        F.expr(f"CAST({u2} AS BIGINT)").alias("u2"),
        F.expr(f"CASE WHEN {guard} THEN {auc_ppm} END").alias("auc_ppm"),
        F.expr(
            f"CASE WHEN {guard} THEN CAST({auc_ppm} AS DOUBLE) / 1e6 END"
        ).alias("auc"),
        F.expr(
            f"CASE WHEN {guard} THEN"
            f" (CAST({auc_ppm} AS DOUBLE) * 2.0 - 1e6) / 1e6 END"
        ).alias("gini"),
    )


def auc_exact_sql(scored_cte: str) -> str:
    """DuckDB twin; `scored_cte` must define `scored(score, label)`."""
    u2 = "(r2pos - CAST(n_pos AS HUGEINT) * (n_pos + 1))"
    auc_ppm = (
        f"CAST(CAST(1000000 AS HUGEINT) * {u2}"
        f" // (CAST(2 AS HUGEINT) * n_pos * n_neg) AS BIGINT)"
    )
    guard = "n_pos > 0 AND n_neg > 0"
    return f"""{scored_cte},
  counts AS (
    SELECT score, CAST(SUM(label) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM scored GROUP BY score),
  ranked AS (
    SELECT c1, ct,
           CAST(2 * SUM(ct) OVER (ORDER BY score
                                  ROWS UNBOUNDED PRECEDING)
                - ct + 1 AS BIGINT) AS r2
    FROM counts),
  sums AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n_pos,
           CAST(SUM(ct - c1) AS BIGINT) AS n_neg,
           SUM(CAST(c1 AS HUGEINT) * r2) AS r2pos
    FROM ranked)
SELECT n_pos, n_neg, CAST({u2} AS BIGINT) AS u2,
       CASE WHEN {guard} THEN {auc_ppm} END AS auc_ppm,
       CASE WHEN {guard} THEN CAST({auc_ppm} AS DOUBLE) / 1e6 END AS auc,
       CASE WHEN {guard} THEN
         (CAST({auc_ppm} AS DOUBLE) * 2.0 - 1e6) / 1e6 END AS gini
FROM sums"""


N_DECILES = 10


def decile_lift(scored: DataFrame) -> DataFrame:
    """scored: (score BIGINT, label INT 0/1) → one row per populated
    decile (0 = best-scored 10%): (decile, n, n_pos, pos_rate_ppm,
    cum_capture_ppm, lift_ppm). Tie-groups land whole in the decile of
    their first (best-ranked) position."""
    counts = scored.groupBy("score").agg(
        F.sum("label").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("ct"),
    )
    wdesc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    staged = counts.select(
        "c1",
        "ct",
        (F.sum("ct").over(wdesc) - F.col("ct")).alias("before"),
        F.sum("ct").over(wall).alias("n"),
        F.sum("c1").over(wall).alias("pos"),
    )
    dec = f"CAST(LEAST({N_DECILES - 1}, {N_DECILES} * before DIV n) AS INT)"
    per_dec = (
        staged.select(
            F.expr(dec).alias("decile"), "c1", "ct", "n", "pos"
        )
        .groupBy("decile")
        .agg(
            F.sum("ct").cast("bigint").alias("n_d"),
            F.sum("c1").cast("bigint").alias("pos_d"),
            F.max("n").alias("n"),
            F.max("pos").alias("pos"),
        )
    )
    wcumdec = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lift = (
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * pos_d * n"
        " DIV (CAST(n_d AS DECIMAL(38,0)) * pos) AS BIGINT)"
    )
    return (
        per_dec.select(
            "decile",
            F.col("n_d").alias("n"),
            F.col("pos_d").alias("n_pos"),
            F.expr("CAST(1000000 * pos_d DIV n_d AS BIGINT)").alias("pos_rate_ppm"),
            F.sum("pos_d").over(wcumdec).alias("cum_pos"),
            F.col("pos").alias("total_pos"),
            F.expr(f"CASE WHEN pos > 0 THEN {lift} END").alias("lift_ppm"),
        )
        .select(
            "decile",
            "n",
            "n_pos",
            "pos_rate_ppm",
            F.expr(
                "CASE WHEN total_pos > 0 THEN"
                " CAST(1000000 * cum_pos DIV total_pos AS BIGINT) END"
            ).alias("cum_capture_ppm"),
            "lift_ppm",
        )
        .orderBy("decile")
    )


def decile_lift_sql(scored_cte: str) -> str:
    """DuckDB twin; `scored_cte` must define `scored(score, label)`."""
    dec = f"CAST(LEAST({N_DECILES - 1}, {N_DECILES} * before // n) AS INT)"
    lift = (
        "CAST(CAST(1000000 AS HUGEINT) * pos_d * n"
        " // (CAST(n_d AS HUGEINT) * pos) AS BIGINT)"
    )
    return f"""{scored_cte},
  counts AS (
    SELECT score, CAST(SUM(label) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM scored GROUP BY score),
  staged AS (
    SELECT c1, ct,
           CAST(SUM(ct) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
                - ct AS BIGINT) AS before,
           CAST(SUM(ct) OVER () AS BIGINT) AS n,
           CAST(SUM(c1) OVER () AS BIGINT) AS pos
    FROM counts),
  per_dec AS (
    SELECT {dec} AS decile,
           CAST(SUM(ct) AS BIGINT) AS n_d, CAST(SUM(c1) AS BIGINT) AS pos_d,
           MAX(n) AS n, MAX(pos) AS pos
    FROM staged GROUP BY 1)
SELECT decile, n_d AS n, pos_d AS n_pos,
       CAST(1000000 * pos_d // n_d AS BIGINT) AS pos_rate_ppm,
       CASE WHEN pos > 0 THEN
         CAST(1000000 * CAST(SUM(pos_d) OVER (ORDER BY decile
                                              ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) // pos AS BIGINT) END AS cum_capture_ppm,
       CASE WHEN pos > 0 THEN {lift} END AS lift_ppm
FROM per_dec
ORDER BY decile"""
