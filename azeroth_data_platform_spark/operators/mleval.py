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
    return auc_from_counts(counts)


def auc_from_counts(counts: DataFrame) -> DataFrame:
    """AUC read-off from the distinct-score count state: counts =
    (score, c1 = positives at score, ct = rows at score). The state is a
    commutative monoid (per-score sums), so it can be maintained
    incrementally or by a stream (streaming/mleval.py) and folded before
    this read-off — the result is bit-equal to :func:`auc_exact` on the
    raw rows."""
    wcum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = counts.select(
        "c1",
        "ct",
        (2 * F.sum("ct").over(wcum) - F.col("ct") + 1).alias("r2"),
    )
    sums = ranked.agg(
        F.coalesce(F.sum("c1").cast("bigint"), F.lit(0)).alias("n_pos"),
        F.coalesce(
            F.sum(F.col("ct") - F.col("c1")).cast("bigint"), F.lit(0)
        ).alias("n_neg"),
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
    SELECT COALESCE(CAST(SUM(c1) AS BIGINT), 0) AS n_pos,
           COALESCE(CAST(SUM(ct - c1) AS BIGINT), 0) AS n_neg,
           SUM(CAST(c1 AS HUGEINT) * r2) AS r2pos
    FROM ranked)
SELECT n_pos, n_neg, CAST({u2} AS BIGINT) AS u2,
       CASE WHEN {guard} THEN {auc_ppm} END AS auc_ppm,
       CASE WHEN {guard} THEN CAST({auc_ppm} AS DOUBLE) / 1e6 END AS auc,
       CASE WHEN {guard} THEN
         (CAST({auc_ppm} AS DOUBLE) * 2.0 - 1e6) / 1e6 END AS gini
FROM sums"""


def auc_by_group(scored: DataFrame) -> DataFrame:
    """Per-slice exact AUC: scored = (grp STRING, score BIGINT, label
    INT 0/1) → one row per grp (grp, n_pos, n_neg, auc_ppm, auc) — the
    slice-wise eval (per domain / per language) a classifier gate runs
    before trusting a global number that can hide a broken slice.

    Same rank-sum identity as :func:`auc_exact`, but every window is
    PARTITIONED on grp — the scaffold becomes embarrassingly parallel:
    one map-combinable groupBy to (grp, distinct score), one partitioned
    window, one grp groupBy. No unpartitioned window anywhere, so this
    form scales to any number of slices at 100 TB (the global auc_exact
    is the degenerate single-slice case and keeps its value-domain-sized
    single-partition window by design)."""
    counts = scored.groupBy("grp", "score").agg(
        F.sum("label").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("ct"),
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = counts.select(
        "grp",
        "c1",
        "ct",
        (2 * F.sum("ct").over(wcum) - F.col("ct") + 1).alias("r2"),
    )
    sums = ranked.groupBy("grp").agg(
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
        "grp",
        "n_pos",
        "n_neg",
        F.expr(f"CASE WHEN {guard} THEN {auc_ppm} END").alias("auc_ppm"),
        F.expr(
            f"CASE WHEN {guard} THEN CAST({auc_ppm} AS DOUBLE) / 1e6 END"
        ).alias("auc"),
    ).orderBy("grp")


def auc_by_group_sql(scored_cte: str) -> str:
    """DuckDB twin; `scored_cte` must define `scored(grp, score, label)`."""
    u2 = "(r2pos - CAST(n_pos AS HUGEINT) * (n_pos + 1))"
    auc_ppm = (
        f"CAST(CAST(1000000 AS HUGEINT) * {u2}"
        f" // (CAST(2 AS HUGEINT) * n_pos * n_neg) AS BIGINT)"
    )
    guard = "n_pos > 0 AND n_neg > 0"
    return f"""{scored_cte},
  counts AS (
    SELECT grp, score, CAST(SUM(label) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM scored GROUP BY grp, score),
  ranked AS (
    SELECT grp, c1, ct,
           CAST(2 * SUM(ct) OVER (PARTITION BY grp ORDER BY score
                                  ROWS UNBOUNDED PRECEDING)
                - ct + 1 AS BIGINT) AS r2
    FROM counts),
  sums AS (
    SELECT grp, CAST(SUM(c1) AS BIGINT) AS n_pos,
           CAST(SUM(ct - c1) AS BIGINT) AS n_neg,
           SUM(CAST(c1 AS HUGEINT) * r2) AS r2pos
    FROM ranked GROUP BY grp)
SELECT grp, n_pos, n_neg,
       CASE WHEN {guard} THEN {auc_ppm} END AS auc_ppm,
       CASE WHEN {guard} THEN CAST({auc_ppm} AS DOUBLE) / 1e6 END AS auc
FROM sums ORDER BY grp"""


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


def _pr_staged(scored: DataFrame) -> DataFrame:
    """Shared scaffold: one distinct-score groupBy, one descending window
    → per threshold (= distinct score, classify-as-positive at score >=
    threshold, whole tie-group included) the cumulative tp/fp and class
    totals. Value-domain-sized after the first aggregate."""
    counts = scored.groupBy("score").agg(
        F.sum("label").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("ct"),
    )
    wdesc = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    return counts.select(
        "score",
        "c1",
        F.sum("c1").over(wdesc).alias("tp"),
        (F.sum("ct").over(wdesc) - F.sum("c1").over(wdesc)).alias("fp"),
        F.sum("c1").over(wall).alias("n_pos"),
        F.sum(F.col("ct") - F.col("c1")).over(wall).alias("n_neg"),
    )


# Shared ppm expressions for the PR scaffold (Spark `DIV` vs DuckDB `//`;
# DECIMAL(38,0) vs HUGEINT staging — overflow-safe to tp ~ 1e31).
def _pr_exprs(duck: bool) -> dict[str, str]:
    big = "HUGEINT" if duck else "DECIMAL(38,0)"
    dv = "//" if duck else "DIV"
    m = f"CAST(1000000 AS {big})"
    return {
        "precision": f"CAST({m} * tp {dv} (tp + fp) AS BIGINT)",
        "recall": f"CASE WHEN n_pos > 0 THEN"
        f" CAST({m} * tp {dv} n_pos AS BIGINT) END",
        "f1": f"CAST({m} * 2 * tp {dv} (2 * tp + fp + (n_pos - tp))"
        f" AS BIGINT)",
        # step-wise AP term (sklearn's sum over thresholds of
        # precision·Δrecall), truncated PER TERM so the sum is a
        # deterministic, engine-identical integer: the result is a lower
        # bound of true AP within n_thresholds ppm (documented, exact).
        "ap_term": f"CASE WHEN n_pos > 0 THEN CAST({m} * c1 * tp {dv}"
        f" (CAST(n_pos AS {big}) * (tp + fp)) AS BIGINT) ELSE 0 END",
    }


def pr_curve(scored: DataFrame) -> DataFrame:
    """scored: (score BIGINT, label INT 0/1) → one row per distinct score
    threshold, descending-best-first semantics: (threshold, tp, fp, fn,
    precision_ppm, recall_ppm, f1_ppm), all exact integer ppm. The fn
    column and f1 derive from the same cumulative pass — no second scan."""
    e = _pr_exprs(duck=False)
    return (
        _pr_staged(scored)
        .select(
            F.col("score").alias("threshold"),
            "tp",
            "fp",
            (F.col("n_pos") - F.col("tp")).alias("fn"),
            F.expr(e["precision"]).alias("precision_ppm"),
            F.expr(e["recall"]).alias("recall_ppm"),
            F.expr(e["f1"]).alias("f1_ppm"),
        )
        .orderBy(F.col("threshold").desc())
    )


def pr_curve_sql(scored_cte: str) -> str:
    """DuckDB twin; `scored_cte` must define `scored(score, label)`."""
    e = _pr_exprs(duck=True)
    return f"""{scored_cte},
  counts AS (
    SELECT score, CAST(SUM(label) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM scored GROUP BY score),
  staged AS (
    SELECT score, c1,
           CAST(SUM(c1) OVER w AS BIGINT) AS tp,
           CAST(SUM(ct) OVER w - SUM(c1) OVER w AS BIGINT) AS fp,
           CAST(SUM(c1) OVER () AS BIGINT) AS n_pos
    FROM counts
    WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING))
SELECT score AS threshold, tp, fp, n_pos - tp AS fn,
       {e['precision']} AS precision_ppm,
       {e['recall']} AS recall_ppm,
       {e['f1']} AS f1_ppm
FROM staged ORDER BY threshold DESC"""


def pr_summary(scored: DataFrame) -> DataFrame:
    """Single-row PR summary: (n_thresholds, n_pos, n_neg, ap_ppm,
    best_f1_ppm, best_f1_threshold). ap_ppm is the step-wise average
    precision (sum over thresholds of precision·Δrecall) with each term
    truncated to ppm — a deterministic lower bound of true AP within
    n_thresholds ppm. best_f1_threshold tie-breaks to the LOWEST
    threshold achieving max F1 (the most inclusive operating point)."""
    e = _pr_exprs(duck=False)
    staged = _pr_staged(scored).select(
        "score",
        "n_pos",
        "n_neg",
        F.expr(e["f1"]).alias("f1_ppm"),
        F.expr(e["ap_term"]).alias("ap_term"),
    )
    staged = staged.withColumn(
        "max_f1", F.max("f1_ppm").over(Window.partitionBy())
    )
    return staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_thresholds"),
        F.max("n_pos").cast("bigint").alias("n_pos"),
        F.max("n_neg").cast("bigint").alias("n_neg"),
        F.expr(
            "CASE WHEN MAX(n_pos) > 0 THEN"
            " CAST(SUM(CAST(ap_term AS DECIMAL(38,0))) AS BIGINT) END"
        ).alias("ap_ppm"),
        F.max("f1_ppm").alias("best_f1_ppm"),
        F.expr(
            "MIN(CASE WHEN f1_ppm = max_f1 THEN score END)"
        ).alias("best_f1_threshold"),
    )


def pr_summary_sql(scored_cte: str) -> str:
    """DuckDB twin; `scored_cte` must define `scored(score, label)`."""
    e = _pr_exprs(duck=True)
    return f"""{scored_cte},
  counts AS (
    SELECT score, CAST(SUM(label) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM scored GROUP BY score),
  staged AS (
    SELECT score, c1,
           CAST(SUM(c1) OVER w AS BIGINT) AS tp,
           CAST(SUM(ct) OVER w - SUM(c1) OVER w AS BIGINT) AS fp,
           CAST(SUM(c1) OVER () AS BIGINT) AS n_pos,
           CAST(SUM(ct - c1) OVER () AS BIGINT) AS n_neg
    FROM counts
    WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)),
  scoredrows AS (
    SELECT score, n_pos, n_neg,
           {e['f1']} AS f1_ppm,
           {e['ap_term']} AS ap_term
    FROM staged)
SELECT CAST(COUNT(*) AS BIGINT) AS n_thresholds,
       MAX(n_pos) AS n_pos, MAX(n_neg) AS n_neg,
       CASE WHEN MAX(n_pos) > 0 THEN
         CAST(SUM(CAST(ap_term AS HUGEINT)) AS BIGINT) END AS ap_ppm,
       MAX(f1_ppm) AS best_f1_ppm,
       MIN(CASE WHEN f1_ppm = (SELECT MAX(f1_ppm) FROM scoredrows)
                THEN score END) AS best_f1_threshold
FROM scoredrows"""


def multiclass_prf(pairs: DataFrame) -> DataFrame:
    """pairs: (label_a STRING gold, label_b STRING predicted) → one row
    per class over the UNION of gold and predicted label sets:
    (cls, n_true, n_pred, tp, precision_ppm, recall_ppm, f1_ppm,
    macro_f1_ppm) — the per-class eval table next to the kappa scalar.
    All exact integer ppm; precision NULL when the class is never
    predicted, recall NULL when it never occurs in gold (the honest
    NULLs — sklearn's zero_division warning as a type). f1 uses the
    margin identity 2·tp/(n_true+n_pred), defined for every class in the
    union. macro_f1_ppm = Σf1 DIV n_classes (absent-side classes
    contribute their true f1 of 0) carried on every row.

    Scale shape: one map-combinable groupBy to the |A|×|B| cells, margin
    groupBys + a full outer join over class-domain-sized frames, a
    window over the class table. Nothing row-sized past the first
    aggregate."""
    cells = pairs.groupBy("label_a", "label_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ab")
    )
    gold = cells.groupBy(F.col("label_a").alias("cls")).agg(
        F.sum("n_ab").cast("bigint").alias("n_true")
    )
    pred = cells.groupBy(F.col("label_b").alias("cls")).agg(
        F.sum("n_ab").cast("bigint").alias("n_pred")
    )
    diag = cells.where(F.col("label_a") == F.col("label_b")).select(
        F.col("label_a").alias("cls"), F.col("n_ab").alias("tp")
    )
    per = (
        gold.join(pred, "cls", "full_outer")
        .join(diag, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
        )
        .select(
            "cls",
            "n_true",
            "n_pred",
            "tp",
            F.expr(
                "CASE WHEN n_pred > 0 THEN"
                " CAST(1000000 * tp DIV n_pred AS BIGINT) END"
            ).alias("precision_ppm"),
            F.expr(
                "CASE WHEN n_true > 0 THEN"
                " CAST(1000000 * tp DIV n_true AS BIGINT) END"
            ).alias("recall_ppm"),
            F.expr(
                "CAST(1000000 * 2 * tp DIV (n_true + n_pred) AS BIGINT)"
            ).alias("f1_ppm"),
        )
    )
    return (
        per.withColumn(
            "macro_f1_ppm",
            F.expr(
                "CAST(SUM(f1_ppm) OVER () DIV COUNT(1) OVER () AS BIGINT)"
            ),
        )
        .orderBy("cls")
    )


def multiclass_prf_sql(pairs_cte: str) -> str:
    """DuckDB twin; `pairs_cte` must define `pairs(label_a, label_b)`."""
    return f"""{pairs_cte},
  cells AS (
    SELECT label_a, label_b, CAST(COUNT(*) AS BIGINT) AS n_ab
    FROM pairs GROUP BY label_a, label_b),
  gold AS (SELECT label_a AS cls, CAST(SUM(n_ab) AS BIGINT) AS n_true
           FROM cells GROUP BY label_a),
  pred AS (SELECT label_b AS cls, CAST(SUM(n_ab) AS BIGINT) AS n_pred
           FROM cells GROUP BY label_b),
  diag AS (SELECT label_a AS cls, n_ab AS tp FROM cells
           WHERE label_a = label_b),
  per AS (
    SELECT COALESCE(g.cls, p.cls) AS cls,
           COALESCE(g.n_true, 0) AS n_true,
           COALESCE(p.n_pred, 0) AS n_pred,
           CAST(COALESCE(d.tp, 0) AS BIGINT) AS tp
    FROM gold g
    FULL OUTER JOIN pred p ON g.cls = p.cls
    LEFT JOIN diag d ON COALESCE(g.cls, p.cls) = d.cls),
  scored AS (
    SELECT cls, n_true, n_pred, tp,
           CASE WHEN n_pred > 0 THEN
             CAST(1000000 * tp // n_pred AS BIGINT) END AS precision_ppm,
           CASE WHEN n_true > 0 THEN
             CAST(1000000 * tp // n_true AS BIGINT) END AS recall_ppm,
           CAST(1000000 * 2 * tp // (n_true + n_pred) AS BIGINT) AS f1_ppm
    FROM per)
SELECT *, CAST(SUM(f1_ppm) OVER () // COUNT(*) OVER () AS BIGINT)
            AS macro_f1_ppm
FROM scored ORDER BY cls"""


def cohens_kappa(pairs: DataFrame) -> DataFrame:
    """pairs: (label_a STRING, label_b STRING) — two labelings of the
    same rows (e.g. gold lang vs predicted lang) → single row
    (n, n_agree, po_ppm, pe_ppm, kappa_ppm, kappa): multi-class Cohen's
    kappa as the exact rational (n·Σn_ii − Σ_i row_i·col_i) /
    (n² − Σ_i row_i·col_i), ppm-truncated TOWARD ZERO (kappa can be
    negative; sign split keeps Spark DIV / DuckDB // engine-identical).
    NULL kappa when chance agreement is 1 (both sides constant).

    Scale shape: one map-combinable groupBy to the |A|×|B| confusion
    cells, margin joins over class-domain-sized frames — nothing
    row-sized past the first aggregate. Headroom: 1e6·n² ≤ 1e38 holds
    to n ~ 1e16 rows."""
    cells = pairs.groupBy("label_a", "label_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ab")
    )
    rows_m = cells.groupBy("label_a").agg(F.sum("n_ab").alias("row_n"))
    cols_m = cells.groupBy("label_b").agg(F.sum("n_ab").alias("col_n"))
    margin = rows_m.join(
        cols_m, rows_m.label_a == cols_m.label_b, "inner"
    ).select(
        F.expr("CAST(row_n AS DECIMAL(38,0)) * col_n").alias("rowcol")
    )
    totals = cells.agg(
        F.sum("n_ab").cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN label_a = label_b THEN n_ab ELSE 0 END"))
        .cast("bigint")
        .alias("n_agree"),
    )
    sums = totals.crossJoin(
        F.broadcast(
            margin.agg(
                F.coalesce(
                    F.sum("rowcol"), F.lit(0).cast("decimal(38,0)")
                ).alias("sum_rowcol")
            )
        )
    )
    num = "(CAST(n AS DECIMAL(38,0)) * n_agree - sum_rowcol)"
    den = "(CAST(n AS DECIMAL(38,0)) * n - sum_rowcol)"
    kappa_ppm = (
        f"CASE WHEN {den} > 0 THEN"
        f" CAST(SIGNUM({num}) AS BIGINT)"
        f" * CAST(CAST(1000000 AS DECIMAL(38,0)) * ABS({num})"
        f" DIV {den} AS BIGINT) END"
    )
    return sums.select(
        "n",
        "n_agree",
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * n_agree DIV n AS BIGINT)"
        ).alias("po_ppm"),
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * sum_rowcol"
            " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("pe_ppm"),
        F.expr(kappa_ppm).alias("kappa_ppm"),
        F.expr(f"CAST({kappa_ppm} AS DOUBLE) / 1e6").alias("kappa"),
    )


def cohens_kappa_sql(pairs_cte: str) -> str:
    """DuckDB twin; `pairs_cte` must define `pairs(label_a, label_b)`."""
    num = "(CAST(n AS HUGEINT) * n_agree - sum_rowcol)"
    den = "(CAST(n AS HUGEINT) * n - sum_rowcol)"
    kappa_ppm = (
        f"CASE WHEN {den} > 0 THEN"
        f" CAST(SIGN({num}) AS BIGINT)"
        f" * CAST(CAST(1000000 AS HUGEINT) * ABS({num})"
        f" // {den} AS BIGINT) END"
    )
    return f"""{pairs_cte},
  cells AS (
    SELECT label_a, label_b, CAST(COUNT(*) AS BIGINT) AS n_ab
    FROM pairs GROUP BY label_a, label_b),
  rows_m AS (SELECT label_a AS cls, CAST(SUM(n_ab) AS BIGINT) AS row_n
             FROM cells GROUP BY label_a),
  cols_m AS (SELECT label_b AS cls, CAST(SUM(n_ab) AS BIGINT) AS col_n
             FROM cells GROUP BY label_b),
  margin AS (
    SELECT COALESCE(SUM(CAST(row_n AS HUGEINT) * col_n), 0) AS sum_rowcol
    FROM rows_m JOIN cols_m USING (cls)),
  totals AS (
    SELECT CAST(SUM(n_ab) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN label_a = label_b THEN n_ab ELSE 0 END)
                AS BIGINT) AS n_agree
    FROM cells)
SELECT n, n_agree,
       CAST(CAST(1000000 AS HUGEINT) * n_agree // n AS BIGINT) AS po_ppm,
       CAST(CAST(1000000 AS HUGEINT) * sum_rowcol
            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm,
       {kappa_ppm} AS kappa_ppm,
       CAST({kappa_ppm} AS DOUBLE) / 1e6 AS kappa
FROM totals, margin"""


def auc_from_counts_by_group(counts: DataFrame) -> DataFrame:
    """Per-slice AUC read-off from grouped count state: counts =
    (grp, score, c1, ct) → (grp, n_pos, n_neg, auc_ppm, auc), bit-equal
    to :func:`auc_by_group` on the raw scored rows (the grouped twin of
    :func:`auc_from_counts`, for the streaming per-slice monitor —
    every window grp-partitioned, no single-partition stage)."""
    wcum = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = counts.select(
        "grp",
        "c1",
        "ct",
        (2 * F.sum("ct").over(wcum) - F.col("ct") + 1).alias("r2"),
    )
    sums = ranked.groupBy("grp").agg(
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
        "grp",
        "n_pos",
        "n_neg",
        F.expr(f"CASE WHEN {guard} THEN {auc_ppm} END").alias("auc_ppm"),
        F.expr(
            f"CASE WHEN {guard} THEN CAST({auc_ppm} AS DOUBLE) / 1e6 END"
        ).alias("auc"),
    ).orderBy("grp")
