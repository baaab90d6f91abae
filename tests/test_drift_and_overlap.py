"""Drift detectors + KMV overlap + Spearman (operators/drift.py,
sketches.py kmv_*, profiling.py spearman_*): exactness pins on
hand-computable cases, planted-drift detection, estimator error bounds,
and a DuckDB midrank cross-check."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from azeroth_data_platform_spark import harness
from azeroth_data_platform_spark.operators import drift, profiling, sketches


def _events(spark, rows):
    """rows: (event_type, user_id, ts_str, value)"""
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts_s string, value double"
    )
    return df.select(
        "event_type", "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )


# --- KS ---------------------------------------------------------------------


def test_ks_exact_rational_hand_case(spark):
    """4-vs-4 half-overlapping supports: D = 1/2 exactly, no rejection at
    these sizes (crit ≈ 0.96)."""
    rows = [("t", 0, "2024-01-01 00:00:00", float(v)) for v in (1, 2, 3, 4)]
    rows += [("t", 1, "2024-01-01 00:00:00", float(v)) for v in (3, 4, 5, 6)]
    r = drift.ks_test(_events(spark, rows)).collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_d"] == 0.5  # (8 * 10^12 DIV 16) / 1e12 — exact
    assert r["reject_05"] is False


def test_ks_disjoint_cohorts_reject(spark):
    """Fully disjoint supports at n=200/200: D = 1, crit ≈ 0.136 → reject."""
    rows = [("t", 2 * i, "2024-01-01 00:00:00", 1.0 + i) for i in range(200)]
    rows += [("t", 2 * i + 1, "2024-01-01 00:00:00", 1000.0 + i) for i in range(200)]
    r = drift.ks_test(_events(spark, rows)).collect()[0]
    assert r["ks_d"] == 1.0
    assert r["reject_05"] is True


def test_ks_null_case_on_corpus(spark, sf_dir):
    """Parity cohorts of the real events table are iid by construction: D
    stays small for every type. α=0.05 means individual false rejections
    are EXPECTED (~23% chance of ≥1 across 5 types at sf0.001's ~100-row
    cohorts), so the pin is on magnitude and flag consistency, not on
    zero rejections."""
    out = drift.ks_test(harness._events_ts(spark, sf_dir)).collect()
    assert len(out) == 5
    assert sum(r["reject_05"] for r in out) <= 2
    for r in out:
        assert r["ks_d"] < 0.35, r
        assert r["reject_05"] == (r["ks_d"] > r["ks_crit_05"])


# --- PSI --------------------------------------------------------------------


def test_psi_planted_scale_drift(spark):
    """Second half scaled 16× → every mass moves 4 log2-bins → PSI far
    over the 0.25-nats band; identical halves stay under the warn band."""
    early = [("a", i, "2024-01-02 00:00:00", 1.0 + (i % 5)) for i in range(100)]
    late = [("a", i, "2024-01-28 00:00:00", 16.0 * (1.0 + (i % 5))) for i in range(100)]
    stable = [("b", i, "2024-01-02 00:00:00", 1.0 + (i % 5)) for i in range(100)]
    stable += [("b", i, "2024-01-28 00:00:00", 1.0 + (i % 5)) for i in range(100)]
    out = {
        r["event_type"]: r
        for r in drift.psi_drift(_events(spark, early + late + stable)).collect()
    }
    assert out["a"]["drift_025"] is True
    assert out["b"]["warn_010"] is False
    assert out["b"]["psi_q15"] < out["a"]["psi_q15"]


def test_psi_integer_quantization_is_sum_of_floored_terms(spark):
    """psi_q15 must be an exact BIGINT (the flag path never sees a float):
    recompute Σfloor(term·1e15) from the staged counts in plain Python
    using the same plog2 polynomial via DuckDB, and match exactly."""
    rows = [("a", i, "2024-01-02 00:00:00", float(1 + i % 7)) for i in range(60)]
    rows += [("a", i, "2024-01-28 00:00:00", float(1 + i % 11)) for i in range(80)]
    r = drift.psi_drift(_events(spark, rows)).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"('{t}', {u}, TIMESTAMP '{ts}', {v})" for (t, u, ts, v) in rows
        )
        + ") AS t(event_type, user_id, ts, value)"
    )
    oracle = con.execute(drift.psi_drift_sql()).fetchall()[0]
    assert r["psi_q15"] == oracle[4]
    assert isinstance(r["psi_q15"], int)


# --- KMV --------------------------------------------------------------------


def test_kmv_exact_mode_small_sets(spark):
    """Under K distinct members both per-side and in the union, every
    output is EXACT set arithmetic: counts, jaccard, intersection."""
    rows = [("X", u, "2024-01-01 00:00:00", 1.0) for u in range(10)]
    rows += [("Y", u, "2024-01-01 00:00:00", 1.0) for u in range(5, 15)]
    r = sketches.kmv_cohort_overlap(_events(spark, rows)).collect()[0]
    assert (r["type_a"], r["type_b"]) == ("X", "Y")
    assert (r["est_a"], r["est_b"]) == (10, 10)
    assert r["est_union"] == 15
    assert r["n_common"] == 5
    assert r["jaccard_ppm"] == 1_000_000 * 5 // 15
    assert r["est_intersection"] == 5


def test_kmv_estimate_mode_error_bounds(spark):
    """Over K members the estimator engages; KMV with K=256 has ~1/√K ≈
    6% typical error — assert a generous 4σ band on union/intersection."""
    rows = [("P", u, "2024-01-01 00:00:00", 1.0) for u in range(3000)]
    rows += [("Q", u, "2024-01-01 00:00:00", 1.0) for u in range(1500, 4500)]
    r = sketches.kmv_cohort_overlap(_events(spark, rows)).collect()[0]
    assert abs(r["est_a"] - 3000) / 3000 < 0.25
    assert abs(r["est_b"] - 3000) / 3000 < 0.25
    assert abs(r["est_union"] - 4500) / 4500 < 0.25
    assert abs(r["est_intersection"] - 1500) / 1500 < 0.40
    assert abs(r["jaccard_ppm"] / 1e6 - 1500 / 4500) < 0.12


def test_kmv_corpus_pairs_complete_and_ordered(spark, sf_dir):
    """All C(5,2)=10 ordered pairs come back, union ≥ max(side), common ≤ K."""
    out = sketches.kmv_cohort_overlap(harness._events_ts(spark, sf_dir)).collect()
    assert len(out) == 10
    for r in out:
        assert r["type_a"] < r["type_b"]
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) * 0.8
        assert 0 <= r["n_common"] <= sketches.KMV_K
        assert 0 <= r["jaccard_ppm"] <= 1_000_000


# --- Spearman ---------------------------------------------------------------


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )


def test_spearman_perfect_monotone_is_exactly_one(spark):
    rows = [("A", float(i), float(i * 3)) for i in range(1, 40)]
    r = profiling.spearman_rank_corr(_lineitem(spark, rows)).collect()[0]
    assert r["rho_spearman"] == 1.0
    rows = [("A", float(i), float(100 - i)) for i in range(1, 40)]
    r = profiling.spearman_rank_corr(_lineitem(spark, rows)).collect()[0]
    assert r["rho_spearman"] == -1.0


def test_spearman_degenerate_groups_null(spark):
    """Zero variance in either column (or n < 2) → NULL, not a crash."""
    rows = [("C", 5.0, float(i)) for i in range(10)] + [("S", 1.0, 2.0)]
    out = {r["l_returnflag"]: r for r in
           profiling.spearman_rank_corr(_lineitem(spark, rows)).collect()}
    assert out["C"]["rho_spearman"] is None
    assert out["S"]["rho_spearman"] is None


def test_spearman_ties_match_midrank_pearson(spark):
    """Tie-heavy synthetic data: the integer-midrank result must equal an
    independent double-midrank Pearson (DuckDB corr) to ~1e-9."""
    rows = [
        ("A", float((i * 37) % 23) / 4.0, float((i * 17) % 13))
        for i in range(500)
    ]
    r = profiling.spearman_rank_corr(_lineitem(spark, rows)).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW li AS SELECT * FROM (VALUES "
        + ", ".join(f"('A', {p!r}, {q!r})" for (_, p, q) in rows)
        + ") AS t(l_returnflag, l_extendedprice, l_quantity)"
    )
    truth = con.execute(
        """
        WITH r AS (SELECT
          rank() OVER (ORDER BY round(l_extendedprice*100)) +
          (count(*) OVER (PARTITION BY round(l_extendedprice*100)) - 1)/2.0 AS rx,
          rank() OVER (ORDER BY round(l_quantity*100)) +
          (count(*) OVER (PARTITION BY round(l_quantity*100)) - 1)/2.0 AS ry
          FROM li)
        SELECT corr(rx, ry) FROM r"""
    ).fetchone()[0]
    assert r["rho_spearman"] == pytest.approx(truth, abs=1e-9)


def test_spearman_corpus_groups(spark, sf_dir):
    """Real lineitem: three return classes, |rho| small (price and
    quantity are independent in the generator), never NULL."""
    li = harness.adapters.read_table(spark, sf_dir, "lineitem")
    out = profiling.spearman_rank_corr(li).collect()
    assert {r["l_returnflag"] for r in out} == {"A", "N", "R"}
    for r in out:
        assert r["rho_spearman"] is not None
        assert abs(r["rho_spearman"]) < 0.2


# --- EMD --------------------------------------------------------------------


def test_emd_exact_shift_hand_case(spark):
    """Cohort B = cohort A shifted by exactly $2.50: W1 must equal 2.50
    exactly (2,500,000 micro-dollars) — transport distance of a pure
    translation."""
    rows = [("t", 0, "2024-01-01 00:00:00", float(v)) for v in (1, 2, 3, 4)]
    rows += [("t", 1, "2024-01-01 00:00:00", v + 2.5) for v in (1.0, 2.0, 3.0, 4.0)]
    r = drift.emd_drift(_events(spark, rows)).collect()[0]
    assert r["emd_microdollars"] == 2_500_000
    assert r["emd_dollars"] == 2.5


def test_emd_identical_cohorts_zero(spark):
    rows = [("t", u, "2024-01-01 00:00:00", float(1 + u % 5)) for u in range(100)]
    r = drift.emd_drift(_events(spark, rows)).collect()[0]
    assert r["emd_microdollars"] == 0


def test_emd_dominated_by_ks_times_range(spark, sf_dir):
    """W1 ≤ D·range (both integrals over the same support): cross-check
    the two drift scores against each other on the corpus."""
    ev = harness._events_ts(spark, sf_dir)
    ks = {r["event_type"]: r for r in drift.ks_test(ev).collect()}
    emd = {r["event_type"]: r for r in drift.emd_drift(ev).collect()}
    rng = ev.agg(
        (F.max("value") - F.min("value")).alias("r")
    ).collect()[0]["r"]
    for et, e in emd.items():
        assert e["emd_dollars"] <= ks[et]["ks_d"] * rng + 1e-9


# --- Mann-Whitney -----------------------------------------------------------


def test_mannwhitney_dominant_cohort(spark):
    """Cohort A strictly above cohort B: U_a = n_a·n_b (u2 = 2·n_a·n_b),
    z strongly positive and significant."""
    rows = [("t", 0, "2024-01-01 00:00:00", 100.0 + i) for i in range(30)]
    rows += [("t", 1, "2024-01-01 00:00:00", 1.0 + i) for i in range(30)]
    r = drift.mannwhitney_u(_events(spark, rows)).collect()[0]
    assert r["u2"] == 2 * 30 * 30
    assert r["z_mw"] > 1.96
    assert r["significant"] is True


def test_mannwhitney_all_tied_null(spark):
    """Every value identical → sigma = 0 → z NULL (no crash, no inf)."""
    rows = [("t", u, "2024-01-01 00:00:00", 7.0) for u in range(40)]
    r = drift.mannwhitney_u(_events(spark, rows)).collect()[0]
    assert r["z_mw"] is None
    assert r["significant"] is None
    assert r["u2"] == 20 * 20  # midranks: U = n_a·n_b/2, so u2 = n_a·n_b


def test_mannwhitney_null_case_on_corpus(spark, sf_dir):
    out = drift.mannwhitney_u(harness._events_ts(spark, sf_dir)).collect()
    assert len(out) == 5
    assert sum(bool(r["significant"]) for r in out) <= 2
    for r in out:
        assert r["z_mw"] is not None


# --- Cramér's V -------------------------------------------------------------


def test_cramers_v_perfect_association(spark):
    """k deterministically a function of event_type → V = 1 exactly (2×2)."""
    rows = [("a", u, "2024-01-01 00:00:00", 1.0) for u in range(50)]
    rows += [("b", u, "2024-01-01 00:00:00", 1.0) for u in range(50)]
    df = _events(spark, rows).withColumn(
        "props",
        F.when(F.col("event_type") == "a", F.lit('{"k": 10}')).otherwise(
            F.lit('{"k": 90}')
        ),
    )
    r = profiling.cramers_v(df).collect()[0]
    assert (r["n_rows"], r["n_cols"]) == (2, 2)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-9)
    assert r["chi2"] == pytest.approx(100.0, rel=1e-9)  # chi2 = n for 2x2 perfect


def test_cramers_v_independent_near_zero(spark, sf_dir):
    """Corpus props k is independent of event_type: V ≈ 0."""
    r = profiling.cramers_v(harness._events_ts(spark, sf_dir)).collect()[0]
    assert r["n_rows"] == 5
    assert 0.0 <= r["cramers_v"] < 0.15
    assert r["phi2_q15"] >= 0


# --- day-over-day PSI -------------------------------------------------------


def test_psi_daily_planted_drift_day(spark):
    """29 stable days + one day with 16×-scaled values: exactly the two
    pairs touching the anomalous day flag, bias-corrected; stable pairs
    stay quiet."""
    rows = []
    for d in range(1, 11):
        scale = 16.0 if d == 6 else 1.0
        for i in range(200):
            rows.append(
                ("a", i, f"2024-01-{d:02d} 12:00:00", scale * (1.0 + i % 5))
            )
    out = drift.psi_day_over_day(_events(spark, rows)).collect()
    assert len(out) == 9  # days 1..9 each have a next day
    flagged = {str(r["day"]) for r in out if r["drift_025"]}
    assert flagged == {"2024-01-05", "2024-01-06"}
    for r in out:
        if str(r["day"]) not in flagged:
            assert r["warn_010"] is False, r


def test_psi_daily_histogram_is_mergeable_state(spark):
    """The histogram built from partition slices and summed equals the
    one-pass histogram — the monoid law that makes it stream-state."""
    rows = [
        ("a", i, f"2024-01-{1 + i % 3:02d} 08:00:00", float(1 + i % 9))
        for i in range(300)
    ]
    ev = _events(spark, rows)
    whole = {
        (r["event_type"], str(r["day"]), r["bin"]): r["c"]
        for r in drift.value_histogram_daily(ev).collect()
    }
    merged: dict = {}
    for p in range(3):
        part = drift.value_histogram_daily(ev.where(F.col("user_id") % 3 == p))
        for r in part.collect():
            k = (r["event_type"], str(r["day"]), r["bin"])
            merged[k] = merged.get(k, 0) + r["c"]
    assert merged == whole


# --- classifier eval (mleval) -----------------------------------------------


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score long, label int")


def test_auc_perfect_and_reversed(spark):
    """Positives strictly above negatives → AUC exactly 1; reversed → 0."""
    from azeroth_data_platform_spark.operators import mleval

    rows = [(100 + i, 1) for i in range(20)] + [(i, 0) for i in range(20)]
    r = mleval.auc_exact(_scored(spark, rows)).collect()[0]
    assert r["auc_ppm"] == 1_000_000 and r["auc"] == 1.0 and r["gini"] == 1.0
    rows = [(i, 1) for i in range(20)] + [(100 + i, 0) for i in range(20)]
    r = mleval.auc_exact(_scored(spark, rows)).collect()[0]
    assert r["auc_ppm"] == 0 and r["gini"] == -1.0


def test_auc_all_tied_is_exactly_half(spark):
    """One score for everything: midranks give U = n_pos·n_neg/2 → 0.5."""
    from azeroth_data_platform_spark.operators import mleval

    rows = [(7, 1)] * 30 + [(7, 0)] * 50
    r = mleval.auc_exact(_scored(spark, rows)).collect()[0]
    assert r["auc_ppm"] == 500_000


def test_auc_matches_independent_rank_formula(spark):
    """Tie-heavy mixed case vs an independent double-rank AUC in DuckDB."""
    from azeroth_data_platform_spark.operators import mleval

    rows = [((i * 7) % 23, 1 if (i * 13) % 3 == 0 else 0) for i in range(400)]
    r = mleval.auc_exact(_scored(spark, rows)).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW s AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in rows)
        + ") AS t(score, label)"
    )
    truth = con.execute(
        """
        WITH r AS (SELECT label,
          rank() OVER (ORDER BY score) +
          (count(*) OVER (PARTITION BY score) - 1) / 2.0 AS rk FROM s)
        SELECT (SUM(CASE WHEN label = 1 THEN rk END)
                - (SUM(label) * (SUM(label) + 1)) / 2.0)
               / (SUM(label) * (COUNT(*) - SUM(label))) FROM r"""
    ).fetchone()[0]
    assert abs(r["auc_ppm"] / 1e6 - truth) < 2e-6  # ppm truncation only


def test_auc_single_class_null(spark):
    from azeroth_data_platform_spark.operators import mleval

    r = mleval.auc_exact(_scored(spark, [(5, 1)] * 10)).collect()[0]
    assert r["auc"] is None and r["auc_ppm"] is None


def test_decile_lift_monotone_signal(spark):
    """Score == signal strength: top decile lift > 1 > bottom decile;
    capture reaches exactly 1e6; whole tie-groups stay in one decile."""
    from azeroth_data_platform_spark.operators import mleval

    rows = []
    for i in range(1000):
        score = i // 10  # 100 distinct scores, tie-groups of 10
        label = 1 if (i * 7919) % 1000 < score else 0  # P(pos) rises with score
    # deterministic pseudo-random but reproducible
        rows.append((score, label))
    out = mleval.decile_lift(_scored(spark, rows)).collect()
    assert [r["decile"] for r in out] == sorted(r["decile"] for r in out)
    assert out[-1]["cum_capture_ppm"] == 1_000_000
    assert sum(r["n"] for r in out) == 1000
    top, bottom = out[0], out[-1]
    assert top["lift_ppm"] > 1_000_000 > bottom["lift_ppm"]


def test_decile_lift_corpus_base_rate(spark, sf_dir):
    """Real corpus: capture ends at 1e6, rows sum to the doc count, and
    every populated decile's pos_rate is a valid ppm."""
    out = harness.ALL_QUERIES["ts_lift_langid"](spark, sf_dir).collect()
    assert out[-1]["cum_capture_ppm"] == 1_000_000
    for r in out:
        assert 0 <= r["pos_rate_ppm"] <= 1_000_000


def test_pr_curve_perfect_separation(spark):
    """Positives strictly above negatives: at the lowest positive score
    precision=1, recall=1, f1=1; at lower thresholds precision decays."""
    from azeroth_data_platform_spark.operators import mleval

    rows = [(100 + i, 1) for i in range(20)] + [(i, 0) for i in range(30)]
    out = mleval.pr_curve(_scored(spark, rows)).collect()
    by_thr = {r["threshold"]: r for r in out}
    assert by_thr[100]["precision_ppm"] == 1_000_000
    assert by_thr[100]["recall_ppm"] == 1_000_000
    assert by_thr[100]["f1_ppm"] == 1_000_000
    assert by_thr[0]["precision_ppm"] == 1_000_000 * 20 // 50
    # monotone recall as threshold descends; fn + tp == n_pos everywhere
    thrs = sorted(by_thr, reverse=True)
    rec = [by_thr[t]["recall_ppm"] for t in thrs]
    assert rec == sorted(rec)
    assert all(by_thr[t]["tp"] + by_thr[t]["fn"] == 20 for t in thrs)


def test_pr_summary_matches_sklearn_style_ap(spark):
    """Tie-heavy case vs an independently-computed step-wise AP
    (python reimplementation of the sklearn threshold sum)."""
    from azeroth_data_platform_spark.operators import mleval

    rows = [((i * 7) % 23, 1 if (i * 13) % 3 == 0 else 0) for i in range(400)]
    r = mleval.pr_summary(_scored(spark, rows)).collect()[0]
    # independent AP: group by distinct score desc, cumulative tp/fp
    from collections import Counter

    c1, ct = Counter(), Counter()
    for s, l in rows:
        ct[s] += 1
        c1[s] += l
    n_pos = sum(c1.values())
    tp = fp = 0
    ap_true = 0.0
    ap_trunc = 0
    best_f1 = -1
    best_thr = None
    for s in sorted(ct, reverse=True):
        tp += c1[s]
        fp += ct[s] - c1[s]
        ap_true += (c1[s] / n_pos) * (tp / (tp + fp))
        ap_trunc += 1_000_000 * c1[s] * tp // (n_pos * (tp + fp))
        f1 = 1_000_000 * 2 * tp // (2 * tp + fp + (n_pos - tp))
        if f1 > best_f1 or (f1 == best_f1 and s < best_thr):
            best_f1, best_thr = f1, s
    assert r["ap_ppm"] == ap_trunc
    assert abs(r["ap_ppm"] / 1e6 - ap_true) < len(ct) / 1e6
    assert r["best_f1_ppm"] == best_f1
    assert r["best_f1_threshold"] == best_thr
    assert r["n_thresholds"] == len(ct)


def test_pr_summary_single_class(spark):
    from azeroth_data_platform_spark.operators import mleval

    r = mleval.pr_summary(_scored(spark, [(5, 0)] * 10)).collect()[0]
    assert r["ap_ppm"] is None


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "label_a string, label_b string")


def test_kappa_perfect_and_chance(spark):
    from azeroth_data_platform_spark.operators import mleval

    # perfect agreement over 3 classes
    rows = [(c, c) for c in "abc" for _ in range(10)]
    r = mleval.cohens_kappa(_pairs(spark, rows)).collect()[0]
    assert r["kappa_ppm"] == 1_000_000 and r["n_agree"] == 30
    # independent labelings with identical uniform margins: po == pe
    # exactly -> kappa == 0 (2x2 balanced grid)
    rows = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")] * 5
    r = mleval.cohens_kappa(_pairs(spark, rows)).collect()[0]
    assert r["kappa_ppm"] == 0 and r["po_ppm"] == r["pe_ppm"] == 500_000


def test_kappa_negative_and_null(spark):
    from azeroth_data_platform_spark.operators import mleval

    # systematic disagreement -> kappa = -1 (truncation toward zero
    # keeps the exact -1e6 since the rational is exactly -1)
    rows = [("a", "b")] * 10 + [("b", "a")] * 10
    r = mleval.cohens_kappa(_pairs(spark, rows)).collect()[0]
    assert r["kappa_ppm"] == -1_000_000
    # both sides constant -> pe = 1 -> NULL kappa
    r = mleval.cohens_kappa(_pairs(spark, [("a", "a")] * 5)).collect()[0]
    assert r["kappa_ppm"] is None and r["po_ppm"] == 1_000_000


def test_kappa_matches_hand_formula(spark):
    from azeroth_data_platform_spark.operators import mleval

    rows = [
        ("a", "b" if (i * 7) % 5 == 0 else ("a" if i % 3 else "c"))
        if i % 2
        else ("b" if i % 5 else "c", "b")
        for i in range(300)
    ]
    r = mleval.cohens_kappa(_pairs(spark, rows)).collect()[0]
    from collections import Counter

    cells = Counter(rows)
    n = sum(cells.values())
    diag = sum(v for (a, b), v in cells.items() if a == b)
    rowm, colm = Counter(), Counter()
    for (a, b), v in cells.items():
        rowm[a] += v
        colm[b] += v
    rowcol = sum(rowm[c] * colm[c] for c in set(rowm) & set(colm))
    num, den = n * diag - rowcol, n * n - rowcol
    sign = -1 if num < 0 else 1
    assert r["kappa_ppm"] == sign * (1_000_000 * abs(num) // den)
    assert r["n"] == n and r["n_agree"] == diag


def test_auc_by_group_matches_per_group_auc_exact(spark):
    """The partitioned scaffold must equal the global scaffold run on
    each slice separately — same rank-sum, same truncation."""
    from azeroth_data_platform_spark.operators import mleval

    rows = [
        (f"g{i % 3}", (i * 7) % 23, 1 if (i * 13) % 4 == 0 else 0)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "grp string, score long, label int")
    got = {r["grp"]: r for r in mleval.auc_by_group(df).collect()}
    assert set(got) == {"g0", "g1", "g2"}
    for g in got:
        solo = mleval.auc_exact(df.where(F.col("grp") == g).drop("grp")).collect()[0]
        assert got[g]["auc_ppm"] == solo["auc_ppm"], g
        assert got[g]["n_pos"] == solo["n_pos"] and got[g]["n_neg"] == solo["n_neg"]


def test_eval_ops_on_empty_and_degenerate_input(spark):
    """Empty scored frame: every eval op returns a well-typed result
    (aggregates one NULL-ish row, curves zero rows) — no analysis error,
    no division blow-up. Single-distinct-score frame: PR curve is one
    row with recall 1."""
    from azeroth_data_platform_spark.operators import mleval

    empty = spark.createDataFrame([], "score long, label int")
    r = mleval.auc_exact(empty).collect()[0]
    assert r["auc_ppm"] is None and r["n_pos"] == 0
    assert mleval.pr_curve(empty).collect() == []
    s = mleval.pr_summary(empty).collect()[0]
    assert s["n_thresholds"] == 0 and s["best_f1_ppm"] is None
    assert mleval.decile_lift(empty).collect() == []
    one = _scored(spark, [(42, 1)] * 3 + [(42, 0)] * 2)
    curve = mleval.pr_curve(one).collect()
    assert len(curve) == 1 and curve[0]["recall_ppm"] == 1_000_000
    assert curve[0]["tp"] == 3 and curve[0]["fp"] == 2


def test_winsorized_stats_hand_check(spark):
    """100 values 1..100 cents in one type: exact discrete p01=1, p99=99,
    one row clipped high, winsorized mean checks by hand."""
    from azeroth_data_platform_spark.operators import profiling

    rows = [("a", float(i) / 100.0) for i in range(1, 101)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    r = profiling.winsorized_stats(ev).collect()[0]
    assert r["n"] == 100 and r["n_distinct"] == 100
    # lo rank = ceil(100/100) = 1 -> value 1; hi rank = ceil(99) = 99
    assert r["p01_units"] == 1 and r["p99_units"] == 99
    assert r["n_clipped_low"] == 0 and r["n_clipped_high"] == 1
    # clamped sum = (1+..+99) + 99 = 4950 + 99 = 5049
    assert r["winsorized_mean_q4"] == 10000 * 5049 // 100


def test_winsorized_stats_clips_planted_outlier(spark):
    """A 1e6-cent spike in a 10-cent-ish series must not move the
    winsorized mean by more than the clamp allows."""
    from azeroth_data_platform_spark.operators import profiling

    rows = [("a", 0.10)] * 199 + [("a", 10000.0)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    r = profiling.winsorized_stats(ev).collect()[0]
    assert r["p99_units"] == 10  # the spike is past the p99 rank
    assert r["n_clipped_high"] == 1
    assert r["winsorized_mean_q4"] == 10000 * (10 * 200) // 200  # = 1e5


def test_selfjoin_density_hand_check(spark):
    """Counts {a:4, b:2, c:1}: pairs 6/1/0, total 7, Σc² = 21,
    expansion = 21/7 = 3.0."""
    from azeroth_data_platform_spark.operators import profiling

    rows = (
        [(1, "2024-06-01", 1.0)] * 4
        + [(2, "2024-06-01", 1.0)] * 2
        + [(3, "2024-06-01", 1.0)]
    )
    silver = spark.createDataFrame(
        rows, "item_id int, snapshot_date string, unit_price double"
    )
    out = {r["item_id"]: r for r in profiling.selfjoin_density(silver).collect()}
    assert out[1]["pairs"] == 6 and out[2]["pairs"] == 1 and out[3]["pairs"] == 0
    assert out[1]["total_pairs"] == 7
    assert out[1]["pair_share_ppm"] == 1_000_000 * 6 // 7
    assert out[1]["expansion_q4"] == 10000 * 21 // 7  # 3.0 in q4


def test_multiclass_prf_hand_check(spark):
    """3-class case with an absent-in-gold prediction and an
    absent-in-pred gold class: margins, NULLs, and macro F1 by hand."""
    from azeroth_data_platform_spark.operators import mleval

    rows = (
        [("a", "a")] * 6 + [("a", "b")] * 2
        + [("b", "b")] * 3 + [("b", "d")] * 1
        + [("c", "a")] * 2  # gold class c never predicted
    )  # predicted class d never in gold
    out = {r["cls"]: r for r in mleval.multiclass_prf(_pairs(spark, rows)).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    a = out["a"]
    assert (a["n_true"], a["n_pred"], a["tp"]) == (8, 8, 6)
    assert a["precision_ppm"] == a["recall_ppm"] == 750_000
    assert a["f1_ppm"] == 1_000_000 * 12 // 16
    c = out["c"]
    assert c["n_pred"] == 0 and c["precision_ppm"] is None
    assert c["recall_ppm"] == 0 and c["f1_ppm"] == 0
    d = out["d"]
    assert d["n_true"] == 0 and d["recall_ppm"] is None and d["f1_ppm"] == 0
    b = out["b"]
    assert b["f1_ppm"] == 1_000_000 * 6 // 9
    macro = (a["f1_ppm"] + b["f1_ppm"] + 0 + 0) // 4
    assert all(r["macro_f1_ppm"] == macro for r in out.values())


# --- hash-classifier gate drift by source ------------------------------------


def test_hashclf_drift_planted_source_skew(spark):
    """A source whose docs are a disjoint vocabulary (different bucket
    mass) must score PSI far above sources drawn from the shared pool;
    identical-text sources stay near the rest. Bucket arithmetic
    cross-checked against a pure-Python hashlib recompute."""
    import hashlib

    from azeroth_data_platform_spark.operators import corpus as C
    from azeroth_data_platform_spark.operators.dedup import MINHASH_P

    shared = "the market opened calm and steady today with light volume"
    rows = []
    for i in range(40):
        rows.append((i * 3 + 0, shared, "en", "common_a"))
        rows.append((i * 3 + 1, shared, "en", "common_b"))
        rows.append((i * 3 + 2, f"zx{i} qq{i} ww{i} rr{i} tt{i} yy{i}", "en", "weird"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r.source: r for r in C.hashclf_drift_by_source(df).collect()}
    assert set(out) == {"common_a", "common_b", "weird"}
    # the two identical-text sources have IDENTICAL score mass -> equal
    # psi vs their respective rests... their rests differ (one contains
    # the other + weird), but symmetry makes them equal to each other
    assert out["common_a"].psi_q15 == out["common_b"].psi_q15
    assert out["weird"].psi_q15 > out["common_a"].psi_q15
    assert out["weird"].n_source == 40 and out["weird"].n_rest == 80

    # bucket recompute for one weird doc, pure Python
    wmap = {
        f: int(hashlib.md5(f"ftw:{f}".encode()).hexdigest()[:8], 16)
        % MINHASH_P
        % 2001
        - 1000
        for f in range(C.FT_BUCKETS)
    }
    def bucket(text):
        ws = text.split()
        sw = sum(
            wmap[int(hashlib.md5(f"ftq:{a} {b}".encode()).hexdigest()[:8], 16)
                 % MINHASH_P % C.FT_BUCKETS]
            for a, b in zip(ws, ws[1:])
        )
        n = len(ws) - 1
        import math

        return max(-64, min(63, math.floor((sw - 16 * n) / (16 * n))))

    got_buckets = {
        r.source: r.bucket
        for r in C._hashclf_bucket_frame(df.where("doc_id IN (0, 2)")).collect()
    }
    assert got_buckets["common_a"] == bucket(shared)
    assert got_buckets["weird"] == bucket("zx0 qq0 ww0 rr0 tt0 yy0")


def test_hashclf_drift_plan_one_scoring_scan(spark, sf_dir):
    """The expensive md5 pass runs ONCE: the zero-completion side is a
    source-only column scan crossed with the literal 128-value domain
    (broadcast), never a second reference to the scored subtree."""
    from azeroth_data_platform_spark import harness

    df = harness.QUERIES["ts_hashclf_drift"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") <= 2
    assert "CartesianProduct" not in plan
    # exactly one interpreted HOF scoring pass (the aggregate lambda)
    assert plan.count("aggregate(_hx") <= 1 or plan.count("aggregate(") <= 2
