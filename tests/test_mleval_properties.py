"""Property-based invariants for the classifier-eval and pre-flight
operators (hypothesis): random tie-heavy scored frames and count tables
must match pure-Python reference implementations EXACTLY — the same
integer-quantization contract the DuckDB oracles pin, but over inputs
the fixed corpus cannot produce (all-one-class mixes, singleton groups,
maximal ties, adversarial clip boundaries).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling files)

from azeroth_data_platform_spark.operators import mleval, profiling

scored_rows = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 1)),
    min_size=1,
    max_size=120,
)


def _ref_auc(rows):
    c1, ct = Counter(), Counter()
    for s, l in rows:
        ct[s] += 1
        c1[s] += l
    n_pos = sum(c1.values())
    n_neg = sum(ct.values()) - n_pos
    if n_pos == 0 or n_neg == 0:
        return n_pos, n_neg, None
    cum = 0
    r2pos = 0
    for s in sorted(ct):
        r2 = 2 * (cum + ct[s]) - ct[s] + 1  # doubled midrank
        r2pos += c1[s] * r2
        cum += ct[s]
    u2 = r2pos - n_pos * (n_pos + 1)
    return n_pos, n_neg, 1_000_000 * u2 // (2 * n_pos * n_neg)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(scored_rows)
def test_auc_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "score long, label int")
    r = mleval.auc_exact(df).collect()[0]
    n_pos, n_neg, auc_ppm = _ref_auc(rows)
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (n_pos, n_neg, auc_ppm)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(scored_rows)
def test_pr_summary_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "score long, label int")
    r = mleval.pr_summary(df).collect()[0]
    c1, ct = Counter(), Counter()
    for s, l in rows:
        ct[s] += 1
        c1[s] += l
    n_pos = sum(c1.values())
    tp = fp = 0
    ap = 0
    best_f1, best_thr = -1, None
    for s in sorted(ct, reverse=True):
        tp += c1[s]
        fp += ct[s] - c1[s]
        if n_pos > 0:
            ap += 1_000_000 * c1[s] * tp // (n_pos * (tp + fp))
        f1 = 1_000_000 * 2 * tp // (2 * tp + fp + (n_pos - tp))
        if f1 > best_f1 or (f1 == best_f1 and s < best_thr):
            best_f1, best_thr = f1, s
    assert r["n_thresholds"] == len(ct)
    assert r["ap_ppm"] == (ap if n_pos > 0 else None)
    assert r["best_f1_ppm"] == best_f1 and r["best_f1_threshold"] == best_thr


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(scored_rows)
def test_decile_lift_invariants(spark, rows):
    df = spark.createDataFrame(rows, "score long, label int")
    out = mleval.decile_lift(df).collect()
    assert sum(r["n"] for r in out) == len(rows)
    n_pos = sum(l for _, l in rows)
    caps = [r["cum_capture_ppm"] for r in out]
    if n_pos > 0:
        assert caps == sorted(caps) and caps[-1] == 1_000_000
    else:
        assert all(c is None for c in caps)
    # tie-groups are never split: decile counts follow the first-position
    # rule exactly
    ct = Counter(s for s, _ in rows)
    n = len(rows)
    before = 0
    dec_n = Counter()
    for s in sorted(ct, reverse=True):
        dec_n[min(9, 10 * before // n)] += ct[s]
        before += ct[s]
    assert {r["decile"]: r["n"] for r in out} == dict(dec_n)


pair_rows = st.lists(
    st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd")),
    min_size=1,
    max_size=150,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(pair_rows)
def test_kappa_and_prf_match_reference(spark, rows):
    df = spark.createDataFrame(rows, "label_a string, label_b string")
    cells = Counter(rows)
    n = len(rows)
    diag = sum(v for (a, b), v in cells.items() if a == b)
    rowm, colm = Counter(), Counter()
    for (a, b), v in cells.items():
        rowm[a] += v
        colm[b] += v
    rowcol = sum(rowm[c] * colm[c] for c in set(rowm) & set(colm))
    r = mleval.cohens_kappa(df).collect()[0]
    num, den = n * diag - rowcol, n * n - rowcol
    if den > 0:
        sign = -1 if num < 0 else 1
        assert r["kappa_ppm"] == sign * (1_000_000 * abs(num) // den)
    else:
        assert r["kappa_ppm"] is None
    prf = {x["cls"]: x for x in mleval.multiclass_prf(df).collect()}
    classes = set(rowm) | set(colm)
    assert set(prf) == classes
    f1s = []
    for c in classes:
        tp = cells.get((c, c), 0)
        nt, np_ = rowm.get(c, 0), colm.get(c, 0)
        x = prf[c]
        assert (x["n_true"], x["n_pred"], x["tp"]) == (nt, np_, tp)
        f1 = 1_000_000 * 2 * tp // (nt + np_)
        assert x["f1_ppm"] == f1
        f1s.append(f1)
    assert all(x["macro_f1_ppm"] == sum(f1s) // len(f1s) for x in prf.values())


value_rows = st.lists(
    st.tuples(st.sampled_from("xy"), st.integers(0, 40)),
    min_size=1,
    max_size=150,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(value_rows)
def test_winsorized_stats_matches_reference(spark, rows):
    # values are integer cents/100 so int_units is exact
    ev = spark.createDataFrame(
        [(g, v / 100.0) for g, v in rows], "event_type string, value double"
    )
    out = {r["event_type"]: r for r in profiling.winsorized_stats(ev).collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    assert set(out) == set(by_g)
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        lo = vs[(n * 1 + 99) // 100 - 1]
        hi = vs[(n * 99 + 99) // 100 - 1]
        clamped = [min(max(v, lo), hi) for v in vs]
        r = out[g]
        assert (r["p01_units"], r["p99_units"]) == (lo, hi), g
        assert r["n_clipped_low"] == sum(1 for v in vs if v < lo)
        assert r["n_clipped_high"] == sum(1 for v in vs if v > hi)
        assert r["winsorized_mean_q4"] == 10000 * sum(clamped) // n


def test_hash_classifier_scores_integer_export(spark):
    """r9: the gate classifier's integer score export is ORDER- and
    TIE-faithful to the exact logit rational SW/n (floor at nmax²
    granularity is injective on distinct rationals), and the AUC read
    off it matches a pure-Python rank-sum recompute — all re-derived
    here from hashlib, independent of the SQL md5 chain."""
    import hashlib
    from fractions import Fraction

    from azeroth_data_platform_spark.operators import corpus as C

    docs = [
        (1, "the quick brown fox jumps", "en"),
        (2, "le renard brun rapide saute", "fr"),
        (3, "a b", "en"),                      # minimal 1-bigram doc
        (4, "a b", "fr"),                      # exact tie with doc 3
        (5, "x y z w v u t s r q p o", "en"),
        (6, "solo", "en"),                     # < 2 words: excluded
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = sorted(
        (r.score, r.label)
        for r in C.hash_classifier_scores(df).collect()
    )

    def sw_n(text):
        ws = [w for w in text.split(" ") if w]
        sw = 0
        for a, b in zip(ws, ws[1:]):
            h = int(hashlib.md5(f"ftq:{a} {b}".encode()).hexdigest()[:8], 16)
            f = (h % 2_147_483_647) % C.FT_BUCKETS
            hw = int(hashlib.md5(f"ftw:{f}".encode()).hexdigest()[:8], 16) % 2_147_483_647
            sw += hw % 2001 - 1000
        return sw, len(ws) - 1

    kept = [(d, t, lang) for d, t, lang in docs if len(t.split()) >= 2]
    pairs = [sw_n(t) for _, t, lang in kept]
    nmax = max(n for _, n in pairs)
    import math

    exp = sorted(
        (math.floor(Fraction(sw * nmax * nmax, n)), 1 if lang == "en" else 0)
        for (sw, n), (_, _, lang) in zip(pairs, kept)
    )
    assert got == exp
    # injectivity on distinct rationals; exact ties preserved
    rat = sorted(Fraction(sw, n) for sw, n in pairs)
    scores = sorted(s for s, _ in exp)
    for (r1, s1), (r2, s2) in zip(zip(rat, scores), zip(rat[1:], scores[1:])):
        assert (r1 == r2) == (s1 == s2)
        assert (r1 < r2) == (s1 < s2)
    # AUC through the operator == pure-python rank-sum with midranks
    row = mleval.auc_exact(
        spark.createDataFrame(
            [(int(s), int(lb)) for s, lb in exp], "score long, label int"
        )
    ).collect()[0]
    ranks = {}
    allsc = sorted(s for s, _ in exp)
    for s in set(allsc):
        idx = [i + 1 for i, v in enumerate(allsc) if v == s]
        ranks[s] = sum(idx) / len(idx)
    pos = [s for s, lb in exp if lb == 1]
    neg = [s for s, lb in exp if lb == 0]
    u = sum(ranks[s] for s in pos) - len(pos) * (len(pos) + 1) / 2
    want_ppm = int(Fraction(int(2 * u) * 1_000_000, 2 * len(pos) * len(neg)))
    assert row.auc_ppm == want_ppm


def test_hashclf_bucket_scores_domain_and_python_recompute(spark):
    """r10 (verdict #4): the q6-bucketed gate score — every bucket inside
    the fixed [-64, 63] domain, values equal to a pure-Python
    clamp(floor((SW - 16n)/(16n))) recompute from hashlib (independent of
    the SQL md5 chain), and bucketing is a MONOTONE coarsening of the
    exact ts_auc_hashclf score (never reorders, only ties)."""
    import hashlib
    import math
    from fractions import Fraction

    from azeroth_data_platform_spark.operators import corpus as C

    docs = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "le renard brun rapide saute par dessus le chien", "fr"),
        (3, "a b", "en"),
        (4, "x y z w v u t s r q p o n m l k j i h g", "de"),
        (5, "data platform market " * 30, "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = sorted(
        (r.score, r.label) for r in C.hashclf_bucket_scores(df).collect()
    )

    def sw_n(text):
        ws = [w for w in text.split(" ") if w]
        sw = 0
        for a, b in zip(ws, ws[1:]):
            h = int(hashlib.md5(f"ftq:{a} {b}".encode()).hexdigest()[:8], 16)
            f = (h % 2_147_483_647) % C.FT_BUCKETS
            hw = int(
                hashlib.md5(f"ftw:{f}".encode()).hexdigest()[:8], 16
            ) % 2_147_483_647
            sw += hw % 2001 - 1000
        return sw, len(ws) - 1

    exp = []
    fracs = []
    for _, t, lang in docs:
        sw, n = sw_n(t)
        b = max(-64, min(63, math.floor(Fraction(sw - 16 * n, 16 * n))))
        exp.append((b, 1 if lang == "en" else 0))
        fracs.append(Fraction(sw, n))
    assert got == sorted(exp)
    assert all(C.HASHCLF_BUCKET_LO <= s <= C.HASHCLF_BUCKET_HI for s, _ in got)
    # monotone coarsening: order of buckets never contradicts exact logits
    pairs = sorted(zip(fracs, (b for b, _ in exp)))
    for (f1, b1), (f2, b2) in zip(pairs, pairs[1:]):
        assert b1 <= b2


def test_hash_classifier_scores_empty_corpus_no_error(spark):
    """r10 (ADVICE #1): when NO document has >= 2 words, the nmax
    aggregate is NULL — the guard CASE must take the explicit IS NULL
    branch and return an EMPTY result, not fall into the raise_error
    ELSE whose concat() null-propagates into a NULL-message failure
    (the broadcast side evaluates even though the scored side is
    empty)."""
    from azeroth_data_platform_spark.operators import corpus as C

    docs = [(1, "solo", "en"), (2, "", "fr"), (3, "one", "en")]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    assert C.hash_classifier_scores(df).collect() == []


def test_hash_classifier_scores_plan_rowlocal_broadcast(spark, sf_dir):
    """Plan pin: the scoring pass is a row-local HOF projection (no
    explode, no pre-scaffold shuffle); nmax arrives via a broadcast
    1-row join of the cheap words-only scan, never a CartesianProduct;
    the only hash exchange is the mleval distinct-score groupBy."""
    from azeroth_data_platform_spark import harness

    df = harness.QUERIES["ts_auc_hashclf"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Generate" not in plan  # no explode: bigrams stay in-row
