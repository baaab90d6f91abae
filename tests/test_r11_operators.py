"""Round-11 operator units: Mann-Kendall trend test, Pettitt changepoint,
RFM segmentation, cohort LTV, padding efficiency."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F


def _silver(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, item_id long, quantity long, unit_price double,"
        " snapshot_date date, time_left string",
    )


def _series(spark, prices_by_item):
    d0 = dt.date(2025, 1, 1)
    rows, rid = [], 0
    for item, prices in prices_by_item.items():
        for i, p in enumerate(prices):
            if p is None:  # calendar gap
                continue
            rid += 1
            rows.append((rid, item, 1, p, d0 + dt.timedelta(days=i), "N"))
    return _silver(spark, rows)


# ---------------------------------------------------------------------------
# a19: Mann-Kendall


def test_mann_kendall_exact_counts_and_tau(spark):
    """Strictly rising series: S = n_pairs, tau_b = 1; series with a tie
    pair: exact C/D/tie split recomputed in python."""
    from azeroth_data_platform_spark.operators.timeseries import mann_kendall

    out = {
        r.item_id: r
        for r in mann_kendall(
            _series(
                spark,
                {
                    1: [10.0, 12.0, 14.0, 16.0, 18.0],  # strictly up
                    2: [10.0, 10.0, 9.0, 11.0],  # tie + wiggle
                },
            )
        ).collect()
    }
    r1 = out[1]
    assert r1.n_pairs == 10 and r1.s_stat == 10
    assert r1.n_concordant == 10 and r1.n_discordant == 0
    assert r1.tau_b == 1.0 and r1.trend == "up"

    # item 2 pairs (day order 10,10,9,11): python recompute
    prices = [10.0, 10.0, 9.0, 11.0]
    c = d = t = 0
    for i in range(4):
        for j in range(i + 1, 4):
            if prices[j] > prices[i]:
                c += 1
            elif prices[j] < prices[i]:
                d += 1
            else:
                t += 1
    r2 = out[2]
    assert (r2.n_concordant, r2.n_discordant, r2.n_tied_price) == (c, d, t)
    assert r2.s_stat == c - d
    assert r2.n_pairs == 6


def test_mann_kendall_all_tied_null_tau(spark):
    """A constant series has every pair tied: tau_b must be NULL (guarded
    denominator), trend 'flat' — the ANSI divide-by-zero trap."""
    from azeroth_data_platform_spark.operators.timeseries import mann_kendall

    rows = mann_kendall(_series(spark, {1: [5.0] * 6})).collect()
    assert len(rows) == 1
    assert rows[0].s_stat == 0 and rows[0].trend == "flat"
    assert rows[0].tau_b is None
    assert rows[0].n_tied_price == rows[0].n_pairs == 15


def test_mann_kendall_plan_equi_join(spark):
    """The pair stage must be an equi self-join on item_id, never a
    CartesianProduct."""
    from azeroth_data_platform_spark.operators.timeseries import mann_kendall

    plan = mann_kendall(
        _series(spark, {1: [1.0, 2.0, 3.0]})
    )._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# a20: Pettitt


def _pettitt_brute(prices):
    """O(n^2) sign-sum definition: U_t = sum_{i<=t} sum_{j>t} sgn(x_j-x_i);
    returns (K, first-argmax t, signed U at max)."""
    n = len(prices)
    best = None
    for t in range(1, n):  # t = prefix length, 1..n-1
        u = 0
        for i in range(t):
            for j in range(t, n):
                u += (prices[j] > prices[i]) - (prices[j] < prices[i])
        if best is None or abs(u) > abs(best[1]):
            best = (t, u)
    return abs(best[1]), best[0], best[1]


def test_pettitt_level_shift_located(spark):
    """A clean level shift half-way through the series is found at the
    shift day, and the rank identity matches the O(n^2) definition."""
    from azeroth_data_platform_spark.operators.timeseries import (
        pettitt_changepoint,
    )

    prices = [10.0] * 6 + [20.0] * 6
    rows = pettitt_changepoint(_series(spark, {1: prices})).collect()
    assert len(rows) == 1
    r = rows[0]
    k, t, u = _pettitt_brute([round(p * 100) for p in prices])
    assert r.k_stat == k and r.t_at_max == t and r.u_at_max == u
    # the split maximizing |U| is the last low day (prefix 1..6)
    assert r.t_at_max == 6
    assert r.changepoint_day == dt.date(2025, 1, 6)
    assert bool(r.significant_05) is (6 * k * k > 3.6888794541139363 * (12**3 + 12**2))


def test_pettitt_matches_brute_force_with_ties(spark):
    """Property probe: 20 random series with heavy ties and gaps — the
    rank-collapse identity must equal the O(n^2) sign-sum definition,
    including the first-t argmax tiebreak."""
    from azeroth_data_platform_spark.operators.timeseries import (
        pettitt_changepoint,
    )

    rng = random.Random(11)
    series = {}
    expected = {}
    for item in range(1, 21):
        n = rng.randint(5, 14)
        prices = [float(rng.randint(1, 4)) for _ in range(n)]
        series[item] = prices
        expected[item] = _pettitt_brute([round(p * 100) for p in prices])
    out = {r.item_id: r for r in pettitt_changepoint(_series(spark, series)).collect()}
    assert set(out) == set(expected)
    for item, (k, t, u) in expected.items():
        r = out[item]
        assert (r.k_stat, r.t_at_max, r.u_at_max) == (k, t, u), item


def test_pettitt_plan_has_no_join(spark):
    """The rank identity removes the pairwise join entirely: the plan
    must contain windows but NO join of any kind (the broadcast anchor
    crossJoin of a one-row aggregate is the only allowed exception)."""
    from azeroth_data_platform_spark.operators.timeseries import (
        pettitt_changepoint,
    )

    plan = pettitt_changepoint(
        _series(spark, {1: [1.0, 2.0, 3.0, 4.0, 5.0]})
    )._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# ---------------------------------------------------------------------------
# w_rfm_segments


def test_rfm_exact_scores_and_segments(spark):
    """10 customers with strictly separated metrics: quintiles land 2 per
    tile deterministically; cents are exact; segment quadrants hold."""
    from azeroth_data_platform_spark.operators.windows import rfm_segments

    d0 = dt.date(2025, 1, 1)
    rows = []
    ok = 0
    # customer c has orders on days 0..c-1 (c orders), each 10.01 * c
    for c in range(1, 11):
        for k in range(c):
            ok += 1
            rows.append((ok, c, "O", 10.01 * c, d0 + dt.timedelta(days=k), "P"))
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    out = {r.c_custkey: r for r in rfm_segments(orders).collect()}
    assert len(out) == 10
    # customer 10: most orders (10), most recent (day 9 = anchor), richest
    r10 = out[10]
    assert r10.recency_days == 0 and r10.frequency == 10
    assert r10.monetary_cents == 10 * 10010  # 10 orders x 100.10
    assert (r10.r_score, r10.f_score, r10.m_score) == (5, 5, 5)
    assert r10.segment == "champion"
    # customer 1: single day-0 order, max recency, minimum everything
    r1 = out[1]
    assert r1.recency_days == 9 and r1.frequency == 1
    assert r1.monetary_cents == 1001
    assert (r1.r_score, r1.f_score, r1.m_score) == (1, 1, 1)
    assert r1.segment == "lost"
    # quintiles over 10 distinct-valued customers: exactly 2 per tile
    from collections import Counter

    assert Counter(r.f_score for r in out.values()) == {i: 2 for i in range(1, 6)}


def test_rfm_ties_share_scores_deterministically(spark):
    """Tied metric values ALWAYS share a score (percentile_disc boundary
    semantics — the r12 de-weak of the partition-less NTILE): all-identical
    metrics collapse everyone to score 1, and the assignment is invariant
    under repartitioning (no rank tiebreak left to permute)."""
    from azeroth_data_platform_spark.operators.windows import rfm_segments

    d0 = dt.date(2025, 1, 1)
    rows = [(c, c, "O", 50.0, d0, "P") for c in range(1, 8)]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    a = {r.c_custkey: (r.r_score, r.f_score, r.m_score) for r in rfm_segments(orders).collect()}
    b = {
        r.c_custkey: (r.r_score, r.f_score, r.m_score)
        for r in rfm_segments(orders.repartition(7)).collect()
    }
    assert a == b
    # every metric is a single tied run: the only boundary value is the
    # run itself, nothing exceeds it, so everyone scores (1, 1, 1)
    assert set(a.values()) == {(1, 1, 1)}


def test_rfm_boundary_semantics_brute_force(spark):
    """Property probe: scores must equal the O(n log n) python recompute of
    the percentile_disc rule (q_b = smallest value with cum >= ceil(b*n/5);
    score = 1 + #{q_b < v}) on a tie-heavy random base."""
    import random

    from azeroth_data_platform_spark.operators.windows import rfm_segments

    rng = random.Random(12)
    d0 = dt.date(2025, 1, 1)
    rows = []
    ok = 0
    for c in range(1, 41):
        for _ in range(rng.randint(1, 4)):
            ok += 1
            rows.append(
                (
                    ok,
                    c,
                    "O",
                    rng.choice([10.0, 10.0, 25.5, 99.99]),
                    d0 + dt.timedelta(days=rng.randint(0, 6)),
                    "P",
                )
            )
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    got = {
        r.c_custkey: r for r in rfm_segments(orders).collect()
    }

    def expect_scores(values):
        n = len(values)
        s = sorted(values)
        qs = [s[-(-n * b // 5) - 1] for b in range(1, 5)]  # ceil-rank values
        return {v: 1 + sum(1 for q in qs if v > q) for v in set(values)}

    for metric, col in (
        ("r", lambda r: -r.recency_days),
        ("f", lambda r: r.frequency),
        ("m", lambda r: r.monetary_cents),
    ):
        vals = [col(r) for r in got.values()]
        exp = expect_scores(vals)
        attr = {"r": "r_score", "f": "f_score", "m": "m_score"}[metric]
        for r in got.values():
            assert getattr(r, attr) == exp[col(r)], (metric, r)


# ---------------------------------------------------------------------------
# x_cohort_ltv


def test_cohort_ltv_exact_cents_and_consistency(spark):
    """Hand-built two-cohort stream: exact cent accumulation, cumulative
    window, and cohort_size consistent with x_retention_cohorts."""
    from azeroth_data_platform_spark.operators.windows import (
        cohort_ltv,
        retention_cohorts,
    )

    t0 = dt.datetime(2025, 1, 6, 12, 0, 0)  # a Monday
    wk = dt.timedelta(days=7)
    rows = [
        # cohort A: users 1,2 first seen week 0
        (1, t0, 1, "signup", 0.0, "{}"),
        (2, t0, 2, "signup", 0.0, "{}"),
        (3, t0 + dt.timedelta(hours=1), 1, "purchase", 10.50, "{}"),
        (4, t0 + wk, 1, "purchase", 5.25, "{}"),
        (5, t0 + 2 * wk, 2, "purchase", 1.00, "{}"),
        # cohort B: user 3 first seen week 1
        (6, t0 + wk, 3, "purchase", 99.99, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {(r.cohort_week, r.week_offset): r for r in cohort_ltv(events).collect()}
    base = min(cw for cw, _ in out)
    a0 = out[(base, 0)]
    assert a0.cohort_size == 2 and a0.revenue_cents == 1050
    assert a0.cum_revenue_cents == 1050
    a1 = out[(base, 1)]
    assert a1.revenue_cents == 525 and a1.cum_revenue_cents == 1575
    a2 = out[(base, 2)]
    assert a2.revenue_cents == 100 and a2.cum_revenue_cents == 1675
    assert a2.cum_ltv_per_user == 837.5  # 1675 cents over 2 users
    b0 = out[(base + 1, 0)]
    assert b0.cohort_size == 1 and b0.revenue_cents == 9999
    # cohort sizes agree with the retention report
    ret = {
        r.cohort_week: r.cohort_size
        for r in retention_cohorts(events).collect()
        if r.week_offset == 0
    }
    assert ret[base] == 2 and ret[base + 1] == 1


# ---------------------------------------------------------------------------
# tp_padding_efficiency


def test_padding_efficiency_hand_computed(spark):
    """4 docs, batch size 2: arrival pairs (5,1)(4,2) -> padded 10+8;
    sorted pairs (5,4)(2,1) -> padded 10+4; exact ppm."""
    from azeroth_data_platform_spark.operators.corpus import padding_efficiency

    docs = spark.createDataFrame(
        [
            (1, "a a a a a", "en", "web", 9),
            (2, "b", "en", "web", 1),
            (3, "c c c c", "en", "web", 7),
            (4, "d d", "en", "web", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r.strategy: r for r in padding_efficiency(docs, batch_size=2).collect()
    }
    arr, srt = out["arrival"], out["sorted"]
    assert arr.n_docs == srt.n_docs == 4
    assert arr.n_batches == srt.n_batches == 2
    assert arr.token_mass == srt.token_mass == 12
    assert arr.padded_mass == 18  # (5,1)->10, (4,2)->8
    assert srt.padded_mass == 14  # (5,4)->10, (2,1)->4
    assert arr.padding_tokens == 6 and srt.padding_tokens == 2
    assert arr.padding_ppm == 6 * 1_000_000 // 18
    assert srt.padding_ppm == 2 * 1_000_000 // 14


def test_padding_windows_are_source_partitioned(spark):
    """The batching windows must partition by source — a global sort of
    the corpus would be the 100 TB scale bug."""
    from azeroth_data_platform_spark.operators.corpus import padding_efficiency

    docs = spark.createDataFrame(
        [(1, "a b", "en", "web", 3), (2, "c", "en", "books", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    plan = (
        padding_efficiency(docs)._jdf.queryExecution().sparkPlan().toString()
    )
    import re

    for m in re.finditer(r"Window \[row_number\(\)[^\n]*", plan):
        assert "source" in m.group(0), m.group(0)


# ---------------------------------------------------------------------------
# a21: seasonal Mann-Kendall (legacy registry)


def test_seasonal_mk_weekly_cycle_is_not_a_trend(spark):
    """A pure weekly cycle (price depends only on weekday) over 4 weeks:
    every same-season pair is a TIE, so seasonal S = 0 / 'flat', while
    the plain a19 S over all pairs is nonzero on the same data — the
    exact confound the seasonal variant exists to remove."""
    from azeroth_data_platform_spark.operators.timeseries import (
        mann_kendall,
        seasonal_mann_kendall,
    )

    prices = [10.0 + (i % 7) for i in range(28)]  # weekday staircase
    df = _series(spark, {1: prices})
    smk = seasonal_mann_kendall(df).collect()
    assert len(smk) == 1
    r = smk[0]
    assert r.s_stat == 0 and r.trend == "flat"
    assert bool(r.significant_05) is False
    assert r.n_seasons_active == 7
    # each season: 4 equal values -> C(4,2)=6 tied pairs, 7 seasons
    assert r.n_pairs == 7 * 6
    mk = mann_kendall(df).collect()[0]
    assert mk.s_stat != 0  # the cycle fools the unseasoned statistic

    # and a genuine within-season trend IS detected: staircase + 1.0/week
    trended = [10.0 + (i % 7) + 1.0 * (i // 7) for i in range(28)]
    r2 = seasonal_mann_kendall(_series(spark, {2: trended})).collect()[0]
    assert r2.s_stat == 7 * 6 and r2.trend == "up"  # all pairs rise
    # var18 with no ties: 7 seasons of n=4 -> 7 * 4*3*13 = 1092
    assert r2.var18 == 7 * (4 * 3 * (2 * 4 + 5))
    # decision: (42-1)^2*18 = 30258 > 3.8416*1092 = 4195 -> significant
    assert bool(r2.significant_05) is True


def test_seasonal_mk_pairs_bounded_by_plain_mk(spark):
    """Seasons partition the days, so the seasonal pair count is always
    <= the plain C(n,2) — the plan-cost argument, checked on data."""
    from azeroth_data_platform_spark.operators.timeseries import (
        mann_kendall,
        seasonal_mann_kendall,
    )

    import random

    rng = random.Random(5)
    series = {i: [float(rng.randint(1, 9)) for _ in range(rng.randint(8, 20))] for i in range(1, 6)}
    df = _series(spark, series)
    smk = {r.item_id: r.n_pairs for r in seasonal_mann_kendall(df).collect()}
    mk = {r.item_id: r.n_pairs for r in mann_kendall(df).collect()}
    for item, np_s in smk.items():
        assert np_s <= mk[item]


# ---------------------------------------------------------------------------
# x_rfm_migration (legacy registry)


def test_rfm_migration_new_customers_and_share(spark):
    """Customers present only after the split enter as 'new_customer';
    every late customer lands in exactly one cell; ppm shares are exact
    truncations summing to <= 1e6."""
    from azeroth_data_platform_spark.operators.windows import rfm_migration

    d_early = dt.date(1995, 1, 1)
    d_late = dt.date(1997, 1, 1)
    rows = []
    ok = 0
    # 10 long-standing customers ordering in both periods
    for c in range(1, 11):
        for k in range(c):
            ok += 1
            rows.append((ok, c, "O", 10.0 * c, d_early + dt.timedelta(days=k), "P"))
            ok += 1
            rows.append((ok, c, "O", 10.0 * c, d_late + dt.timedelta(days=k), "P"))
    # 2 customers that appear only after the split
    for c in (21, 22):
        ok += 1
        rows.append((ok, c, "O", 55.0, d_late, "P"))
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    out = rfm_migration(orders, split_date="1996-06-30").collect()
    total = sum(r.n_customers for r in out)
    assert total == 12  # every late customer in exactly one cell
    new_cells = [r for r in out if r.segment_from == "new_customer"]
    assert sum(r.n_customers for r in new_cells) == 2
    ppm = sum(r.share_ppm for r in out)
    assert 1_000_000 - len(out) < ppm <= 1_000_000  # exact truncations


def test_mann_kendall_matches_brute_force_property(spark):
    """Property probe: 15 random tie-heavy series — S/C/D/ties and the
    seasonal S must equal O(n^2) python recomputes (the pettitt-grade
    cross-check for the pair family)."""
    from azeroth_data_platform_spark.operators.timeseries import (
        mann_kendall,
        seasonal_mann_kendall,
    )

    rng = random.Random(19)
    series = {}
    for item in range(1, 16):
        n = rng.randint(4, 16)
        series[item] = [float(rng.randint(1, 5)) for _ in range(n)]
    df = _series(spark, series)
    mk = {r.item_id: r for r in mann_kendall(df).collect()}
    smk = {r.item_id: r for r in seasonal_mann_kendall(df).collect()}
    for item, prices in series.items():
        cents = [round(p * 100) for p in prices]
        n = len(cents)
        c = d = t = 0
        s_seasonal = 0
        pairs_seasonal = 0
        for i in range(n):
            for j in range(i + 1, n):
                sgn = (cents[j] > cents[i]) - (cents[j] < cents[i])
                c += sgn == 1
                d += sgn == -1
                t += sgn == 0
                if i % 7 == j % 7:  # d0 is day 0, so dow == index mod 7
                    s_seasonal += sgn
                    pairs_seasonal += 1
        r = mk[item]
        assert (r.n_concordant, r.n_discordant, r.n_tied_price) == (c, d, t), item
        assert r.s_stat == c - d
        # every item meeting min_days reports — zero-pair items as the
        # honest n_pairs=0/s_stat=0 'flat' row (r11 ADVICE #1)
        rs = smk[item]
        assert rs.s_stat == s_seasonal, item
        assert rs.n_pairs == pairs_seasonal, item
        # tie-corrected variance recompute
        from collections import Counter

        v_n = v_t = 0
        for g in range(7):
            vals = [cents[i] for i in range(n) if i % 7 == g]
            ng = len(vals)
            v_n += ng * (ng - 1) * (2 * ng + 5)
            for tt in Counter(vals).values():
                v_t += tt * (tt - 1) * (2 * tt + 5)
        assert rs.var18 == v_n - v_t, item
        if pairs_seasonal == 0:
            assert rs.trend == "flat" and not rs.significant_05, item


def test_funnel_wilson_hand_computed(spark):
    """Known funnel (10 view -> 4 click -> 1 purchase): rates and Wilson
    bounds equal the python recompute of the identical IEEE tree; the
    interval brackets the rate."""
    import math

    from azeroth_data_platform_spark.operators.windows import funnel_wilson

    t0 = dt.datetime(2025, 1, 1, 9, 0, 0)
    rows = []
    eid = 0
    for u in range(1, 11):
        eid += 1
        rows.append((eid, u, t0, "view", 0.0, "{}"))
    for u in range(1, 5):
        eid += 1
        rows.append((eid, u, t0 + dt.timedelta(minutes=1), "click", 0.0, "{}"))
    eid += 1
    rows.append((eid, 1, t0 + dt.timedelta(minutes=2), "purchase", 1.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    out = {r.to_step: r for r in funnel_wilson(events).collect()}

    def wilson(k, n, sign):
        return ((k + 3.8416 / 2.0) / (n + 3.8416)) + sign * (
            1.96 * math.sqrt((k * (n - k)) / n + 3.8416 / 4.0) / (n + 3.8416)
        )

    c = out["click"]
    assert (c.n_from, c.n_to) == (10, 4) and c.rate == 0.4
    assert c.wilson_lo == wilson(4.0, 10.0, -1) and c.wilson_hi == wilson(4.0, 10.0, +1)
    assert c.wilson_lo < c.rate < c.wilson_hi
    p = out["purchase"]
    assert (p.n_from, p.n_to) == (4, 1)
    assert p.wilson_lo < p.rate < p.wilson_hi
    assert 0.0 < p.wilson_lo and p.wilson_hi < 1.0  # Wilson never escapes [0,1]


def test_abtest_srm_flag_exact_boundary(spark):
    """SRM on hand-built exposures: a balanced type is not flagged, a
    grossly skewed one is, and the flag flips EXACTLY where the integer
    comparison says — pinned on a boundary pair around chi2 = 3.8416."""
    from azeroth_data_platform_spark.operators.windows import abtest_srm

    t0 = dt.datetime(2025, 1, 1, 9, 0, 0)
    rows = []
    eid = 0

    def add(event_type, n_even, n_odd):
        nonlocal eid
        for u in range(n_even):
            eid += 1
            rows.append((eid, 2 * (u + 1), t0, event_type, 0.0, "{}"))
        for u in range(n_odd):
            eid += 1
            rows.append((eid, 2 * u + 1, t0, event_type, 0.0, "{}"))

    add("view", 50, 50)         # perfectly balanced
    add("click", 80, 20)        # chi2 = 3600/100 = 36 -> flagged
    # boundary pair: chi2 = (d^2)/n vs 3.8416
    add("purchase", 60, 41)     # d=19, n=101: 361/101 = 3.574 -> no flag
    add("signup", 61, 41)       # d=20, n=102: 400/102 = 3.922 -> flag
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    out = {r.event_type: r for r in abtest_srm(events).collect()}
    assert out["view"].chi2 == 0.0 and bool(out["view"].srm_flag) is False
    assert out["click"].chi2 == 36.0 and bool(out["click"].srm_flag) is True
    assert bool(out["purchase"].srm_flag) is False
    assert bool(out["signup"].srm_flag) is True
    assert out["purchase"].n_a == 60 and out["purchase"].n_b == 41
    # exposure counts DISTINCT users: duplicate events must not inflate
    eid += 1
    rows.append((eid, 2, t0, "view", 0.0, "{}"))  # user 2 views again
    events2 = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    out2 = {r.event_type: r for r in abtest_srm(events2).collect()}
    assert out2["view"].n_a == 50
