"""Round-10 operator units: Theil-Sen robust trend, daily max
concurrency, LSH recall report, faceted catalog counts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _silver(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, item_id long, quantity long, unit_price double,"
        " snapshot_date date, time_left string",
    )


def test_theil_sen_exact_median_and_robustness(spark):
    """Known series: item 1 rises exactly 2.00/day -> slope 2e6 uc/day;
    item 2 has the same rise plus ONE wild spike day, and Theil-Sen still
    reports the underlying slope (the breakdown property an OLS fit does
    not have); quantized lower median equals a pure-Python Fraction
    recompute."""
    import math
    from fractions import Fraction

    from azeroth_data_platform_spark.operators.timeseries import (
        theil_sen_trend,
    )

    d0 = dt.date(2025, 1, 1)
    rows = []
    rid = 0
    prices1, prices2 = [], []
    for i in range(7):
        p = 10.0 + 2.0 * i
        prices1.append(p)
        rid += 1
        rows.append((rid, 1, 1, p, d0 + dt.timedelta(days=i), "N"))
    for i in range(7):
        p = 10.0 + 2.0 * i + (500.0 if i == 3 else 0.0)  # planted spike
        prices2.append(p)
        rid += 1
        rows.append((rid, 2, 1, p, d0 + dt.timedelta(days=i), "N"))
    out = {r.item_id: r for r in theil_sen_trend(_silver(spark, rows)).collect()}
    # slope unit is micro-CENTS per day: 2.00/day = 200 cents -> 2e8
    assert out[1].slope_uc_per_day == 200_000_000
    assert out[1].trend == "up"
    assert out[1].n_days == 7 and out[1].n_pairs == 21
    # robust: the spike flips 6 of 21 pairwise slopes, median unmoved
    assert out[2].slope_uc_per_day == 200_000_000

    # python recompute: lower median of sign-split-floor-quantized slopes
    def slopes(prices):
        cents = [round(p * 100) for p in prices]
        out = []
        for i in range(len(cents)):
            for j in range(i + 1, len(cents)):
                out.append(Fraction(cents[j] - cents[i], j - i))
        return sorted(out)

    for item, prices in ((1, prices1), (2, prices2)):
        qs = sorted(math.floor(s * 10**6) for s in slopes(prices))
        n_pairs = len(qs)
        k = (n_pairs + 1) // 2
        assert out[item].slope_uc_per_day == qs[k - 1]
        # Sen's rank band: same order-statistic selection, python-recomputed
        n = len(prices)
        c = 1.96 * math.sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
        m1 = max(1, math.floor((n_pairs - c) / 2))
        m2 = min(n_pairs, math.floor((n_pairs + c) / 2) + 1)
        assert out[item].slope_lo_uc == qs[m1 - 1]
        assert out[item].slope_hi_uc == qs[m2 - 1]
        assert out[item].slope_lo_uc <= out[item].slope_uc_per_day
        assert out[item].slope_uc_per_day <= out[item].slope_hi_uc
    # the spike widens item 2's band (here downward: the 6 post-spike
    # pairs have negative slopes) but never moves its median
    width = lambda r: r.slope_hi_uc - r.slope_lo_uc  # noqa: E731
    assert width(out[2]) > width(out[1])


def test_theil_sen_plan_no_cartesian_item_partitioned(spark, sf_dir):
    from azeroth_data_platform_spark import harness

    df = harness.ALL_QUERIES["a18_theil_sen"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the median rank window is item-partitioned, never partition-less
    assert "Window [" not in plan.replace(
        "windowspecdefinition(item_id", ""
    ) or "windowspecdefinition(item_id" in plan


def test_max_concurrency_sweepline_semantics(spark):
    """Hand-built sessions: overlapping users peak at 3; a touch at the
    exact same microsecond counts as overlap (closed intervals); a
    session crossing midnight contributes to BOTH days; a single-event
    session still counts itself."""
    from azeroth_data_platform_spark.operators.windows import (
        max_concurrency_daily,
    )

    t = lambda h, m=0, s=0, d=1: dt.datetime(2025, 3, d, h, m, s)  # noqa: E731
    rows = []
    eid = 0

    def session(user, start, end):
        # events every 20 min (inside the 30-min gap) so [start, end]
        # really is ONE session
        nonlocal eid
        cur = start
        while cur < end:
            eid += 1
            rows.append((eid, user, cur, "view", 1.0))
            cur += dt.timedelta(minutes=20)
        eid += 1
        rows.append((eid, user, end, "view", 1.0))

    session(1, t(9), t(10))          # 9-10
    session(2, t(9, 30), t(10, 30))  # overlap with 1 and 3
    session(3, t(10), t(11))         # touches session 1 at exactly 10:00
    eid += 1
    rows.append((eid, 4, t(23, 50), "view", 1.0))  # crosses midnight
    eid += 1
    rows.append((eid, 4, dt.datetime(2025, 3, 2, 0, 10), "view", 1.0))
    eid += 1
    rows.append((eid, 5, dt.datetime(2025, 3, 3, 12), "view", 1.0))  # single
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {str(r.day): r for r in max_concurrency_daily(ev).collect()}
    d1, d2, d3 = "2025-03-01", "2025-03-02", "2025-03-03"
    # at 10:00 sessions 1,2,3 are simultaneously open (closed intervals)
    assert out[d1].max_concurrent == 3
    assert out[d1].n_sessions == 4  # users 1,2,3 + user 4's day-1 segment
    assert out[d2].n_sessions == 1 and out[d2].max_concurrent == 1
    assert out[d3].n_sessions == 1 and out[d3].max_concurrent == 1


def test_dedup_index_append_and_resubmit_idempotence(spark, tmp_path):
    """The standing-index maintenance contract: appending a batch's docs
    (append_to_dedup_index) yields the same index as building the union
    from scratch, and RESUBMITTING an already-indexed batch flags every
    doc as a self-duplicate (jaccard 1.0) — the idempotence guarantee an
    ongoing pipeline relies on to never re-admit a crawled batch."""
    from azeroth_data_platform_spark.operators import dedup

    unit = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    mk = lambda i, txt: (i, txt, "en", "web", len(txt))  # noqa: E731
    batch_a = spark.createDataFrame(
        [mk(10, unit * 6), mk(20, "totally different words about spark plans here today")],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    batch_b = spark.createDataFrame(
        [mk(31, unit * 8), mk(32, "unrelated fresh content nothing shared with others at all")],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    idx_dir = str(tmp_path / "standing_index")
    for name, df in dedup.build_dedup_index(batch_a).items():
        df.write.parquet(f"{idx_dir}/{name}")
    # run batch B against the standing index: 31 matches indexed 10
    index = dedup.read_dedup_index(spark, idx_dir)
    hits = {
        (r.d_new, r.d_ref): r.jaccard
        for r in dedup.incremental_dedup_indexed(batch_b, index).collect()
    }
    assert hits == {(31, 10): 1.0}
    # append B's docs, then RESUBMIT batch B: every doc must now be
    # flagged against its own indexed copy
    dedup.append_to_dedup_index(idx_dir, batch_b)
    index2 = dedup.read_dedup_index(spark, idx_dir)
    again = {
        (r.d_new, r.d_ref): r.jaccard
        for r in dedup.incremental_dedup_indexed(batch_b, index2).collect()
    }
    assert (31, 31) in again and again[(31, 31)] == 1.0
    assert (32, 32) in again and again[(32, 32)] == 1.0
    # appended index == union index built from scratch
    union = dedup.build_dedup_index(batch_a.unionAll(batch_b))
    for name in ("bands", "shingles", "sizes"):
        got = sorted(map(tuple, index2[name].collect()))
        want = sorted(map(tuple, union[name].collect()))
        assert got == want, name


def test_lsh_recall_report_invariants_and_consistency(spark, sf_dir):
    """tp <= candidates, tp <= truth; the counts agree with the standalone
    dd_minhash_lsh / dd_ngram_jaccard queries on the same corpus; ppm
    values are the exact truncated rationals."""
    from azeroth_data_platform_spark import harness

    row = harness.ALL_QUERIES["dd_recall_report"](spark, sf_dir).collect()[0]
    assert row.n_true_candidates <= row.n_candidates
    assert row.n_true_candidates <= row.n_true_pairs
    n_true = harness.ALL_QUERIES["dd_ngram_jaccard"](spark, sf_dir).count()
    n_tp = harness.ALL_QUERIES["dd_minhash_lsh"](spark, sf_dir).count()
    assert row.n_true_pairs == n_true
    assert row.n_true_candidates == n_tp
    if row.n_candidates:
        assert row.precision_ppm == 10**6 * row.n_true_candidates // row.n_candidates
    if row.n_true_pairs:
        assert row.recall_ppm == 10**6 * row.n_true_candidates // row.n_true_pairs
    assert row.missed_pairs == row.n_true_pairs - row.n_true_candidates


def test_dup_stats_by_source_planted(spark):
    """Planted corpus: source A holds an exact twin PAIR (both counted),
    source B holds a cross-source exact twin of an A doc (cross-source
    duplication counts — the point of the report), near-dups count under
    the minhash verify, clean sources read zero; ppm is the exact
    truncated rational."""
    from azeroth_data_platform_spark.operators.dedup import (
        dup_stats_by_source,
    )

    unit = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    same = unit * 6
    near = unit * 8  # same distinct shingle set -> jaccard 1.0 pair
    docs = spark.createDataFrame(
        [
            (1, same, "en", "A", len(same)),
            (2, same, "en", "A", len(same)),          # exact twin of 1
            (3, same, "en", "B", len(same)),          # cross-source twin
            (4, near, "en", "B", len(near)),          # near-dup of 1/2/3
            (5, "totally different words about spark plans here today", "en", "C", 50),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.source: r for r in dup_stats_by_source(docs).collect()}
    assert out["A"].n_docs == 2 and out["A"].n_exact_dup == 2
    assert out["A"].exact_dup_ppm == 1_000_000
    assert out["B"].n_exact_dup == 1  # doc 3's twins live in source A
    assert out["B"].exact_dup_ppm == 500_000
    # docs 1,2,3,4 share shingle sets -> all appear in near-dup pairs
    assert out["A"].n_near_dup == 2 and out["B"].n_near_dup == 2
    assert out["C"].n_exact_dup == 0 and out["C"].n_near_dup == 0
    assert out["C"].exact_dup_ppm == 0 and out["C"].near_dup_ppm == 0


def test_facet_counts_partition_of_catalog(spark, sf_dir):
    """Each facet's counts partition the catalog (sum == item count, even
    with NULL facet values); values agree with per-facet groupBys; one
    Expand pass, not a union of scans."""
    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.operators import adapters

    dim = adapters.dim_items(spark, sf_dir)
    total = dim.count()
    out = harness.ALL_QUERIES["o14_facet_counts"](spark, sf_dir)
    rows = out.collect()
    for facet in ("quality", "item_class"):
        got = {r.value: r.n_items for r in rows if r.facet == facet}
        assert sum(got.values()) == total
        want = {
            str(r[facet]) if r[facet] is not None else None: r["count"]
            for r in dim.groupBy(facet).count().collect()
        }
        assert got == want
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "Expand" in plan
    assert "Union" not in plan  # one pass, not N per-facet scans
    assert plan.count("FileScan parquet") == 1
