"""Sketch laws (operators/sketches.py): HLL merge/accuracy, CMS guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azeroth_data_platform_spark import harness
from azeroth_data_platform_spark.operators import sketches


@pytest.fixture(scope="module")
def silver(spark, sf_dir):
    df = harness._silver(spark, sf_dir).cache()
    yield df
    df.unpersist()  # cached plans would pollute later plan-shape tests


def _est(df):
    return {r["grp"]: r["n_est"] for r in df.collect()}


def test_hll_merge_equals_whole_data_sketch(spark, silver):
    """Sketch union law: states built per partition-slice and merged give
    the IDENTICAL registers (hence identical estimate) as one pass over
    everything — what makes the sketch a day-over-day maintainable state."""
    parts = [silver.where(F.col("id") % 3 == i) for i in range(3)]
    merged = sketches.hll_merge(
        *[sketches.hll_state(p, "time_left", "item_id") for p in parts]
    )
    whole = sketches.hll_state(silver, "time_left", "item_id")
    m = {(r["grp"], r["register"]): r["m_j"] for r in merged.collect()}
    w = {(r["grp"], r["register"]): r["m_j"] for r in whole.collect()}
    assert m == w
    assert _est(sketches.hll_estimate(merged)) == _est(sketches.hll_estimate(whole))


def test_hll_estimate_within_expected_error(spark, silver):
    """m=256 gives ~1.04/√m ≈ 6.5% typical error; assert a 3σ-ish bound."""
    for r in sketches.hll_distinct(silver, "time_left", "item_id").collect():
        assert abs(r["rel_err"]) < 0.20, (r["time_left"], r["rel_err"])


def test_hll_linear_counting_small_cardinality(spark):
    """Tiny cardinalities take the linear-counting branch and stay tight."""
    df = spark.createDataFrame(
        [("g", i) for i in range(30)], "grp_col string, key long"
    )
    row = sketches.hll_distinct(df, "grp_col", "key").collect()[0]
    assert row["n_exact"] == 30
    assert abs(row["rel_err"]) < 0.15


def test_cms_never_undercounts(spark, sf_dir):
    """CMS point estimates are one-sided: estimate ≥ truth, always."""
    docs = harness._docs(spark, sf_dir)
    for r in sketches.cms_top_terms(docs, k=50).collect():
        assert r["overcount"] >= 0, r


def test_cms_top_terms_tight_on_heavy_keys(spark, sf_dir):
    """Heavy hitters dominate their buckets; overcount stays a small
    fraction of the true count for the corpus's top terms."""
    docs = harness._docs(spark, sf_dir)
    rows = sketches.cms_top_terms(docs, k=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_cms"] - r["n_exact"] <= max(50, r["n_exact"]), r


def test_histogram_quantiles_within_one_bucket_of_exact(spark, sf_dir):
    """Histogram read-off error is bounded by one bucket width (1/SCALE),
    upper-edge biased: exact_q <= hist_q < exact_q + 1/SCALE + ulp."""
    from azeroth_data_platform_spark.operators import profiling, windows

    ev = harness._events_ts(spark, sf_dir)
    hist = {r["event_type"]: r for r in profiling.histogram_quantiles(ev).collect()}
    exact = {r["event_type"]: r for r in windows.group_percentiles(ev).collect()}
    width = 1.0 / profiling.HIST_SCALE
    for et, h in hist.items():
        for q in ("50", "90", "99"):
            e = exact[et][f"p{q}"]
            g = h[f"q{q}"]
            assert e <= g + 1e-9 and g <= e + width + 1e-9, (et, q, e, g)


def test_table_stats_profile_values(spark, sf_dir):
    """Spot-check the exact profile against direct aggregates."""
    from azeroth_data_platform_spark.operators import profiling
    from azeroth_data_platform_spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    stats = {r["column"]: r for r in profiling.table_stats(li).collect()}
    n = li.count()
    assert stats["l_partkey"]["n_rows"] == n
    assert stats["l_partkey"]["n_distinct"] == li.select("l_partkey").distinct().count()
    assert stats["l_returnflag"]["min_num"] is None
    assert stats["l_returnflag"]["avg_str_len"] == 1.0
    assert stats["l_quantity"]["null_frac"] == 0.0
