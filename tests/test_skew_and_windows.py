"""Salted aggregation equivalence + sessionization unit semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azeroth_data_platform_spark.functions.numerics import dec
from azeroth_data_platform_spark.functions.skew import salted_sum
from azeroth_data_platform_spark.operators.windows import sessionize


def test_salted_sum_bit_identical_to_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # partials must stay decimal through BOTH phases — casting a partial to
    # double would reintroduce order-dependence, defeating the point
    sums = {
        "revenue": F.sum(dec("l_extendedprice", 2)),
        "qty": F.sum(F.col("l_quantity").cast("bigint")),
    }
    direct = (
        li.groupBy("l_returnflag")
        .agg(*[c.alias(n) for n, c in sums.items()])
        .collect()
    )
    salted = salted_sum(li, ["l_returnflag"], sums, buckets=8).collect()
    d = {r.l_returnflag: (float(r.revenue), r.qty) for r in direct}
    s = {r.l_returnflag: (float(r.revenue), r.qty) for r in salted}
    assert d == s  # exact decimal accumulation ⇒ salting is bit-invisible


def test_sessionize_gap_semantics(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, t0, "view", 1.0),
        (2, 7, t0 + dt.timedelta(minutes=10), "click", 2.0),
        (3, 7, t0 + dt.timedelta(minutes=50), "view", 3.0),  # 40min gap → new session
        (4, 8, t0, "view", 4.0),  # other user: own session numbering
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {(r.user_id, r.session_seq): r for r in sessionize(ev, gap_minutes=30).collect()}
    assert len(out) == 3
    assert out[(7, 0)].n_events == 2 and out[(7, 0)].session_value == 3.0
    assert out[(7, 1)].n_events == 1 and out[(7, 1)].session_start == t0 + dt.timedelta(minutes=50)
    assert out[(8, 0)].n_events == 1


def test_approx_sketches_within_tolerance(spark, sf_dir):
    """Sketch aggregates (HLL distinct, approx quantile) can't be
    oracle-hash-checked across engines, so their accuracy contract is
    pinned here instead: within standard error of exact."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("p50a"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05  # HLL default rsd 5%
    assert abs(row.p50a - row.p50) / row.p50 < 0.02


def test_group_percentiles_match_python_reference(spark):
    """Exact discrete percentiles: value at rank ceil(q*n), checked against
    a python model including the n=1 and all-equal edge cases."""
    import math

    from azeroth_data_platform_spark.operators import windows

    rows = (
        [(i, "a", float(i)) for i in range(1, 101)]  # 1..100
        + [(200, "b", 7.0)]  # singleton group
        + [(300 + i, "c", 5.0) for i in range(4)]  # all equal
    )
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.event_type: r for r in windows.group_percentiles(ev).collect()}
    for g, vals in {
        "a": [float(i) for i in range(1, 101)],
        "b": [7.0],
        "c": [5.0] * 4,
    }.items():
        n = len(vals)
        assert out[g].n_events == n
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert getattr(out[g], col) == sorted(vals)[math.ceil(q * n) - 1], (g, col)


def test_funnel_strict_ordering_semantics(spark):
    """Ordered-funnel contract: a step counts only when it happens STRICTLY
    after the previous step's first completion; out-of-order events don't."""
    from azeroth_data_platform_spark.operators.windows import funnel

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, etype, minutes):
        return (uid, etype, t0 + dt.timedelta(minutes=minutes))

    rows = [
        # u1 completes the whole funnel in order
        ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 10),
        # u2: click BEFORE the first view → click must not count
        ev(2, "click", 0), ev(2, "view", 5),
        # u3: purchase before click → only view+click count
        ev(3, "view", 0), ev(3, "purchase", 1), ev(3, "click", 2),
        # u4: click at the SAME instant as view → strict ordering rejects it
        ev(4, "view", 0), ev(4, "click", 0),
        # u5: no view at all → enters no step
        ev(5, "purchase", 0),
        # u6: later click still chains after an early view
        ev(6, "click", 0), ev(6, "view", 1), ev(6, "click", 2),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["step"]: (r["users"], r["conversion_pct"]) for r in funnel(df).collect()}
    assert got["view"] == (5, 1.0)        # u1,u2,u3,u4,u6
    assert got["click"] == (3, 3 / 5)     # u1,u3,u6
    assert got["purchase"] == (1, 1 / 5)  # u1 only


def test_skew_report_x_uniform_no_bigint_overflow(spark):
    """x_uniform_ppm stages 1e6·c·n_keys through 128-bit integers
    (DECIMAL(38,0) + `DIV` in Spark, HUGEINT + `//` in DuckDB): in
    BIGINT the product wraps (Spark, non-ANSI) or raises (DuckDB) once
    c·n_keys > ~9.2e12 — the 100 TB hot-key regime. Pin the literal
    expressions each engine uses, on probes that would detect BOTH
    historical failure modes:

    - floor(decimal / bigint) in Spark rounds HALF_UP to the result
      scale BEFORE floor → off by one when the true fractional part is
      ≥ 1 − 5e-7 (probe 2: true quotient 2999999.99999995).
    - DECIMAL(38,0)/BIGINT in DuckDB executes as DOUBLE → inexact once
      the product exceeds 2^53 (probe 3: 90071992547409931·1e6/1e6 is
      not double-representable; a DOUBLE path yields ...409936)."""
    import duckdb

    spark_expr = (
        "CAST(CAST(1000000 AS DECIMAL(38,0)) * c * n_keys DIV total"
        " AS BIGINT) AS x"
    )
    duck_expr = (
        "CAST(CAST(1000000 AS HUGEINT) * c * n_keys // total"
        " AS BIGINT) AS x"
    )
    probes = [
        # (c, n_keys, total, exact x_uniform_ppm)
        (10000000, 1000000, 20000000, 500_000_000_000),  # BIGINT-overflow regime
        (59999999999999, 1, 20000000000000, 2_999_999),  # HALF_UP-floor trap
        (90071992547409931, 1, 1000000, 90071992547409931),  # >2^53, non-double
    ]
    for c, n_keys, total, want in probes:
        got_s = spark.sql(
            f"SELECT {spark_expr} FROM VALUES (CAST({c} AS BIGINT),"
            f" CAST({n_keys} AS BIGINT), CAST({total} AS BIGINT))"
            " AS t(c, n_keys, total)"
        ).collect()[0].x
        got_d = duckdb.sql(
            f"SELECT {duck_expr} FROM (SELECT CAST({c} AS BIGINT) c,"
            f" CAST({n_keys} AS BIGINT) n_keys, CAST({total} AS BIGINT) total)"
        ).fetchone()[0]
        assert got_s == want, (c, n_keys, total, got_s)
        assert got_d == want, (c, n_keys, total, got_d)
    # and the old BIGINT form is genuinely out of range there (sanity)
    import pytest as _pytest
    with _pytest.raises(Exception):
        duckdb.sql(
            "SELECT CAST(1000000 * 10000000 * CAST(1000000 AS BIGINT)"
            " // 20000000 AS BIGINT)"
        ).fetchone()


def test_zipf_fit_expressions_exact_in_100tb_regime(spark):
    """The zipf slope/intercept expressions stage through 128-bit integers
    and truncate rationals in integer space. Probe the exact literal
    expressions both engines use in the regime where the OLD forms broke:
    y = plog2(c) micro-bits of a 1e12-count token makes n·Σxy and Σx·Σy
    exceed 2^63 (BIGINT wrap — the 100 TB top-token regime), and the old
    DECIMAL(18,12)-of-double quantizer is engine-divergent on rational
    outputs (the abtest_welch fuzz finding)."""
    import duckdb

    from azeroth_data_platform_spark.operators.textstats import (
        _zipf_intercept_sql,
        _zipf_slope_sql,
    )

    # k=200-point fit with 100TB-scale magnitudes: x ~ log2(rank) ≤ 7.6e6
    # micro-bits, y ~ log2(1e15 counts) ≈ 5e7 micro-bits
    n, sx, sy = 200, 764_000_000, 10_000_000_000
    sxy, sxx = 76_000_000_000_000_000, 3_300_000_000_000_000
    # sanity: the old BIGINT products genuinely wrap here
    assert n * sxy > 2**63 or sx * sy > 2**63

    lit = (
        f"(SELECT CAST({n} AS BIGINT) n, CAST({sx} AS BIGINT) sx,"
        f" CAST({sy} AS BIGINT) sy, CAST({sxy} AS BIGINT) sxy,"
        f" CAST({sxx} AS BIGINT) sxx)"
    )
    got_s = spark.sql(
        f"SELECT {_zipf_slope_sql(duck=False)} AS s,"
        f" {_zipf_intercept_sql(duck=False)} AS i FROM {lit} AS fit"
    ).collect()[0]
    got_d = duckdb.sql(
        f"SELECT {_zipf_slope_sql(duck=True)} AS s,"
        f" {_zipf_intercept_sql(duck=True)} AS i FROM {lit} fit"
    ).fetchone()
    assert got_s.s == got_d[0], (got_s.s, got_d[0])
    assert got_s.i == got_d[1], (got_s.i, got_d[1])
    # truncated exact rational, independently recomputed in Python ints
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    want_slope_e12 = (abs(num) * 10**12 // den) * (1 if num >= 0 else -1)
    assert got_s.s == want_slope_e12 / 1e12


def test_welch_significant_integer_exact_at_boundary(spark):
    """r9: the `significant` flag is decided by the division-staged
    integer t² comparison (welch_significant_sql), not the q12 double.
    Pin the literal expressions both engines use on aggregate probes at
    the decision boundary:

    - probe 1: t = 49/25 EXACTLY (cohorts {0,50} vs {74,74} cents) —
      strict > must say False.
    - probe 2: t = 1.96 + 4.3e-13, BELOW the q12 quantum — the q12
      device rounds the double to 1.960000000000 and answers False; the
      integer comparison answers True (Fraction-verified below).
    - probe 3/4: both variances zero — defined verdicts now (D=0 →
      False, D≠0 → True; the old NaN path was engine-dependent).
    - probe 5: guard-tripping sxx (> 1e28) falls back to q12 without
      error, identically in both engines."""
    import duckdb
    from fractions import Fraction

    from azeroth_data_platform_spark.operators.windows import (
        welch_significant_sql,
    )

    probes = [
        # (n_a, n_b, sx_a, sx_b, sxx_a, sxx_b, expected)
        (2, 2, 50, 148, 2500, 10952, False),                      # t == 49/25
        (10001, 10001, 32624, 3126, 113346348, 113240903, True),  # t = 1.96+4e-13
        (3, 3, 300, 300, 30000, 30000, False),                    # 0/0 -> False
        (3, 3, 600, 300, 120000, 30000, True),                    # inf t -> True
        (2, 2, 50, 148, 10**30, 10952, None),                     # guard trip
    ]
    # independent truth for the first four: exact rational t^2 vs (49/25)^2
    for n_a, n_b, sx_a, sx_b, sxx_a, sxx_b, want in probes[:4]:
        D = sx_a * n_b - sx_b * n_a
        Va = n_a * sxx_a - sx_a * sx_a
        Vb = n_b * sxx_b - sx_b * sx_b
        denom = Va * n_b * n_b * (n_b - 1) + Vb * n_a * n_a * (n_a - 1)
        lhs = Fraction(625 * D * D * (n_a - 1) * (n_b - 1), 1)
        assert (lhs > 2401 * denom) == want, (n_a, sx_a, "truth mismatch")

    for n_a, n_b, sx_a, sx_b, sxx_a, sxx_b, want in probes:
        lit_s = (
            f"SELECT {welch_significant_sql(duck=False)} AS s FROM VALUES"
            f" (CAST({n_a} AS BIGINT), CAST({n_b} AS BIGINT),"
            f" CAST({sx_a} AS BIGINT), CAST({sx_b} AS BIGINT),"
            f" CAST({sxx_a} AS DECIMAL(38,0)), CAST({sxx_b} AS DECIMAL(38,0)))"
            " AS t(n_a, n_b, sx_a, sx_b, sxx_a, sxx_b)"
        )
        lit_d = (
            f"SELECT {welch_significant_sql(duck=True)} AS s FROM (SELECT"
            f" CAST({n_a} AS BIGINT) n_a, CAST({n_b} AS BIGINT) n_b,"
            f" CAST({sx_a} AS BIGINT) sx_a, CAST({sx_b} AS BIGINT) sx_b,"
            f" CAST({sxx_a} AS HUGEINT) sxx_a, CAST({sxx_b} AS HUGEINT) sxx_b)"
        )
        got_s = spark.sql(lit_s).collect()[0].s
        got_d = duckdb.sql(lit_d).fetchone()[0]
        assert got_s == got_d, (n_a, sx_a, got_s, got_d)
        if want is not None:
            assert got_s == want, (n_a, sx_a, got_s)


def test_welch_display_degenerate_inputs_agree(spark):
    """r10 (verdict #6): the welch_t DISPLAY column (q12-quantized double)
    on degenerate inputs — the decision column is integer-exact, the
    display keeps q12, and this pins that the display's degenerate
    handling agrees cross-engine:

    - zero-variance-both cohorts: the raw division by zero DIVERGES
      (Spark 4 ANSI default raises DIVIDE_BY_ZERO, DuckDB yields NULL),
      so welch_t_raw_sql NULLIF-guards the divisor — the display must be
      NULL in both engines, never an error or an inf->DECIMAL cast;
    - exact rational t (t = 49/25 from the significance boundary probe):
      identical IEEE expression tree -> bit-identical double -> same q12
      value.
    """
    import duckdb

    from azeroth_data_platform_spark.operators.windows import welch_t_raw_sql

    q12 = lambda e: f"CAST(CAST({e} AS DECIMAL(18,12)) AS DOUBLE)"  # noqa: E731
    probes = [
        # (n_a, n_b, sx_a, sx_b, sxx_a, sxx_b, want) — want None = NULL
        (3, 3, 300, 300, 30000, 30000, None),   # both variances zero, D=0
        (3, 3, 600, 300, 120000, 30000, None),  # variance zero, D!=0 (inf t)
        (2, 2, 50, 148, 2500, 10952, -1.96),    # exact |t| = 49/25
    ]
    for n_a, n_b, sx_a, sx_b, sxx_a, sxx_b, want in probes:
        lit_s = (
            f"SELECT {q12(welch_t_raw_sql())} AS t FROM VALUES"
            f" (CAST({n_a} AS BIGINT), CAST({n_b} AS BIGINT),"
            f" CAST({sx_a} AS BIGINT), CAST({sx_b} AS BIGINT),"
            f" CAST({sxx_a} AS DECIMAL(38,0)), CAST({sxx_b} AS DECIMAL(38,0)))"
            " AS t(n_a, n_b, sx_a, sx_b, sxx_a, sxx_b)"
        )
        lit_d = (
            f"SELECT {q12(welch_t_raw_sql())} AS t FROM (SELECT"
            f" CAST({n_a} AS BIGINT) n_a, CAST({n_b} AS BIGINT) n_b,"
            f" CAST({sx_a} AS BIGINT) sx_a, CAST({sx_b} AS BIGINT) sx_b,"
            f" CAST({sxx_a} AS HUGEINT) sxx_a, CAST({sxx_b} AS HUGEINT) sxx_b)"
        )
        got_s = spark.sql(lit_s).collect()[0].t
        got_d = duckdb.sql(lit_d).fetchone()[0]
        assert got_s == got_d or (got_s is None and got_d is None), (
            n_a, sx_a, got_s, got_d,
        )
        if want is None:
            assert got_s is None, (n_a, sx_a, got_s)
        else:
            assert got_s == want, (n_a, sx_a, got_s)
