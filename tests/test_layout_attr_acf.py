"""Unit/property tests for the round-8 third-session operators:
last-touch attribution (windows.py), exact-ppm autocorrelation
(timeseries.py), and the z-order layout report (layout.py) — each checked
against a pure-Python reference on inputs the fixed corpus cannot
produce (same-microsecond ties, lookback boundaries, anticorrelated
series, single-pair lags), plus the plan shapes we rely on at scale.
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azeroth_data_platform_spark import harness
from azeroth_data_platform_spark.operators import layout, timeseries, windows

D0 = dt.date(1992, 1, 1)
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- last-touch attribution ---------------------------------------------------


def _ev(eid, uid, ts, etype, value=10.0):
    return (eid, uid, ts, etype, float(value))


EV_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"


def test_attribution_semantics(spark):
    h = dt.timedelta(hours=1)
    d = dt.timedelta(days=1)
    rows = [
        # user 1: view -> purchase (attributes to view)
        _ev(1, 1, T0, "view"),
        _ev(2, 1, T0 + h, "purchase", 5.0),
        # user 2: purchase with no prior event at all -> direct
        _ev(3, 2, T0, "purchase", 7.0),
        # user 3: click 8 days before purchase -> outside lookback -> direct
        _ev(4, 3, T0, "click"),
        _ev(5, 3, T0 + 8 * d, "purchase", 1.0),
        # user 4: click then purchase then ANOTHER purchase 1h later —
        # both attribute to the click (a purchase is never a touch)
        _ev(6, 4, T0, "click"),
        _ev(7, 4, T0 + h, "purchase", 2.0),
        _ev(8, 4, T0 + 2 * h, "purchase", 3.0),
        # user 5: same-microsecond view(9) and click(10) — event_id
        # breaks the tie, so the later event_id (click) is the last touch
        _ev(9, 5, T0, "view"),
        _ev(10, 5, T0, "click"),
        _ev(11, 5, T0 + h, "purchase", 4.0),
        # user 6: touch exactly AT the lookback boundary still attributes
        _ev(12, 6, T0, "signup"),
        _ev(13, 6, T0 + 7 * d, "purchase", 6.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {
        r["channel"]: r
        for r in windows.last_touch_attribution(df).collect()
    }
    assert set(out) == {"view", "direct", "click", "signup"}
    assert out["view"]["n_conversions"] == 1
    assert out["view"]["attributed_value"] == 5.0
    assert out["direct"]["n_conversions"] == 2
    assert out["direct"]["attributed_value"] == 8.0
    assert out["direct"]["n_users"] == 2
    assert out["click"]["n_conversions"] == 3  # users 4 (2x) and 5
    assert out["click"]["n_users"] == 2
    assert out["click"]["attributed_value"] == 9.0
    assert out["signup"]["n_conversions"] == 1
    # exact-ppm shares over 7 total conversions (truncated rationals)
    assert out["view"]["share_ppm"] == 1_000_000 * 1 // 7
    assert out["click"]["share_ppm"] == 1_000_000 * 3 // 7
    assert out["direct"]["share_ppm"] == 1_000_000 * 2 // 7


def test_attribution_plan_single_user_exchange(spark, sf_dir):
    """ONE user_id exchange hosts both IGNORE-NULLS frames, the events
    parquet is scanned exactly once (the grand total is a window over
    the channel aggregate, not a second aggregate subtree), and no join
    appears anywhere."""
    import re

    df = harness.QUERIES["w_attribution"](spark, sf_dir)
    plan = _plan(df)
    user_ex = re.findall(r"Exchange hashpartitioning\(user_id#\d+L?, \d+\)", plan)
    assert len(user_ex) <= 1
    assert plan.count("events.parquet") == 1
    assert "CartesianProduct" not in plan
    assert "Join" not in plan


# --- autocorrelation ----------------------------------------------------------


def _ref_acf(prices_by_item, max_lag=3):
    """Pure-Python ACF in exact integer arithmetic (prices in cents,
    ordered by date), mirroring the operator's truncation contract."""
    expected = {}
    for item, series in prices_by_item.items():
        xs = [x for _, x in sorted(series)]
        n = len(xs)
        s = sum(xs)
        den = n * n * sum(x * x for x in xs) - n * s * s
        for k in range(1, max_lag + 1):
            pairs = list(zip(xs, xs[k:]))
            c = len(pairs)
            if c < 2 or den <= 0:
                continue
            p = sum(a * b for a, b in pairs)
            sa = sum(a for a, _ in pairs)
            sb = sum(b for _, b in pairs)
            num = n * n * p - n * s * (sa + sb) + c * s * s
            ppm = (
                1_000_000 * num // den
                if num >= 0
                else -((1_000_000 * -num) // den)
            )
            expected[(item, k)] = (n, c, ppm)
    return expected


acf_series = st.dictionaries(
    st.integers(1, 3),  # item ids
    st.lists(
        st.tuples(st.integers(0, 59), st.integers(1, 10_000)),  # (day, cents)
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(acf_series)
def test_acf_matches_reference(spark, by_item):
    rows = [
        (item, D0 + dt.timedelta(days=day), cents / 100.0, 1)
        for item, series in by_item.items()
        for day, cents in series
    ]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    got = {
        (r["item_id"], r["lag"]): (r["n_days"], r["n_pairs"], r["acf_ppm"])
        for r in timeseries.autocorrelation(df).collect()
    }
    assert got == _ref_acf(by_item)


def test_acf_constant_series_has_zero_denominator(spark):
    rows = [(1, D0 + dt.timedelta(days=i), 5.0, 1) for i in range(10)]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    assert timeseries.autocorrelation(df).count() == 0


def test_acf_anticorrelated_series_is_negative(spark):
    # strict alternation -> lag-1 ACF close to -1, lag-2 close to +1
    rows = [
        (1, D0 + dt.timedelta(days=i), 10.0 if i % 2 == 0 else 20.0, 1)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    got = {r["lag"]: r["acf_ppm"] for r in timeseries.autocorrelation(df).collect()}
    assert got[1] < -900_000
    assert got[2] > 900_000


def test_acf_plan_single_item_exchange(spark, sf_dir):
    """The lead windows and the per-item aggregate share ONE item_id
    exchange (groupBy key == window partition key)."""
    import re

    df = harness.QUERIES["a16_autocorrelation"](spark, sf_dir)
    plan = _plan(df)
    item_only = re.findall(r"Exchange hashpartitioning\(item_id#\d+L?, \d+\)", plan)
    assert len(item_only) <= 1
    assert "CartesianProduct" not in plan


# --- z-order layout -----------------------------------------------------------


def _morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_matches_python_reference(spark):
    rows = [
        (item, D0 + dt.timedelta(days=day), 1.0, 1)
        for item in (0, 1, 7, 255, 256, 65535, 65536, 123456)
        for day in (0, 1, 63, 64, 4095)
    ]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    got = {
        r["zorder_shard"]: (r["n_rows"], r["item_lo"], r["item_hi"], r["z_lo"], r["z_hi"])
        for r in layout.zorder_layout(df).collect()
    }
    ref = defaultdict(list)
    for item, date, _, _ in rows:
        day = (date - D0).days
        z = _morton(item & 0xFFFF, day & 0xFFFF)
        ref[z >> 16].append((item, z))
    exp = {
        shard: (
            len(vals),
            min(i for i, _ in vals),
            max(i for i, _ in vals),
            min(z for _, z in vals),
            max(z for _, z in vals),
        )
        for shard, vals in ref.items()
    }
    assert got == exp


def test_zorder_curve_is_injective(spark):
    """Distinct (item16, day16) pairs map to distinct curve values —
    pinned over a small exhaustive grid through the SQL expression
    itself (not the Python mirror)."""
    df = spark.range(0, 1024).selectExpr(
        "CAST(id DIV 32 AS BIGINT) AS item16", "CAST(id % 32 AS BIGINT) AS day16"
    )
    z = df.selectExpr(f"{layout.morton_expr('item16', 'day16')} AS z")
    assert z.distinct().count() == 1024


def test_zorder_out_of_domain_date_fails_loudly(spark):
    """A snapshot_date before Z_EPOCH (or past the 16-bit day range) must
    raise, not silently wrap through the & mask onto another curve cell
    (two's-complement aliasing)."""
    import pytest

    for bad_day in (-1, 65536):
        df = spark.createDataFrame(
            [(7, D0 + dt.timedelta(days=bad_day), 1.0, 1)],
            "item_id long, snapshot_date date, unit_price double, quantity long",
        )
        with pytest.raises(Exception, match="day16 domain violation"):
            layout.zorder_layout(df).collect()


def test_zorder_plan_single_aggregate_exchange(spark, sf_dir):
    """The curve is a row-local projection: one map-combinable shard
    aggregate, no joins, no windows."""
    df = harness.QUERIES["x_zorder_layout"](spark, sf_dir)
    plan = _plan(df)
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "Window" not in plan


# --- activity bitmap ----------------------------------------------------------


def test_activity_bitmap_semantics(spark):
    """Masks, popcounts, and both streak extractions against hand-built
    expectations, including anchor-day activity, a gap pattern, and
    out-of-window rows."""
    from azeroth_data_platform_spark.operators import bitmaps

    anchor = dt.date(1992, 6, 1)
    # item 1: active on idx {0,1,2,5} -> mask 0b100111 = 39
    # item 2: active on idx {3} only -> no current streak
    # item 3: active on idx {1,2,3,4} -> longest 4, current 0
    # item 4: active 40 days ago -> out of window, absent
    days = {1: (0, 1, 2, 5), 2: (3,), 3: (1, 2, 3, 4), 4: (40,)}
    rows = [
        (item, anchor - dt.timedelta(days=i), 1.0, 1)
        for item, idxs in days.items()
        for i in idxs
    ] + [(1, anchor, 2.0, 1)]  # duplicate day: bit_or must be idempotent
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    got = {r["item_id"]: r for r in bitmaps.activity_bitmap(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["mask"] == 0b100111
    assert (got[1]["days_active"], got[1]["active_last7"]) == (4, 4)
    assert (got[1]["current_streak"], got[1]["longest_streak"]) == (3, 3)
    assert got[2]["mask"] == 0b1000
    assert (got[2]["current_streak"], got[2]["longest_streak"]) == (0, 1)
    assert got[3]["mask"] == 0b11110
    assert (got[3]["current_streak"], got[3]["longest_streak"]) == (0, 4)


def test_activity_bitmap_full_window_streak(spark):
    """A fully-active window must report streak 28 of 28 (the chain's
    last link) and survive the bit-63-free contract."""
    from azeroth_data_platform_spark.operators import bitmaps

    anchor = dt.date(1992, 6, 1)
    rows = [(9, anchor - dt.timedelta(days=i), 1.0, 1) for i in range(28)]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    [r] = bitmaps.activity_bitmap(df).collect()
    assert r["mask"] == (1 << 28) - 1
    assert r["days_active"] == 28
    assert r["current_streak"] == 28
    assert r["longest_streak"] == 28


def test_activity_bitmap_plan_map_combinable(spark, sf_dir):
    """bit_or partial-aggregates before its single item exchange; the
    anchor stays a broadcast, the streak chain stays a projection."""
    df = harness.QUERIES["x_activity_bitmap"](spark, sf_dir)
    plan = _plan(df)
    assert "partial_" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# --- day-of-week seasonal baseline ---------------------------------------------


def test_dow_baseline_semantics(spark):
    """A sector that is reliably more expensive on one weekday must flag
    exactly the day that breaks ITS OWN weekday pattern — not the merely
    expensive weekday itself."""
    from azeroth_data_platform_spark.operators import timeseries

    monday = dt.date(1992, 1, 6)
    rows = []
    # sector A floor price: 100 on Mondays, 200 on Tuesdays, 6 weeks —
    # then week 7 has a 500 Tuesday (the true seasonal outlier) and a
    # perfectly normal 200 Tuesday would NOT flag
    for wk in range(6):
        rows.append((1, monday + dt.timedelta(weeks=wk), 1.00, 1))
        rows.append((2, monday + dt.timedelta(weeks=wk, days=1), 2.00, 1))
    rows.append((1, monday + dt.timedelta(weeks=6), 1.00, 1))
    rows.append((2, monday + dt.timedelta(weeks=6, days=1), 5.00, 1))
    silver = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    dim = spark.createDataFrame([(1, "A"), (2, "A")], "item_id long, item_class string")
    out = timeseries.dow_baseline(silver, dim).collect()
    [flagged] = out
    assert flagged["snapshot_date"] == monday + dt.timedelta(weeks=6, days=1)
    assert flagged["dow"] == 1  # Tuesday
    assert flagged["price_units"] == 500
    # weekday baseline: 7 Tuesdays summing to 6*200 + 500 = 1700
    assert flagged["dow_n"] == 7
    assert flagged["dow_mean_units"] == 1700 // 7
    # dev_ppm = 1e6 * (7*500 - 1700) / 1700, truncated
    assert flagged["dev_ppm"] == 1_000_000 * (7 * 500 - 1700) // 1700


def test_dow_baseline_plan_shapes(spark, sf_dir):
    """Broadcast dim join, map-combinable sector-day pre-aggregation,
    one (sector, dow) window exchange, no sort-merge join."""
    df = harness.QUERIES["a17_dow_baseline"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_skipping_report_matches_python_reference(spark):
    """Shard stats, probe replay, and exact ppm vs a pure-Python mirror
    on a grid where z-order and linear layouts differ materially."""
    from azeroth_data_platform_spark.operators.layout import (
        LINEAR_DAYS_PER_SHARD,
        SKIP_ITEM_SAMPLE_MOD,
        Z_SHARD_SHIFT,
        skipping_report,
    )

    rows = [
        (item, D0 + dt.timedelta(days=day), 1.0, 1)
        for item in range(1, 400, 7)
        for day in range(0, 200, 3)
    ]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    got = {
        (r["layout"], r["workload"]): (
            r["n_probes"],
            r["n_shards"],
            r["scanned_pairs"],
            r["scan_ppm"],
        )
        for r in skipping_report(df).collect()
    }

    pts = {(item, (date - D0).days) for item, date, _, _ in rows}
    shards = {"linear": defaultdict(list), "zorder": defaultdict(list)}
    for item, day in pts:
        shards["linear"][day // LINEAR_DAYS_PER_SHARD].append((item, day))
        z = _morton(item & 0xFFFF, day & 0xFFFF)
        shards["zorder"][z >> Z_SHARD_SHIFT].append((item, day))
    probes = {
        "item_point": [
            (i, i, "item")
            for i in sorted({p[0] for p in pts if p[0] % SKIP_ITEM_SAMPLE_MOD == 1})
        ],
        "week_range": [
            (w, w + LINEAR_DAYS_PER_SHARD - 1, "day")
            for w in sorted({d - d % LINEAR_DAYS_PER_SHARD for _, d in pts})
        ],
    }
    for layout_name, by_shard in shards.items():
        stats = [
            (
                min(i for i, _ in v),
                max(i for i, _ in v),
                min(d for _, d in v),
                max(d for _, d in v),
            )
            for v in by_shard.values()
        ]
        for workload, plist in probes.items():
            scanned = 0
            for ilo, ihi, dlo, dhi in stats:
                for lo, hi, dim in plist:
                    if dim == "item":
                        scanned += int(ilo <= hi and ihi >= lo)
                    else:
                        scanned += int(dlo <= hi and dhi >= lo)
            exp = (
                len(plist),
                len(stats),
                scanned,
                1_000_000 * scanned // (len(plist) * len(stats)),
            )
            assert got[(layout_name, workload)] == exp, (layout_name, workload)


def test_skipping_report_plan_metadata_joins_only(spark, sf_dir):
    """The fact scan feeds ONE (layout, shard) aggregate; every join in
    the plan is between metadata-sized aggregates (broadcast), never a
    row-level self-join."""
    df = harness.QUERIES["x_skipping_report"](spark, sf_dir)
    plan = _plan(df)
    assert "partial_" in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_zorder_ranked_balances_clustered_keys(spark):
    """The regime the fixed-mask variant cannot handle: all item ids
    inside one 65536-range and all dates inside one quarter. The
    rank-normalized curve must still spread rows over many shards with
    near-balanced occupancy, and ntile must agree with the exact
    floor-balanced reference."""
    from azeroth_data_platform_spark.operators.layout import (
        zorder_layout,
        zorder_ranked,
    )

    rows = [
        (1_000_000 + item * 3, D0 + dt.timedelta(days=day), 1.0, 1)
        for item in range(64)
        for day in range(64)
    ]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    ranked = zorder_ranked(df).collect()
    fixed = zorder_layout(df).collect()
    # 64 distinct values per dim -> ntile(256) gives one rank per value
    # (a 12-bit curve), so the top-8-bit shard key yields 16 shards of
    # exactly 256 rows each; the fixed-mask variant sees the clustered
    # raw ids (1e6-range) and collapses to fewer, unbalanced shards
    assert len(ranked) == 16
    assert len(fixed) < len(ranked)
    sizes = [r["n_rows"] for r in ranked]
    assert max(sizes) == min(sizes) == 256  # 64*64 rows / 16 shards, exact
    # every shard is a small rectangle in BOTH dimensions: 16 consecutive
    # ranks per dim -> item span 15*3, day span 15
    assert max(r["day_span"] for r in ranked) <= 15
    assert max(r["item_span"] for r in ranked) <= 45


def test_zorder_ranked_plan_broadcast_rank_dims(spark, sf_dir):
    """Both rank dims join back as broadcasts; the fact side never
    shuffles for the join; one hash exchange for the shard aggregate."""
    df = harness.QUERIES["x_zorder_ranked"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_compaction_plan_conserves_rows_and_order(spark):
    """The defining invariants: Σ n_rows over planned files equals the
    input row count, files partition the shard sequence in curve order
    (no overlap, no gap), and every file except possibly the last is at
    least target-full once its first shard lands."""
    from azeroth_data_platform_spark.operators.layout import (
        COMPACT_TARGET_ROWS,
        compaction_plan,
    )

    rows = [
        (item, D0 + dt.timedelta(days=day), 1.0, 1)
        for item in range(1, 300, 2)
        for day in range(0, 120, 2)
    ]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    plan = compaction_plan(df).collect()
    assert sum(r["n_rows"] for r in plan) == len(rows)
    # files cover the shard range in order without overlap
    for prev, cur in zip(plan, plan[1:]):
        assert prev["shard_hi"] < cur["shard_lo"]
        assert prev["out_file"] < cur["out_file"]
    # exclusive-prefix packing: every file but the last closes at or
    # past the target (its last shard straddles the boundary)
    for r in plan[:-1]:
        assert r["n_rows"] >= 1
        assert r["fill_ppm"] == 1_000_000 * r["n_rows"] // COMPACT_TARGET_ROWS


def test_sample_allocation_hamilton_invariants(spark):
    """Hamilton apportionment: integer quotas sum EXACTLY to
    min(budget, total), no source exceeds its own doc count, and the
    leftover seats go to the largest remainders with the source-name
    tiebreak."""
    from azeroth_data_platform_spark.operators.corpus import sample_allocation

    counts = {"a": 7, "b": 11, "c": 3, "d": 23, "e": 1}
    rows = [
        (i, f"doc {i}", "en", src, 5)
        for i, src in enumerate(
            [s for s, n in counts.items() for _ in range(n)]
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    for budget in (1, 5, 17, 44, 45, 100):  # 45 = total, 100 > total
        out = {r["source"]: r for r in sample_allocation(df, budget).collect()}
        total = sum(counts.values())
        b = min(budget, total)
        assert sum(r["allocation"] for r in out.values()) == b, budget
        for src, n in counts.items():
            r = out[src]
            assert 0 <= r["allocation"] <= n, (budget, src)
            assert r["floor_quota"] == b * n // total
            assert r["remainder"] == b * n - (b * n // total) * total
        # reference Hamilton: floors + largest remainders (source tiebreak)
        floors = {s: b * n // total for s, n in counts.items()}
        rema = sorted(
            counts, key=lambda s: (-(b * counts[s] - floors[s] * total), s)
        )
        left = b - sum(floors.values())
        expect = {
            s: floors[s] + (1 if s in set(rema[:left]) else 0) for s in counts
        }
        assert {s: out[s]["allocation"] for s in counts} == expect, budget


def test_compaction_plan_shapes(spark, sf_dir):
    """Metadata-sized: the fact scan ends at the shard aggregate; the
    pack window and file aggregate run over file-count rows."""
    df = harness.QUERIES["x_compaction_plan"](spark, sf_dir)
    plan = _plan(df)
    assert "partial_" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_sample_allocation_plan_shapes(spark, sf_dir):
    """One map-combinable source rollup + broadcast grand total; the
    rank/sum windows run over the value-domain-sized source table."""
    df = harness.QUERIES["tp_sample_allocation"](spark, sf_dir)
    plan = _plan(df)
    assert "partial_" in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_multitouch_attribution_semantics(spark):
    """Hamilton credit split per conversion: equal shares, remainder to
    the most recent touches, credit conservation, and the same qualify
    rule as last-touch (strict (ts, event_id) precedence, 7-day
    lookback, 'direct' when touchless)."""
    from azeroth_data_platform_spark.operators.windows import (
        multitouch_attribution,
    )

    h = dt.timedelta(hours=1)
    d = dt.timedelta(days=1)
    rows = [
        # user 1: view, click, signup -> purchase: 1e6 split 3 ways =
        # 333333 each + 1 leftover to the MOST RECENT touch (signup)
        _ev(1, 1, T0, "view"),
        _ev(2, 1, T0 + h, "click"),
        _ev(3, 1, T0 + 2 * h, "signup"),
        _ev(4, 1, T0 + 3 * h, "purchase", 9.0),
        # user 2: no touches -> direct gets the full 1e6
        _ev(5, 2, T0, "purchase", 4.0),
        # user 3: one touch outside lookback, one inside -> only the
        # inside one credits (in full)
        _ev(6, 3, T0 - 8 * d, "view"),
        _ev(7, 3, T0, "click"),
        _ev(8, 3, T0 + h, "purchase", 2.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["channel"]: r for r in multitouch_attribution(df).collect()}
    assert set(out) == {"view", "click", "signup", "direct"}
    assert out["view"]["credit_sum_ppm"] == 333_333
    assert out["click"]["credit_sum_ppm"] == 333_333 + 1_000_000
    assert out["signup"]["credit_sum_ppm"] == 333_334  # leftover seat
    assert out["direct"]["credit_sum_ppm"] == 1_000_000
    # conservation: one million ppm per conversion, three conversions
    assert sum(r["credit_sum_ppm"] for r in out.values()) == 3_000_000
    # value credit: user 1's 9.00 -> 900 units split 299.9997/...: floor
    assert out["signup"]["value_credit_units"] == 900 * 333_334 // 1_000_000
    assert out["direct"]["value_credit_units"] == 400
    assert out["click"]["n_conversions"] == 2
    assert out["click"]["n_touchpoints"] == 2


def test_multitouch_credit_conservation_on_corpus(spark, sf_dir):
    """Grand invariant on real data: Σ credit_sum_ppm = 1e6 · total
    conversions, engine-exact by construction."""
    import pyspark.sql.functions as SF

    df = harness.QUERIES["w_attribution_multitouch"](spark, sf_dir)
    total_credit = df.agg(SF.sum("credit_sum_ppm")).collect()[0][0]
    n_conv = (
        harness._events_ts(spark, sf_dir)
        .where(SF.col("event_type") == "purchase")
        .count()
    )
    assert total_credit == 1_000_000 * n_conv


def test_multitouch_plan_single_keyed_join(spark, sf_dir):
    """The conversion->touch pairing is ONE user-keyed equi-join with a
    residual (never a cartesian); rollup is map-combinable."""
    df = harness.QUERIES["w_attribution_multitouch"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "partial_" in plan


def test_decay_attribution_semantics(spark):
    """Power-of-two decay weights with the Hamilton remainder rule: a
    same-day touch outweighs a 3-day-old one 8:1, credit conserves
    exactly, and touchless conversions stay 'direct'."""
    from azeroth_data_platform_spark.operators.windows import decay_attribution

    h = dt.timedelta(hours=1)
    d = dt.timedelta(days=1)
    rows = [
        # user 1: view 3 days before, click 1h before -> weights
        # 2^(7-3)=16 vs 2^(7-0)=128; W=144
        _ev(1, 1, T0 - 3 * d, "view"),
        _ev(2, 1, T0 - h, "click"),
        _ev(3, 1, T0, "purchase", 9.0),
        # user 2: touchless -> direct 1e6
        _ev(4, 2, T0, "purchase", 4.0),
        # user 3: touch exactly at the lookback boundary -> weight 2^0=1
        _ev(5, 3, T0 - 7 * d, "signup"),
        _ev(6, 3, T0, "purchase", 2.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["channel"]: r for r in decay_attribution(df).collect()}
    # user 1: base view = 1e6*16//144 = 111111 (rem 16), click =
    # 1e6*128//144 = 888888 (rem 128); leftover 1, larger rem -> click
    assert out["view"]["credit_sum_ppm"] == 111_111
    assert out["click"]["credit_sum_ppm"] == 888_889
    assert out["direct"]["credit_sum_ppm"] == 1_000_000
    assert out["signup"]["credit_sum_ppm"] == 1_000_000
    assert sum(r["credit_sum_ppm"] for r in out.values()) == 3_000_000
    assert out["click"]["value_credit_units"] == 900 * 888_889 // 1_000_000


def test_decay_attribution_conservation_on_corpus(spark, sf_dir):
    import pyspark.sql.functions as SF

    df = harness.ALL_QUERIES["w_attribution_decay"](spark, sf_dir)
    total_credit = df.agg(SF.sum("credit_sum_ppm")).collect()[0][0]
    n_conv = (
        harness._events_ts(spark, sf_dir)
        .where(SF.col("event_type") == "purchase")
        .count()
    )
    assert total_credit == 1_000_000 * n_conv


def test_fano_burstiness_matches_reference(spark):
    """Dispersion against hand-computed rationals: a constant series has
    Fano 0, a Poisson-ish mixed one lands at the exact truncated ppm, a
    single-day type is excluded (n < 2)."""
    from azeroth_data_platform_spark.operators.profiling import fano_burstiness

    d = dt.timedelta(days=1)
    rows = []
    eid = 0
    # 'steady': 5 events/day for 4 days -> variance 0 -> fano 0
    for day in range(4):
        for _ in range(5):
            eid += 1
            rows.append((eid, 1, T0 + day * d, "steady", 1.0))
    # 'bursty': day counts 1, 9 -> n=2, S=10, Q=82;
    # fano = (2*82 - 100) / (1*10) = 6.4 -> 6_400_000 ppm
    eid += 1
    rows.append((eid, 2, T0, "bursty", 1.0))
    for _ in range(9):
        eid += 1
        rows.append((eid, 2, T0 + d, "bursty", 1.0))
    # 'single': one day only -> excluded
    eid += 1
    rows.append((eid, 3, T0, "single", 1.0))
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["event_type"]: r for r in fano_burstiness(df).collect()}
    assert set(out) == {"steady", "bursty"}
    assert out["steady"]["fano_ppm"] == 0
    assert out["steady"]["mean_per_day_milli"] == 5_000
    assert out["bursty"]["fano_ppm"] == 6_400_000
    assert out["bursty"]["n_days"] == 2 and out["bursty"]["n_events"] == 10
    assert out["bursty"]["max_day"] == 9


def test_fano_plan_two_small_aggregates(spark, sf_dir):
    df = harness.QUERIES["x_fano_burstiness"](spark, sf_dir)
    plan = _plan(df)
    assert "partial_" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_ushape_attribution_semantics(spark):
    """Position-based 40/20/40: first and last touch take 400k ppm each,
    middles split the 200k pool by largest remainder (most recent
    middles seat the leftover); k=1 -> 1e6, k=2 -> 500k each, touchless
    -> direct in full; conservation holds."""
    from azeroth_data_platform_spark.operators.windows import (
        ushape_attribution,
    )

    h = dt.timedelta(hours=1)
    rows = [
        # user 1: FIVE touches -> purchase: first(view)=400k,
        # last(error)=400k, middles click/signup/view split 200000:
        # base 66666, leftover 2 to the two most recent middles
        _ev(1, 1, T0, "view"),
        _ev(2, 1, T0 + h, "click"),
        _ev(3, 1, T0 + 2 * h, "signup"),
        _ev(4, 1, T0 + 3 * h, "view"),
        _ev(5, 1, T0 + 4 * h, "error"),
        _ev(6, 1, T0 + 5 * h, "purchase", 9.0),
        # user 2: two touches -> 500k each
        _ev(7, 2, T0, "click"),
        _ev(8, 2, T0 + h, "signup"),
        _ev(9, 2, T0 + 2 * h, "purchase", 4.0),
        # user 3: one touch -> full million; user 4: touchless -> direct
        _ev(10, 3, T0, "click"),
        _ev(11, 3, T0 + h, "purchase", 2.0),
        _ev(12, 4, T0, "purchase", 1.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r["channel"]: r for r in ushape_attribution(df).collect()}
    # user 1: view gets first (400000) + middle seat (66666+1 for the
    # most recent middle = the T0+3h view); click middle base 66666;
    # signup middle 66666+1 (second most recent middle)
    assert out["error"]["credit_sum_ppm"] == 400_000
    assert out["view"]["credit_sum_ppm"] == 400_000 + 66_667
    assert out["signup"]["credit_sum_ppm"] == 66_667 + 500_000
    assert out["click"]["credit_sum_ppm"] == 66_666 + 500_000 + 1_000_000
    assert out["direct"]["credit_sum_ppm"] == 1_000_000
    assert sum(r["credit_sum_ppm"] for r in out.values()) == 4_000_000


def test_ushape_credit_conservation_on_corpus(spark, sf_dir):
    """Σ credit_sum_ppm = 1e6 · conversions on real data — the integer
    identity all four attribution variants share."""
    import pyspark.sql.functions as SF

    from azeroth_data_platform_spark import harness

    out = harness.ALL_QUERIES["w_attribution_ushape"](spark, sf_dir)
    total = out.agg(SF.sum("credit_sum_ppm")).collect()[0][0]
    convs = (
        harness._events_ts(spark, sf_dir)
        .where("event_type = 'purchase'")
        .count()
    )
    assert total == 1_000_000 * convs


def test_gini_concentration_matches_reference(spark):
    """Exact Gini vs a pure-Python recompute on constructed days: all
    equal -> 0; one item holds everything -> (n-1)/n; a mixed day."""
    from fractions import Fraction

    from azeroth_data_platform_spark.operators.gold import gini_concentration

    rows = []
    # day 1: four items, equal revenue 10.00 x 1
    for i in range(4):
        rows.append((i, dt.date(2024, 1, 1), 10.0, 1))
    # day 2: item 0 has all the revenue; three zero-revenue items need
    # price 0 — skip zeros, use 3 items: 0.01, 0.01, 99.98
    rows += [
        (0, dt.date(2024, 1, 2), 0.01, 1),
        (1, dt.date(2024, 1, 2), 0.01, 1),
        (2, dt.date(2024, 1, 2), 99.98, 1),
    ]
    # day 3: mixed with quantity weighting and two lots per item
    rows += [
        (0, dt.date(2024, 1, 3), 3.0, 2),
        (0, dt.date(2024, 1, 3), 1.0, 1),
        (1, dt.date(2024, 1, 3), 5.0, 4),
        (2, dt.date(2024, 1, 3), 0.5, 10),
    ]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, unit_price double, quantity long"
    )
    got = {str(r.snapshot_date): r for r in gini_concentration(df).collect()}

    def ref(xs):
        xs = sorted(xs)
        n = len(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        return Fraction(num, n * sum(xs))

    assert got["2024-01-01"].gini_ppm == 0
    d2 = ref([1, 1, 9998])
    assert got["2024-01-02"].gini_ppm == (d2.numerator * 10**6) // d2.denominator
    d3 = ref([700, 2000, 500])
    assert got["2024-01-03"].gini_ppm == (d3.numerator * 10**6) // d3.denominator
    assert got["2024-01-03"].total_units == 3200


def test_gini_plan_date_partitioned_window(spark, sf_dir):
    """Plan pin: the rank window is PARTITIONED BY snapshot_date (never
    a partition-less window over the fact table); no joins."""
    from azeroth_data_platform_spark import harness

    df = harness.QUERIES["x_gini_concentration"](spark, sf_dir)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "partial_" in plan
    import re

    for m in re.finditer(r"Window \[(.*?)\]", plan):
        assert "snapshot_date" in m.group(1)


def test_markov_transitions_row_stochastic(spark, sf_dir):
    """Per src: Σ p_ppm ∈ (1e6 − n_dst, 1e6] (each term floors away
    < 1); counts match user_paths' extraction; known toy chain exact."""
    import pyspark.sql.functions as SF

    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.operators.windows import (
        markov_transitions,
    )

    h = dt.timedelta(hours=1)
    rows = [
        _ev(1, 1, T0, "view"),
        _ev(2, 1, T0 + h, "click"),
        _ev(3, 1, T0 + 2 * h, "view"),
        _ev(4, 1, T0 + 3 * h, "click"),
        _ev(5, 1, T0 + 4 * h, "purchase", 1.0),
        _ev(6, 2, T0, "view"),
        _ev(7, 2, T0 + h, "view"),
    ]
    toy = {
        (r.src, r.dst): (r.n_transitions, r.src_total, r.p_ppm)
        for r in markov_transitions(
            spark.createDataFrame(rows, EV_SCHEMA)
        ).collect()
    }
    # src=view rows: view->click x2 (user 1), view->view x1 (user 2)
    assert toy[("view", "click")] == (2, 3, 666_666)
    assert toy[("view", "view")] == (1, 3, 333_333)
    assert toy[("click", "view")] == (1, 2, 500_000)
    assert toy[("click", "purchase")] == (1, 2, 500_000)

    out = harness.QUERIES["x_markov_transitions"](spark, sf_dir)
    rowsum = (
        out.groupBy("src")
        .agg(
            SF.sum("p_ppm").alias("s"),
            SF.count(SF.lit(1)).alias("k"),
        )
        .collect()
    )
    assert rowsum
    for r in rowsum:
        assert 1_000_000 - r.k < r.s <= 1_000_000, (r.src, r.s, r.k)


def test_lsh_tuning_curve_exact_probabilities(spark):
    """The frozen S-curve constants are the exact rationals
    1 − (1−j^r)^b at bucket midpoints: recompute with Fraction; p is
    monotone in j for every config, 0 at j-bucket 0 for the loosest-row
    config only in the tiny sense, and exactly 1e6 ppm at j = 1."""
    from fractions import Fraction

    from azeroth_data_platform_spark.operators.dedup import (
        _SCURVE_D,
        LSH_SWEEP_CONFIGS,
        _scurve_rows,
    )

    rows = _scurve_rows()
    by_cfg = {}
    for b, r, k, p_num in rows:
        j = Fraction(min(2 * k + 1, 20), 20)
        want = 1 - (1 - j**r) ** b
        assert Fraction(p_num, _SCURVE_D) == want, (b, r, k)
        by_cfg.setdefault((b, r), []).append(p_num)
    for cfg, ps in by_cfg.items():
        assert ps == sorted(ps), cfg  # monotone in j
        assert ps[-1] == _SCURVE_D  # j = 1 -> probability 1
    assert set(by_cfg) == set(LSH_SWEEP_CONFIGS)


def test_top_session_paths_semantics(spark):
    """Known sessions: path strings follow the (ts, event_id) order,
    prefix truncation flags long sessions, counts/users exact."""
    from azeroth_data_platform_spark.operators.windows import (
        top_session_paths,
    )

    m = dt.timedelta(minutes=1)
    hr = dt.timedelta(hours=2)  # > 30-min gap -> new session
    rows = [
        # user 1, session A: view>click>purchase
        _ev(1, 1, T0, "view"),
        _ev(2, 1, T0 + m, "click"),
        _ev(3, 1, T0 + 2 * m, "purchase"),
        # user 1, session B (2h later): view>click>purchase again
        _ev(4, 1, T0 + hr, "view"),
        _ev(5, 1, T0 + hr + m, "click"),
        _ev(6, 1, T0 + hr + 2 * m, "purchase"),
        # user 2: same path once
        _ev(7, 2, T0, "view"),
        _ev(8, 2, T0 + m, "click"),
        _ev(9, 2, T0 + 2 * m, "purchase"),
        # user 3: 7-event session -> truncated prefix of 5
        *[_ev(10 + i, 3, T0 + i * m, "view") for i in range(7)],
        # user 4: same-us tie resolved by event_id: 17 before 18
        _ev(17, 4, T0, "signup"),
        _ev(18, 4, T0, "error"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r.path: r for r in top_session_paths(df).collect()}
    assert got["view>click>purchase"].n_sessions == 3
    assert got["view>click>purchase"].n_users == 2
    assert got["view>click>purchase"].truncated_sessions == 0
    assert got["view>view>view>view>view"].n_sessions == 1
    assert got["view>view>view>view>view"].truncated_sessions == 1
    assert got["signup>error"].n_sessions == 1


def test_top_paths_plan_single_user_exchange(spark, sf_dir):
    """Both session windows and the in-session rank ride the user_id
    exchange; the path groupBy is the only other shuffle; top-k
    collapses to TakeOrderedAndProject."""
    from azeroth_data_platform_spark import harness

    df = harness.QUERIES["w_top_paths"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    import re

    user_ex = re.findall(r"Exchange hashpartitioning\(user_id#\d+L?, \d+\)", plan)
    assert len(user_ex) <= 1
