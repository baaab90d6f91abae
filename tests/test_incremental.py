"""Incremental gold maintenance (operators/incremental.py).

The contract under test: partial-aggregate states form a commutative
monoid with EXACT (decimal/integer) partials, so any batching of the input
finalizes to bit-identical gold — the property that makes day-over-day
delta maintenance safe at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azeroth_data_platform_spark import harness
from azeroth_data_platform_spark.operators import incremental


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def silver(spark, sf_dir):
    df = harness._silver(spark, sf_dir).cache()
    yield df
    df.unpersist()  # cached plans would pollute later plan-shape tests


def test_incremental_equals_full_recompute(spark, silver):
    split = F.lit("1996-01-01").cast("date")
    inc = incremental.incremental_summary(
        silver.where(F.col("snapshot_date") < split),
        silver.where(F.col("snapshot_date") >= split),
    )
    full = incremental.finalize_summary(incremental.summary_state(silver))
    assert _rows(inc) == _rows(full)


def test_merge_is_associative_and_order_insensitive(spark, silver):
    # three uneven batches split on a key-derived predicate
    parts = [silver.where(F.col("id") % 3 == i) for i in range(3)]
    states = [incremental.summary_state(p) for p in parts]
    merged_abc = incremental.merge_summary_state(*states)
    merged_nested = incremental.merge_summary_state(
        incremental.merge_summary_state(states[2], states[0]), states[1]
    )
    assert _rows(incremental.finalize_summary(merged_abc)) == _rows(
        incremental.finalize_summary(merged_nested)
    )


def test_empty_delta_is_identity(spark, silver):
    empty = silver.where(F.lit(False))
    inc = incremental.incremental_summary(silver, empty)
    full = incremental.finalize_summary(incremental.summary_state(silver))
    assert _rows(inc) == _rows(full)


def test_matches_gold_algebraic_columns(spark, silver):
    """finalize(state) reproduces daily_market_summary's algebraic columns
    bit-for-bit (median is out of scope by design — holistic)."""
    from azeroth_data_platform_spark.operators import gold

    cols = [
        "item_id",
        "snapshot_date",
        "min_buyout",
        "max_buyout",
        "avg_price",
        "quantity_available",
        "market_cap",
        "price_volatility",
        "auction_count",
    ]
    inc = incremental.finalize_summary(incremental.summary_state(silver)).select(*cols)
    a1 = gold.daily_market_summary(silver).select(*cols)
    assert _rows(inc) == _rows(a1)


def test_state_merge_plan_is_single_aggregate(spark, silver):
    """The merge is one shuffle keyed on the state key — a union of partials
    into a single hash aggregate, no join, no extra exchange per input."""
    merged = incremental.merge_summary_state(
        incremental.summary_state(silver.where(F.col("id") % 2 == 0)),
        incremental.summary_state(silver.where(F.col("id") % 2 == 1)),
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_scd2_history_semantics(spark):
    """Hand-built snapshot series: runs collapse to versions, intervals
    tile the timeline (valid_to = next valid_from), exactly one current
    version per key, status flaps open NEW versions (no merging across
    gaps in value)."""
    import datetime as dt

    from azeroth_data_platform_spark.operators.incremental import scd2_history

    d = dt.date
    rows = [
        # item 1: A A B B A  -> 3 versions (A, B, A)
        (1, d(2024, 1, 1), "A"), (1, d(2024, 1, 2), "A"),
        (1, d(2024, 1, 3), "B"), (1, d(2024, 1, 4), "B"),
        (1, d(2024, 1, 5), "A"),
        # item 2: constant -> 1 version
        (2, d(2024, 1, 1), "X"), (2, d(2024, 1, 9), "X"),
    ]
    df = spark.createDataFrame(
        rows, "item_id long, snapshot_date date, market_status string"
    )
    hist = scd2_history(df).collect()
    by_item = {}
    for r in hist:
        by_item.setdefault(r.item_id, []).append(r)
    v1 = sorted(by_item[1], key=lambda r: r.version)
    assert [r.market_status for r in v1] == ["A", "B", "A"]
    assert [r.valid_from for r in v1] == [d(2024, 1, 1), d(2024, 1, 3), d(2024, 1, 5)]
    assert [r.valid_to for r in v1] == [d(2024, 1, 3), d(2024, 1, 5), d(9999, 12, 31)]
    assert [r.is_current for r in v1] == [False, False, True]
    assert len(by_item[2]) == 1 and by_item[2][0].is_current
    for rows_ in by_item.values():
        assert sum(1 for r in rows_ if r.is_current) == 1


def test_scd2_merge_folding_equals_batch_history(spark):
    """Folding daily snapshots into the history one date at a time (the
    incremental maintenance step) reproduces the from-scratch
    scd2_history of the full series exactly — including flapping values
    and keys that appear mid-series."""
    import datetime as dt

    from azeroth_data_platform_spark.operators.incremental import (
        scd2_history,
        scd2_merge,
    )

    d = dt.date
    series = [
        (1, d(2024, 1, 1), "A"), (1, d(2024, 1, 2), "A"),
        (1, d(2024, 1, 3), "B"), (1, d(2024, 1, 4), "A"),
        (2, d(2024, 1, 1), "X"), (2, d(2024, 1, 4), "Y"),
        (3, d(2024, 1, 3), "Q"),  # appears mid-series
    ]
    schema = "item_id long, snapshot_date date, market_status string"
    full = spark.createDataFrame(series, schema)
    expected = sorted(map(tuple, scd2_history(full).collect()))

    dates = sorted({r[1] for r in series})
    first = [r for r in series if r[1] == dates[0]]
    hist = scd2_history(spark.createDataFrame(first, schema))
    for day in dates[1:]:
        batch = spark.createDataFrame([r for r in series if r[1] == day], schema)
        hist = scd2_merge(hist, batch).localCheckpoint()
    got = sorted(map(tuple, hist.collect()))
    assert got == expected
