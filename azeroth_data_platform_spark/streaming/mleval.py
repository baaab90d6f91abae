"""Streaming classifier-monitor state: per-day distinct-score label
counts as a Structured Streaming windowed aggregation.

operators/mleval.py factors exact AUC into (distinct-score count state) +
(rank-sum read-off) precisely so the state can be STREAM-MAINTAINED: the
per-(day, score, label) count is a commutative monoid — exactly what a
tumbling 1-day event-time window with a watermark materializes in append
mode. A micro-batch ingest keeps the score/label histogram current; the
AUC read-off (mleval.auc_from_counts after a fold across days) runs over
the materialized state on whatever cadence the monitor wants — never
re-scanning raw scored events. Day-sliced state also gives the monitor
per-day AUC and day-over-day score drift for free (the PSI pattern,
streaming/drift.py).

Day alignment contract: the stream buckets by F.window(ts, "1 day"),
which is UTC-EPOCH-aligned regardless of session timezone — the
deterministic choice for a multi-session 100 TB monitor (two clusters in
different zones materialize identical state). The batch operator labels
days by session-local calendar date; the two coincide under the UTC
production session (harness._prep). Late-row admission uses the PREVIOUS
batch's committed watermark while eviction uses the updated one
(measured), so a drop is only guaranteed one batch after the watermark
passes — both pinned in tests/test_streaming.py hostile-condition tests.

State scale: one row per (day, distinct score, label) — for a ppm-scaled
integer score that is value-domain-bounded, independent of event volume,
and pruned by the watermark. Batch/stream bit-equality is pinned in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WATERMARK = "2 days"


def streaming_score_counts(scored: DataFrame) -> DataFrame:
    """scored: streaming frame (ts TIMESTAMP, score BIGINT, label INT) →
    (day, score, label, c) finalized daily count rows, append mode after
    the watermark closes each day."""
    return (
        scored.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 day").alias("w"), "score", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "score",
            "label",
            "c",
        )
    )


def fold_score_counts(state: DataFrame) -> DataFrame:
    """Fold the materialized (day, score, label, c) state across days to
    the (score, c1, ct) frame mleval.auc_from_counts reads — one
    value-domain-sized groupBy."""
    return state.groupBy("score").agg(
        F.sum(F.expr("CASE WHEN label = 1 THEN c ELSE 0 END"))
        .cast("bigint")
        .alias("c1"),
        F.sum("c").cast("bigint").alias("ct"),
    )


def streaming_score_counts_by_group(scored: DataFrame) -> DataFrame:
    """Per-slice monitor state (r10 verdict #4 follow-through): scored =
    streaming (ts TIMESTAMP, grp STRING, score BIGINT, label INT) →
    (day, grp, score, label, c) finalized daily rows — the same
    commutative-monoid window as :func:`streaming_score_counts` with grp
    in the key, so state is bounded by slices × value domain
    (sources × ≤128 for the bucketed gate score), never event volume.
    Fold with :func:`fold_score_counts_by_group` and read off with
    operators/mleval.auc_from_counts_by_group for the live per-slice
    AUC — bit-equal to the batch auc_by_group (test-pinned under the
    hostile trio)."""
    return (
        scored.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 day").alias("w"), "grp", "score", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "grp",
            "score",
            "label",
            "c",
        )
    )


def fold_score_counts_by_group(state: DataFrame) -> DataFrame:
    """Fold (day, grp, score, label, c) state across days to the
    (grp, score, c1, ct) frame auc_from_counts_by_group reads — one
    slices×domain-sized groupBy."""
    return state.groupBy("grp", "score").agg(
        F.sum(F.expr("CASE WHEN label = 1 THEN c ELSE 0 END"))
        .cast("bigint")
        .alias("c1"),
        F.sum("c").cast("bigint").alias("ct"),
    )


def streaming_value_counts(events: DataFrame) -> DataFrame:
    """Live EXACT-quantile monitor state (r12): events = streaming
    (ts TIMESTAMP, event_type STRING, value DOUBLE) → (day, event_type,
    value_units, c) finalized daily rows — the same commutative-monoid
    window as :func:`streaming_score_counts` over the int_units-quantized
    value, so state is bounded by groups × the VALUE DOMAIN in cents
    (and pruned by the watermark), never by event volume. Fold with
    :func:`fold_value_counts` and read off with
    operators/profiling.group_quantiles_from_counts — the radix selector
    over the folded histogram, bit-equal to the batch
    group_quantiles_radix on the same rows (test-pinned under the
    hostile trio + checkpoint recovery). NULL values are excluded, same
    as the batch twin."""
    from ..functions.numerics import int_units

    return (
        events.where(F.col("value").isNotNull())
        .withWatermark("ts", WATERMARK)
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            "event_type",
            int_units("value").cast("bigint").alias("value_units"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "value_units",
            "c",
        )
    )


def fold_value_counts(state: DataFrame) -> DataFrame:
    """Fold (day, event_type, value_units, c) state across days to the
    (event_type, value_units, c) histogram the quantile read-off
    consumes — one groups×domain-sized groupBy."""
    return state.groupBy("event_type", "value_units").agg(
        F.sum("c").cast("bigint").alias("c")
    )
