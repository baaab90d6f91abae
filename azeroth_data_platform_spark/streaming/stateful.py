"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's escape hatch for operators Structured Streaming's
declarative aggregates can't express: here, a per-item running price
anomaly detector that maintains (count, mean, M2) Welford state across
micro-batches and emits ticks deviating more than K·σ from the running
mean — the streaming cousin of the A3 z-score gold table.

State is one small tuple per item_key — bounded, partitioned by key,
checkpointed by the engine. At 100 TB/day of ticks this scales with
distinct keys, not volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

K_SIGMA = 3.0
MIN_OBSERVATIONS = 5

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("item_key", T.StringType()),
        T.StructField("tick_id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("running_mean", T.DoubleType()),
        T.StructField("running_std", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def _detect(
    key: tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out_rows: list[dict[str, Any]] = []
    for pdf in batches:
        # process in deterministic event order within the batch
        pdf = pdf.sort_values(["ts", "tick_id"])
        for row in pdf.itertuples():
            if n >= MIN_OBSERVATIONS:
                std = (m2 / (n - 1)) ** 0.5 if n > 1 else 0.0
                if std > 0.0:
                    z = (row.price - mean) / std
                    if abs(z) >= K_SIGMA:
                        out_rows.append(
                            {
                                "item_key": key[0],
                                "tick_id": row.tick_id,
                                "price": row.price,
                                "running_mean": mean,
                                "running_std": std,
                                "z": z,
                            }
                        )
            # Welford update AFTER scoring: each tick is judged against
            # strictly-prior history
            n += 1
            delta = row.price - mean
            mean += delta / n
            m2 += delta * (row.price - mean)
    state.update((n, mean, m2))
    if out_rows:
        yield pd.DataFrame(out_rows)


def streaming_anomalies(ticks: DataFrame) -> DataFrame:
    """ticks (streaming or batch-with-groupBy): (tick_id, item_key, ts,
    price, ...) → anomalous ticks with running stats."""
    return ticks.groupBy("item_key").applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Session windows with state-timeout eviction
#
# Structured Streaming's built-in session_window() covers declarative gap
# sessions; this operator is the custom-state variant: per-key session
# accumulation whose IDLE keys are evicted by the state-store timeout
# rather than by new data arriving for that key. That distinction matters
# at scale — with billions of keys, sessions for keys that never speak
# again must still close and release their state, and only a timeout can
# do that.

SESSION_GAP_SECONDS = 30 * 60

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # 'gap' | 'timeout'
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_rows(key, start_us: int, last_us: int, n: int, closed_by: str) -> dict:
    return {
        "user_id": key[0],
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "n_events": n,
        "closed_by": closed_by,
    }


def _sessionize_state(
    key: tuple[int], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    if state.hasTimedOut:
        # idle-key eviction: the watermark passed last_event + gap with no
        # new data — close the session and RELEASE the state slot
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame([_session_rows(key, start_us, last_us, n, "timeout")])
        return

    out: list[dict] = []
    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    for pdf in batches:
        for ts in sorted(pdf["ts"]):
            ts_us = int(pd.Timestamp(ts).value // 1_000)
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > gap_us:
                out.append(_session_rows(key, start_us, last_us, n, "gap"))
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us, n = ts_us, n + 1
    state.update((start_us, last_us, n))
    # evict when the event-time watermark passes last event + gap
    state.setTimeoutTimestamp(last_us // 1_000 + SESSION_GAP_SECONDS * 1_000)
    if out:
        yield pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Streaming sequence packing — the incremental twin of
# operators/corpus.py::pack_sequences: documents arriving on a stream get
# their (pack_id, pack_offset) layout slot as they land, from ONE running
# token total per shard carried across micro-batches. This is the shape a
# continuously-ingesting training pipeline needs: the nightly batch packer
# re-lays the whole corpus; the streaming packer extends the layout
# append-only without touching earlier packs. State per shard is a single
# bigint — bounded by N_SHARDS, not volume.
#
# Ordering contract: within a micro-batch docs pack in doc_id order (same
# tie-break as the batch operator); ACROSS batches arrival order is the
# layout order — the batch twin over the same arrival sequence produces
# the identical layout (test-pinned).

PACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("pack_offset", T.LongType()),
        T.StructField("crosses_boundary", T.BooleanType()),
    ]
)

PACK_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])


def streaming_pack(sampled: DataFrame, budget: int | None = None) -> DataFrame:
    """sampled (streaming): (doc_id, shard, n_tokens, ...) → per-doc pack
    layout slots assigned incrementally, running totals persisted in the
    state store across micro-batches. `budget` defaults to the batch
    operator's PACK_BUDGET so the two layouts agree token-for-token."""
    from ..operators.corpus import PACK_BUDGET

    b = PACK_BUDGET if budget is None else budget

    def _pack_state(
        key: tuple[int], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (total,) = state.get if state.exists else (0,)
        rows: list[dict[str, Any]] = []
        # Concatenate ALL Arrow chunks before sorting: a micro-batch can be
        # delivered as several chunks, and per-chunk sorts would pack docs
        # in chunk order — diverging from the batch pack_sequences layout.
        chunks = [pdf for pdf in batches]
        if chunks:
            merged = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            for row in merged.sort_values("doc_id").itertuples():
                start, n = total, int(row.n_tokens)
                rows.append(
                    {
                        "shard": key[0],
                        "doc_id": row.doc_id,
                        "n_tokens": n,
                        "pack_id": start // b,
                        "pack_offset": start % b,
                        "crosses_boundary": start % b + n > b,
                    }
                )
                total += n
        state.update((total,))
        if rows:
            yield pd.DataFrame(rows)

    return sampled.groupBy("shard").applyInPandasWithState(
        _pack_state,
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessions(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """events (streaming): (user_id, ts, ...) → closed sessions. A session
    closes either when a later event for the SAME key arrives beyond the
    gap ('gap') or when the watermark passes its idle deadline with no new
    data at all ('timeout' — the state-store eviction path)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_state,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- streaming user-path transitions ----------------------------------------

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("src_event_id", T.LongType()),
        T.StructField("dst_event_id", T.LongType()),
    ]
)

_TRANS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_type", T.StringType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _transition_state(
    key: tuple[int], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last = state.get if state.exists else (None, None, None)
    last_type, last_eid, last_us = last
    rows = []
    # One user's micro-batch may arrive as SEVERAL Arrow chunks; sorting each
    # chunk independently would interleave transitions in chunk order and
    # could persist a non-latest event as state. Concatenate first, sort the
    # whole group once by the event total order (us, event_id) — mirrors
    # _pack_state above. State stays one tuple per user either way.
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["us", "event_id"])
        for eid, us, et in zip(pdf["event_id"], pdf["us"], pdf["event_type"]):
            if last_type is not None:
                rows.append((key[0], last_type, et, int(last_eid), int(eid)))
            last_type, last_eid, last_us = et, int(eid), int(us)
    if last_type is not None:
        state.update((last_type, last_eid, last_us))
    if rows:
        yield pd.DataFrame(
            rows, columns=["user_id", "src", "dst", "src_event_id", "dst_event_id"]
        )


def streaming_transitions(events: DataFrame) -> DataFrame:
    """(src → dst) event transitions ON A STREAM — the live feed of the
    batch `windows.user_paths` flow analysis. The per-user state is ONE
    (last_type, last_event_id, last_ts) tuple, so state scales with
    distinct users, never volume; each micro-batch emits the transitions
    it completes, including the one spanning the batch boundary — the
    case a per-batch window could never see.

    Within-batch order is (ts, event_id) — the repo's event total order;
    correctness across batches assumes per-user in-order arrival (the
    dedup-ingest watermark upstream provides it), the standard contract
    for transition CDC. Batch parity pinned in tests/test_streaming.py.

    Expects columns (user_id, event_id, event_type, us) — `us` the
    microsecond epoch (integer event time)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _transition_state,
        TRANSITION_SCHEMA,
        _TRANS_STATE_SCHEMA,
        "append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Last-touch attribution ON A STREAM — the live twin of
# windows.last_touch_attribution. Batch uses two IGNORE-NULLS window
# frames; on a stream the same semantics is exactly ONE (touch_type,
# touch_us) tuple per user, updated by every non-conversion event and
# read by every conversion — including the conversion that arrives in a
# LATER micro-batch than its touch, the case a per-batch window cannot
# see. State scales with distinct users, never volume. The channel
# report (groupBy channel) stays a downstream declarative aggregate.

ATTRIBUTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("channel", T.StringType()),
        T.StructField("xu", T.LongType()),  # conversion value in int units
    ]
)

_ATTR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("touch_type", T.StringType()),
        T.StructField("touch_us", T.LongType()),
    ]
)

ATTR_CONVERSION = "purchase"
ATTR_LOOKBACK_US = 7 * 86_400 * 1_000_000
# State-eviction horizon (EVENT time): a user idle longer than this is
# dropped from the store. 2x the lookback so no evictable touch could
# still be credited — eviction is a pure state-size optimization,
# semantics unchanged. MEASURED (this sandbox, r9): ProcessingTimeTimeout
# was tried first and rejected — registered processing-time timers make
# the streaming engine fire continuous "no new data but cleaning up
# state" micro-batches (~2/s at the default trigger), burning CPU and
# keeping processAllAvailable() from ever settling. Event-time timeouts
# piggyback on watermark advancement (data-driven), so idle streams stay
# idle.
ATTR_IDLE_TIMEOUT_US = 2 * ATTR_LOOKBACK_US


def _set_event_timeout(state: GroupState, last_us: int) -> None:
    """Register eviction at last-event-time + 2x lookback, clamped above
    the current watermark (Spark rejects a timeout at-or-below it — a
    user whose horizon already passed gets evicted at the next batch)."""
    state.setTimeoutTimestamp(
        max(
            (last_us + ATTR_IDLE_TIMEOUT_US) // 1000,
            state.getCurrentWatermarkMs() + 1,
        )
    )


def _make_attribution_state(evict: bool):
    def _attribution_state(
        key: tuple[int], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # user idle past the horizon: their retained touch is older
            # than the lookback, so it can never be credited — drop it
            state.remove()
            return
        touch_type, touch_us = state.get if state.exists else (None, None)
        rows = []
        last_us = None
        # Concat-then-sort across Arrow chunks (the _transition_state lesson:
        # per-chunk sorting can interleave the group and persist a non-latest
        # touch). Order is the repo's (us, event_id) event total order.
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["us", "event_id"])
            for eid, us, et, xu in zip(
                pdf["event_id"], pdf["us"], pdf["event_type"], pdf["xu"]
            ):
                if et == ATTR_CONVERSION:
                    channel = (
                        touch_type
                        if touch_type is not None
                        and int(us) - int(touch_us) <= ATTR_LOOKBACK_US
                        else "direct"
                    )
                    rows.append((key[0], int(eid), channel, int(xu)))
                else:
                    touch_type, touch_us = et, int(us)
                last_us = int(us)
        if touch_type is not None:
            state.update((touch_type, touch_us))
            if evict and last_us is not None:
                _set_event_timeout(state, last_us)
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "event_id", "channel", "xu"])

    return _attribution_state


# default (no-eviction) instance, kept importable for unit probes
_attribution_state = _make_attribution_state(evict=False)


def streaming_attribution(
    events: DataFrame, evict_watermark: str | None = None
) -> DataFrame:
    """Per-conversion attributed rows ON A STREAM: each purchase credited
    to the user's latest prior touch within the 7-day lookback (state:
    one tuple per user), 'direct' otherwise — feed the declarative
    channel aggregate downstream for the live report. Within-batch order
    is (us, event_id); across batches assumes per-user in-order arrival
    (the dedup-ingest watermark upstream provides it). Batch bit-parity
    pinned in tests/test_stateful_streaming.py.

    With `evict_watermark` set (a delay string, e.g. "1 hour"), state is
    bounded by ACTIVE users rather than lifetime distinct users: an
    event-time watermark is declared on timestamp_micros(us) and each
    user is evicted once the watermark passes last-event + 2x lookback —
    by then their retained touch can no longer qualify for any future
    conversion, so semantics are unchanged. The delay bounds input
    disorder as usual (rows older than the watermark are dropped), so
    callers pick it to cover their late-data contract; None (default)
    keeps the unbounded-store behavior for disorder-tolerant replays.

    Expects columns (user_id, event_id, event_type, us, xu) — `us` the
    microsecond epoch, `xu` the value in int units."""
    if evict_watermark is None:
        src, conf = events, GroupStateTimeout.NoTimeout
    else:
        src = events.withColumn(
            "event_ts", F.timestamp_micros(F.col("us"))
        ).withWatermark("event_ts", evict_watermark)
        conf = GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        _make_attribution_state(evict=evict_watermark is not None),
        ATTRIBUTION_SCHEMA,
        _ATTR_STATE_SCHEMA,
        "append",
        timeoutConf=conf,
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution ON A STREAM — the live twin of
# windows.multitouch_attribution. State per user is the touch list
# PRUNED TO THE LOOKBACK (bounded by lookback window × touch rate, the
# classic bounded-state argument — an unpruned list would grow with
# lifetime volume). Each conversion replays the Hamilton split against
# the pruned list: 1e6 DIV k per touch, the 1e6 % k leftover to the most
# recent — per-conversion credit conservation holds on the stream exactly
# as in batch.

MT_ATTRIBUTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("conv_eid", T.LongType()),
        T.StructField("channel", T.StringType()),
        T.StructField("credit_ppm", T.LongType()),
        T.StructField("xu", T.LongType()),
    ]
)

_MT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("channels", T.ArrayType(T.StringType())),
        T.StructField("uss", T.ArrayType(T.LongType())),
        T.StructField("eids", T.ArrayType(T.LongType())),
    ]
)


def _make_multitouch_state(evict: bool):
    def _multitouch_state(
        key: tuple[int], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # user idle past the horizon: every retained touch is older
            # than the lookback and can never earn credit — drop them
            state.remove()
            return
        channels, uss, eids = state.get if state.exists else ([], [], [])
        channels, uss, eids = list(channels), list(uss), list(eids)
        rows = []
        last_us = None
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["us", "event_id"])
            for eid, us, et, xu in zip(
                pdf["event_id"], pdf["us"], pdf["event_type"], pdf["xu"]
            ):
                eid, us = int(eid), int(us)
                last_us = us
                if et == ATTR_CONVERSION:
                    # prune on conversions too, not just touch arrivals —
                    # a burst of touches followed by only conversions must
                    # not pin up-to-lookback stale touches in state
                    # forever. Only when a watermark bounds disorder
                    # (evict=True): without one, an out-of-order EARLIER
                    # conversion may still arrive and legitimately claim a
                    # touch this later conversion's cutoff would discard —
                    # pruning here would misattribute it 'direct'
                    # (r9 ADVICE #3). Unbounded mode keeps its
                    # disorder-tolerant unbounded store; the read below
                    # still filters to the lookback either way.
                    if evict:
                        cutoff = us - ATTR_LOOKBACK_US
                        if uss and uss[0] < cutoff:
                            keep = [i for i, u in enumerate(uss) if u >= cutoff]
                            channels = [channels[i] for i in keep]
                            uss = [uss[i] for i in keep]
                            eids = [eids[i] for i in keep]
                    # precedence must be checked explicitly, not assumed
                    # from processing order: in no-watermark (disorder-
                    # tolerant) mode the unpruned store can hold touches
                    # NEWER than an out-of-order conversion, and crediting
                    # them would break the batch twin's precedence rule
                    # (surfaced by the r10-ADVICE-#1 closure test). The
                    # (u, e) < (us, eid) tiebreak mirrors the
                    # sort_values(["us", "event_id"]) processing order.
                    q = [
                        (c, u, e)
                        for c, u, e in zip(channels, uss, eids)
                        if us - u <= ATTR_LOOKBACK_US and (u, e) < (us, eid)
                    ]
                    if not q:
                        rows.append((key[0], eid, "direct", 1_000_000, int(xu)))
                    else:
                        k = len(q)
                        base, rem = divmod(1_000_000, k)
                        for r, (c, _, _) in enumerate(
                            sorted(q, key=lambda t: (-t[1], -t[2])), start=1
                        ):
                            rows.append(
                                (key[0], eid, c, base + (1 if r <= rem else 0), int(xu))
                            )
                else:
                    channels.append(et)
                    uss.append(us)
                    eids.append(eid)
                    # prune to the lookback relative to the newest event —
                    # the state-boundedness contract. Gated on evict for
                    # the same reason as the conversion-side prune (r10
                    # ADVICE #1): without a watermark bounding disorder,
                    # an out-of-order EARLIER conversion (uc < us) may
                    # arrive in a later micro-batch and legitimately claim
                    # a touch inside ITS lookback that this newer touch's
                    # cutoff would discard — pruning here would
                    # misattribute it 'direct'. No-watermark mode
                    # therefore keeps the full disorder-tolerant store
                    # (unbounded state is that mode's stated contract);
                    # the conversion read filters to the lookback anyway.
                    if evict:
                        cutoff = us - ATTR_LOOKBACK_US
                        if uss and uss[0] < cutoff:
                            keep = [i for i, u in enumerate(uss) if u >= cutoff]
                            channels = [channels[i] for i in keep]
                            uss = [uss[i] for i in keep]
                            eids = [eids[i] for i in keep]
        state.update((channels, uss, eids))
        if evict and last_us is not None:
            _set_event_timeout(state, last_us)
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "conv_eid", "channel", "credit_ppm", "xu"]
            )

    return _multitouch_state


# default (no-eviction) instance, kept importable for unit probes
_multitouch_state = _make_multitouch_state(evict=False)


def streaming_multitouch(
    events: DataFrame, evict_watermark: str | None = None
) -> DataFrame:
    """Per-(conversion, touch) credit rows ON A STREAM: the Hamilton
    multi-touch split replayed against the lookback-pruned per-user touch
    list — attributes conversions whose touches arrived in earlier
    micro-batches. Fold by channel downstream for the live report; batch
    bit-parity pinned in tests/test_stateful_streaming.py.

    Boundedness: with `evict_watermark` set (the watermark bounds
    disorder) the touch list is pruned to the lookback on BOTH touch and
    conversion arrivals, and an EVENT-TIME idle timeout of 2x the
    lookback evicts users with no events at all, so state scales with
    active users x touch rate, never lifetime cardinality. Without a
    watermark BOTH prunes are skipped (r9 ADVICE #3; r10 ADVICE #1
    closed the touch-side half): an out-of-order EARLIER conversion may
    arrive in a later micro-batch and legitimately claim a touch that
    either prune's cutoff — keyed to a NEWER event's timestamp — would
    have discarded. Unbounded mode is therefore fully disorder-tolerant
    at the price of unbounded per-user state: that mode exists for
    replay/backfill probes; production streams set the watermark. See
    streaming_attribution for the watermark contract and why the timeout
    is event-time, not processing-time.

    Expects columns (user_id, event_id, event_type, us, xu)."""
    if evict_watermark is None:
        src, conf = events, GroupStateTimeout.NoTimeout
    else:
        src = events.withColumn(
            "event_ts", F.timestamp_micros(F.col("us"))
        ).withWatermark("event_ts", evict_watermark)
        conf = GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        _make_multitouch_state(evict=evict_watermark is not None),
        MT_ATTRIBUTION_SCHEMA,
        _MT_STATE_SCHEMA,
        "append",
        timeoutConf=conf,
    )
