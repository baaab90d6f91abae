"""Managed materialization lifecycle for shared-stage relations.

Round-12 folded every "N plan branches re-run the same expensive stage"
site onto eager ``localCheckpoint()``. That fixed the redundant scans but
left the engine with no storage lifecycle: the pinned executor-local
blocks were released only when the *Python* garbage collector happened to
collect the py4j references and the ContextCleaner caught up — measured
in r12 as ann_pq_codes creeping 3.8 → 10 s across back-to-back runs, and
papered over with a bench-side gc.collect (r12 change #21) instead of an
engine fix.

:func:`materialize` keeps the r12 execution mechanics — an EAGER
``localCheckpoint()``: one job at construction, ``Scan ExistingRDD``
leaves, lineage truncated — and adds the missing lifecycle: every
materialized relation is registered in a bounded FIFO pool holding
STRONG references, and the ENGINE unpersists deterministically (pool
overflow past ``SPARK_GRAFT_MATERIALIZE_CAP``, explicit
:func:`release`, or :func:`release_all`). No reliance on gc timing,
no unbounded pinned-block growth in long-lived sessions.

Why not ``persist(MEMORY_AND_DISK)`` (recompute-safe, evictable)? It was
BUILT AND MEASURED first (r13): the InMemoryRelation path regressed the
very operators these folds serve — alternating-pair A/B at sf0.1,
same session: dd_minhash_lsh 1.6-2.1 s (localCheckpoint) vs 2.7-3.8 s
(persist), x_rfm_migration 3.3-3.8 vs 5.6-5.9, and the whole-list A/B
showed +25-90% on ts_perplexity_bigram / tp_bpe_encode /
ann_topk_ivf_trained — the columnar cache build/decode plus planning
through CacheManager-matched cached plans costs far more than these
dim/doc-sized relations save. localCheckpoint blocks are already
StorageLevel MEMORY_AND_DISK, so the spill half of the at-scale story
holds; what localCheckpoint gives up is recompute-on-loss.

Semantics (documented contract, r12 ADVICE #1/#4 closure):
- Construction is EAGER: materialize() runs the producing job once, at
  operator-construction time. explain()/dry-run composition of these
  operators therefore executes their shared stage — the measured price
  of deterministic single-execution folding (the lazy persist variant
  restored lazy construction and lost 25-90% at execution; eager wins).
- Actions on ONE returned DataFrame share the materialized blocks; a
  separate operator call always recomputes — each call checkpoints its
  own fresh plan, so there is no cross-run or cross-invocation result
  caching, structurally.
- EVICTION (cap overflow / release) frees the blocks; a still-held
  DataFrame whose entry was evicted FAILS on its next action
  (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) rather than recomputing — lineage
  was truncated. The cap (default 16) is sized several queries deep:
  engine operators hold at most ~6 live materializations per invocation
  and consume them within the invocation; iterative loops release
  superseded rounds explicitly (see dedup.neardup_clusters).
- On a CLUSTER, executor loss likewise kills a query mid-flight; the
  fault-tolerant variants for multi-hour jobs are a reliable
  ``checkpoint()`` to cluster storage or replicated persist — the
  single-host bench engine deliberately takes the measured-faster local
  form (similarity.build_lsh_index docstring carries the same note).
"""

from __future__ import annotations

import os
from collections import deque

from pyspark.sql import DataFrame

_SEQ = 0
# (uid, checkpointed DataFrame) in creation order; strong references —
# the pool is the owner, eviction is the deterministic unpersist point.
_POOL: deque[tuple[int, DataFrame]] = deque()


def _cap() -> int:
    return int(os.environ.get("SPARK_GRAFT_MATERIALIZE_CAP", "16"))


def _unpersist_quiet(df: DataFrame) -> None:
    try:
        # a localCheckpointed DataFrame's blocks belong to the RDD inside
        # its LogicalRDD leaf — DataFrame.unpersist() only talks to the
        # CacheManager and would be a no-op here
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — session already stopped / not a LogicalRDD
        pass


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly localCheckpoint ``df`` as a pool-managed shared relation.

    Identical schema and r12-identical execution shape (ExistingRDD
    leaves); the pool owns the unpersist (module docstring).
    """
    global _SEQ
    _SEQ += 1
    out = df.localCheckpoint()
    _POOL.append((_SEQ, out))
    while len(_POOL) > _cap():
        _, old = _POOL.popleft()
        _unpersist_quiet(old)
    return out


def release(df: DataFrame) -> None:
    """Deterministically unpersist a relation returned by
    :func:`materialize` (identity match). Used by iterative loops to drop
    round N-1 as soon as round N supersedes it, and by write paths after
    their staged rewrite completes."""
    for i, (_, entry) in enumerate(_POOL):
        if entry is df:
            _unpersist_quiet(entry)
            del _POOL[i]
            return


def release_all() -> None:
    """Unpersist every pool-managed relation (tests / session teardown)."""
    while _POOL:
        _, entry = _POOL.popleft()
        _unpersist_quiet(entry)


def pool_size() -> int:
    return len(_POOL)
