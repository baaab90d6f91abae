"""Deduplication operators for large-scale training-data pipelines.

Not part of the reference's surface (SURVEY.md §2.7: it has no set ops at
all) — these are the dedup family a 100 TB document pipeline needs, built
as pure DataFrame compositions (no UDFs; md5 + array lambdas stay inside
codegen).

Scale design per operator:
  * exact:       one hash-groupBy shuffle on the content hash. Skew-free
                 (hashes are uniform).
  * ngram-jaccard: exact pairwise via shingle self-join — O(Σ df(sh)²) —
                 correct but quadratic in hot shingles; at scale use it
                 only to VERIFY candidates from LSH/SimHash, never on the
                 full corpus (stop-shingle filtering mitigates; the LSH
                 operator below is the scale path).
  * minhash-lsh: the scale path. 16 hashes → 4 bands of 4; candidate
                 generation is an equi-join on (band, band_key) buckets —
                 linear shuffles, no cross product; exact jaccard runs only
                 on candidates.
  * simhash:     60-bit fingerprint per doc via 60 conditional sums (one
                 groupBy); pairing by hamming distance. Pairing here is
                 pairwise for oracle-checkability; at scale, block on
                 fingerprint chunks (4×15-bit bands, pigeonhole: hamming≤3
                 guarantees one exact band match) and compare within blocks.
  * embedding-cosine: the pairwise form is the recall baseline; the scale
                 path is `embedding_neardup_lsh` — hyperplane-bucket
                 candidates (equi-join) + exact cosine verify.

All hash arithmetic is engine-portable (md5 hex strings, integer ops) so
every operator has an exact DuckDB oracle twin — the *_SQL strings are
generated from the same templates as the Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lifecycle import materialize, release

from ..functions.vectors import cosine_sql

SHINGLE_N = 3
MINHASH_SEEDS = 16
LSH_BANDS = 4
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 60  # 15 hex nibbles of md5 → fits a signed 64-bit int
SIMHASH_MAX_HAMMING = 8
COSINE_DUP_THRESHOLD = 0.4

# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content hash with the
    surviving representative (min doc_id) and the duplicate count."""
    return (
        documents.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("representative_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


EXACT_SQL = """
  SELECT md5(text) AS content_hash,
         MIN(doc_id) AS representative_doc_id,
         COUNT(*) AS n_docs
  FROM documents GROUP BY md5(text)"""


# ---------------------------------------------------------------------------
# word-shingle machinery (shared by jaccard / minhash / simhash)


def shingles(documents: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Distinct word n-gram shingles per document (empty-token-free
    tokenization — textstats._words semantics, mirrored in _shingle_sql)."""
    from .textstats import _words

    terms = ", ' ', ".join(f"element_at(ws, i + {k + 1})" for k in range(n))
    sh = F.expr(
        f"transform(sequence(0, size(ws) - {n}), i -> concat({terms}))"
    )
    return (
        documents.select("doc_id", _words().alias("ws"))
        .where(F.size("ws") >= n)
        .select("doc_id", F.explode(sh).alias("sh"))
        .distinct()
    )


def _shingle_sql(n: int = SHINGLE_N) -> str:
    from .textstats import WORDS_SQL

    terms = " || ' ' || ".join(f"ws[i + {k}]" for k in range(n))
    return f"""
  w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents
        WHERE len({WORDS_SQL}) >= {n}),
  s AS (SELECT DISTINCT doc_id, sh FROM
          (SELECT doc_id, unnest([{terms} FOR i IN range(1, len(ws) - {n - 2})]) AS sh
           FROM w))"""


_SIZES_SQL = "sizes AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id)"


def _pairwise_jaccard(sh: DataFrame) -> DataFrame:
    """(d1, d2, jaccard) for every doc pair sharing >=1 shingle.

    The no-op isNotNull(sh) filter on the sizes branch (shingles are
    concat()s of always-present tokens — never NULL) aligns its canonical
    plan with the self-join sides, which carry the same filter pushed down
    from the `sh` join key: AQE's exchange reuse then serves the sizes
    branch from the already-shuffled shingle relation instead of
    re-scanning and re-tokenizing the corpus (r12, measured plan diff:
    one fewer parquet scan + shingle exchange)."""
    sizes = (
        sh.where(F.col("sh").isNotNull())
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"doc_id": "d1", "n": "n1"}), "d1")
        .join(sizes.withColumnsRenamed({"doc_id": "d2", "n": "n2"}), "d2")
        .select(
            "d1",
            "d2",
            (
                F.col("common").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_dedup(
    documents: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs above `threshold`.

    The shingle relation feeds three plan branches (self-join both sides +
    per-doc sizes) and Spark does not CSE across branches; a lazy
    localCheckpoint of the shingles was measured 45% faster for a single
    cold query but slightly SLOWER across the bench's sequential
    multi-query run (pinned shingle RDDs accumulate until the context
    cleaner catches up) — recompute wins for the engine's usage pattern,
    so no checkpoint here (PERF.md round-2 log). Re-measured in r12 after
    the bench GC fix removed the pinned-block penalty: alternating-pair
    A/B is FLAT here (median pair delta −0.02 s) — the isNotNull
    exchange-reuse alignment already folds the sizes branch, and the two
    self-join sides share the distinct exchange — so recompute still
    stands (unlike minhash_lsh_dedup, whose band/verify branches
    canonicalize differently and did win a checkpoint)."""
    return _pairwise_jaccard(shingles(documents)).where(F.col("jaccard") >= threshold)


NGRAM_JACCARD_SQL = f"""
  WITH {_shingle_sql()},
  {_SIZES_SQL},
  pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
  SELECT d1, d2, CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard
  FROM pairs JOIN sizes x ON x.doc_id = d1 JOIN sizes y ON y.doc_id = d2
  WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}"""


# ---------------------------------------------------------------------------
# MinHash + LSH


# Universal-hash family for MinHash: one md5 per shingle parsed to an
# integer, then seeds apply affine maps (a·h+b) mod p. p = 2³¹−1 keeps
# a·h < 2⁶² inside int64; a/b are fixed odd/prime-spread constants so the
# family is deterministic and identical in the SQL oracle. 16× fewer
# cryptographic hashes than md5-per-seed — the dominant cost at scale.
MINHASH_P = 2_147_483_647
_HEX_NIBBLES = 8  # 32 bits of the md5 → base integer


def _hex_int_sql(expr: str, duck: bool) -> str:
    """First 8 md5 nibbles → integer, portable across engines.

    Spark side parses the 8-hex-digit prefix in ONE conv() call (r12:
    same value as the per-nibble instr sum — an 8-digit base-16 positional
    number — for a quarter of the per-row string work; measured
    equivalent bit-for-bit over 10⁶ md5s). DuckDB keeps the positional
    strpos sum: its conv() lacks an arbitrary-base signature, and the
    oracle text is frozen either way."""
    if not duck:
        return f"(CAST(conv(substr({expr}, 1, {_HEX_NIBBLES}), 16, 10) AS BIGINT) % {MINHASH_P})"
    terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (_HEX_NIBBLES - 1 - i)}"
        for i in range(_HEX_NIBBLES)
    )
    return f"(({terms}) % {MINHASH_P})"


def _affine_sql(seed: int, h: str) -> str:
    a = 2 * seed + 1
    b = (seed * 7919 + 13) % MINHASH_P
    return f"(({a} * {h} + {b}) % {MINHASH_P})"


def minhash_lsh_dedup(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    seeds: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash signatures → banded LSH buckets → exact-jaccard verification.

    The minhash of seed s is min over shingles of an affine universal hash
    of the shingle's md5 (see MINHASH_P block). Candidates are pairs
    sharing any band bucket (equi-join — the whole point: no pairwise
    comparison until after bucketing).

    The shingle relation feeds FIVE plan branches here (band sides a/b,
    verify s1/s2, sizes) and Spark does not CSE across branches; AQE
    exchange reuse recovers some but not all (the band and verify sides
    canonicalize differently). lifecycle.materialize folds the scan +
    tokenize + distinct to ONE eager execution (r12 A/B of the fold:
    alternating-pair at sf0.1, median pair delta −0.14 s ≈ −8%; the r13
    recompute-safe persist variant was measured 1.6-2.1 → 2.7-3.8 s here
    and rejected — lifecycle.py module docstring has the numbers).
    EAGER semantics, documented (r12 ADVICE #1/#4): constructing this
    operator runs the shingle job once; actions on the ONE returned
    DataFrame share the materialized blocks; a separate operator call
    always re-executes (fresh checkpoint — no cross-run caching); the
    POOL owns the unpersist deterministically (r13, no gc dependence).
    Blocks are MEMORY_AND_DISK (spill-safe); at 100 TB the trade is
    1 corpus pass + a local materialization vs ~3 corpus passes — the
    guide-§8 "fingerprint once" shape. For multi-hour cluster jobs the
    fault-tolerant variant is a reliable checkpoint()/replicated persist
    (executor loss kills a localCheckpoint consumer)."""
    sh = materialize(shingles(documents))
    bands_df = _minhash_bands(sh, seeds, bands)
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return _verify_jaccard(sh, cand).where(F.col("jaccard") >= threshold)


def _minhash_bands(sh: DataFrame, seeds: int = MINHASH_SEEDS, bands: int = LSH_BANDS) -> DataFrame:
    """(doc_id, band, band_key) LSH bucket relation from a shingle relation.

    Signature in ONE shuffle: groupBy(doc_id) with `seeds` min-columns
    (map-side partial agg keeps one row per doc per map task). The
    explode-to-(doc, seed) form shuffles seeds× the shingle volume and
    needs two more shuffles (per-seed min, then per-band rollup) — at
    100 TB that's the difference between one shingle-keyed exchange and
    three, 16× the bytes. Band keys are then a pure projection."""
    rows_per_band = seeds // bands
    base = _hex_int_sql("md5(sh)", duck=False)
    mh = (
        sh.withColumn("h0", F.expr(base))
        .groupBy("doc_id")
        .agg(*[F.min(F.expr(_affine_sql(s, "h0"))).alias(f"mh{s}") for s in range(seeds)])
    )
    band_structs = ", ".join(
        "struct({b} AS band, md5(concat_ws('-', {cols})) AS band_key)".format(
            b=b,
            cols=", ".join(
                f"mh{s}" for s in range(b * rows_per_band, (b + 1) * rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return mh.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("x")
    ).select("doc_id", "x.band", "x.band_key")


def _verify_jaccard(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact jaccard for a (d1, d2) candidate relation.

    Verify ONLY candidate pairs: broadcast the (tiny) candidate set and
    intersect the two shingle lists per pair — two broadcast equi-joins
    over the shingle relation. The naive alternative (full pairwise
    jaccard semi-joined with candidates afterwards) re-runs the shingle
    self-join over every co-shingled pair, which is exactly the
    quadratic sweep LSH exists to avoid — measured 1.6× slower at sf0.1
    and catastrophically worse at scale.

    No forced broadcast: candidate volume scales with DUPLICATE DENSITY,
    not corpus size (an 80%-dup source generates O(dups²/bands) pairs), so
    an unconditional F.broadcast hint is a broadcast-OOM waiting to happen
    at 100 TB. With AQE on, Catalyst still picks broadcast-hash when the
    candidate side measures small at runtime, and degrades to a shuffled
    hash join when it does not — tests/test_skew_stress.py pins both: the
    uniform fixture still broadcasts, the dup-heavy fixture still returns
    exact jaccards either way.

    The no-op isNotNull(sh) filter on the sizes branch (shingle strings
    are never NULL) matches the filter the `sh` equi-join key pushes into
    s1/s2, so the sizes branch's distinct exchange canonicalizes equal to
    theirs and AQE reuses the shuffle instead of re-scanning the corpus
    (r12; one fewer scan + shingle exchange in the executed plan)."""
    sizes = (
        sh.where(F.col("sh").isNotNull())
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s1 = sh.select(F.col("doc_id").alias("d1"), "sh")
    s2 = sh.select(F.col("doc_id").alias("d2"), "sh")
    common = (
        cand
        .join(s1, "d1")
        .join(s2, ["d2", "sh"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"doc_id": "d1", "n": "n1"}), "d1")
        .join(sizes.withColumnsRenamed({"doc_id": "d2", "n": "n2"}), "d2")
        .select(
            "d1",
            "d2",
            (
                F.col("common").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("common"))
            ).alias("jaccard"),
        )
    )


_MINHASH_ROWS_PER_BAND = MINHASH_SEEDS // LSH_BANDS


def _minhash_bands_sql() -> str:
    """The hashed/mh/bands CTE text shared by every MinHash-banded oracle."""
    return f"""
  hashed AS (SELECT doc_id, {_hex_int_sql("md5(sh)", duck=True)} AS h0 FROM s),
  mh AS (SELECT doc_id,
                {", ".join(f"MIN({_affine_sql(s, 'h0')}) AS mh{s}" for s in range(MINHASH_SEEDS))}
         FROM hashed GROUP BY doc_id),
  bands AS (SELECT doc_id, u.band, u.band_key FROM mh,
            UNNEST([{", ".join(
                "{{'band': {b}, 'band_key': md5(concat_ws('-', {cols}))}}".format(
                    b=b,
                    cols=", ".join(
                        f"mh{s}"
                        for s in range(b * _MINHASH_ROWS_PER_BAND, (b + 1) * _MINHASH_ROWS_PER_BAND)
                    ),
                )
                for b in range(LSH_BANDS)
            )}]) AS t(u))"""


MINHASH_LSH_SQL = f"""
  WITH {_shingle_sql()},
  {_SIZES_SQL},
  {_minhash_bands_sql()},
  cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
  pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
  SELECT p.d1, p.d2, CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard
  FROM pairs p JOIN cand c ON c.d1 = p.d1 AND c.d2 = p.d2
       JOIN sizes x ON x.doc_id = p.d1 JOIN sizes y ON y.doc_id = p.d2
  WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}"""


# ---------------------------------------------------------------------------
# Incremental (cross-corpus) dedup — dedup a NEW batch against an existing
# REFERENCE corpus: the asymmetric variant every ongoing pipeline runs when
# a fresh crawl lands (drop new docs already represented in the training
# set). Same MinHash-banded machinery, but the candidate join is
# new-side × reference-side instead of a self-join — and the signature
# pass runs ONCE over the union (both sides share the bands relation).
# Self-contained on the test data: doc_id % INCR_REF_MOD == 0 is the
# reference slice; in production the reference bands are a materialized
# table maintained incrementally (append new survivors' bands each run).

INCR_REF_MOD = 5


def incremental_dedup(
    documents: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """(d_new, d_ref, jaccard) for every new-batch doc whose shingle set
    matches a reference doc at `threshold` — the drop-list of the
    incremental run. Candidates come from the banded equi-join of new
    bands × reference bands (linear shuffles, no self-join blow-up);
    only candidates pay the exact-jaccard verify."""
    sh = shingles(documents)
    bands_df = _minhash_bands(sh)
    is_ref = F.col("doc_id") % INCR_REF_MOD == 0
    a = bands_df.where(~is_ref).alias("a")
    b = bands_df.where(is_ref).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return (
        _verify_jaccard(sh, cand)
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("d1").alias("d_new"), F.col("d2").alias("d_ref"), "jaccard"
        )
    )


def build_dedup_index(ref_docs: DataFrame) -> dict[str, DataFrame]:
    """The STANDING dedup index of a reference corpus — what an ongoing
    pipeline persists once and appends to, so each new crawl is deduped
    WITHOUT re-shingling the corpus (r9 verdict #5; the actual 100 TB
    operating mode — reference text is never re-read after indexing).

    Three relations, each a one-pass derivation of the reference docs:
      bands    (doc_id, band, band_key)  — the LSH candidate keys
      shingles (doc_id, sh)              — distinct shingles, for the
                                           exact-jaccard verify of
                                           CANDIDATE ref docs only
      sizes    (doc_id, n)               — |shingle set| per doc, so the
                                           verify never recounts the
                                           reference side
    Persist each as parquet partitioned/bucketed by its join key (band_key
    for bands, doc_id for shingles/sizes) and the incremental run's joins
    are scan-pruned; appending a new batch's surviving docs keeps the
    index current. Layout convention matches similarity.persist_lsh_index."""
    sh = shingles(ref_docs)
    return {
        "bands": _minhash_bands(sh),
        "shingles": sh,
        "sizes": sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ),
    }


def append_to_dedup_index(index_dir: str, new_docs: DataFrame) -> None:
    """Append a batch's docs (the incremental run's SURVIVORS) to a
    persisted dedup index — the maintenance half of the standing-index
    contract: index once, then each run appends only its delta's bands/
    shingles/sizes. Per-doc relations are disjoint across batches (new
    doc_ids), so appending commutes with building the union index from
    scratch (test-pinned, including the resubmit-a-batch-after-append →
    everything flagged idempotence probe).

    Consistency across the three relations (r10 ADVICE #2): the batch's
    shingle relation is computed ONCE and cached (bands/shingles/sizes
    all derive from it — previously each append-write re-shingled the
    delta), and every Spark write lands in a staging subdir first, so
    the expensive derivation/write phase cannot leave the LIVE index
    with a bands row whose shingles/sizes rows are missing (which would
    silently drop verified pairs on every later incremental run). The
    final commit is three cheap file-move loops — not atomic across
    relations, but data-independent, fast, and MECHANICALLY RECOVERABLE
    (r11 verdict #5): before the first move a sidecar manifest
    (_MANIFEST.json, written atomically via temp+rename) records every
    staged file and its target relation, so an interruption anywhere in
    the commit is repaired by one :func:`recover_dedup_index` call —
    manifest present → roll the commit FORWARD (replay the remaining
    moves; staged part names are globally unique and os.replace is
    per-file atomic, so replay is idempotent), manifest absent → the
    derivation phase died before any live mutation → roll BACK (drop
    the staging dir; resubmit the batch). Never resubmit after a
    partial commit without recovering first: duplicate shingles/sizes
    rows would inflate the verify counts (duplicate bands alone are
    harmless — candidates are distinct-ed). This staged path assumes an
    os-rename-capable filesystem; on object stores the
    transactional-table-format MERGE (documented gap) is the answer."""
    import json
    import os
    import shutil
    import tempfile

    os.makedirs(index_dir, exist_ok=True)
    sh = shingles(new_docs).persist()
    staging = tempfile.mkdtemp(prefix="_staging_append_", dir=index_dir)
    try:
        built = {
            "bands": _minhash_bands(sh),
            "shingles": sh,
            "sizes": sh.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("n")
            ),
        }
        for name, df in built.items():
            df.write.mode("overwrite").parquet(os.path.join(staging, name))
        # sidecar manifest BEFORE the first move: the complete move list,
        # atomically visible (temp + rename), so recovery can replay it
        moves = [
            {"rel": name, "file": fn}
            for name in built
            for fn in sorted(os.listdir(os.path.join(staging, name)))
            if fn not in ("_SUCCESS", "._SUCCESS.crc")
        ]
        mtmp = os.path.join(staging, "_MANIFEST.json.tmp")
        with open(mtmp, "w") as f:
            json.dump({"moves": moves}, f)
        os.replace(mtmp, os.path.join(staging, "_MANIFEST.json"))
        _replay_append_commit(index_dir, staging)
    finally:
        sh.unpersist()


def _replay_append_commit(index_dir: str, staging: str) -> None:
    """Execute (or re-execute) the move list in a staging dir's manifest.
    Idempotent: a file already moved is simply absent from staging."""
    import json
    import os
    import shutil

    with open(os.path.join(staging, "_MANIFEST.json")) as f:
        moves = json.load(f)["moves"]
    for mv in moves:
        live = os.path.join(index_dir, mv["rel"])
        os.makedirs(live, exist_ok=True)
        src = os.path.join(staging, mv["rel"], mv["file"])
        if os.path.exists(src):
            os.replace(src, os.path.join(live, mv["file"]))
    for rel in {mv["rel"] for mv in moves}:
        success = os.path.join(index_dir, rel, "_SUCCESS")
        if not os.path.exists(success):
            open(success, "w").close()
    os.remove(os.path.join(staging, "_MANIFEST.json"))
    shutil.rmtree(staging, ignore_errors=True)


def recover_dedup_index(index_dir: str) -> dict[str, list[str]]:
    """Repair an index left by an interrupted :func:`append_to_dedup_index`
    — one call, deterministic outcome per staging dir: roll FORWARD any
    append that reached its commit (manifest present: replay the
    remaining moves — per-file os.replace is atomic and staged names are
    globally unique, so this is safe to run any number of times, live or
    after a crash), roll BACK any append that died during derivation
    (no manifest: nothing touched the live relations; drop the staging
    dir and resubmit the batch). Returns {'rolled_forward': [...],
    'rolled_back': [...]} naming the staging dirs handled."""
    import os
    import shutil

    report: dict[str, list[str]] = {"rolled_forward": [], "rolled_back": []}
    if not os.path.isdir(index_dir):
        return report
    for entry in sorted(os.listdir(index_dir)):
        staging = os.path.join(index_dir, entry)
        if not entry.startswith("_staging_append_") or not os.path.isdir(staging):
            continue
        if os.path.exists(os.path.join(staging, "_MANIFEST.json")):
            _replay_append_commit(index_dir, staging)
            report["rolled_forward"].append(entry)
        else:
            shutil.rmtree(staging, ignore_errors=True)
            report["rolled_back"].append(entry)
    return report


def read_dedup_index(spark, index_dir: str) -> dict[str, DataFrame]:
    """Read a persisted dedup index back as the dict
    incremental_dedup_indexed consumes."""
    return {
        name: spark.read.parquet(f"{index_dir}/{name}")
        for name in ("bands", "shingles", "sizes")
    }


def incremental_dedup_indexed(
    delta_docs: DataFrame,
    index: dict[str, DataFrame],
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """(d_new, d_ref, jaccard): dedup a DELTA batch against a standing
    index (build_dedup_index) — only the delta is shingled/minhashed;
    the reference side is READ (bands for candidates, shingles+sizes for
    the verify of candidate pairs), never recomputed. Cost therefore
    tracks DELTA size: the band equi-join is delta-bands × index-bands
    (linear in each, no self-join), and the verify touches exactly the
    candidate pairs' rows of the index. Same result as
    :func:`incremental_dedup` on the equivalent split (test-pinned) —
    this is the code path a production pipeline runs; the one-shot form
    exists for self-contained oracle checks."""
    sh_new = shingles(delta_docs)
    bands_new = _minhash_bands(sh_new)
    a = bands_new.alias("a")
    b = index["bands"].alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    sizes_new = sh_new.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    s1 = sh_new.select(F.col("doc_id").alias("d1"), "sh")
    s2 = index["shingles"].select(F.col("doc_id").alias("d2"), "sh")
    common = (
        cand.join(s1, "d1")
        .join(s2, ["d2", "sh"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(
            sizes_new.withColumnsRenamed({"doc_id": "d1", "n": "n1"}), "d1"
        )
        .join(
            index["sizes"].withColumnsRenamed({"doc_id": "d2", "n": "n2"}),
            "d2",
        )
        .select(
            F.col("d1").alias("d_new"),
            F.col("d2").alias("d_ref"),
            (
                F.col("common").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


INCREMENTAL_DEDUP_SQL = f"""
  WITH {_shingle_sql()},
  {_SIZES_SQL},
  {_minhash_bands_sql()},
  cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id % {INCR_REF_MOD} <> 0 AND b.doc_id % {INCR_REF_MOD} = 0),
  pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM s a JOIN s b ON a.sh = b.sh
             AND a.doc_id % {INCR_REF_MOD} <> 0 AND b.doc_id % {INCR_REF_MOD} = 0
            GROUP BY a.doc_id, b.doc_id)
  SELECT p.d1 AS d_new, p.d2 AS d_ref,
         CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard
  FROM pairs p JOIN cand c ON c.d1 = p.d1 AND c.d2 = p.d2
       JOIN sizes x ON x.doc_id = p.d1 JOIN sizes y ON y.doc_id = p.d2
  WHERE CAST(common AS DOUBLE) / (x.n + y.n - common) >= {JACCARD_THRESHOLD}"""


# ---------------------------------------------------------------------------
# SimHash


def _simhash_bit_exprs(duck: bool) -> tuple[list[str], str]:
    """Per-bit contribution sums + fingerprint assembly, engine-flavored.

    Bit b of md5(sh): hex nibble b//4 (1-based substr), bit 3-(b%4) within
    the nibble. Contribution ±1 per distinct shingle; sign of the sum sets
    the fingerprint bit.
    """
    instr = "strpos" if duck else "instr"
    div = "//" if duck else "DIV"
    sums = []
    for b in range(SIMHASH_BITS):
        nib = f"({instr}('0123456789abcdef', substr(md5(sh), {b // 4 + 1}, 1)) - 1)"
        bit = f"(({nib} {div} {2 ** (3 - b % 4)}) % 2)"
        sums.append(f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s_{b}")
    fp = " + ".join(
        f"CASE WHEN s_{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(SIMHASH_BITS)
    )
    return sums, fp


def simhash_fingerprints(documents: DataFrame) -> DataFrame:
    """60-bit SimHash fingerprint per document (one groupBy pass).

    r12 per-task rewrite: the 15-hex-digit md5 prefix is parsed ONCE per
    shingle with conv() into a 60-bit BIGINT `_h`; each bit's ±1
    contribution is then `(shiftright(_h, s) & 1) * 2 - 1` — one shift +
    one AND instead of the old per-bit instr scan over the hex alphabet
    (60 string scans per shingle → 1 parse + 60 integer ops; measured
    ~25% off the fingerprint aggregate at 2M shingles, bit-identical
    sums). Bit b lives at shift 4·(14 − b/4) + (3 − b%4): hex char b/4+1
    (most-significant-first) holds nibble bits 3..0. The DuckDB twin
    keeps the positional-instr form (_simhash_bit_exprs(duck=True));
    both compute the same per-bit counts, so the fingerprints agree
    bit-for-bit (pinned by every simhash oracle)."""
    # Pure DataFrame composition (no temp views — they're session-global
    # and would race if the harness ran queries concurrently).
    _, fp = _simhash_bit_exprs(duck=False)
    parsed = shingles(documents).select(
        "doc_id", F.expr("CAST(conv(substr(md5(sh), 1, 15), 16, 10) AS BIGINT)").alias("_h")
    )
    agg_cols = [
        F.expr(
            f"SUM((shiftright(_h, {4 * (14 - b // 4) + (3 - b % 4)}) & 1) * 2 - 1)"
        ).alias(f"s_{b}")
        for b in range(SIMHASH_BITS)
    ]
    bitsums = parsed.groupBy("doc_id").agg(*agg_cols)
    return bitsums.select("doc_id", F.expr(fp).alias("simhash"))


def simhash_dedup(documents: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance (pairwise comparison —
    see module docstring for the banded scale path).

    Both self-join sides consume the fingerprint relation and Spark does
    not CSE across branches — without materialization the scan + tokenize
    + 60-bit-sum aggregate runs twice. The relation is DOC-sized (doc_id +
    one BIGINT), so localCheckpoint is a tiny pin for half the corpus
    work (r12 A/B/A at sf0.1: 1.48 s vs 1.82/1.75 s base blocks, ≈ −18%).
    Recomputed every execution — no cross-run caching."""
    fps = materialize(simhash_fingerprints(documents))
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15
SIMHASH_BANDED_MAX_HAMMING = SIMHASH_BANDS - 1  # pigeonhole: ham<=3 ⇒ a band matches


def simhash_banded_dedup(
    documents: DataFrame, max_hamming: int = SIMHASH_BANDED_MAX_HAMMING
) -> DataFrame:
    """SimHash at scale: 4×15-bit pigeonhole blocking instead of pairwise.

    Any pair with hamming ≤ 3 must agree exactly on at least one 15-bit
    band, so candidates come from four equi-joins on (band, band value) —
    linear shuffles — and only candidates pay the hamming check. Exact
    (no recall loss) for the ≤3 threshold by the pigeonhole principle.

    The fingerprint relation feeds both banded join sides; it is
    doc-sized (doc_id + one BIGINT), so localCheckpoint folds the corpus
    scan + fingerprint aggregate to one execution (r12 A/B/A at sf0.1:
    1.46 s vs 1.71/1.84 s base blocks, ≈ −18%). Recomputed every
    execution — no cross-run caching.
    """
    fps = materialize(simhash_fingerprints(documents))
    banded = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {SIMHASH_BANDS - 1}), "
                f"b -> struct(b AS band, shiftright(simhash, b * {SIMHASH_BAND_BITS})"
                f" % {2 ** SIMHASH_BAND_BITS} AS bv))"
            )
        ).alias("x"),
    ).select("doc_id", "simhash", "x.band", "x.bv")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)


def _simhash_banded_sql() -> str:
    sums, fp = _simhash_bit_exprs(duck=True)
    bands = ", ".join(
        f"{{'band': {b}, 'bv': (simhash >> {b * SIMHASH_BAND_BITS}) % {2 ** SIMHASH_BAND_BITS}}}"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
  WITH {_shingle_sql()},
  bitsums AS (SELECT doc_id, {", ".join(sums)} FROM s GROUP BY doc_id),
  fps AS (SELECT doc_id, {fp} AS simhash FROM bitsums),
  banded AS (SELECT doc_id, simhash, u.band, u.bv FROM fps,
             UNNEST([{bands}]) AS t(u)),
  cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                  bit_count(xor(a.simhash, b.simhash)) AS hamming
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
  SELECT * FROM cand WHERE hamming <= {SIMHASH_BANDED_MAX_HAMMING}"""


SIMHASH_BANDED_SQL = _simhash_banded_sql()


def _simhash_sql() -> str:
    sums, fp = _simhash_bit_exprs(duck=True)
    return f"""
  WITH {_shingle_sql()},
  bitsums AS (SELECT doc_id, {", ".join(sums)} FROM s GROUP BY doc_id),
  fps AS (SELECT doc_id, {fp} AS simhash FROM bitsums)
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM fps a JOIN fps b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}"""


SIMHASH_SQL = _simhash_sql()


# ---------------------------------------------------------------------------
# near-dup clusters (connected components over duplicate pairs)


def neardup_clusters(documents: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Group near-duplicate pairs into clusters: each document maps to the
    minimum doc_id of its connected component — the canonical "keep one
    representative per duplicate cluster" output of a dedup pipeline.

    Iterative min-label propagation over the MinHash-LSH pair graph: each
    round every node adopts the smallest label among itself and its
    neighbors; converges in <= graph-diameter rounds (duplicate clusters
    are tiny — a handful of rounds). Driver-side loop checks a single
    changed-row count per round; per-round state is localCheckpointed to
    cut lineage. At scale this is the standard large-graph CC recipe
    (GraphFrames uses the same alternating large/small-star variant).
    """
    pairs = minhash_lsh_dedup(documents).select("d1", "d2")
    # The edge list is tiny (dup pairs only) but EXPENSIVE to produce (the
    # full MinHash-LSH pass) — checkpoint it once so the per-round joins
    # below reuse the materialized pairs instead of re-running the LSH
    # lineage every iteration (measured: 12.3 s → ~6 s for the composed
    # tp_keep_best at sf0.1).
    edges = materialize(
        pairs.unionByName(
            pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
        )
    )
    labels = materialize(
        edges.select(F.col("d1").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    prev = None
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["d2"] == labels["node"])
            .groupBy(F.col("d1").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
                (F.coalesce("nmin", F.col("label")) < F.col("label")).alias("_changed"),
            )
        )
        updated = materialize(updated)
        # r13: release the superseded round DETERMINISTICALLY — the loop
        # runs up to max_iterations rounds, and without this the pool's
        # FIFO cap evicted the (expensive) `edges` relation mid-loop,
        # recomputing the whole MinHash-LSH pass every remaining round
        # (measured: tp_keep_best 2.75 → 10.5 s before this release).
        if prev is not None:
            release(prev)
        prev = updated
        changed = updated.where("_changed").count()
        labels = updated.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        # Label propagation needs up to component-diameter rounds; stopping
        # early would silently emit wrong cluster_ids for long chains.
        raise RuntimeError(
            f"neardup_clusters did not converge within {max_iterations} rounds "
            "(a connected component's diameter exceeds the cap); raise "
            "max_iterations"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


NEARDUP_CLUSTERS_SQL = f"""
  WITH RECURSIVE pairs AS ({MINHASH_LSH_SQL}),
  edges AS (SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs),
  reach(u, v) AS (
    SELECT DISTINCT u, u FROM edges
    UNION
    SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
  SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


EMBED_PAIR_BLOCKS = 16  # b-side block count of the pair-generating equi-join


def embedding_neardup(
    embeddings: DataFrame, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """Vector near-dup pairs above a cosine threshold (pairwise; bucket with
    similarity.py's LSH first at scale).

    r12 optimization: the all-pairs generator is a BLOCKED EQUI-JOIN, not a
    BroadcastNestedLoopJoin. The b side carries a pmod(vec_id, 16) block
    key; the a side explodes to all 16 block values, so the hash join
    `gj = g AND v1 < v2` emits every unordered pair exactly once — same n²
    work, but inside whole-stage codegen instead of the BNL operator
    (whose per-pair row copy + interpreted projection was the wall:
    measured 5.7 s → 1.1 s at sf0.1, bit-identical output). That also
    unlocks the named-dims + precomputed-norm layout (functions/vectors.py
    — bit-identical by the evaluate-once lemma), which under the old BNL
    join collapsed into the per-pair expression and knocked the stage out
    of codegen (the round-2 7 s vs 48 s measurement). The plan compiles
    under spark.sql.codegen.fallback=false (pinned).

    Perf note: the threshold filter must stay ABOVE the projection — if
    Catalyst pushed it into the join condition, the unrolled dot product
    would be evaluated in the join's non-codegen condition path and again
    in the projection. A nondeterministic term in the FILTER condition
    (`+ rand·0`, exactly zero, bit-identical output) blocks that pushdown:
    nondeterministic predicates are never moved into join conditions, and
    Spark has no x·0→0 fold (it would be unsound for NaN);
    tests/test_plan_shapes.py pins the resulting plan."""
    from ..functions.vectors import dim_exprs, dims_cosine_sql, dims_norm_sql

    a = (
        embeddings.select(F.col("vec_id").alias("v1"), *dim_exprs("embedding", "_a"))
        .withColumn("_na", F.expr(dims_norm_sql("_a")))
        .withColumn("_gj", F.explode(F.expr(f"sequence(0, {EMBED_PAIR_BLOCKS - 1})")))
    )
    b = embeddings.select(
        F.col("vec_id").alias("v2"),
        F.pmod("vec_id", F.lit(EMBED_PAIR_BLOCKS)).alias("_g"),
        *dim_exprs("embedding", "_b"),
    ).withColumn("_nb", F.expr(dims_norm_sql("_b")))
    return (
        a.join(b, (F.col("_gj") == F.col("_g")) & (F.col("v1") < F.col("v2")))
        .select(
            "v1",
            "v2",
            F.expr(dims_cosine_sql("_a", "_b", "_na", "_nb")).alias("cosine"),
        )
        .where((F.col("cosine") + F.rand(42) * 0.0) >= threshold)
    )


EMBED_NEARDUP_SQL = f"""
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         {cosine_sql("a.embedding", "b.embedding", duck=True)} AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {cosine_sql("a.embedding", "b.embedding", duck=True)} >= {COSINE_DUP_THRESHOLD}"""


def embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    probe_hamming: int = 1,
) -> DataFrame:
    """The bucketed scale twin of `embedding_neardup`: hyperplane-LSH
    candidate generation (similarity.py's bucket family) + exact cosine
    verification.

    One side explodes into its own bucket plus every hamming-1 probe, so
    any pair whose 6-bit signatures differ in ≤1 plane becomes an equi-join
    candidate — linear shuffles, no cross product. Only candidate pairs pay
    the exact cosine. Each qualifying pair matches EXACTLY once (a probe
    list holds distinct bucket values, the exact side matches at most one
    of them, and `v1 < v2` keeps one orientation), so no dedup pass or
    embedding re-join is needed — both embeddings ride through the
    equi-join. Recall vs the quadratic baseline is a measured property
    (tests/test_ann_recall.py), not assumed. `probe_hamming` is the
    recall/cost knob — measured at sf0.001 against the 0.4-cosine baseline
    (a near-uniform corpus, hard mode for any LSH):

      probes ≤ hamming-1 (7 buckets):  recall 0.32, candidates ~11% of n²
      probes ≤ hamming-2 (22 buckets): recall 0.48, candidates ~34% of n²
      banded AND-OR (2×6 planes + h1): recall 0.52, candidates ~22% —
        the amplification path for real corpora, at the cost of a
        candidate-dedup pass (pairs can match in several bands)

    Real near-dup corpora sit at cosine ≥ 0.9 (θ≈25°, per-plane flip
    ≈ 0.14) where the default 6-plane/h1 table already recalls ~0.8.
    """
    from .similarity import LSH_PLANES

    return _embed_band_pairs(
        embeddings, start=0, probe_hamming=probe_hamming,
        threshold=threshold, planes=LSH_PLANES,
    )


def _embed_lsh_sql() -> str:
    from .similarity import LSH_PLANES, lsh_bucket_sql

    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << p})" for p in range(LSH_PLANES)])
    return f"""
  WITH b AS (SELECT vec_id, embedding,
                    {lsh_bucket_sql("embedding", duck=True)} AS bucket
             FROM embeddings),
  probes AS (SELECT vec_id, embedding, unnest([{probes}]) AS bucket FROM b)
  SELECT a.vec_id AS v1, c.vec_id AS v2,
         {cosine_sql("a.embedding", "c.embedding", duck=True)} AS cosine
  FROM probes a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE {cosine_sql("a.embedding", "c.embedding", duck=True)} >= {COSINE_DUP_THRESHOLD}"""


EMBED_LSH_SQL = _embed_lsh_sql()


EMBED_LSH_N_BANDS = 5  # default operating point: recall 0.894 at sf0.001


def embedding_neardup_lsh_banded(
    embeddings: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    n_bands: int = EMBED_LSH_N_BANDS,
    probe_hamming: int = 1,
) -> DataFrame:
    """Banded AND-OR amplification of `embedding_neardup_lsh`: `n_bands`
    INDEPENDENT hyperplane tables (disjoint 6-plane ranges of the same
    deterministic md5-parity family), a pair is a candidate if it collides
    in ANY band — the same OR-construction MinHash banding uses
    (`minhash_lsh_dedup`), applied to the cosine space.

    Per-band recall r compounds to 1-(1-r)^bands for independent bands:
    measured 0.32 (1 band) → 0.52 (2) → 0.65 (3) → 0.74 (4) → 0.89 (5,
    the default operating point, floor-pinned at 0.8 in
    tests/test_ann_recall.py) on the near-uniform sf0.001 corpus at the
    hard 0.4-cosine threshold, and ~0.8 → ~1 at the realistic ≥0.9
    near-dup regime. Cost is linear in bands (each band is
    its own equi-join; no cross product), plus one distinct over the
    SURVIVOR pairs — pairs that collide in several bands verify cosine in
    each, so only the tiny post-threshold set pays the dedup shuffle, not
    the candidate set. Both embeddings ride through each band's equi-join,
    so there is no re-join against the corpus (same single-match argument
    as the unbanded twin; the distinct is what replaces it across bands).

    The distinct's key includes the cosine, which is safe: each band
    computes the identical expression on identical inputs, so duplicates
    are bit-equal. Exactness: output ⊆ `embedding_neardup` (precision 1.0,
    pinned in tests/test_ann_recall.py).

    Scan story: ONE pass over the corpus — every vector explodes into its
    (band, bucket) pair per band and candidates come from a single
    equi-join on the composite (band, bucket) key, instead of re-scanning
    the corpus once per band (at 100 TB the scan dominates: L-band
    fan-out-in-one-pass is 1× I/O, per-band scans are L×).

    Named-dims layout (functions/vectors.py): sign projections, norms and
    the verify cosine reference per-dimension columns so every stage stays
    in whole-stage codegen (the element_at form ran interpreted — PERF.md;
    compilation pinned by tests/test_codegen_compiles.py). Each side
    carries its 64 dims + norm through the candidate shuffle instead of the
    float array — ~1.8× wider rows, bought back many times over by the
    per-pair cosine being codegen'd attribute arithmetic instead of an
    interpreted 192-term tree. Bit-identical results to the previous
    layout (same left-associated double ops; norms hoisted pre-join are
    the same SQRT over the same sums)."""
    import itertools

    from .similarity import lsh_bucket_dims_sql
    from ..functions.vectors import dim_exprs, dim_names, dims_cosine_sql, dims_norm_sql

    ad, cd = dim_names("_ad"), dim_names("_cd")
    base_a = embeddings.select("vec_id", *dim_exprs("embedding", "_ad")).select(
        "vec_id",
        F.expr(dims_norm_sql("_ad")).alias("a_nrm"),
        *[
            F.expr(lsh_bucket_dims_sql("_ad", planes=6, start=b * 6)).alias(f"_b{b}")
            for b in range(n_bands)
        ],
        *ad,
    )
    base_c = embeddings.select("vec_id", *dim_exprs("embedding", "_cd")).select(
        "vec_id",
        F.expr(dims_norm_sql("_cd")).alias("c_nrm"),
        *[
            F.expr(lsh_bucket_dims_sql("_cd", planes=6, start=b * 6)).alias(f"_b{b}")
            for b in range(n_bands)
        ],
        *cd,
    )
    plain_structs = ", ".join(
        f"struct({b} AS band, _b{b} AS bucket)" for b in range(n_bands)
    )
    c = base_c.select(
        "vec_id", "c_nrm", F.explode(F.expr(f"array({plain_structs})")).alias("x"), *cd
    ).select("vec_id", "c_nrm", "x.band", "x.bucket", *cd).alias("c")
    probe_structs = []
    for b in range(n_bands):
        masks = [0]
        for r in range(1, probe_hamming + 1):
            masks += [
                sum(1 << p for p in bits)
                for bits in itertools.combinations(range(6), r)
            ]
        probe_structs += [
            f"struct({b} AS band, _b{b} ^ {m} AS bucket)" if m else
            f"struct({b} AS band, _b{b} AS bucket)"
            for m in masks
        ]
    a = base_a.select(
        "vec_id",
        "a_nrm",
        F.explode(F.expr(f"array({', '.join(probe_structs)})")).alias("x"),
        *ad,
    ).select("vec_id", "a_nrm", "x.band", "x.bucket", *ad).alias("a")
    return (
        a.join(c, ["band", "bucket"])
        .where(F.col("a.vec_id") < F.col("c.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("c.vec_id").alias("v2"),
            F.expr(dims_cosine_sql("_ad", "_cd", "a_nrm", "c_nrm")).alias("cosine"),
        )
        .where((F.col("cosine") + F.rand(43) * 0.0) >= threshold)
        .distinct()
    )


def _embed_band_pairs(
    embeddings: DataFrame,
    start: int,
    probe_hamming: int,
    threshold: float,
    planes: int,
) -> DataFrame:
    """One band's (v1, v2, cosine) survivors: bucket equi-join on the
    band's plane range + hamming-`probe_hamming` probes + exact cosine
    verify. Identical shape to `embedding_neardup_lsh` (which is the
    1-band special case kept separate for its plan pin and docstring).
    Named-dims layout — see `embedding_neardup_lsh_banded`."""
    import itertools

    from .similarity import lsh_bucket_dims_sql
    from ..functions.vectors import dim_exprs, dim_names, dims_cosine_sql, dims_norm_sql

    ad, cd = dim_names("_ad"), dim_names("_cd")
    b_a = embeddings.select("vec_id", *dim_exprs("embedding", "_ad")).select(
        "vec_id",
        F.expr(dims_norm_sql("_ad")).alias("a_nrm"),
        F.expr(lsh_bucket_dims_sql("_ad", planes=planes, start=start)).alias("bucket"),
        *ad,
    )
    b_c = embeddings.select("vec_id", *dim_exprs("embedding", "_cd")).select(
        "vec_id",
        F.expr(dims_norm_sql("_cd")).alias("c_nrm"),
        F.expr(lsh_bucket_dims_sql("_cd", planes=planes, start=start)).alias("bucket"),
        *cd,
    )
    probe_list = ["bucket"]
    for r in range(1, probe_hamming + 1):
        probe_list += [
            f"bucket ^ {sum(1 << p for p in bits)}"
            for bits in itertools.combinations(range(planes), r)
        ]
    probes = ", ".join(probe_list)
    a = b_a.select(
        "vec_id", "a_nrm", F.explode(F.expr(f"array({probes})")).alias("bucket"), *ad
    ).alias("a")
    return (
        a.join(b_c.alias("c"), "bucket")
        .where(F.col("a.vec_id") < F.col("c.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("c.vec_id").alias("v2"),
            F.expr(dims_cosine_sql("_ad", "_cd", "a_nrm", "c_nrm")).alias("cosine"),
        )
        .where((F.col("cosine") + F.rand(43) * 0.0) >= threshold)
    )


def _embed_lsh_banded_sql(n_bands: int = EMBED_LSH_N_BANDS) -> str:
    from .similarity import lsh_bucket_sql

    parts = []
    selects = []
    for band in range(n_bands):
        bucket = lsh_bucket_sql("embedding", duck=True, planes=6, start=band * 6)
        probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << p})" for p in range(6)])
        parts.append(f"""
  b{band} AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
  p{band} AS (SELECT vec_id, embedding, unnest([{probes}]) AS bucket FROM b{band})""")
        selects.append(f"""
  SELECT a.vec_id AS v1, c.vec_id AS v2,
         {cosine_sql("a.embedding", "c.embedding", duck=True)} AS cosine
  FROM p{band} a JOIN b{band} c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE {cosine_sql("a.embedding", "c.embedding", duck=True)} >= {COSINE_DUP_THRESHOLD}""")
    # UNION (not UNION ALL): the cross-band dedup, bit-safe because each
    # band computes the identical cosine expression.
    return "  WITH " + ",".join(parts) + "\n  " + "\n  UNION\n  ".join(selects)


EMBED_LSH_BANDED_SQL = _embed_lsh_banded_sql()


EMBED_LSH_TARGET_OCCUPANCY = 64  # vectors per bucket the auto variant aims for


def embedding_neardup_lsh_auto(
    embeddings: DataFrame,
    threshold: float = 0.9,
    target_occupancy: int = EMBED_LSH_TARGET_OCCUPANCY,
    probe_hamming: int = 1,
) -> DataFrame:
    """`embedding_neardup_lsh` with the PRODUCTION scaling rule applied:
    the hyperplane count tracks the corpus size so per-bucket occupancy
    (and therefore candidates per vector) stays CONSTANT as n grows —
    planes = max(6, ceil(log2(n / target_occupancy))), i.e. buckets ≈
    n / occupancy. This is the documented fix for the fixed-geometry
    superlinearity the bench dup-probe measures on `dd_embed_lsh`
    (n²/2^planes uniform background at frozen planes).

    The n-dependent geometry costs ONE count() job at plan-build time —
    the same bounded-driver-work class as the trained-quantizer family's
    k-means iterations (similarity.ivf_trained). It also excludes this
    operator from the static-SQL oracle registry (the oracle text would
    have to embed a bucket expression chosen by the data); correctness is
    pinned instead by tests/test_ann_recall.py: precision 1.0 by
    construction (exact cosine verify), recall ≥ 0.9 on planted
    high-cosine near-dup clusters at TWO corpus sizes, and sub-quadratic
    candidate growth vs the fixed-plane twin.

    Recall note: more planes = more per-plane sign flips per pair, so
    recall at a FIXED threshold decays with n for borderline pairs —
    but for the near-dup regime this operator targets (cosine ≥ 0.9,
    per-plane flip ≤ ~0.14; planted 0.999-cosine dups flip ≤ ~0.015)
    the hamming-1 probe ring keeps recall high at any realistic planes
    count. For threshold-0.4 similarity SEARCH at scale, use the banded
    AND-OR variant (`embedding_neardup_lsh_banded`) whose bands recover
    recall independently of geometry."""
    n = embeddings.count()
    # ceil(log2(n / occupancy)) = (ceil(n/occ) - 1).bit_length(), floored
    # at the fixed-geometry default of 6 planes
    planes = max(6, (max(n // target_occupancy, 1) - 1).bit_length())
    return _embed_band_pairs(
        embeddings, start=0, probe_hamming=probe_hamming,
        threshold=threshold, planes=planes,
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): partition the embedding space with a
# coarse quantizer, then near-dup only WITHIN each cluster — the published
# scale recipe for embedding-level corpus dedup (Abbas et al. 2023,
# "SemDeDup": k-means partition, pairwise cosine inside clusters, keep one
# representative per duplicate group). The cluster assignment bounds the
# pairwise sweep to O(Σ |cluster|²) instead of O(n²): at 100 TB you raise
# the centroid count proportionally so cluster sizes stay bounded, and the
# per-cluster work is an equi-join on cid — never a cross product.

SEMDEDUP_CENTROIDS = 8
SEMDEDUP_THRESHOLD = 0.35


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_centroids: int = SEMDEDUP_CENTROIDS,
) -> DataFrame:
    """Per-vector SemDeDup verdict: `keep` = no lower-id vector in the same
    coarse cluster with cosine ≥ `threshold` (min-id representative per
    duplicate group survives, SemDeDup's "keep one per group" rule).

    Centroids are the deterministic vec_id < `n_centroids` subset (exactly
    the IVF coarse quantizer of similarity.ivf_topk, so the whole operator
    stays SQL-oracle-checkable; swap in similarity.kmeans_centroids for
    trained centroids — same plan shape, rows-only check). Assignment is
    one broadcast argmin join; the within-cluster pair generation is an
    equi-join on cid. The `+ rand·0` term is the optimizer barrier that
    keeps the threshold filter OUT of the join condition (see
    embedding_neardup — BNL/post-join predicates evaluate outside codegen
    and would recompute the unrolled cosine per pair).

    Named-dims layout (functions/vectors.py) on both the vector and the
    broadcast centroid side: the argmin distance and the within-cluster
    cosine are attribute arithmetic, keeping every stage in whole-stage
    codegen (pinned in tests/test_codegen_compiles.py). Bit-identical
    results — the checkpointed assignment carries dims + norm instead of
    the float array.
    """
    from ..functions.vectors import (
        dim_exprs,
        dim_names,
        dims_cosine_sql,
        dims_dot_sql,
        dims_norm_sql,
    )

    vd = dim_names("_d")
    cents = embeddings.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), *dim_exprs("embedding", "_cd")
    )
    v = embeddings.select("vec_id", *dim_exprs("embedding", "_d")).alias("v")
    c = cents.alias("c")
    dist = F.expr(
        f"({dims_dot_sql('_cd', '_cd')}) - 2.0 * ({dims_dot_sql('_d', '_cd')})"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("cid").asc())
    # The assignment relation feeds three plan branches (both sides of the
    # pair self-join + the final verdict select) and Spark does not CSE
    # across branches — checkpoint it once so the broadcast-argmin pass
    # runs 1×, not 3×. At scale this is the quantizer-assignment table a
    # pipeline persists anyway (plan-pinned: exactly one
    # BroadcastNestedLoopJoin in the executed plan).
    # (r12 note: the min(struct(dist, cid, dims)) argmin used elsewhere
    # was tried here and REVERTED — with the 64 named-dim columns in the
    # struct payload the optimizer's constraint/tree transforms blow the
    # driver heap; the window over the checkpointed n×k relation is the
    # cheaper plan for this operator's layout.)
    assigned = materialize(
        v.join(F.broadcast(c))
        .select("v.vec_id", "c.cid", dist.alias("dist"), *vd)
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("vec_id", "cid", F.expr(dims_norm_sql("_d")).alias("_nrm"), *vd)
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    pair_cos = F.expr(dims_cosine_sql("a._d", "b._d", "a._nrm", "b._nrm"))
    dup_counts = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            pair_cos.alias("cosine"),
        )
        .where((F.col("cosine") + F.rand(44) * 0.0) >= threshold)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_dups_lower"))
    )
    return (
        assigned.select("vec_id", "cid")
        .join(dup_counts, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce("n_dups_lower", F.lit(0).cast("bigint")).alias("n_dups_lower"),
            (F.coalesce("n_dups_lower", F.lit(0).cast("bigint")) == 0).alias("keep"),
        )
    )


def _semantic_dedup_sql() -> str:
    from ..functions.vectors import dot_sql

    dist = (
        f"({dot_sql('c.cemb', 'c.cemb', duck=True)})"
        f" - 2.0 * ({dot_sql('v.embedding', 'c.cemb', duck=True)})"
    )
    return f"""
  WITH cents AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings
                 WHERE vec_id < {SEMDEDUP_CENTROIDS}),
  assign_all AS (
    SELECT v.vec_id, v.embedding, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist} ASC, c.cid ASC) AS r
    FROM embeddings v CROSS JOIN cents c),
  a AS (SELECT vec_id, embedding, cid FROM assign_all WHERE r = 1),
  dups AS (
    SELECT y.vec_id, COUNT(*) AS n_dups_lower
    FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
    WHERE {cosine_sql("x.embedding", "y.embedding", duck=True)} >= {SEMDEDUP_THRESHOLD}
    GROUP BY y.vec_id)
  SELECT a.vec_id, a.cid,
         COALESCE(d.n_dups_lower, 0) AS n_dups_lower,
         COALESCE(d.n_dups_lower, 0) = 0 AS keep
  FROM a LEFT JOIN dups d ON a.vec_id = d.vec_id"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()


# ---------------------------------------------------------------------------
# Exact-substring span dedup — the Lee et al. 2022 ("Deduplicating Training
# Data Makes Language Models Better") operation: find token SPANS repeated
# anywhere in the corpus (within or across documents) and emit, per doc,
# the maximal spans to cut. The paper builds a suffix array; the
# distributed equivalent is fixed-width token windows (stride 1) hashed and
# grouped — any repeated substring of length ≥ W contains a repeated
# W-window, so W-window recall is exact for spans ≥ W (shorter repeats are
# invisible by design; W is the paper's 50-token knob).
#
# Shuffle story at 100 TB: windows explode row-locally inside the scan
# (n_tokens rows per doc), the repeat test is ONE groupBy on the window
# hash (uniform md5 → skew-free), flagged positions come back via an
# equi-join on the same hash, and span assembly is a per-doc
# gaps-and-islands window (partition key doc_id — high-cardinality).
# No pairwise anything: cost is linear in corpus token count.

SUBSTR_W = 10  # window width in tokens (the paper uses 50; test corpus is small)


def exact_substring_spans(documents: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """Per doc: maximal token spans [span_start, span_end] (1-based,
    inclusive) covered by some W-token window that occurs ≥2 times in the
    corpus, plus the span token count — the cut-list for substring-level
    dedup."""
    from pyspark.sql import Window

    from .textstats import _words

    wins = (
        documents.select("doc_id", _words().alias("_ws"))
        # docs shorter than W carry no window (and Spark's sequence(1, 0)
        # would run DESCENDING — the guard is correctness, not just cost)
        .where(F.size("_ws") >= w)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_ws) - {w} + 1),"
                    f" i -> struct(i AS pos, md5(array_join(slice(_ws, i, {w}), ' ')) AS h))"
                )
            ).alias("x"),
        )
        .select("doc_id", "x.pos", "x.h")
    )
    dup = wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).where(F.col("cnt") > 1)
    flagged = wins.join(dup.select("h"), "h").select("doc_id", "pos")
    w1 = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        flagged.withColumn("prev", F.lag("pos").over(w1))
        .withColumn(
            "new_island",
            F.col("prev").isNull() | (F.col("pos") > F.col("prev") + w),
        )
        .withColumn("island", F.sum(F.col("new_island").cast("int")).over(w1))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + w - 1).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def _exact_substring_sql(w: int = SUBSTR_W) -> str:
    from .textstats import WORDS_SQL

    return f"""
  WITH toks AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
  wins AS (SELECT doc_id, i AS pos,
                  md5(array_to_string(ws[i : i + {w} - 1], ' ')) AS h
           FROM toks, unnest(range(1, greatest(len(ws) - {w} + 1, 0) + 1)) AS t(i)),
  dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1),
  flagged AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (h)),
  isl AS (SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                        OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {w}
                      THEN 1 ELSE 0 END AS new_island
          FROM flagged),
  grp AS (SELECT doc_id, pos,
                 SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS island
          FROM isl)
  SELECT doc_id,
         CAST(MIN(pos) AS BIGINT) AS span_start,
         CAST(MAX(pos) + {w} - 1 AS BIGINT) AS span_end,
         CAST(MAX(pos) + {w} - MIN(pos) AS BIGINT) AS span_tokens
  FROM grp GROUP BY doc_id, island"""


EXACT_SUBSTRING_SQL = _exact_substring_sql()


def remove_repeated_spans(documents: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """Apply the exact-substring cut list: per doc, the text with every
    repeated span removed (tokens re-joined with single spaces) and the
    removed-token count — the actual dedup action over
    `exact_substring_spans`' findings.

    The span list per doc is tiny (collected into one array column), so
    the removal is a row-local HOF filter over the token array — no
    explode, no per-token shuffle; docs without spans pass through via the
    left join. Membership testing is order-insensitive, so collect_list's
    nondeterministic order cannot change the output."""
    from .textstats import _words

    spans = (
        exact_substring_spans(documents, w)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("_spans"))
    )
    toks = documents.select("doc_id", _words().alias("_ws"))
    kept = F.expr(
        "filter(transform(_ws, (t, i) -> struct(t AS t, i + 1 AS p)),"
        " x -> _spans IS NULL OR NOT exists(_spans,"
        " s -> x.p >= s.span_start AND x.p <= s.span_end))"
    )
    return (
        toks.join(spans, "doc_id", "left")
        .withColumn("_kept", kept)
        .select(
            "doc_id",
            F.expr("array_join(transform(_kept, x -> x.t), ' ')").alias("clean_text"),
            (F.size("_ws") - F.size("_kept")).alias("n_tokens_removed"),
        )
    )


def _remove_spans_sql(w: int = SUBSTR_W) -> str:
    from .textstats import WORDS_SQL

    return f"""
  WITH spans AS ({_exact_substring_sql(w)}),
  toks AS (SELECT doc_id, i AS pos, ws[i] AS t
           FROM (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
                unnest(range(1, len(ws) + 1)) AS u(i)),
  keep AS (SELECT tk.doc_id, tk.pos, tk.t
           FROM toks tk LEFT JOIN spans s
             ON tk.doc_id = s.doc_id
            AND tk.pos BETWEEN s.span_start AND s.span_end
           WHERE s.doc_id IS NULL)
  SELECT d.doc_id,
         COALESCE(k.clean_text, '') AS clean_text,
         CAST(len({WORDS_SQL}) - COALESCE(k.n_kept, 0) AS INTEGER)
           AS n_tokens_removed
  FROM documents d
  LEFT JOIN (SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS clean_text,
                    COUNT(*) AS n_kept
             FROM keep GROUP BY doc_id) k
    ON d.doc_id = k.doc_id"""


REMOVE_SPANS_SQL = _remove_spans_sql()


# ---------------------------------------------------------------------------
# Containment scoring — the asymmetric dup signal Jaccard under-reports:
# containment(A,B) = |A∩B| / min(|A|,|B|) is ≈1 when the smaller document
# is embedded in the larger one even though Jaccard (|A∩B|/|A∪B|) is
# dragged down by the size gap — the sub-document duplication case (quoted
# articles, boilerplate-wrapped reposts). Candidates come from the SAME
# MinHash band relation as minhash_lsh_dedup (one signature pass, equi-join
# buckets); the verify stage computes BOTH scores, so `containment_only`
# rows are exactly the asymmetric dupes a pure-Jaccard pipeline would keep.
# Honest limit, documented: banded MinHash collisions are Jaccard-biased,
# so extreme-size-ratio pairs may not reach the verify stage at all — the
# cure at scale is dd_exact_substring (span-level), which is size-blind.

CONTAINMENT_THRESHOLD = 0.5


def containment_pairs(
    documents: DataFrame, threshold: float = CONTAINMENT_THRESHOLD
) -> DataFrame:
    """(d1, d2, jaccard, containment, containment_only) for banded
    candidates with containment ≥ threshold."""
    sh = shingles(documents)
    bands_df = _minhash_bands(sh)
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = sh.select(F.col("doc_id").alias("d1"), "sh")
    s2 = sh.select(F.col("doc_id").alias("d2"), "sh")
    common = (
        F.broadcast(cand)
        .join(s1, "d1")
        .join(s2, ["d2", "sh"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common"))
    cont = F.col("common").cast("double") / F.least("n1", "n2").cast("double")
    return (
        common.join(sizes.withColumnsRenamed({"doc_id": "d1", "n": "n1"}), "d1")
        .join(sizes.withColumnsRenamed({"doc_id": "d2", "n": "n2"}), "d2")
        .select(
            "d1",
            "d2",
            jac.alias("jaccard"),
            cont.alias("containment"),
            ((cont >= F.lit(threshold)) & (jac < F.lit(JACCARD_THRESHOLD))).alias(
                "containment_only"
            ),
        )
        .where(F.col("containment") >= F.lit(threshold))
    )


CONTAINMENT_SQL = f"""
  WITH {_shingle_sql()},
  {_SIZES_SQL},
  {_minhash_bands_sql()},
  cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
  pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
  SELECT p.d1, p.d2,
         CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard,
         CAST(common AS DOUBLE) / CAST(LEAST(x.n, y.n) AS DOUBLE) AS containment,
         (CAST(common AS DOUBLE) / CAST(LEAST(x.n, y.n) AS DOUBLE)
            >= {CONTAINMENT_THRESHOLD!r}
          AND CAST(common AS DOUBLE) / (x.n + y.n - common) < {JACCARD_THRESHOLD})
           AS containment_only
  FROM pairs p JOIN cand c ON c.d1 = p.d1 AND c.d2 = p.d2
       JOIN sizes x ON x.doc_id = p.d1 JOIN sizes y ON y.doc_id = p.d2
  WHERE CAST(common AS DOUBLE) / CAST(LEAST(x.n, y.n) AS DOUBLE)
          >= {CONTAINMENT_THRESHOLD!r}"""


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup — the storage-dedup technique
# (FastCDC lineage) applied to token streams: segment boundaries fall where
# a rolling window hash ≡ 0 (mod CDC_DIV), so boundaries are a function of
# CONTENT, not position — an insertion near the head shifts every
# fixed-window offset but leaves downstream CDC boundaries (and therefore
# segment hashes) intact. Complements dd_exact_substring: that finds
# repeated FIXED-width windows; CDC finds repeated variable-length
# segments robust to positional shift, at ~CDC_DIV-token granularity.
#
# Scale shape: boundary detection and segmentation are ROW-LOCAL array
# expressions (one projection, no per-token shuffle on the Spark side);
# the only exchange is the segment-hash groupBy — high-cardinality,
# skew-free. The DuckDB oracle deliberately uses the RELATIONAL form
# (per-position rows + window lag) — two independent implementations of
# the same segmentation, hash-compared.

CDC_W = 4  # boundary-hash window (tokens)
CDC_DIV = 8  # expected segment length (tokens); boundary iff nibble % DIV == 0 (must divide 16)


def cdc_segments(documents: DataFrame, w: int = CDC_W, div: int = CDC_DIV) -> DataFrame:
    """(seg_hash, n_occurrences, n_docs, seg_len) for every content-defined
    segment occurring more than once in the corpus.

    Shape: one explode(transform(...)) computes each position's boundary
    nibble exactly ONCE (the exact_substring_spans cost profile — a HOF
    lambda is interpreted, so the hash must not be re-derived per
    reference; the first cut kept boundaries in a doubly-referenced array
    column and CollapseProject re-evaluated the whole boundary scan per
    reference: 153 -> 24 -> ~3 s at sf0.1 across the three forms, PERF.md),
    then boundary filter, per-doc lag window for segment ranges, a join
    back to the token arrays, and one codegen'd segment-hash projection
    feeding the corpus groupBy."""
    from pyspark.sql import Window

    from .textstats import _words

    toks = (
        documents.select("doc_id", _words().alias("_ws"))
        .where(F.size("_ws") >= w)
        .withColumn("_n", F.size("_ws").cast("bigint"))
    )
    nib = (
        f"instr('0123456789abcdef',"
        f" substr(md5(array_join(slice(_ws, p - {w} + 1, {w}), ' ')), 32, 1)) - 1"
    )
    wins = toks.select(
        "doc_id",
        "_n",
        F.explode(
            F.expr(f"transform(sequence({w}, size(_ws)), p -> struct(p AS p, ({nib}) AS nib))")
        ).alias("x"),
    )
    ends = (
        wins.where(F.col("x.nib") % div == 0)
        .select("doc_id", F.col("x.p").cast("bigint").alias("e"))
        .unionByName(toks.select("doc_id", F.col("_n").alias("e")))
        .distinct()
    )
    wd = Window.partitionBy("doc_id").orderBy("e")
    seg = ends.select(
        "doc_id",
        (F.coalesce(F.lag("e").over(wd), F.lit(0)) + 1).alias("s"),
        "e",
    )
    segh = seg.join(toks.select("doc_id", "_ws"), "doc_id").select(
        "doc_id",
        F.expr("md5(array_join(slice(_ws, s, e - s + 1), ' '))").alias("seg_hash"),
        (F.col("e") - F.col("s") + 1).cast("bigint").alias("seg_len"),
    )
    return (
        segh.groupBy("seg_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("seg_len").alias("seg_len"),
        )
        .where(F.col("n_occurrences") > 1)
    )


def _cdc_segments_sql(w: int = CDC_W, div: int = CDC_DIV) -> str:
    from .textstats import WORDS_SQL

    win_h = (
        f"(strpos('0123456789abcdef',"
        f" substr(md5(array_to_string(ws[p - {w} + 1 : p], ' ')), 32, 1)) - 1)"
    )
    return f"""
  WITH toks AS (SELECT doc_id, ws, len(ws) AS n
                FROM (SELECT doc_id, {WORDS_SQL} AS ws FROM documents)
                WHERE len(ws) >= {w}),
  bpos AS (SELECT doc_id, p FROM toks, unnest(range({w}, n + 1)) AS t(p)
           WHERE ({win_h}) % {div} = 0),
  ends AS (SELECT doc_id, p AS e FROM bpos
           UNION
           SELECT doc_id, n FROM toks),
  seg AS (SELECT doc_id,
                 COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s,
                 e
          FROM ends),
  segh AS (SELECT g.doc_id,
                  md5(array_to_string(t.ws[g.s : g.e], ' ')) AS seg_hash,
                  g.e - g.s + 1 AS seg_len
           FROM seg g JOIN toks t ON g.doc_id = t.doc_id)
  SELECT seg_hash, COUNT(*) AS n_occurrences,
         COUNT(DISTINCT doc_id) AS n_docs,
         CAST(MAX(seg_len) AS BIGINT) AS seg_len
  FROM segh GROUP BY seg_hash HAVING COUNT(*) > 1"""


CDC_SEGMENTS_SQL = _cdc_segments_sql()


# ---------------------------------------------------------------------------
# Document novelty — the per-document summary of the exact-substring
# machinery: what fraction of a doc's W-token windows are globally unique?
# Low novelty = the doc is largely assembled from corpus-repeated material
# (boilerplate, quotes, templates) even when no single span crosses the
# dedup threshold — a curation signal complementary to pair-level dedup.
# Same one-shuffle window-hash groupBy as exact_substring_spans; the
# per-doc rollup rides a second small aggregation.

def doc_novelty(documents: DataFrame, w: int = SUBSTR_W) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, novelty): novelty = fraction of
    the doc's windows whose hash occurs exactly once in the corpus."""
    from .textstats import _words

    wins = (
        documents.select("doc_id", _words().alias("_ws"))
        .where(F.size("_ws") >= w)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_ws) - {w} + 1),"
                    f" i -> md5(array_join(slice(_ws, i, {w}), ' ')))"
                )
            ).alias("h"),
        )
    )
    counts = wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        wins.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            (
                F.lit(1.0)
                - F.col("n_dup_windows").cast("double") / F.col("n_windows").cast("double")
            ).alias("novelty"),
        )
    )


def _doc_novelty_sql(w: int = SUBSTR_W) -> str:
    from .textstats import WORDS_SQL

    return f"""
  WITH toks AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
  wins AS (SELECT doc_id,
                  md5(array_to_string(ws[i : i + {w} - 1], ' ')) AS h
           FROM toks, unnest(range(1, greatest(len(ws) - {w} + 1, 0) + 1)) AS t(i)),
  counts AS (SELECT h, COUNT(*) AS cnt FROM wins GROUP BY h)
  SELECT w.doc_id, COUNT(*) AS n_windows,
         CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
         1.0 - CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS novelty
  FROM wins w JOIN counts c ON w.h = c.h
  GROUP BY w.doc_id"""


DOC_NOVELTY_SQL = _doc_novelty_sql()


# --- Jaccard operating-curve histogram --------------------------------------


def jaccard_histogram(documents: DataFrame) -> DataFrame:
    """Tuning curve for the MinHash-LSH threshold: exact-jaccard histogram
    of EVERY LSH candidate pair — including zero-shingle-overlap pairs
    from pure band-hash collisions, left-joined back with common=0 so
    jband 0 counts the full pair volume — in 0.1-wide bands (band = floor(j·10),
    exact — jaccard is a rational c/(n1+n2−c), so j·10 is computed as
    integer 10·c DIV (n1+n2−c), never a float floor). One extra groupBy
    on top of the existing candidate+verify relations; tells the operator
    what pair volume each threshold would keep BEFORE anyone re-runs
    dedup at a new threshold — at 100 TB the sweep costs one histogram,
    not one run per candidate threshold."""
    sh = shingles(documents)
    bands_df = _minhash_bands(sh)
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = sh.select(F.col("doc_id").alias("d1"), "sh")
    s2 = sh.select(F.col("doc_id").alias("d2"), "sh")
    common = (
        cand.join(s1, "d1")
        .join(s2, ["d2", "sh"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # candidates with ZERO shingle overlap (pure band-hash collisions)
    # produce no row in `common` — left-join them back with common=0 so
    # band 0 counts the full pair volume the threshold sweep would prune
    with_zero = cand.join(common, ["d1", "d2"], "left").withColumn(
        "common", F.coalesce(F.col("common"), F.lit(0)).cast("bigint")
    )
    scored = (
        with_zero.join(sizes.withColumnsRenamed({"doc_id": "d1", "n": "n1"}), "d1")
        .join(sizes.withColumnsRenamed({"doc_id": "d2", "n": "n2"}), "d2")
        .select(
            F.expr("CAST(10 * common DIV (n1 + n2 - common) AS INT)").alias("jband")
        )
    )
    return (
        scored.groupBy("jband")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "jband",
            (F.col("jband") / 10.0).alias("j_lo"),
            "n_pairs",
        )
        .orderBy("jband")
    )


JACCARD_HISTOGRAM_SQL = f"""
  WITH {_shingle_sql()},
  {_SIZES_SQL},
  {_minhash_bands_sql()},
  cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
  pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
  scored AS (
    SELECT CAST(10 * COALESCE(p.common, 0)
                // (x.n + y.n - COALESCE(p.common, 0)) AS INTEGER) AS jband
    FROM cand c LEFT JOIN pairs p ON c.d1 = p.d1 AND c.d2 = p.d2
         JOIN sizes x ON x.doc_id = c.d1 JOIN sizes y ON y.doc_id = c.d2)
SELECT jband, jband / 10.0 AS j_lo, COUNT(*) AS n_pairs
FROM scored GROUP BY jband ORDER BY jband"""


# --- near-dup cluster size distribution --------------------------------------


def cluster_size_histogram(documents: DataFrame) -> DataFrame:
    """Distribution of near-dup cluster sizes (including the singleton
    mass) — the one-glance dedup health report: how much of the corpus is
    unique, how much sits in pairs, and whether a mega-cluster (template
    spam, mirrored site) is eating the data. Rides the existing
    label-propagation cluster relation; docs in no pair are singletons.

    Output per size: n_clusters, n_docs (= size·n_clusters), doc share in
    exact integer ppm."""
    clusters = neardup_clusters(documents)
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    n_docs = documents.select(F.count(F.lit(1)).cast("bigint").alias("total"))
    clustered = clusters.select(F.count(F.lit(1)).cast("bigint").alias("in_pairs"))
    hist = sizes.groupBy("size").agg(F.count(F.lit(1)).alias("n_clusters"))
    singles = (
        n_docs.crossJoin(clustered)
        .select(
            F.lit(1).alias("size"),
            (F.col("total") - F.col("in_pairs")).alias("n_clusters"),
        )
        .where(F.col("n_clusters") > 0)
    )
    return (
        hist.select("size", F.col("n_clusters").cast("long"))
        .unionByName(singles.select("size", F.col("n_clusters").cast("long")))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("size").cast("int").alias("size"),
            "n_clusters",
            (F.col("size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
            F.expr("CAST(1000000 * size * n_clusters DIV total AS BIGINT)").alias(
                "doc_share_ppm"
            ),
        )
        .orderBy("size")
    )


CLUSTER_SIZE_HISTOGRAM_SQL = f"""
  WITH clusters AS ({NEARDUP_CLUSTERS_SQL.strip()}),
  sizes AS (SELECT cluster_id, COUNT(*) AS size FROM clusters GROUP BY cluster_id),
  nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents),
  cl AS (SELECT CAST(COUNT(*) AS BIGINT) AS in_pairs FROM clusters),
  hist AS (SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters
           FROM sizes GROUP BY size
           UNION ALL
           SELECT 1, total - in_pairs FROM nd, cl WHERE total - in_pairs > 0)
SELECT CAST(size AS INTEGER) AS size, n_clusters,
       CAST(size * n_clusters AS BIGINT) AS n_docs,
       CAST(1000000 * size * n_clusters // total AS BIGINT) AS doc_share_ppm
FROM hist, nd ORDER BY size"""


# ---------------------------------------------------------------------------
# LSH tuning curve — the (bands, rows) sweep as a query. The MinHash
# S-curve P(candidate | j) = 1 − (1 − j^r)^b is usually eyeballed from a
# matplotlib plot; here it is EXACT arithmetic: at bucket midpoints
# j = (2k+1)/20 every power has denominator 20^seeds, so
# p = (D − (20^r − (2k+1)^r)^b) / D with D = 20^16 ≈ 6.6e20 is an exact
# 128-bit rational, precomputed in Python (frozen constants, the
# hash_classifier weight-map device) and joined onto the OBSERVED
# candidate-jaccard histogram.

LSH_SWEEP_CONFIGS = ((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
_SCURVE_D = 20**MINHASH_SEEDS


def _scurve_rows() -> list[tuple[int, int, int, int]]:
    """(bands, rows, jband, p_num) with P(candidate|j_mid) = p_num/D —
    exact integers; jband 10 (j = 1.0 exactly) clamps the midpoint to 1."""
    out = []
    for b, r in LSH_SWEEP_CONFIGS:
        assert b * r == MINHASH_SEEDS
        for k in range(11):
            num = min(2 * k + 1, 20)
            u = 20**r - num**r
            out.append((b, r, k, _SCURVE_D - u**b))
    return out


def lsh_tuning_curve(documents: DataFrame) -> DataFrame:
    """Per (bands, rows, jband): the observed candidate-pair count at
    that jaccard bucket, the EXACT collision probability the alternative
    (bands, rows) config would give pairs at the bucket midpoint
    (p_ppm = 1e6·p_num DIV D), and the expected surviving pairs in
    milli-pairs (expected_pairs_q3 = 1000·n_pairs·p_num DIV D) — the
    threshold-sweep a dedup operator reads before re-running at a new
    config.

    Scope (documented, honest): the histogram rows are pairs observed as
    candidates under the PRODUCTION config (4 bands × 4 rows), so the
    sweep measures each alternative's RETENTION of the current candidate
    population — the tightening curve. Estimating NEW candidates for
    looser configs would need all-pairs jaccard (quadratic; exactly what
    LSH exists to avoid).

    Scale shape: jaccard_histogram's existing banded-candidate pipeline
    plus one broadcast join against a 55-row constant table and a
    metadata-sized projection — the sweep costs one histogram, not one
    dedup run per config."""
    import decimal

    from pyspark.sql import types as T

    hist = jaccard_histogram(documents)
    spark = documents.sparkSession
    curve = spark.createDataFrame(
        [
            (b, r, k, decimal.Decimal(p))
            for b, r, k, p in _scurve_rows()
        ],
        T.StructType(
            [
                T.StructField("bands", T.LongType()),
                T.StructField("rows", T.LongType()),
                T.StructField("jband", T.LongType()),
                T.StructField("p_num", T.DecimalType(38, 0)),
            ]
        ),
    )
    return (
        hist.withColumn("jband", F.col("jband").cast("bigint"))
        .join(F.broadcast(curve), "jband")
        .select(
            "bands",
            "rows",
            "jband",
            "n_pairs",
            F.expr(
                f"CAST(CAST(1000000 AS DECIMAL(38,0)) * p_num"
                f" DIV {_SCURVE_D} AS BIGINT)"
            ).alias("p_ppm"),
            F.expr(
                f"CAST(CAST(1000 AS DECIMAL(38,0)) * n_pairs * p_num"
                f" DIV {_SCURVE_D} AS BIGINT)"
            ).alias("expected_pairs_q3"),
        )
        .orderBy("bands", "rows", "jband")
    )


def lsh_tuning_curve_sql() -> str:
    """DuckDB twin of :func:`lsh_tuning_curve` (reads `documents`)."""
    values = ",\n    ".join(
        f"({b}, {r}, {k}, CAST('{p}' AS HUGEINT))"
        for b, r, k, p in _scurve_rows()
    )
    return f"""
  WITH hist AS ({JACCARD_HISTOGRAM_SQL}),
  curve(bands, rows, jband, p_num) AS (VALUES
    {values})
SELECT bands, rows, CAST(h.jband AS BIGINT) AS jband, n_pairs,
       CAST(CAST(1000000 AS HUGEINT) * p_num // {_SCURVE_D} AS BIGINT)
         AS p_ppm,
       CAST(CAST(1000 AS HUGEINT) * n_pairs * p_num // {_SCURVE_D} AS BIGINT)
         AS expected_pairs_q3
FROM hist h JOIN curve c ON CAST(h.jband AS BIGINT) = c.jband
ORDER BY bands, rows, jband"""


# ---------------------------------------------------------------------------
# LSH banding quality report — precision/recall of the banded candidate
# set against EXACT-jaccard ground truth, the dedup twin of
# ann_recall_report: "is (16 seeds, 4 bands) actually catching the dups
# above θ on THIS corpus?" — measured, not read off the S-curve
# (dd_lsh_tuning gives the analytic retention; this gives the observed
# one, including the correlation structure the independence assumption
# misses). The ground-truth side is the quadratic pairwise sweep, so this
# is an EVAL-SCALE operator by contract (run it on a sample, like every
# recall report); the candidate side is the production banded path.


def lsh_recall_report(
    documents: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """One row: (threshold, n_true_pairs, n_candidates, n_true_candidates,
    precision_ppm, recall_ppm, missed_pairs) for the MinHash-banded
    candidate generator vs exact n-gram jaccard at `threshold`.

    recall = what fraction of true >=θ pairs the bands surfaced (the
    S-curve's promise, observed); precision = what fraction of surfaced
    candidates survive exact verification (the verify stage's workload).
    Shares are exact truncated ppm (DECIMAL/HUGEINT DIV), NULL when the
    denominator is empty (guarded — Spark 4 ANSI raises on /0). The three
    counts are 1-row aggregates combined by 1-row crossJoins (the allowed
    crossJoin shape). Cites the public MinHash-LSH banding analysis
    (Broder; MMDS ch.3) the S-curve device comes from."""
    # The shingle relation feeds ~7 branches (truth's self-join + sizes,
    # bands, verify s1/s2 + sizes); localCheckpoint folds the scan +
    # tokenize + distinct to one execution (r12 alternating-pair A/B:
    # median pair delta −1.0 s ≈ −19% at sf0.1, 5/6 pairs negative).
    # Recomputed every execution — no cross-run caching.
    sh = materialize(shingles(documents))
    truth = _pairwise_jaccard(sh).where(F.col("jaccard") >= threshold)
    bands_df = _minhash_bands(sh)
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    tp = _verify_jaccard(sh, cand).where(F.col("jaccard") >= threshold)
    n_true = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true_pairs"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    n_tp = tp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_candidates")
    )
    ppm = (
        lambda num, den: f"CASE WHEN {den} = 0 THEN NULL ELSE"
        f" CAST(CAST(1000000 AS DECIMAL(38,0)) * {num} DIV {den} AS BIGINT)"
        " END"
    )
    return (
        n_true.crossJoin(n_cand)
        .crossJoin(n_tp)
        .select(
            F.lit(float(threshold)).alias("threshold"),
            "n_true_pairs",
            "n_candidates",
            "n_true_candidates",
            F.expr(ppm("n_true_candidates", "n_candidates")).alias(
                "precision_ppm"
            ),
            F.expr(ppm("n_true_candidates", "n_true_pairs")).alias(
                "recall_ppm"
            ),
            (F.col("n_true_pairs") - F.col("n_true_candidates"))
            .cast("bigint")
            .alias("missed_pairs"),
        )
    )


LSH_RECALL_REPORT_SQL = f"""
  WITH {_shingle_sql()},
  {_SIZES_SQL},
  truth AS (
    SELECT p.d1, p.d2
    FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id) p
    JOIN sizes x ON x.doc_id = p.d1 JOIN sizes y ON y.doc_id = p.d2
    WHERE CAST(common AS DOUBLE) / (x.n + y.n - common)
          >= {JACCARD_THRESHOLD}),
  {_minhash_bands_sql()},
  cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id),
  tp AS (SELECT c.d1, c.d2 FROM cand c JOIN truth t
           ON c.d1 = t.d1 AND c.d2 = t.d2),
  counts AS (SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true_pairs,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM tp) AS n_true_candidates)
SELECT CAST({JACCARD_THRESHOLD} AS DOUBLE) AS threshold,
       n_true_pairs, n_candidates, n_true_candidates,
       CASE WHEN n_candidates = 0 THEN NULL ELSE
         CAST(CAST(1000000 AS HUGEINT) * n_true_candidates // n_candidates
              AS BIGINT) END AS precision_ppm,
       CASE WHEN n_true_pairs = 0 THEN NULL ELSE
         CAST(CAST(1000000 AS HUGEINT) * n_true_candidates // n_true_pairs
              AS BIGINT) END AS recall_ppm,
       CAST(n_true_pairs - n_true_candidates AS BIGINT) AS missed_pairs
FROM counts"""


# ---------------------------------------------------------------------------
# Per-source dedup health — the slice-wise report a crawl pipeline reads
# before deciding which SOURCE to throttle: exact-duplicate and near-dup
# incidence per source, cross-source (a doc duplicated from another
# source still counts — that is the point).


def dup_stats_by_source(
    documents: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """(source, n_docs, n_exact_dup, exact_dup_ppm, n_near_dup,
    near_dup_ppm): per source, how many docs have an exact content twin
    ANYWHERE in the corpus (md5 groupcount >= 2) and how many appear in
    a verified MinHash near-dup pair at `threshold` — both as exact
    truncated ppm of the source's docs.

    Scale shape: the exact side is one content-hash-keyed window over a
    projection of the scan (the dd_exact shuffle); the near side reuses
    the production banded pair relation (linear, duplicate-density-
    bounded) and touches docs only through a distinct-id semi-join; the
    final frame is |sources| rows, joined source-keyed. Each side scans
    `documents` independently (Spark does not CSE across DAG branches —
    the documented ngram_jaccard tradeoff: recompute beats pinning for
    this engine's usage pattern)."""
    from pyspark.sql import Window

    base = documents.select(
        "doc_id", "source", F.md5(F.col("text")).alias("_h")
    )
    wh = Window.partitionBy("_h")
    per_src = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    exact = (
        base.withColumn("_c", F.count(F.lit(1)).over(wh))
        .where(F.col("_c") >= 2)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_dup"))
    )
    pairs = minhash_lsh_dedup(documents, threshold)
    ids = (
        pairs.select(F.col("d1").alias("doc_id"))
        .unionAll(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    near = (
        base.join(ids, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_near_dup"))
    )
    ppm = (
        lambda num: f"CAST(CAST(1000000 AS DECIMAL(38,0)) * {num}"
        " DIV n_docs AS BIGINT)"
    )
    return (
        per_src.join(exact, "source", "left")
        .join(near, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_exact_dup", F.lit(0)).cast("bigint").alias("n_exact_dup"),
            F.coalesce("n_near_dup", F.lit(0)).cast("bigint").alias("n_near_dup"),
        )
        .select(
            "source",
            "n_docs",
            "n_exact_dup",
            F.expr(ppm("n_exact_dup")).alias("exact_dup_ppm"),
            "n_near_dup",
            F.expr(ppm("n_near_dup")).alias("near_dup_ppm"),
        )
        .orderBy("source")
    )


DUP_STATS_BY_SOURCE_SQL = f"""
  WITH base AS (SELECT doc_id, source, md5(text) AS h FROM documents),
  per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM base GROUP BY source),
  exact AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact_dup
    FROM (SELECT source,
                 COUNT(*) OVER (PARTITION BY h) AS c
          FROM base) t
    WHERE c >= 2 GROUP BY source),
  pairs AS ({MINHASH_LSH_SQL}),
  ids AS (SELECT DISTINCT doc_id FROM
            (SELECT d1 AS doc_id FROM pairs
             UNION ALL SELECT d2 AS doc_id FROM pairs)),
  near AS (SELECT b.source, CAST(COUNT(*) AS BIGINT) AS n_near_dup
           FROM base b JOIN ids i ON b.doc_id = i.doc_id
           GROUP BY b.source)
SELECT p.source, p.n_docs,
       CAST(COALESCE(e.n_exact_dup, 0) AS BIGINT) AS n_exact_dup,
       CAST(CAST(1000000 AS HUGEINT) * COALESCE(e.n_exact_dup, 0)
            // p.n_docs AS BIGINT) AS exact_dup_ppm,
       CAST(COALESCE(n.n_near_dup, 0) AS BIGINT) AS n_near_dup,
       CAST(CAST(1000000 AS HUGEINT) * COALESCE(n.n_near_dup, 0)
            // p.n_docs AS BIGINT) AS near_dup_ppm
FROM per_src p
LEFT JOIN exact e ON e.source = p.source
LEFT JOIN near n ON n.source = p.source
ORDER BY p.source"""
