"""Composed training-data cleaning pipeline — the operators working together.

`clean_corpus` is the end-to-end shape every LLM data pipeline runs:
quality-filter → near-dup removal (keep the lowest-id representative of
each duplicate pair) → annotate survivors with token counts and predicted
language. Each stage is one of the engine's standalone operators; the
composition is pure DataFrame algebra, so Catalyst fuses what it can and
the whole thing stays oracle-checkable.

At 100 TB: quality scoring and annotation are scan-bound projections; the
dedup stage is MinHash-LSH (bucketed candidates, no pairwise sweep); the
final anti-join broadcasts the (tiny) drop-list. Nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.lifecycle import materialize

from . import dedup, textstats

QUALITY_THRESHOLD = 0.5


def clean_corpus(documents: DataFrame, quality_threshold: float = QUALITY_THRESHOLD) -> DataFrame:
    """Survivors of quality + near-dup filtering, annotated for training.

    Quality + language annotation is one fused projection
    (textstats.corpus_annotations) — per-row expressions never justify a
    self-join; the only joins left are the broadcast anti-join against the
    tiny near-dup drop list."""
    annotated = textstats.corpus_annotations(documents).where(
        F.col("quality_score") >= quality_threshold
    )
    drop_list = (
        dedup.minhash_lsh_dedup(documents).select(F.col("d2").alias("doc_id")).distinct()
    )
    return annotated.join(F.broadcast(drop_list), "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "quality_score", "lang_pred"
    )


N_SHARDS = 8
# per-stratum keep-rate in percent: downsample the low-quality tail,
# keep everything above the bar
SAMPLE_RATES = {"hi": 100, "lo": 40}
QUALITY_BAND_SPLIT = 0.75


def _doc_hash_sql(duck: bool, mod: int = 100) -> str:
    """Engine-portable uniform hash of doc_id ∈ [0, mod) — md5-derived, so
    sampling decisions are identical in Spark, DuckDB, or anything else
    that can md5 a string. Deterministic sampling means a re-run of the
    pipeline selects the same corpus — reproducible training data."""
    if not duck:
        # one conv() parse of the 8-hex-digit prefix — same positional
        # value as the per-nibble instr sum (r12; DuckDB keeps the
        # strpos sum: no arbitrary-base conv there)
        return (
            f"(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            f" AS BIGINT) % {mod})"
        )
    h = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({h}) % {mod})"


def stratified_sample(cleaned: DataFrame) -> DataFrame:
    """Deterministic stratified downsampling + shard assignment over the
    cleaned corpus: quality bands get different keep-rates, survivors get a
    stable shard id for train-file layout (`partitionBy("shard")` on
    write). Pure projections + one filter — scan-bound at any scale."""
    band = F.when(F.col("quality_score") >= QUALITY_BAND_SPLIT, "hi").otherwise("lo")
    h = F.expr(_doc_hash_sql(duck=False))
    rate = F.when(F.col("band") == "hi", F.lit(SAMPLE_RATES["hi"])).otherwise(
        F.lit(SAMPLE_RATES["lo"])
    )
    return (
        cleaned.withColumn("band", band)
        .withColumn("h", h)
        .where(F.col("h") < rate)
        .select(
            "doc_id",
            "band",
            "n_tokens",
            "lang_pred",
            (F.col("h") % N_SHARDS).alias("shard"),
        )
    )


def _stratified_sample_sql() -> str:
    h = _doc_hash_sql(duck=True)
    return f"""
  banded AS (SELECT *, CASE WHEN quality_score >= {QUALITY_BAND_SPLIT} THEN 'hi' ELSE 'lo' END AS band,
                    {h} AS h
             FROM cleaned)
  SELECT doc_id, band, n_tokens, lang_pred, CAST(h % {N_SHARDS} AS BIGINT) AS shard
  FROM banded
  WHERE h < CASE WHEN band = 'hi' THEN {SAMPLE_RATES["hi"]} ELSE {SAMPLE_RATES["lo"]} END"""


# ---------------------------------------------------------------------------
# Benchmark decontamination — the train/eval n-gram overlap check every
# serious LLM data pipeline runs before training (the GPT-3/PaLM-style
# "13-gram overlap" rule; n is a knob). A corpus document is contaminated
# if it shares ≥1 word n-gram with any document in the held-out benchmark
# set. Here the benchmark side is the deterministic doc_id % 10 == 0 slice
# of the documents table so the operator is self-contained on the test
# data; in production it would be the eval suites.

DECON_N = 8  # word n-gram length for the overlap check
DECON_MOD = 10  # doc_id % DECON_MOD == 0 → benchmark side


def decontaminate(documents: DataFrame, n: int = DECON_N) -> DataFrame:
    """Per corpus doc: how many of its distinct word `n`-grams appear in
    the benchmark set, and the contaminated verdict.

    At 100 TB the asymmetry is the whole design: eval benchmarks are tiny
    (thousands of docs), so their distinct-shingle set broadcasts and the
    corpus side is ONE scan → broadcast left join (at most one bench match
    per distinct corpus shingle, so no fan-out) → one groupBy keyed on
    doc_id (high cardinality, skew-free) counting rows and matches
    together. No corpus-shingle shuffle beyond the per-doc distinct, no
    second pass for the sizes."""
    sh = dedup.shingles(documents, n)
    is_bench = F.col("doc_id") % DECON_MOD == 0
    bench = F.broadcast(
        sh.where(is_bench).select("sh").distinct().withColumn("_hit", F.lit(1))
    )
    n_hits = F.count("_hit")
    return (
        sh.where(~is_bench)
        .join(bench, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_hits.alias("n_contaminated_ngrams"),
            (n_hits.cast("double") / F.count(F.lit(1))).alias("contamination_ratio"),
            (n_hits > 0).alias("contaminated"),
        )
    )


def _decontaminate_sql() -> str:
    from .dedup import _shingle_sql

    return f"""
  WITH {_shingle_sql(DECON_N)},
  bench AS (SELECT DISTINCT sh FROM s WHERE doc_id % {DECON_MOD} = 0)
  SELECT c.doc_id, COUNT(*) AS n_shingles,
         COUNT(b.sh) AS n_contaminated_ngrams,
         CAST(COUNT(b.sh) AS DOUBLE) / COUNT(*) AS contamination_ratio,
         COUNT(b.sh) > 0 AS contaminated
  FROM s c LEFT JOIN bench b ON c.sh = b.sh
  WHERE c.doc_id % {DECON_MOD} <> 0
  GROUP BY c.doc_id"""


DECONTAMINATE_SQL = _decontaminate_sql()


# Verbatim-overlap severity: a run of >= this many consecutive
# contaminated 8-gram positions means a contiguous token overlap of
# run + 7 >= 15 tokens — the GPT-3/BigBench-style "substring leak"
# regime, vs scattered single n-gram hits (common phrases).
DECON_VERBATIM_RUN = 8


def contamination_report(documents: DataFrame, n: int = DECON_N) -> DataFrame:
    """Per corpus doc: contamination DEPTH, not just the boolean —
    positional n-gram hits against the benchmark shingle set, the
    longest CONSECUTIVE run of contaminated positions (gaps-and-islands
    in pure integers: island id = pos − running hit count), the
    contiguous token overlap it implies (run + n − 1), and a severity
    verdict ('verbatim' for runs >= DECON_VERBATIM_RUN, 'scattered' for
    any other hit, 'clean'). Scattered hits are common phrases; long
    runs are copied eval text — the distinction decontamination policy
    actually acts on (decontaminate's boolean treats both alike).

    Scale shape: same asymmetric design as decontaminate — the tiny
    benchmark shingle set broadcasts; the corpus side is ONE positional
    explode → broadcast left join → one doc-keyed window (running hit
    count) → two groupBys on the SAME doc key (island sizes, then doc
    rollup). No corpus self-join, no second scan of the corpus.

    Cites reference transformation.py:17-84 (the cleaning stage this
    extends) — run-length semantics from the public GPT-3/PaLM
    decontamination descriptions (13-gram / contiguous-overlap
    removal)."""
    from .dedup import shingles
    from .textstats import _words

    terms = ", ' ', ".join(f"element_at(ws, i + {k + 1})" for k in range(n))
    pos_sh = F.expr(
        f"posexplode(transform(sequence(0, size(ws) - {n}),"
        f" i -> concat({terms}))) AS (pos, sh)"
    )
    is_bench = F.col("doc_id") % DECON_MOD == 0
    bench = F.broadcast(
        shingles(documents, n)
        .where(is_bench)
        .select("sh")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus = (
        documents.where(~is_bench)
        .select("doc_id", _words().alias("ws"))
        .where(F.size("ws") >= n)
        .select("doc_id", pos_sh)
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    flagged = (
        corpus.join(bench, "sh", "left")
        .withColumn("_h", F.coalesce(F.col("_hit"), F.lit(0)))
        .withColumn("_hrn", F.sum("_h").over(w))
        .withColumn(
            "island",
            F.expr("CASE WHEN _h = 1 THEN pos - _hrn END"),
        )
    )
    per_island = flagged.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_doc = per_island.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_shingles"),
        F.sum(F.expr("CASE WHEN island IS NOT NULL THEN c ELSE 0 END"))
        .cast("bigint")
        .alias("n_hit_positions"),
        F.max(F.expr("CASE WHEN island IS NOT NULL THEN c ELSE 0 END"))
        .cast("bigint")
        .alias("longest_run"),
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_hit_positions",
        "longest_run",
        F.expr(
            f"CAST(CASE WHEN longest_run > 0 THEN longest_run + {n - 1}"
            " ELSE 0 END AS BIGINT)"
        ).alias("longest_overlap_tokens"),
        F.expr(
            f"CASE WHEN longest_run >= {DECON_VERBATIM_RUN} THEN 'verbatim'"
            " WHEN n_hit_positions > 0 THEN 'scattered'"
            " ELSE 'clean' END"
        ).alias("severity"),
    )


def contamination_report_sql(n: int = DECON_N) -> str:
    """DuckDB twin of :func:`contamination_report` (reads `documents`)."""
    from .textstats import WORDS_SQL

    terms = " || ' ' || ".join(f"ws[i + {k}]" for k in range(n))
    return f"""
  WITH w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents
             WHERE len({WORDS_SQL}) >= {n}),
  pos_sh AS (SELECT doc_id,
                    CAST(i - 1 AS BIGINT) AS pos,
                    {terms.replace('ws[i +', 'ws[i +')} AS sh
             FROM w, unnest(range(1, len(ws) - {n - 2})) AS u(i)),
  bench AS (SELECT DISTINCT sh FROM pos_sh WHERE doc_id % {DECON_MOD} = 0),
  flagged AS (
    SELECT c.doc_id, c.pos,
           CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END AS h
    FROM pos_sh c LEFT JOIN bench b ON c.sh = b.sh
    WHERE c.doc_id % {DECON_MOD} <> 0),
  runs AS (
    SELECT doc_id, pos, h,
           CASE WHEN h = 1 THEN pos - SUM(h) OVER (PARTITION BY doc_id
                ORDER BY pos ROWS UNBOUNDED PRECEDING) END AS island
    FROM flagged),
  per_island AS (
    SELECT doc_id, island, CAST(COUNT(*) AS BIGINT) AS c
    FROM runs GROUP BY doc_id, island),
  per_doc AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN island IS NOT NULL THEN c ELSE 0 END)
                AS BIGINT) AS n_hit_positions,
           CAST(MAX(CASE WHEN island IS NOT NULL THEN c ELSE 0 END)
                AS BIGINT) AS longest_run
    FROM per_island GROUP BY doc_id)
SELECT doc_id, n_shingles, n_hit_positions, longest_run,
       CAST(CASE WHEN longest_run > 0 THEN longest_run + {n - 1}
            ELSE 0 END AS BIGINT) AS longest_overlap_tokens,
       CASE WHEN longest_run >= {DECON_VERBATIM_RUN} THEN 'verbatim'
            WHEN n_hit_positions > 0 THEN 'scattered'
            ELSE 'clean' END AS severity
FROM per_doc"""


def contamination_attribution(documents: DataFrame, n: int = DECON_N) -> DataFrame:
    """Per CONTAMINATED corpus doc: WHICH benchmark doc leaked — the
    question a decontamination policy asks right after
    contamination_report says 'verbatim' (r9 verdict #3). For every
    corpus doc with >= 1 positional n-gram hit: the benchmark doc
    sharing the most distinct hit n-grams (ties broken toward the smaller
    bench doc_id for a deterministic verdict), how many distinct n-grams it
    accounts for, how many bench docs were hit at all, and the top
    doc's share of the total attribution mass in exact ppm.

    Counting semantics: the shingle relation is DISTINCT per doc (the
    dedup.shingles contract), so a corpus n-gram is attributed to bench
    doc b when it appears anywhere in b, and an n-gram present in k
    bench docs contributes to k pairs — total_pair_hits is attribution
    MASS, not distinct hit n-grams (contamination_report carries the
    positional depth; re-deriving distinct-hit counts here would need a
    second pass over the matched subtree, which Spark would re-execute —
    the measured w_attribution lesson).

    Scale shape: same asymmetric broadcast as decontaminate, with the
    bench side now keyed (sh, bench doc) — still eval-suite-sized. ONE
    corpus scan → broadcast inner join → ONE map-combinable groupBy on
    (doc_id, bench_doc_id) → windows over that pair aggregate, whose
    size is bounded by (contaminated docs × bench docs hit), metadata
    next to the corpus. Cites reference transformation.py:17-84 (the
    cleaning stage this extends)."""
    from .dedup import shingles

    is_bench = F.col("doc_id") % DECON_MOD == 0
    bench = F.broadcast(
        shingles(documents, n)
        .where(is_bench)
        .select(F.col("doc_id").alias("bench_doc_id"), "sh")
        .distinct()
    )
    corpus = shingles(documents, n).where(~is_bench)
    pair = (
        corpus.join(bench, "sh")
        .groupBy("doc_id", "bench_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
    )
    wdoc = Window.partitionBy("doc_id")
    wrank = Window.partitionBy("doc_id").orderBy(
        F.col("n_shared_ngrams").desc(), F.col("bench_doc_id").asc()
    )
    return (
        pair.withColumn("n_bench_docs_hit", F.count(F.lit(1)).over(wdoc))
        .withColumn(
            "total_pair_hits",
            F.sum("n_shared_ngrams").over(wdoc).cast("bigint"),
        )
        .withColumn("_rn", F.row_number().over(wrank))
        .where(F.col("_rn") == 1)
        .select(
            "doc_id",
            "bench_doc_id",
            "n_shared_ngrams",
            F.col("n_bench_docs_hit").cast("bigint").alias("n_bench_docs_hit"),
            "total_pair_hits",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * n_shared_ngrams"
                " DIV total_pair_hits AS BIGINT)"
            ).alias("top_share_ppm"),
        )
    )


def contamination_attribution_sql(n: int = DECON_N) -> str:
    """DuckDB twin of :func:`contamination_attribution` (reads
    `documents`)."""
    from .dedup import _shingle_sql

    return f"""
  WITH {_shingle_sql(n)},
  bench AS (SELECT DISTINCT doc_id AS bench_doc_id, sh FROM s
            WHERE doc_id % {DECON_MOD} = 0),
  pair AS (SELECT c.doc_id, b.bench_doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
           FROM s c JOIN bench b ON c.sh = b.sh
           WHERE c.doc_id % {DECON_MOD} <> 0
           GROUP BY c.doc_id, b.bench_doc_id),
  ranked AS (
    SELECT doc_id, bench_doc_id, n_shared_ngrams,
           CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT)
             AS n_bench_docs_hit,
           CAST(SUM(n_shared_ngrams) OVER (PARTITION BY doc_id)
                AS BIGINT) AS total_pair_hits,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY n_shared_ngrams DESC, bench_doc_id ASC) AS rn
    FROM pair)
SELECT doc_id, bench_doc_id, n_shared_ngrams, n_bench_docs_hit,
       total_pair_hits,
       CAST(CAST(1000000 AS HUGEINT) * n_shared_ngrams
            // total_pair_hits AS BIGINT) AS top_share_ppm
FROM ranked WHERE rn = 1"""


CONTAMINATION_ATTRIBUTION_SQL = contamination_attribution_sql()


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — the constant-memory scale twin of
# `decontaminate`. The exact version broadcasts the benchmark's distinct
# shingle STRINGS; at production eval-suite sizes that broadcast grows with
# the benchmark. A Bloom filter caps it at M_BLOOM_BITS regardless: build a
# bitmap from the bench shingles (k md5-derived probes each), then screen
# corpus shingles against the broadcast bitmap. Spark 4.1 does not expose
# bloom_filter_agg/might_contain to SQL (probed round 3), so the filter is
# built RELATIONALLY — word-indexed bigint rows bit_or-aggregated — which
# also makes it bit-for-bit reproducible in DuckDB: the driver hash-checks
# an approximate data structure exactly. Bloom semantics: no false
# negatives (exact contaminated ⊆ bloom contaminated — test-pinned), false
# positives bounded by m/k/n.

M_BLOOM_BITS = 4096  # 64 bigint words; fixed broadcast size at ANY bench size
K_BLOOM = 2  # probes per shingle


def _sh_hash_sql(seed: int, duck: bool) -> str:
    """Engine-portable md5 hash of a shingle → [0, M_BLOOM_BITS): parse the
    first 8 hex nibbles of md5('<seed>:' || sh) exactly like _doc_hash_sql."""
    if not duck:
        return (
            f"(CAST(conv(substr(md5(concat('{seed}:', sh)), 1, 8), 16, 10)"
            f" AS BIGINT) % {M_BLOOM_BITS})"
        )
    h = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(md5('{seed}:' || sh), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({h}) % {M_BLOOM_BITS})"


def decontaminate_bloom(documents: DataFrame, n: int = DECON_N) -> DataFrame:
    """Per corpus doc: how many of its distinct shingles the bench Bloom
    filter flags, and the (no-false-negative) contaminated verdict.

    Shuffle story at 100 TB: the filter build reduces the (tiny) bench
    side to ≤ M/64 = 64 bigint rows — a broadcast whose size is CONSTANT
    in benchmark volume; the corpus side is one scan, k broadcast word
    lookups per distinct shingle, one doc_id groupBy. Same join/agg shape
    as `decontaminate` with the shingle-set broadcast swapped for the
    fixed bitmap."""
    sh = dedup.shingles(documents, n)
    is_bench = F.col("doc_id") % DECON_MOD == 0
    hashes = [_sh_hash_sql(s, duck=False) for s in range(K_BLOOM)]
    word = [F.expr(f"({h}) DIV 64") for h in hashes]
    mask = [
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(({h}) % 64 AS INT))")
        for h in hashes
    ]
    probe_structs = F.array(
        *[F.struct(word[s].alias("word"), mask[s].alias("mask")) for s in range(K_BLOOM)]
    )
    bits = (
        sh.where(is_bench)
        .select(F.explode(probe_structs).alias("x"))
        .select("x.word", "x.mask")
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    corpus_sh = sh.where(~is_bench)
    hit_all = None
    for s in range(K_BLOOM):
        corpus_sh = corpus_sh.withColumn(f"_w{s}", word[s]).withColumn(
            f"_m{s}", mask[s]
        ).join(
            F.broadcast(
                bits.select(F.col("word").alias(f"_w{s}"), F.col("bits").alias(f"_b{s}"))
            ),
            f"_w{s}",
            "left",
        )
        hit = F.coalesce(F.col(f"_b{s}"), F.lit(0)).bitwiseAND(F.col(f"_m{s}")) != 0
        hit_all = hit if hit_all is None else (hit_all & hit)
    return (
        corpus_sh.withColumn("_hit", hit_all)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("_hit"), 1)).alias("n_flagged_ngrams"),
            (F.count(F.when(F.col("_hit"), 1)) > 0).alias("contaminated"),
        )
    )


def _duck_bit_mask(p: str) -> str:
    """Single-bit bigint mask for bit index (p) % 64 in DuckDB. DuckDB's
    `<<` raises on 1 << 63 (the result is negative); Spark's shiftleft
    wraps to min-bigint. Emit the min-bigint literal for bit 63 so both
    engines produce the identical signed mask for every bit 0..63."""
    bit = f"CAST(({p}) % 64 AS INTEGER)"
    return (
        f"(CASE WHEN {bit} = 63 THEN CAST(-9223372036854775807 - 1 AS BIGINT)"
        f" ELSE CAST(1 AS BIGINT) << {bit} END)"
    )


def _decontaminate_bloom_sql() -> str:
    from .dedup import _shingle_sql

    h = [_sh_hash_sql(s, duck=True) for s in range(K_BLOOM)]
    probe_rows = " UNION ALL ".join(
        f"SELECT ({p}) // 64 AS word, {_duck_bit_mask(p)} AS mask"
        f" FROM bench_sh"
        for p in h
    )
    hit = " AND ".join(
        f"(COALESCE(b{s}.bits, 0) & {_duck_bit_mask(h[s])}) <> 0"
        for s in range(K_BLOOM)
    )
    joins = " ".join(
        f"LEFT JOIN bits b{s} ON b{s}.word = ({h[s]}) // 64" for s in range(K_BLOOM)
    )
    return f"""
  WITH {_shingle_sql(DECON_N)},
  bench_sh AS (SELECT DISTINCT sh FROM s WHERE doc_id % {DECON_MOD} = 0),
  bits AS (SELECT word, bit_or(mask) AS bits FROM ({probe_rows}) p GROUP BY word),
  flagged AS (
    SELECT c.doc_id, ({hit}) AS hit
    FROM (SELECT doc_id, sh FROM s WHERE doc_id % {DECON_MOD} <> 0) c
    {joins})
  SELECT doc_id, COUNT(*) AS n_shingles,
         COUNT(CASE WHEN hit THEN 1 END) AS n_flagged_ngrams,
         COUNT(CASE WHEN hit THEN 1 END) > 0 AS contaminated
  FROM flagged GROUP BY doc_id"""


DECONTAMINATE_BLOOM_SQL = _decontaminate_bloom_sql()


CLEAN_CORPUS_SQL = f"""
  WITH q AS (SELECT doc_id, n_tokens, quality_score
             FROM ({textstats.QUALITY_SQL}) qq
             WHERE quality_score >= {QUALITY_THRESHOLD}),
  nd AS (SELECT DISTINCT d2 AS doc_id FROM ({dedup.MINHASH_LSH_SQL}) mm),
  lp AS (SELECT doc_id, lang_pred FROM ({textstats.LANGID_NGRAM_SQL}) ll)
  SELECT q.doc_id, q.n_tokens, q.quality_score, lp.lang_pred
  FROM q LEFT JOIN nd ON q.doc_id = nd.doc_id
  JOIN lp ON lp.doc_id = q.doc_id
  WHERE nd.doc_id IS NULL"""

TRAIN_SAMPLE_SQL = (
    f"WITH cleaned AS (SELECT * FROM ({CLEAN_CORPUS_SQL}) cc), {_stratified_sample_sql()}"
)


# ---------------------------------------------------------------------------
# Sequence packing — the last hop before the trainer: concatenate the
# sampled corpus into fixed token-budget training sequences ("packs"),
# GPT-style concat-and-chunk (documents may span pack boundaries). Each
# doc gets its pack id and byte/token offset from a running token total.

PACK_BUDGET = 2048  # tokens per training sequence


def pack_sequences(sampled: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Assign every sampled doc its (shard, pack_id, pack_offset) layout
    slot via a per-shard running token total.

    The window partitions by shard — the parallelism unit the sampler
    already assigned — so no global ordering exists anywhere: at 100 TB
    you raise N_SHARDS (corpus.py) and every shard packs independently;
    pack_id is shard-local by construction (emit (shard, pack_id) as the
    composite sequence key). The cumsum is integer arithmetic over
    BIGINTs, so Spark and the SQL twin agree exactly."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = F.col("n_tokens").cast("bigint")
    start = F.sum(n_tokens).over(w) - n_tokens
    return sampled.select(
        "doc_id",
        "shard",
        n_tokens.alias("n_tokens"),
        (start / budget).cast("bigint").alias("pack_id"),
        (start % budget).alias("pack_offset"),
        ((start % budget) + n_tokens > budget).alias("crosses_boundary"),
    )


def _pack_sequences_sql() -> str:
    # DuckDB's window SUM over BIGINT yields HUGEINT; without the CAST the
    # derived pack_id / pack_offset surface to pandas as float64 while Spark
    # emits BIGINT — identical values, different dtype, value-hash mismatch
    # (round-2 driver failure). Pin the accumulator back to BIGINT.
    return f"""
  packed AS (SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
                    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                      - n_tokens AS start
             FROM sampled)
  SELECT doc_id, shard, n_tokens,
         start // {PACK_BUDGET} AS pack_id,
         start % {PACK_BUDGET} AS pack_offset,
         start % {PACK_BUDGET} + n_tokens > {PACK_BUDGET} AS crosses_boundary
  FROM packed"""


PACK_SEQUENCES_SQL = f"WITH sampled AS ({TRAIN_SAMPLE_SQL}), {_pack_sequences_sql()}"


def pack_contents(
    sampled: DataFrame, documents: DataFrame, budget: int = PACK_BUDGET
) -> DataFrame:
    """Materialize the actual training sequences: one row per (shard,
    pack_id) carrying the concatenated token text, assembled from per-doc
    segments that split documents across pack boundaries (the last mile of
    the GPT-style concat-and-chunk story — pack_sequences assigns the
    layout, this emits the content).

    Shuffle story at 100 TB: the per-shard cumsum window is the same
    partitioning pack_sequences already uses; the text join is a doc_id
    equi-join (sampled side is the small filtered corpus); the boundary
    explode fans a doc into ≤ ceil(n_tokens/budget)+1 segments inside the
    scan stage; final groupBy keys on (shard, pack_id) — high cardinality,
    skew-free, with every pack's segments collected and ordered by their
    in-pack offset (offsets are unique within a pack, so the sort is a
    total order and the assembly is deterministic at any parallelism)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = F.col("n_tokens").cast("bigint")
    laid = sampled.where(n_tokens > 0).select(
        "doc_id",
        "shard",
        n_tokens.alias("n_tokens"),
        (F.sum(n_tokens).over(w) - n_tokens).alias("start"),
    )
    withtext = laid.join(
        documents.select("doc_id", textstats._words().alias("_ws")), "doc_id"
    )
    segs = withtext.select(
        "shard",
        "start",
        "n_tokens",
        "_ws",
        F.explode(
            F.expr(f"sequence(start DIV {budget}, (start + n_tokens - 1) DIV {budget})")
        ).alias("pack_id"),
    ).select(
        "shard",
        "pack_id",
        F.greatest(F.col("pack_id") * budget - F.col("start"), F.lit(0)).alias(
            "seg_start"
        ),
        F.least((F.col("pack_id") + 1) * budget - F.col("start"), F.col("n_tokens")).alias(
            "seg_end"
        ),
        F.greatest(F.col("start") - F.col("pack_id") * budget, F.lit(0)).alias(
            "pack_offset"
        ),
        "_ws",
    )
    seg_text = F.expr(
        "array_join(slice(_ws, CAST(seg_start + 1 AS INT), CAST(seg_end - seg_start AS INT)), ' ')"
    )
    return (
        segs.select(
            "shard",
            "pack_id",
            "pack_offset",
            (F.col("seg_end") - F.col("seg_start")).alias("seg_len"),
            seg_text.alias("seg_text"),
        )
        .groupBy("shard", "pack_id")
        .agg(
            F.sum("seg_len").alias("n_tokens_in_pack"),
            F.count(F.lit(1)).alias("n_docs_in_pack"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pack_offset", "seg_text"))),
                    lambda x: x["seg_text"],
                ),
                " ",
            ).alias("pack_text"),
        )
    )


PACK_CONTENTS_SQL = f"""
  WITH sampled AS ({TRAIN_SAMPLE_SQL}),
  laid AS (SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
                  CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    - n_tokens AS start
           FROM sampled WHERE n_tokens > 0),
  wt AS (SELECT l.shard, l.start, l.n_tokens, {textstats.WORDS_SQL} AS ws
         FROM laid l JOIN documents d ON l.doc_id = d.doc_id),
  segs AS (SELECT shard, start, n_tokens, ws,
                  unnest(range(start // {PACK_BUDGET},
                               (start + n_tokens - 1) // {PACK_BUDGET} + 1)) AS pack_id
           FROM wt),
  s2 AS (SELECT shard, pack_id,
                GREATEST(pack_id * {PACK_BUDGET} - start, 0) AS seg_start,
                LEAST((pack_id + 1) * {PACK_BUDGET} - start, n_tokens) AS seg_end,
                GREATEST(start - pack_id * {PACK_BUDGET}, 0) AS pack_offset,
                ws
         FROM segs)
  SELECT shard, pack_id,
         CAST(SUM(seg_end - seg_start) AS BIGINT) AS n_tokens_in_pack,
         COUNT(*) AS n_docs_in_pack,
         string_agg(array_to_string(ws[seg_start + 1 : seg_end], ' '), ' '
                    ORDER BY pack_offset) AS pack_text
  FROM s2 GROUP BY shard, pack_id"""


# ---------------------------------------------------------------------------
# Corpus health report — the per-source dashboard a data-curation team
# watches: volume, token mass, and how much each filter family would
# remove. Counts only (BIGINT aggregation) so the cross-engine value hash
# is exact without the decimal machinery.


def corpus_report(documents: DataFrame) -> DataFrame:
    """Per-source corpus KPIs: doc/token volume, quality-pass count,
    repetition-drop count, benchmark-contamination count, distinct
    predicted languages.

    Composition of the standalone operators (annotations, repetition,
    decontamination) joined back on doc_id — each input is per-doc
    (join keys unique, no fan-out), the final groupBy keys on `source`
    (a low-cardinality rollup over per-doc rows, map-side combined).
    The repetition and contamination sides are left joins: docs those
    operators exclude (under-length; benchmark slice) simply don't
    count toward their flags."""
    from . import textstats as ts

    # r12 (guide §2.4): `source` rides the fused annotation projection via
    # its carry parameter instead of a separate documents scan + doc-keyed
    # join — annotations are row-local, so the old 4-scan/3-join
    # composition had one scan + one shuffle that existed only to
    # re-attach a column the scan already had. Corpus scans 4 → 3,
    # doc-keyed joins 3 → 2 (rep and dec still need their own passes:
    # rep's verdict and dec's shingle groupBy are different computations).
    ann = ts.corpus_annotations(documents, carry=("source",)).select(
        "doc_id", "source", "n_tokens", "quality_score", "lang_pred"
    )
    rep = ts.repetition_stats(documents).select("doc_id", "keep")
    dec = decontaminate(documents).select("doc_id", "contaminated")
    j = ann.join(rep, "doc_id", "left").join(dec, "doc_id", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.when(F.col("quality_score") >= QUALITY_THRESHOLD, 1)).alias(
            "n_quality_ok"
        ),
        F.count(F.when(~F.col("keep"), 1)).alias("n_repetitive"),
        F.count(F.when(F.col("contaminated"), 1)).alias("n_contaminated"),
        F.countDistinct("lang_pred").alias("n_langs"),
    )


def _corpus_report_sql() -> str:
    from . import textstats as ts

    return f"""
  WITH ann AS (SELECT q.doc_id, q.n_tokens, q.quality_score, l.lang_pred
               FROM ({ts.QUALITY_SQL}) q
               JOIN (SELECT doc_id, lang_pred FROM ({ts.LANGID_NGRAM_SQL}) ll) l
                 ON q.doc_id = l.doc_id),
  rep AS (SELECT doc_id, keep FROM ({ts.REPETITION_SQL}) r),
  dec AS (SELECT doc_id, contaminated FROM ({DECONTAMINATE_SQL}) d)
  SELECT s.source, COUNT(*) AS n_docs,
         CAST(SUM(ann.n_tokens) AS BIGINT) AS total_tokens,
         COUNT(CASE WHEN ann.quality_score >= {QUALITY_THRESHOLD} THEN 1 END)
           AS n_quality_ok,
         COUNT(CASE WHEN NOT rep.keep THEN 1 END) AS n_repetitive,
         COUNT(CASE WHEN dec.contaminated THEN 1 END) AS n_contaminated,
         COUNT(DISTINCT ann.lang_pred) AS n_langs
  FROM (SELECT doc_id, source FROM documents) s
  JOIN ann ON s.doc_id = ann.doc_id
  LEFT JOIN rep ON s.doc_id = rep.doc_id
  LEFT JOIN dec ON s.doc_id = dec.doc_id
  GROUP BY s.source"""


CORPUS_REPORT_SQL = _corpus_report_sql()


# ---------------------------------------------------------------------------
# Quantile-threshold quality pruning — cut the corpus at a GLOBAL quality
# percentile instead of a fixed score (the FineWeb-style "drop the bottom
# X%" rule): the threshold adapts to the corpus distribution, so the same
# pipeline config prunes a clean crawl lightly and a dirty one hard.

PRUNE_QUANTILE = 0.1  # drop the bottom decile


def quality_prune(
    documents: DataFrame, quantile: float = PRUNE_QUANTILE, approx: bool = False
) -> DataFrame:
    """Survivors of the global-quantile quality cut, annotated, with the
    computed threshold carried on every row (pipeline provenance).

    Two passes by nature — the threshold IS a corpus aggregate: pass 1
    reduces the scan to ONE exact-percentile row (partial aggregation
    map-side, a single final reduce task of #partitions pre-aggregated
    sketches); pass 2 re-scans and filters against the broadcast scalar.
    Exact `percentile` (not approx) because the oracle gate demands
    bit-equality — it matches DuckDB's quantile_cont interpolation exactly
    (same linear rule, proven by x_price_iqr_outliers).

    `approx=True` is the 100 TB swap: `approx_percentile` replaces the
    exact sort-based sketch with a bounded-memory Greenwald-Khanna summary
    (mergeable per partition, constant driver-side state at any corpus
    size). The threshold drift vs exact is tolerance-tested in
    tests/test_dedup_units.py rather than hash-gated."""
    # The annotation stage feeds BOTH passes (threshold aggregate +
    # survivor filter); Spark does not CSE across plan branches, so
    # without materialization the full text-scoring scan ran twice.
    # localCheckpoint materializes the per-doc score table once per
    # execution (r12; guide §3.3) — at 100 TB this is the quality-score
    # table a pipeline persists anyway, and one scoring pass + a
    # columnar re-read beats two scoring passes.
    ann = materialize(textstats.corpus_annotations(documents))
    pct = (
        F.expr(f"approx_percentile(quality_score, {quantile})")
        if approx
        else F.percentile("quality_score", quantile)
    )
    thresh = ann.agg(pct.alias("q_cut"))
    return (
        ann.crossJoin(F.broadcast(thresh))
        .where(F.col("quality_score") >= F.col("q_cut"))
        .select("doc_id", "n_tokens", "quality_score", "lang_pred", "q_cut")
    )


QUALITY_PRUNE_SQL = f"""
  WITH q AS (SELECT doc_id, n_tokens, quality_score FROM ({textstats.QUALITY_SQL}) qq),
  lp AS (SELECT doc_id, lang_pred FROM ({textstats.LANGID_NGRAM_SQL}) ll),
  ann AS (SELECT q.doc_id, q.n_tokens, q.quality_score, lp.lang_pred
          FROM q JOIN lp ON q.doc_id = lp.doc_id),
  t AS (SELECT quantile_cont(quality_score, {PRUNE_QUANTILE}) AS q_cut FROM ann)
  SELECT ann.doc_id, ann.n_tokens, ann.quality_score, ann.lang_pred, t.q_cut
  FROM ann CROSS JOIN t
  WHERE ann.quality_score >= t.q_cut"""


# ---------------------------------------------------------------------------
# Cluster-representative selection — the "keep the BEST copy" refinement of
# near-dup removal: instead of dropping every d2 of a dup pair (clean_corpus's
# rule, which keeps the lowest doc_id), group near-dups into clusters and keep
# the highest-QUALITY member of each. This is what production pipelines
# actually ship: templated pages dedup to the canonical version, not the
# first-crawled one.


def select_representatives(documents: DataFrame) -> DataFrame:
    """Per-doc verdict: cluster id (connected component of the MinHash-LSH
    pair graph; singletons = own doc_id), quality score, cluster size, and
    whether this doc is the cluster's representative (max quality, tie →
    min doc_id).

    Scale design: the window runs ONLY over the clustered subset — near-dup
    clusters are a tiny fraction of any corpus, so `clustered` broadcasts
    into both the inner join and the anti-join, and the full corpus never
    pays a shuffle: singletons (the overwhelming majority) are a pure
    projection union'd on. No corpus-wide Window.partitionBy anywhere.
    """
    from pyspark.sql import Window

    from . import dedup, textstats

    clustered = dedup.neardup_clusters(documents)
    # ann feeds both the cluster-member join and the singleton anti-join;
    # materialize the per-doc score table once instead of running the
    # text-scoring scan twice (r12; guide §3.3 — quality_prune's device;
    # `clustered` is already materialized by the label-propagation loop's
    # per-round checkpoints).
    ann = materialize(
        textstats.corpus_annotations(documents)
        .select("doc_id", "quality_score")
    )
    in_cluster = ann.join(F.broadcast(clustered), "doc_id")
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    w_all = Window.partitionBy("cluster_id")
    members = in_cluster.select(
        "doc_id",
        "cluster_id",
        "quality_score",
        (F.row_number().over(w_rank) == 1).alias("is_representative"),
        F.count(F.lit(1)).over(w_all).alias("cluster_size"),
    )
    singletons = ann.join(
        F.broadcast(clustered.select("doc_id")), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.col("doc_id").alias("cluster_id"),
        "quality_score",
        F.lit(True).alias("is_representative"),
        F.lit(1).cast("bigint").alias("cluster_size"),
    )
    return members.unionByName(singletons)


def _keep_best_sql() -> str:
    from . import dedup, textstats

    return f"""
  WITH cl AS (SELECT * FROM ({dedup.NEARDUP_CLUSTERS_SQL}) c),
  q AS (SELECT doc_id, quality_score FROM ({textstats.QUALITY_SQL}) qq),
  j AS (SELECT q.doc_id, COALESCE(cl.cluster_id, q.doc_id) AS cluster_id,
               q.quality_score
        FROM q LEFT JOIN cl ON q.doc_id = cl.doc_id)
  SELECT doc_id, cluster_id, quality_score,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality_score DESC, doc_id ASC) = 1
           AS is_representative,
         COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM j"""


KEEP_BEST_SQL = _keep_best_sql()


# ---------------------------------------------------------------------------
# Training-mix rebalancing — the data-mixing stage between curation and
# packing: decide how hard to sample each source so the training mix hits a
# target token share (The-Pile-style mix tables; here the target is the
# uniform share, the common "rebalance a crawl-dominated corpus" default —
# a weights column swaps in trivially). Outputs the per-source sampling
# plan: observed token mass, target, the keep-rate to apply, and the
# expected post-sampling tokens.


def mix_rebalance(documents: DataFrame) -> DataFrame:
    """Per-source sampling plan toward a uniform token share.

    Shuffle story: ONE groupBy on `source` (low-cardinality rollup over
    per-row token counts, map-side combined) + a broadcast one-row grand
    total — the plan is two tiny aggregations over a single scan; the
    expensive part (applying the plan) is `stratified_sample`-shaped.
    All derived columns are single IEEE divisions of exact integers, so
    the DuckDB twin matches bit-for-bit."""
    # Source-dim rollup with corpus-scan lineage, two consumers (grand
    # total + final projection): materialize once per execution (r12;
    # guide §3.3 — mix_temperature's device). Corpus scans 2 → 1.
    per_src = materialize(
        documents.select("source", F.size(textstats._words()).alias("_n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("tokens"),
        )
    )
    grand = per_src.agg(
        F.sum("tokens").alias("_total"), F.count(F.lit(1)).alias("_n_sources")
    )
    target = F.col("_total").cast("double") / F.col("_n_sources")
    return per_src.crossJoin(F.broadcast(grand)).select(
        "source",
        "n_docs",
        "tokens",
        target.alias("target_tokens"),
        F.least(F.lit(1.0), target / F.col("tokens")).alias("sample_rate"),
        F.least(F.col("tokens").cast("double"), target).alias("expected_tokens"),
    )


MIX_REBALANCE_SQL = f"""
  WITH t AS (SELECT source, COUNT(*) AS n_docs,
                    CAST(SUM(len({textstats.WORDS_SQL})) AS BIGINT) AS tokens
             FROM documents GROUP BY source),
  g AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS n_sources FROM t)
  SELECT source, n_docs, tokens,
         CAST(total AS DOUBLE) / n_sources AS target_tokens,
         LEAST(1.0, (CAST(total AS DOUBLE) / n_sources) / tokens) AS sample_rate,
         LEAST(CAST(tokens AS DOUBLE), CAST(total AS DOUBLE) / n_sources)
           AS expected_tokens
  FROM t CROSS JOIN g"""


MIX_HASH_MOD = 10_000  # rate resolution for the deterministic keep decision


def apply_mix(documents: DataFrame) -> DataFrame:
    """Apply the mix_rebalance plan: per-source deterministic downsampling
    at the computed keep-rate (md5-hash thresholding, the same
    reproducible-sampling device as stratified_sample, at 1/10000
    resolution). Output: the surviving (doc_id, source, n_tokens).

    The 20-row plan broadcasts into the corpus scan; keep = doc_hash <
    floor(rate · 10000) — floor() explicitly, because a double→int CAST
    truncates in Spark but ROUNDS in DuckDB, and the two must agree."""
    plan = mix_rebalance(documents).select("source", "sample_rate")
    h = F.expr(_doc_hash_sql(duck=False, mod=MIX_HASH_MOD))
    return (
        documents.select(
            "doc_id", "source", F.size(textstats._words()).alias("n_tokens")
        )
        .withColumn("_h", h)
        .join(F.broadcast(plan), "source")
        .where(
            F.col("_h")
            < F.floor(F.col("sample_rate") * MIX_HASH_MOD).cast("bigint")
        )
        .select("doc_id", "source", "n_tokens")
    )


APPLY_MIX_SQL = f"""
  WITH t AS (SELECT source, COUNT(*) AS n_docs,
                    CAST(SUM(len({textstats.WORDS_SQL})) AS BIGINT) AS tokens
             FROM documents GROUP BY source),
  g AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS n_sources FROM t),
  plan AS (SELECT source,
                  LEAST(1.0, (CAST(total AS DOUBLE) / n_sources) / tokens)
                    AS sample_rate
           FROM t CROSS JOIN g)
  SELECT d.doc_id, d.source, CAST(len({textstats.WORDS_SQL}) AS BIGINT) AS n_tokens
  FROM documents d JOIN plan p ON d.source = p.source
  WHERE {_doc_hash_sql(duck=True, mod=MIX_HASH_MOD)}
        < CAST(floor(p.sample_rate * {MIX_HASH_MOD}) AS BIGINT)"""


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): score every raw document by how much
# more likely its hashed-bigram features are under a TARGET domain than
# under the raw corpus — log p_target(doc)/p_raw(doc) with smoothed
# bag-of-hashed-ngrams models. The published data-selection recipe: train
# two feature distributions, weight docs by the log-ratio, then resample
# proportionally (tp_mix_apply / tp_train_sample are the resampling side).
#
# Hash-exactness: both distributions count INTEGER bucket hits, and every
# log is the portable plog2 over integers (functions/numerics.py) with the
# per-doc sum in DECIMAL(28,12) — bit-identical in both engines.
#
# Shuffle story at 100 TB: bigram explode is row-local inside the scan;
# two bucket-keyed counts (B=1024 buckets — the hash bounds the model state
# regardless of corpus size, which is DSIR's trick); the scored bucket
# table is ≤ B rows — always a broadcast; one doc-keyed aggregation. The
# target slice rides the same scan (a CASE inside the counts), so the
# whole operator is TWO passes over the token stream.

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def _dsir_feature_sql(duck: bool, b: int = DSIR_BUCKETS) -> str:
    """Hashed-bigram feature id: first 8 md5 nibbles of 'dsir:'||bigram,
    mod `b` — portable (dedup._hex_int_sql machinery)."""
    from .dedup import _hex_int_sql

    md5_expr = "md5('dsir:' || bg)"
    return f"({_hex_int_sql(md5_expr, duck)} % {b})"


def dsir_weights(
    documents: DataFrame,
    b: int = DSIR_BUCKETS,
    target_lang: str = DSIR_TARGET_LANG,
) -> DataFrame:
    """Per-doc DSIR importance weight in bits:
    log2_weight = Σ_features [plog2(c_t[f]+1) − plog2(c_r[f]+1)]
                  + n_features · [plog2(N_r+B) − plog2(N_t+B)]
    where c_t / c_r are hashed-bigram counts over the target slice
    (lang = `target_lang`) and the whole corpus, with add-one smoothing
    over the B buckets. Positive = more target-like than the corpus
    average; feed the weight into the mix/resampling operators."""
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    from ..functions.numerics import plog2_sql
    from .textstats import _words

    bg = F.expr(
        "transform(sequence(0, size(ws) - 2),"
        " i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))"
    )
    feats = (
        documents.select("doc_id", "lang", _words().alias("ws"))
        .where(F.size("ws") >= 2)
        .select("doc_id", "lang", F.explode(bg).alias("bg"))
        .select("doc_id", "lang", F.expr(_dsir_feature_sql(duck=False, b=b)).alias("f"))
    )
    # The hashed-feature count table is the DSIR model — AT MOST `b`
    # (=1024) rows — but it feeds TWO consumers (per-bucket scores and the
    # smoothing constant), and Spark does not CSE across plan branches:
    # without materialization each consumer re-ran the whole
    # tokenize+bigram+hash pass over the corpus. localCheckpoint folds the
    # model once per execution (r12; guide §3.3 materialise-an-intermediate
    # — same device as the exact-quantile targets relation). Corpus scans
    # in the executed plan: 3 → 2 (model build + scoring pass, the
    # irreducible train-then-score shape).
    counts = materialize(
        feats.groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.count(F.when(F.col("lang") == target_lang, 1)).alias("c_t"),
        )
    )
    bucket_scores = counts.select(
        "f",
        (
            F.expr(plog2_sql("c_t + 1")) - F.expr(plog2_sql("c_r + 1"))
        ).alias("score"),
    )
    const = counts.agg(
        (
            F.expr(plog2_sql(f"SUM(c_r) + {b}"))
            - F.expr(plog2_sql(f"SUM(c_t) + {b}"))
        ).alias("_const")
    )
    term = (F.col("score") + F.col("_const")).cast("decimal(28,12)")
    return (
        feats.join(F.broadcast(bucket_scores), "f")
        .crossJoin(F.broadcast(const))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(term).cast("double").alias("log2_weight"),
            (F.sum(term).cast("double") / F.count(F.lit(1))).alias(
                "mean_log2_weight"
            ),
        )
    )


def _dsir_weights_sql(b: int = DSIR_BUCKETS, target_lang: str = DSIR_TARGET_LANG) -> str:
    from ..functions.numerics import plog2_sql
    from .textstats import WORDS_SQL

    feat = _dsir_feature_sql(duck=True, b=b)
    return f"""
  WITH w AS (SELECT doc_id, lang, {WORDS_SQL} AS ws FROM documents
             WHERE len({WORDS_SQL}) >= 2),
  feats AS (SELECT doc_id, lang, {feat} AS f FROM
              (SELECT doc_id, lang,
                      unnest([ws[i] || ' ' || ws[i + 1]
                              FOR i IN range(1, len(ws))]) AS bg
               FROM w)),
  counts AS (SELECT f, COUNT(*) AS c_r,
                    COUNT(CASE WHEN lang = '{target_lang}' THEN 1 END) AS c_t
             FROM feats GROUP BY f),
  scores AS (SELECT f, ({plog2_sql("c_t + 1", duck=True)})
                       - ({plog2_sql("c_r + 1", duck=True)}) AS score
             FROM counts),
  c0 AS (SELECT ({plog2_sql(f"SUM(c_r) + {b}", duck=True)})
                - ({plog2_sql(f"SUM(c_t) + {b}", duck=True)}) AS cconst
         FROM counts)
  SELECT t.doc_id, COUNT(*) AS n_features,
         CAST(SUM(CAST(s.score + c0.cconst AS DECIMAL(28,12))) AS DOUBLE)
           AS log2_weight,
         CAST(SUM(CAST(s.score + c0.cconst AS DECIMAL(28,12))) AS DOUBLE)
           / COUNT(*) AS mean_log2_weight
  FROM feats t JOIN scores s ON t.f = s.f CROSS JOIN c0
  GROUP BY t.doc_id"""


DSIR_WEIGHTS_SQL = _dsir_weights_sql()


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016) — the tokenizer-training
# operator: start from characters, repeatedly (a) count adjacent symbol
# pairs across the word-frequency table, (b) take the most frequent pair,
# (c) merge its occurrences left-to-right non-overlapping. The engine's
# iterative-algorithm pattern (fixed deterministic iterations, like
# similarity.kmeans_centroids), so the DuckDB oracle unrolls the rounds as
# chained CTEs and the driver hash-checks tokenizer training end-to-end.
#
# Two representation tricks make the whole thing relational:
#   * a word's symbol sequence is ONE delimited string ␟a␟b␟c␟ (U+001F
#     never occurs in corpus text), so "merge pair (a,b) left-to-right
#     non-overlapping" is EXACTLY SQL replace(s, '␟a␟b', '␟ab') —
#     verified identical semantics in Spark and DuckDB;
#   * pair counting works on the word-FREQUENCY table (vocab-sized, not
#     corpus-sized): at 100 TB the corpus scan happens once to build word
#     counts; every merge round then touches only the vocabulary.
#
# Pair counts follow the reference algorithm (all adjacent pairs, overlaps
# included); ties break (count desc, left asc, right asc). No </w> marker
# (whitespace pre-tokenization already bounds words).

BPE_N_MERGES = 6
BPE_SEP = "\x1f"


def bpe_merges(documents: DataFrame, n_merges: int = BPE_N_MERGES) -> DataFrame:
    """(merge_rank, left, right, pair_count): the first `n_merges` BPE
    merges learned from the corpus word-frequency table. Each round is one
    vocab-keyed aggregation + a one-row broadcast; the word relation is
    localCheckpointed per round (k-means-style) to keep lineage flat."""
    merges, _ = _bpe_train(documents, n_merges)
    return merges


def _bpe_train(
    documents: DataFrame, n_merges: int = BPE_N_MERGES
) -> tuple[DataFrame, list[tuple[str, str]]]:
    """BPE training loop shared by `bpe_merges` (returns the merge table)
    and `bpe_encode` (applies the merges as literal replace stages).
    Returns (merge-table DataFrame, [(left, right) per round]).

    r12 rewrite: each round's winner is a SINGLE row — model state, not
    data — so it is collected to the driver (the textstats vocab-fold
    device; VERDICT r11 class "legitimate tiny-result boundary") and fed
    back as string LITERALS. That removes, per round, one localCheckpoint
    job + one count job + one crossJoin-broadcast build that the old
    one-row-DataFrame plumbing paid (6 rounds × 3 jobs → 6 TakeOrdered
    collects), and the word rewrite becomes a pure projection over the
    ONE corpus-fold checkpoint — the per-round word-relation checkpoints
    go away too (r-1 stacked literal replaces over the vocab relation are
    cheaper than a materialization each round). Winner selection, tiebreak
    (count desc, left asc, right asc) and the replace composition are
    unchanged — the merge table and every encode downstream are
    bit-identical (parity-pinned)."""
    from .textstats import _words

    sep = BPE_SEP
    words = materialize(
        documents.select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.concat(
                F.lit(sep),
                F.expr(f"regexp_replace(word, '(.)', concat('$1', '{sep}'))"),
            ).alias("s"),
        )
    )
    rows: list[tuple[int, str, str, int]] = []
    merged = words
    for r in range(1, n_merges + 1):
        syms = F.expr(f"filter(split(s, '{sep}'), x -> x <> '')")
        pairs = (
            merged.select("freq", syms.alias("syms"))
            .where(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS a,"
                        "             element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .select("freq", "p.a", "p.b")
        )
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").cast("bigint").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            # degenerate corpus (e.g. all single-symbol words): no pair
            # left to merge — stop early; encode chains only real rounds.
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["pair_count"])
        rows.append((r, a, b, cnt))
        merged = merged.select(
            "freq",
            F.replace(
                F.col("s"), F.lit(f"{sep}{a}{sep}{b}"), F.lit(f"{sep}{a}{b}")
            ).alias("s"),
        )
    merges = documents.sparkSession.createDataFrame(
        rows, "merge_rank int, left string, right string, pair_count bigint"
    )
    return merges, [(a, b) for (_, a, b, _) in rows]


def _bpe_train_ctes(n_merges: int = BPE_N_MERGES) -> str:
    """DuckDB CTE chain `w0, sy1, p1, b1, w1, ... w{n}` unrolling the fixed
    training rounds; `b{r}` is round r's winning (a, right) pair. Shared by
    the merges oracle and the encode oracle."""
    from .textstats import WORDS_SQL

    sep = "chr(31)"
    parts = [
        f"""
  w0 AS (SELECT COUNT(*) AS freq,
                {sep} || regexp_replace(word, '(.)', '\\1' || {sep}, 'g') AS s
         FROM (SELECT unnest({WORDS_SQL}) AS word FROM documents)
         GROUP BY word)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""
  sy{r} AS (SELECT freq, list_filter(string_split(s, {sep}), x -> x <> '') AS syms
            FROM w{r - 1}),
  p{r} AS (SELECT freq, syms, unnest(range(1, len(syms))) AS i
           FROM sy{r} WHERE len(syms) >= 2),
  b{r} AS (SELECT {r} AS merge_rank, a, b AS "right", pair_count FROM
             (SELECT syms[i] AS a, syms[i + 1] AS b,
                     CAST(SUM(freq) AS BIGINT) AS pair_count
              FROM p{r} GROUP BY 1, 2)
           ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1),
  w{r} AS (SELECT freq,
                  replace(s, {sep} || a || {sep} || "right",
                          {sep} || a || "right") AS s
           FROM w{r - 1} CROSS JOIN b{r})""")
    return ",".join(parts)


def _bpe_merges_sql(n_merges: int = BPE_N_MERGES) -> str:
    selects = "\n  UNION ALL\n  ".join(
        f'SELECT merge_rank, a AS "left", "right", pair_count FROM b{r}'
        for r in range(1, n_merges + 1)
    )
    return "  WITH " + _bpe_train_ctes(n_merges) + "\n  " + selects


BPE_MERGES_SQL = _bpe_merges_sql()


# ---------------------------------------------------------------------------
# BPE encoding — tokenizer APPLICATION, the other half of the tokenizer
# story: train merges on the corpus (bpe_merges), then segment every
# document with them. This is the op a training-data pipeline runs over
# 100 TB (training runs once over the vocab; encoding runs over
# everything), so its shape matters most: after training, encoding is a
# pure per-row projection — each merge round is a broadcast one-row join +
# a row-local array transform(replace(...)), no shuffle anywhere. The same
# ␟-delimited-string trick as training makes "apply merge left-to-right
# non-overlapping" exactly replace(), identical in both engines.
#
# Output is per-doc stats + a bounded token preview rather than the full
# exploded (doc, pos, token) stream: the full stream is one extra explode
# away for consumers, but materializing it in the gate would make the
# checked relation |tokens|-sized for no extra coverage.

BPE_PREVIEW_TOKENS = 12


def bpe_encode(documents: DataFrame, n_merges: int = BPE_N_MERGES) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens, avg_token_len, bpe_preview):
    segment each document's words with the `n_merges` trained BPE merges.

    The trained merges arrive as driver-side literals (see `_bpe_train`),
    so encoding is a pure projection: ONE array transform whose lambda
    nests the per-round replaces innermost-first — the same left-to-right
    merge composition per element as a chain of per-round transforms
    (bit-identical strings) with one array traversal, no crossJoins, and
    the document side never shuffles."""
    from .textstats import _words

    sep = BPE_SEP
    _, bests = _bpe_train(documents, n_merges)
    enc = documents.select(
        "doc_id",
        F.transform(
            _words(),
            lambda w: F.concat(F.lit(sep), F.regexp_replace(w, "(.)", "$1" + sep)),
        ).alias("ws"),
    )
    if bests:

        def apply_merges(s):
            e = s
            for a, b in bests:  # round 1 innermost — training order
                e = F.replace(
                    e, F.lit(f"{sep}{a}{sep}{b}"), F.lit(f"{sep}{a}{b}")
                )
            return e

        enc = enc.select("doc_id", F.transform("ws", apply_merges).alias("ws"))
    toks = enc.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.expr(
            f"flatten(transform(ws, s -> filter(split(s, '{sep}'), x -> x <> '')))"
        ).alias("toks"),
    )
    return toks.select(
        "doc_id",
        "n_words",
        F.size("toks").alias("n_bpe_tokens"),
        F.when(
            F.size("toks") > 0,
            F.length(F.concat_ws("", F.col("toks"))).cast("double")
            / F.size("toks"),
        ).alias("avg_token_len"),
        F.concat_ws(" ", F.slice("toks", 1, BPE_PREVIEW_TOKENS)).alias(
            "bpe_preview"
        ),
    )


def _bpe_encode_sql(n_merges: int = BPE_N_MERGES) -> str:
    from .textstats import WORDS_SQL

    sep = "chr(31)"
    parts = [
        f"""
  e0 AS (SELECT doc_id, {WORDS_SQL} AS words,
                list_transform({WORDS_SQL},
                  w -> {sep} || regexp_replace(w, '(.)', '\\1' || {sep}, 'g')) AS ws
         FROM documents)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""
  e{r} AS (SELECT doc_id, words,
                  list_transform(ws, s -> replace(s,
                    {sep} || a || {sep} || "right",
                    {sep} || a || "right")) AS ws
           FROM e{r - 1} CROSS JOIN b{r})""")
    return (
        "  WITH "
        + _bpe_train_ctes(n_merges)
        + ","
        + ",".join(parts)
        + f""",
  ef AS (SELECT doc_id, words,
                flatten(list_transform(ws,
                  s -> list_filter(string_split(s, {sep}), x -> x <> ''))) AS toks
         FROM e{n_merges})
  SELECT doc_id, len(words) AS n_words, len(toks) AS n_bpe_tokens,
         CASE WHEN len(toks) > 0
              THEN CAST(length(array_to_string(toks, '')) AS DOUBLE) / len(toks)
         END AS avg_token_len,
         array_to_string(toks[1:{BPE_PREVIEW_TOKENS}], ' ') AS bpe_preview
  FROM ef"""
    )


BPE_ENCODE_SQL = _bpe_encode_sql()


# ---------------------------------------------------------------------------
# Hashed linear classifier inference — the "quality classifier" stage of
# CCNet/LLaMA-style corpus pipelines: a fastText-shaped linear model over
# hashed bag-of-bigram features scores every document, and a threshold
# keeps the high-quality slice. Real pipelines load trained weights; here
# the weight vector is a frozen deterministic function of the bucket id
# (the hashing-trick kernel, inlined), which keeps the operator
# self-contained and hash-checkable while preserving the EXACT relational
# shape of inference: feature hashing is row-local inside the scan, the
# model is O(B) state independent of corpus size, and scoring is one
# doc-keyed aggregation — no joins, no shuffle beyond the final groupBy.
# (With externally-trained weights the inline kernel becomes a broadcast
# B-row bucket→weight table — the DSIR operator in operators/corpus.py
# already exercises that variant of the shape.)
#
# Bit-exactness without transcendentals: weights are (m − 1000)/1024 with
# m ∈ [0, 2000] — a 10-decimal-digit value exactly representable in BOTH
# double and DECIMAL(28,12), so accumulation is exact and engine-identical
# by construction. The raw mean-logit is emitted instead of a sigmoid
# (monotone — thresholding is equivalent) so no libm call ever runs.

FT_BUCKETS = 4096
FT_BIAS = -0.015625  # −1/64: exact in binary and decimal
FT_THRESHOLD = 0.0

# --- r13 Arrow-vectorized gate scorer (guide §4.2) -------------------------
# The per-bigram work — md5('ftq:' || bigram), 8-hex parse, mod-fold to a
# bucket, weight lookup, integer sum per doc — ran as an interpreted HOF
# aggregate (no codegen, ~10 µs/bigram measured via the family's ~2.5 s
# walls at sf0.1's ~265k bigrams). The FROZEN feature definition needs a
# cryptographic hash per bigram either way, so the win is executing it as
# a tight batch loop with a per-task bigram→weight memo instead of an
# expression-tree walk per element. The md5 bytes, the mod folds and the
# integer sum are bit-identical (hashlib md5 over the same UTF-8 bytes;
# all operands non-negative, so Python % == Spark %); the DuckDB oracle
# still RE-DERIVES the weights in SQL, keeping the hash check an
# independent-implementation check. Returns per-doc SW (BIGINT) — every
# downstream variant (float logit, exact-score export, q6 bucket) keeps
# its arithmetic tree unchanged on top of sw.

_FT_WEIGHT_INTS: list[int] | None = None
_HASHCLF_SW_UDF = None


def _ft_weight_ints() -> list[int]:
    global _FT_WEIGHT_INTS
    if _FT_WEIGHT_INTS is None:
        import hashlib

        from .dedup import MINHASH_P

        _FT_WEIGHT_INTS = [
            int(hashlib.md5(f"ftw:{f}".encode()).hexdigest()[:8], 16)
            % MINHASH_P
            % 2001
            - 1000
            for f in range(FT_BUCKETS)
        ]
    return _FT_WEIGHT_INTS


def _hashclf_sw():
    """pandas_udf: array<string> words → BIGINT SW = Σ weight[feature(bigram)].

    Iterator form so the weight table binds once per task and the
    bigram→weight memo amortizes repeats across every batch in the
    partition (guide §4.5); the memo caches a pure function of the bigram
    string, never data."""
    global _HASHCLF_SW_UDF
    if _HASHCLF_SW_UDF is not None:
        return _HASHCLF_SW_UDF

    from ..functions.gatescore import make_sw_udf
    from .dedup import MINHASH_P

    _HASHCLF_SW_UDF = make_sw_udf(_ft_weight_ints(), MINHASH_P, FT_BUCKETS)
    return _HASHCLF_SW_UDF


def _ft_feature_sql(duck: bool) -> str:
    """Hashed-bigram bucket id: first 8 md5 nibbles of 'ftq:'||bg mod B."""
    from .dedup import _hex_int_sql

    md5_expr = "md5('ftq:' || bg)"
    return f"({_hex_int_sql(md5_expr, duck)} % {FT_BUCKETS})"


def _ft_weight_sql(duck: bool, f_expr: str = "f") -> str:
    """Frozen weight for bucket expression `f_expr`: ((H('ftw:'||f) mod
    2001) − 1000) / 1024 ∈ [−0.9766, 0.9766], exactly representable."""
    from .dedup import _hex_int_sql

    s = "VARCHAR" if duck else "STRING"
    m = _hex_int_sql(f"md5('ftw:' || CAST({f_expr} AS {s}))", duck)
    return f"(CAST(({m} % 2001) - 1000 AS DOUBLE) / 1024.0)"


def hash_classifier(documents: DataFrame) -> DataFrame:
    """(doc_id, n_features, logit, keep): mean hashed-bigram weight + bias
    per document; `keep` = logit > threshold. Docs with < 2 words carry no
    bigram evidence and are excluded (same contract as corpus.dsir_weights).

    A document's bigrams all live in its own row, so inference is a
    ROW-LOCAL projection: the weighted sum runs as an `aggregate` HOF over
    the bigram array with exact decimal accumulation (the
    textstats.perplexity_scorer accumulator pattern) — ZERO shuffle at any
    scale, and the same projection applies unchanged to a readStream
    (streaming.classify_ingest; batch/stream bit-equality pinned). The
    first cut exploded bigrams into a doc-keyed groupBy — a corpus-wide
    exchange for an aggregation whose inputs never leave the row.

    Scoring runs through the r13 Arrow scorer (_hashclf_sw — guide §4.2):
    the per-bigram md5 + bucket fold + weight sum execute as one
    ArrowEvalPython batch pass instead of an interpreted HOF aggregate
    (the r12 form paid ~10 µs of expression-tree walking per bigram).
    Logits are bit-identical: the r12 DECIMAL(28,12) accumulation of
    w = k/1024 weights summed EXACTLY to SW/1024 (each term has ≤ 10
    decimal places; |SW| ≪ precision), and SW/1024 is a dyadic rational,
    so its DOUBLE cast is exact — computing CAST(sw AS DOUBLE)/1024.0
    (division by 2¹⁰ only shifts the exponent) reproduces the same
    double, and the logit arithmetic on top is unchanged. The DuckDB
    oracle still RE-DERIVES the weights in SQL, keeping the hash check
    an independent-implementation check. The old rand()*0.0 projection-
    collapse guard is gone WITH the interpreted tree it protected: the
    ArrowEvalPython node is evaluated once and both logit and keep read
    its output column."""
    sw = _hashclf_sw()(F.col("_ws"))
    logit = (F.col("_sum") / F.col("n_features")) + F.lit(FT_BIAS)
    return (
        documents.withColumn("_ws", textstats._words())
        .where(F.size("_ws") >= 2)
        .withColumn("n_features", (F.size("_ws") - 1).cast("bigint"))
        .withColumn("_sum", sw.cast("double") / F.lit(1024.0))
        .select(
            "doc_id",
            "n_features",
            logit.alias("logit"),
            (logit > F.lit(FT_THRESHOLD)).alias("keep"),
        )
    )


def _hash_classifier_sql() -> str:
    from .textstats import WORDS_SQL

    feat = _ft_feature_sql(duck=True)
    w = _ft_weight_sql(duck=True)
    return f"""
  WITH wd AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents
              WHERE len({WORDS_SQL}) >= 2),
  feats AS (SELECT doc_id, {feat} AS f FROM
              (SELECT doc_id,
                      unnest([ws[i] || ' ' || ws[i + 1]
                              FOR i IN range(1, len(ws))]) AS bg
               FROM wd)),
  scored AS (SELECT doc_id, COUNT(*) AS n_features,
                    CAST(SUM(CAST({w} AS DECIMAL(28,12))) AS DOUBLE)
                      / COUNT(*) + ({FT_BIAS!r}) AS logit
             FROM feats GROUP BY doc_id)
  SELECT doc_id, n_features, logit, logit > {FT_THRESHOLD!r} AS keep
  FROM scored"""


HASH_CLASSIFIER_SQL = _hash_classifier_sql()


# The hash classifier's logit is the exact rational (SW − 16n)/(1024n)
# with SW = Σ(h mod 2001 − 1000) an integer and n the bigram count —
# weights are n/1024 by construction, so 1024·Σw is integer. Its ORDER
# (what AUC/PR consume) is the order of SW/n.
FT_SCORE_NMAX_LIMIT = 96_000_000  # keeps |score| ≤ 1000·nmax² inside BIGINT


def hash_classifier_scores(documents: DataFrame) -> DataFrame:
    """(score BIGINT, label INT): the classifier's logit exported as an
    ORDER- AND TIE-FAITHFUL integer for the mleval BIGINT scaffold
    (r8 verdict #4 — the double logit kept the gate score out of the
    exact AUC/PR instances).

    Encoding: score = floor(SW·nmax²/n). Distinct rationals SW₁/n₁ ≠
    SW₂/n₂ differ by at least 1/(n₁n₂) ≥ 1/nmax², so flooring at nmax²
    granularity is INJECTIVE on distinct logits and exact on ties —
    order-isomorphic to the true logit, no quantization collisions (the
    device the doc-novelty/containment rationals cannot use because
    their denominators are unbounded; here n ≤ nmax by definition).
    floor (not truncate) so negative scores match the Python-reference
    convention: BOTH engines' integer division truncates toward zero
    (measured r9 — DuckDB's `//` does NOT floor on integers, despite
    its name), so both twins spell floor as the same sign-split CASE.

    nmax comes from a WORDS-ONLY scan (no md5 work) broadcast onto the
    scored rows — not a partition-less window over the md5-scored
    subtree (that would single-partition the expensive pass) and not a
    crossJoin of an aggregate of the SAME subtree (that would re-execute
    the md5 scan — the measured w_attribution lesson). Guard: nmax ≤
    9.6e7 (a ~100M-word document) keeps SW·nmax² inside DECIMAL(38,0)
    and the quotient inside BIGINT; beyond it the operator raises
    loudly (layout.day16_expr convention) rather than wrap.

    Label: lang = 'en', the same truth as ts_auc_langid/ts_auc_doclen —
    the frozen random-projection gate should sit near AUC 0.5; the point
    is measuring the ACTUAL gate score through the exact scaffold.
    Cites reference transformation.py:17-84 (the quality-gate stage this
    classifier stands in for)."""
    from .textstats import _words

    nmax = (
        documents.select(F.size(_words()).alias("_nw"))
        .where(F.col("_nw") >= 2)
        .agg((F.max("_nw") - 1).cast("bigint").alias("nmax"))
    )
    k2 = (
        # nmax is NULL when no document has >= 2 words; the scored side is
        # empty then, so any constant works — but without this branch the
        # NULL falls into the ELSE and raise_error(concat(.. NULL ..))
        # null-propagates into a NULL-message failure (r9 ADVICE #1).
        "CASE WHEN nmax IS NULL THEN CAST(0 AS DECIMAL(38,0))"
        f" WHEN nmax <= {FT_SCORE_NMAX_LIMIT}"
        " THEN CAST(nmax AS DECIMAL(38,0)) * nmax"
        " ELSE CAST(raise_error(concat('hash_classifier_scores: nmax ',"
        " CAST(nmax AS STRING),"
        f" ' exceeds the exact-score domain {FT_SCORE_NMAX_LIMIT}'))"
        " AS DECIMAL(38,0)) END"
    )
    score = (
        f"CASE WHEN sw >= 0 THEN CAST(CAST(sw AS DECIMAL(38,0)) * _k2 DIV _n"
        " AS BIGINT)"
        f" ELSE -CAST((CAST(-sw AS DECIMAL(38,0)) * _k2 + _n - 1) DIV _n"
        " AS BIGINT) END"
    )
    # r13: per-doc SW through the Arrow scorer (see _hashclf_sw) — the
    # integer sum is order-independent-exact, so the BIGINT value is
    # bit-identical to the r12 interpreted aggregate.
    return (
        documents.withColumn("_ws", _words())
        .where(F.size("_ws") >= 2)
        .select(
            _hashclf_sw()(F.col("_ws")).alias("sw"),
            (F.size("_ws") - 1).cast("bigint").alias("_n"),
            F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("label"),
        )
        .crossJoin(F.broadcast(nmax.selectExpr(f"{k2} AS _k2")))
        .select(F.expr(score).alias("score"), "label")
    )


def quality_token_curve(documents: DataFrame) -> DataFrame:
    """The data-curation frontier as a query: for every occupied quality
    level q (score floored to the FIXED q3 grid, 1001 buckets), the doc
    and TOKEN share a 'keep everything with quality ≥ q' policy retains
    — the Lorenz-style curve a corpus curator reads to pick the
    threshold ('top 30% of docs by quality holds 45% of tokens'). Doc
    counts and token counts answer different questions because doc
    length correlates with quality; this surfaces both.

    Exactness: the quality score double is bit-identical cross-engine by
    construction (same expression tree — the parity-green QUALITY_SQL
    twin), so floor(score·1000) is a deterministic integer bucket; from
    there everything is integer arithmetic, with shares as exact
    truncated ppm rationals. Score domain is provably [0, 1] so the
    bucket grid is [0, 1000] by construction — value-domain-BOUNDED,
    which is what keeps the cumulative windows metadata-sized.

    Scale shape: one row-local scoring projection → one map-combinable
    1001-key groupBy → cumulative/total windows over the ≤1001-row
    aggregate (free). Cites reference transformation.py:17-84 (the
    quality-gate stage whose threshold this curve tunes)."""
    from .textstats import quality_score

    scored = quality_score(documents).select(
        F.expr("CAST(floor(quality_score * 1000) AS BIGINT)").alias("qb"),
        F.col("n_tokens").cast("bigint").alias("nt"),
    )
    per_bucket = scored.groupBy("qb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.col("qb").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(F.lit(1))
    return (
        per_bucket.withColumn(
            "cum_docs", F.sum("n_docs").over(wcum).cast("bigint")
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(wcum).cast("bigint"))
        .withColumn("total_docs", F.sum("n_docs").over(wall).cast("bigint"))
        .withColumn(
            "total_tokens", F.sum("n_tokens").over(wall).cast("bigint")
        )
        .select(
            "qb",
            (F.col("qb") / F.lit(1000.0)).alias("q_threshold"),
            "n_docs",
            "n_tokens",
            "cum_docs",
            "cum_tokens",
            F.expr(
                # DECIMAL(38,0) staging like token_share_ppm: BIGINT
                # 1000000*cum_docs overflows past ~9.2e12 docs, and
                # DIVERGENTLY (Spark NULL, DuckDB error) — r9 ADVICE #2.
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * cum_docs"
                " DIV total_docs AS BIGINT)"
            ).alias("doc_share_ppm"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * cum_tokens"
                " DIV total_tokens AS BIGINT)"
            ).alias("token_share_ppm"),
        )
        .orderBy(F.col("qb").desc())
    )


def quality_token_curve_sql() -> str:
    """DuckDB twin of :func:`quality_token_curve` (reads `documents`)."""
    from .textstats import QUALITY_SQL

    return f"""
  WITH q AS (SELECT doc_id, n_tokens, quality_score FROM ({QUALITY_SQL})),
  scored AS (SELECT CAST(floor(quality_score * 1000) AS BIGINT) AS qb,
                    CAST(n_tokens AS BIGINT) AS nt FROM q),
  per_bucket AS (SELECT qb, CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(nt) AS BIGINT) AS n_tokens
                 FROM scored GROUP BY qb),
  cum AS (
    SELECT qb, n_docs, n_tokens,
           CAST(SUM(n_docs) OVER (ORDER BY qb DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
           CAST(SUM(n_tokens) OVER (ORDER BY qb DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
           CAST(SUM(n_docs) OVER () AS BIGINT) AS total_docs,
           CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens
    FROM per_bucket)
SELECT qb, qb / 1000.0 AS q_threshold, n_docs, n_tokens,
       cum_docs, cum_tokens,
       CAST(CAST(1000000 AS HUGEINT) * cum_docs // total_docs AS BIGINT)
         AS doc_share_ppm,
       CAST(CAST(1000000 AS HUGEINT) * cum_tokens // total_tokens AS BIGINT)
         AS token_share_ppm
FROM cum ORDER BY qb DESC"""


HASHCLF_BUCKET_LO, HASHCLF_BUCKET_HI = -64, 63  # clamped q6 score domain


def _hashclf_bucket_frame(
    documents: DataFrame, with_source: bool = True
) -> DataFrame:
    """(source, bucket, label): every scored doc's gate logit quantized to the
    FIXED q6 domain — bucket = clamp(floor(64·logit)) =
    clamp(floor((SW − 16n)/(16n))), a pure-integer sign-split floor.
    Value-domain-bounded by CONTRACT (128 buckets), which is what makes
    the per-source drift monitor's state constant-size at any corpus
    volume — the bounded-score instance the ts_auc_hashclf 100×-probe
    note calls for."""
    from .textstats import _words

    bucket = (
        f"LEAST(CAST({HASHCLF_BUCKET_HI} AS BIGINT),"
        f" GREATEST(CAST({HASHCLF_BUCKET_LO} AS BIGINT),"
        " CASE WHEN sw - 16 * _n >= 0 THEN (sw - 16 * _n) DIV (16 * _n)"
        " ELSE -((-(sw - 16 * _n) + 16 * _n - 1) DIV (16 * _n)) END))"
    )
    src = [F.col("source")] if with_source else []
    # r13: per-doc SW through the Arrow scorer (see _hashclf_sw); the q6
    # bucket arithmetic on top is unchanged.
    return (
        documents.withColumn("_ws", _words())
        .where(F.size("_ws") >= 2)
        .select(
            *src,
            _hashclf_sw()(F.col("_ws")).alias("sw"),
            (F.size("_ws") - 1).cast("bigint").alias("_n"),
            F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("label"),
        )
        .select(*src, F.expr(bucket).alias("bucket"), "label")
    )


def hashclf_bucket_scores(documents: DataFrame) -> DataFrame:
    """(score BIGINT, label INT): the gate classifier's q6-BUCKETED logit
    as an mleval-ready scored frame — the value-domain-BOUNDED instance
    of ts_auc_hashclf (r9 verdict #4). The exact ts_auc_hashclf score
    floor(SW·nmax²/n) is injective on distinct logits, so its distinct-
    score domain GROWS with corpus size (its 100×-probe note); this
    variant trades tie-granularity for a FIXED 128-value domain
    (clamp(floor(64·logit))), which is what lets the streaming monitor's
    per-day count state stay constant-size at any event volume
    (streaming/mleval.streaming_score_counts — hostile pins in
    tests/test_streaming.py). Label truth: lang = 'en', same as
    ts_auc_hashclf, so the two AUCs are directly comparable (bucketing
    can only COARSEN the ranking — more ties, never reordering)."""
    return _hashclf_bucket_frame(documents, with_source=False).select(
        F.col("bucket").cast("bigint").alias("score"), "label"
    )


def hashclf_bucket_scores_by_source(documents: DataFrame) -> DataFrame:
    """(grp, score, label): the q6-bucketed gate score keyed by source —
    the slice-wise instance for mleval.auc_by_group ('is the gate
    ranking THIS domain's docs as well as the corpus?'), next to
    ts_hashclf_drift's PSI view of the same bucketed score. Per-slice
    state is (sources × ≤128 buckets) — constant-size per slice, so the
    streaming monitor shape carries over unchanged."""
    return _hashclf_bucket_frame(documents).select(
        F.col("source").alias("grp"),
        F.col("bucket").cast("bigint").alias("score"),
        "label",
    )


def hashclf_bucket_scores_by_source_cte() -> str:
    """DuckDB `scored(grp, score, label)` CTE twin of
    :func:`hashclf_bucket_scores_by_source`."""
    from .dedup import _hex_int_sql
    from .textstats import WORDS_SQL

    feat = _ft_feature_sql(duck=True)
    md5w = "md5('ftw:' || CAST(f AS VARCHAR))"
    w_int = f"(({_hex_int_sql(md5w, True)} % 2001) - 1000)"
    return f"""
  WITH wd AS (SELECT doc_id, lang, source, {WORDS_SQL} AS ws FROM documents
              WHERE len({WORDS_SQL}) >= 2),
  feats AS (SELECT doc_id, {feat} AS f FROM
              (SELECT doc_id,
                      unnest([ws[i] || ' ' || ws[i + 1]
                              FOR i IN range(1, len(ws))]) AS bg
               FROM wd)),
  sw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM({w_int}) AS BIGINT) AS sw
         FROM feats GROUP BY doc_id),
  scored AS (SELECT wd.source AS grp,
               LEAST(CAST({HASHCLF_BUCKET_HI} AS BIGINT),
                 GREATEST(CAST({HASHCLF_BUCKET_LO} AS BIGINT),
                   CASE WHEN sw.sw - 16 * sw.n >= 0
                        THEN (sw.sw - 16 * sw.n) // (16 * sw.n)
                        ELSE -((-(sw.sw - 16 * sw.n) + 16 * sw.n - 1)
                               // (16 * sw.n)) END)) AS score,
               CASE WHEN wd.lang = 'en' THEN 1 ELSE 0 END AS label
             FROM sw JOIN wd USING (doc_id))"""


def hashclf_bucket_scores_cte() -> str:
    """DuckDB `scored(score, label)` CTE twin of
    :func:`hashclf_bucket_scores` — model fold re-derived in SQL; the q6
    bucket floor is the sign-split CASE both engines spell identically
    (integer division truncates toward zero in both — measured r9)."""
    from .dedup import _hex_int_sql
    from .textstats import WORDS_SQL

    feat = _ft_feature_sql(duck=True)
    md5w = "md5('ftw:' || CAST(f AS VARCHAR))"
    w_int = f"(({_hex_int_sql(md5w, True)} % 2001) - 1000)"
    return f"""
  WITH wd AS (SELECT doc_id, lang, {WORDS_SQL} AS ws FROM documents
              WHERE len({WORDS_SQL}) >= 2),
  feats AS (SELECT doc_id, {feat} AS f FROM
              (SELECT doc_id,
                      unnest([ws[i] || ' ' || ws[i + 1]
                              FOR i IN range(1, len(ws))]) AS bg
               FROM wd)),
  sw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM({w_int}) AS BIGINT) AS sw
         FROM feats GROUP BY doc_id),
  scored AS (SELECT
               LEAST(CAST({HASHCLF_BUCKET_HI} AS BIGINT),
                 GREATEST(CAST({HASHCLF_BUCKET_LO} AS BIGINT),
                   CASE WHEN sw.sw - 16 * sw.n >= 0
                        THEN (sw.sw - 16 * sw.n) // (16 * sw.n)
                        ELSE -((-(sw.sw - 16 * sw.n) + 16 * sw.n - 1)
                               // (16 * sw.n)) END)) AS score,
               CASE WHEN wd.lang = 'en' THEN 1 ELSE 0 END AS label
             FROM sw JOIN wd USING (doc_id))"""


def hashclf_drift_by_source(documents: DataFrame) -> DataFrame:
    """Per source: PSI of the q6-bucketed gate score against the REST of
    the corpus — "is the quality gate scoring this domain systematically
    differently?", the slice-wise gate-health check next to
    ts_auc_hashclf's global number. Same _psi_term_q15 arithmetic tree
    as every other PSI instance (Laplace-smoothed, floored at 1e-15,
    exact integer sum) over the FIXED 128-bucket domain, so zero bins
    contribute their smoothing terms and the monitor state is
    constant-size regardless of corpus volume.

    Scale shape: ONE md5-scoring pass feeds one (source, bucket)
    groupBy, referenced exactly once; zero-completion comes from a CHEAP
    source-only scan (column-pruned, no md5 — the
    hash_classifier_scores nmax pattern) crossed with the LITERAL
    128-value bucket domain, never from a second reference to the
    scored subtree (the w_attribution re-execution lesson). The
    completed frame is |sources|×128 rows — metadata-sized — so its
    windows (rest counts per bucket, grand total) are free.

    Output per source: (source, n_source, n_rest, psi_q15, psi_bits,
    warn_010, drift_025), ordered by source."""
    counts = _hashclf_bucket_frame(documents).groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return hashclf_drift_from_counts(
        counts, documents.select("source").distinct()
    )


def hashclf_drift_from_counts(counts: DataFrame, sources: DataFrame) -> DataFrame:
    """The source-vs-rest PSI read-off from (source, bucket, c) count
    state — factored out of :func:`hashclf_drift_by_source` so the SAME
    arithmetic runs over a stream-maintained histogram
    (streaming/mleval.streaming_score_counts_by_group state folded
    across days and labels): the monitor never re-scans scored docs,
    and batch/stream bit-equality is pinned in tests/test_streaming.py.
    `sources` is the one-column frame of ALL sources (zero-doc slices
    still get their smoothing terms)."""
    from .drift import PSI_DRIFT_Q15, PSI_WARN_Q15, _psi_term_q15

    spark = counts.sparkSession
    domain = spark.range(HASHCLF_BUCKET_LO, HASHCLF_BUCKET_HI + 1).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    completed = (
        sources.crossJoin(F.broadcast(domain))
        .join(counts, ["source", "bucket"], "left")
        .withColumn("c0", F.coalesce(F.col("c"), F.lit(0)).cast("bigint"))
    )
    wsrc = Window.partitionBy("source")
    wb = Window.partitionBy("bucket")
    wall = Window.partitionBy(F.lit(1))
    nb = HASHCLF_BUCKET_HI - HASHCLF_BUCKET_LO + 1
    staged = (
        completed.withColumn("n0", F.sum("c0").over(wsrc).cast("bigint"))
        .withColumn(
            "c1", (F.sum("c0").over(wb) - F.col("c0")).cast("bigint")
        )
        .withColumn(
            "n1", (F.sum("c0").over(wall) - F.col("n0")).cast("bigint")
        )
        .withColumn("nb", F.lit(nb).cast("bigint"))
    )
    term_q = _psi_term_q15(duck=False)
    return (
        staged.select("source", "n0", "n1", F.expr(term_q).alias("tq"))
        .groupBy("source")
        .agg(
            F.max("n0").alias("n_source"),
            F.max("n1").alias("n_rest"),
            F.sum("tq").alias("psi_q15"),
        )
        .select(
            "source",
            "n_source",
            "n_rest",
            "psi_q15",
            F.expr("CAST(psi_q15 AS DOUBLE) / 1e15").alias("psi_bits"),
            F.expr(f"psi_q15 > {PSI_WARN_Q15}").alias("warn_010"),
            F.expr(f"psi_q15 > {PSI_DRIFT_Q15}").alias("drift_025"),
        )
        .orderBy("source")
    )


def hashclf_drift_by_source_sql() -> str:
    """DuckDB twin of :func:`hashclf_drift_by_source` (reads
    `documents`) — weights and the bucket floor re-derived in SQL."""
    from .dedup import _hex_int_sql
    from .drift import PSI_DRIFT_Q15, PSI_WARN_Q15, _psi_term_q15
    from .textstats import WORDS_SQL

    feat = _ft_feature_sql(duck=True)
    md5w = "md5('ftw:' || CAST(f AS VARCHAR))"
    w_int = f"(({_hex_int_sql(md5w, True)} % 2001) - 1000)"
    nb = HASHCLF_BUCKET_HI - HASHCLF_BUCKET_LO + 1
    term_q = _psi_term_q15(duck=True)
    return f"""
  WITH wd AS (SELECT doc_id, source, {WORDS_SQL} AS ws FROM documents
              WHERE len({WORDS_SQL}) >= 2),
  feats AS (SELECT doc_id, {feat} AS f FROM
              (SELECT doc_id,
                      unnest([ws[i] || ' ' || ws[i + 1]
                              FOR i IN range(1, len(ws))]) AS bg
               FROM wd)),
  sw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM({w_int}) AS BIGINT) AS sw
         FROM feats GROUP BY doc_id),
  bucketed AS (
    SELECT wd.source,
           LEAST(CAST({HASHCLF_BUCKET_HI} AS BIGINT),
                 GREATEST(CAST({HASHCLF_BUCKET_LO} AS BIGINT),
                   CASE WHEN sw.sw - 16 * sw.n >= 0
                        THEN CAST((sw.sw - 16 * sw.n) // (16 * sw.n) AS BIGINT)
                        ELSE -CAST((-(sw.sw - 16 * sw.n) + 16 * sw.n - 1)
                                   // (16 * sw.n) AS BIGINT) END)) AS bucket
    FROM sw JOIN wd USING (doc_id)),
  counts AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
             FROM bucketed GROUP BY source, bucket),
  srcs AS (SELECT DISTINCT source FROM documents),
  domain AS (SELECT CAST(b AS BIGINT) AS bucket
             FROM generate_series({HASHCLF_BUCKET_LO},
                                  {HASHCLF_BUCKET_HI}) AS t(b)),
  completed AS (
    SELECT s.source, d.bucket, COALESCE(c.c, 0) AS c0
    FROM srcs s CROSS JOIN domain d
    LEFT JOIN counts c ON c.source = s.source AND c.bucket = d.bucket),
  staged AS (
    SELECT source, c0,
           CAST(SUM(c0) OVER (PARTITION BY source) AS BIGINT) AS n0,
           CAST(SUM(c0) OVER (PARTITION BY bucket) - c0 AS BIGINT) AS c1,
           CAST(SUM(c0) OVER ()
                - SUM(c0) OVER (PARTITION BY source) AS BIGINT) AS n1,
           CAST({nb} AS BIGINT) AS nb
    FROM completed)
SELECT source,
       CAST(MAX(n0) AS BIGINT) AS n_source,
       CAST(MAX(n1) AS BIGINT) AS n_rest,
       CAST(SUM({term_q}) AS BIGINT) AS psi_q15,
       CAST(CAST(SUM({term_q}) AS BIGINT) AS DOUBLE) / 1e15 AS psi_bits,
       CAST(SUM({term_q}) AS BIGINT) > {PSI_WARN_Q15} AS warn_010,
       CAST(SUM({term_q}) AS BIGINT) > {PSI_DRIFT_Q15} AS drift_025
FROM staged GROUP BY source ORDER BY source"""


def hash_classifier_scores_cte() -> str:
    """DuckDB `scored(score, label)` CTE twin — weights RE-DERIVED in SQL
    (independent implementation of the model fold, as for
    HASH_CLASSIFIER_SQL); DuckDB integer `//` truncates toward zero
    exactly like Spark DIV (measured r9), so floor is the same
    sign-split CASE in both dialects."""
    from .dedup import _hex_int_sql
    from .textstats import WORDS_SQL

    feat = _ft_feature_sql(duck=True)
    md5w = "md5('ftw:' || CAST(f AS VARCHAR))"
    w_int = f"(({_hex_int_sql(md5w, True)} % 2001) - 1000)"
    return f"""
  WITH wd AS (SELECT doc_id, lang, {WORDS_SQL} AS ws FROM documents
              WHERE len({WORDS_SQL}) >= 2),
  nm AS (SELECT CAST(MAX(len(ws) - 1) AS BIGINT) AS nmax FROM wd),
  feats AS (SELECT doc_id, {feat} AS f FROM
              (SELECT doc_id,
                      unnest([ws[i] || ' ' || ws[i + 1]
                              FOR i IN range(1, len(ws))]) AS bg
               FROM wd)),
  sw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM({w_int}) AS BIGINT) AS sw
         FROM feats GROUP BY doc_id),
  scored AS (SELECT CASE WHEN sw.sw >= 0
                    THEN CAST(CAST(sw.sw AS HUGEINT)
                              * (CAST(nmax AS HUGEINT) * nmax)
                              // sw.n AS BIGINT)
                    ELSE -CAST((CAST(-sw.sw AS HUGEINT)
                                * (CAST(nmax AS HUGEINT) * nmax)
                                + sw.n - 1) // sw.n AS BIGINT) END AS score,
                    CASE WHEN wd.lang = 'en' THEN 1 ELSE 0 END AS label
             FROM sw JOIN wd USING (doc_id) CROSS JOIN nm)"""


# ---------------------------------------------------------------------------
# Corpus-wide line-level dedup — the CCNet/C4 paragraph-dedup stage: exact
# duplicate LINES (boilerplate headers, nav bars, license blurbs) are
# removed across the whole corpus, keeping only the first occurrence, and
# each document is reassembled from its surviving lines. The corpus here is
# single-line, so "lines" are fixed W-word segments (the same pseudo-line
# convention as chunk_documents); with real multi-line text the splitter
# swaps for split(text, '\n') and nothing else changes.
#
# Scale shape: line fan-out is row-local inside the scan; ONE line-hash
# groupBy finds each line's first occurrence (map-side combine; hot
# boilerplate lines reduce to one row per partition before the exchange);
# the winner check rides a line-hash equi-join (AQE splits genuinely hot
# keys); reassembly is ONE doc-keyed aggregation whose array_sort makes
# the rebuilt text independent of collection order. First-occurrence is
# decided on a packed (doc_id, line_idx) bigint — portable total order,
# no struct-min semantics to align across engines.

LINE_W = 16  # words per pseudo-line
LINE_PACK = 1_000_000  # line_idx < 1e6 (docs are <= ~1e2 lines); doc_id * PACK + idx fits bigint


def line_dedup(documents: DataFrame, w: int = LINE_W) -> DataFrame:
    """(doc_id, n_lines, n_kept, text_dedup): per-doc line counts before /
    after corpus-wide exact line dedup, plus the reassembled text. Docs
    with zero words carry no lines and are excluded (both engines)."""
    staged = documents.select("doc_id", textstats._words().alias("_ws")).where(
        F.size("_ws") >= 1  # zero-word docs have no lines (oracle: empty range)
    )
    lines = staged.select(
        "doc_id",
        "_ws",
        F.explode(F.expr(f"sequence(0, size(_ws) - 1, {w})")).alias("st"),
    ).select(
        "doc_id",
        (F.col("st") / w).cast("bigint").alias("line_idx"),
        F.expr(f"array_join(slice(_ws, st + 1, {w}), ' ')").alias("line"),
    )
    hashed = lines.select(
        "doc_id",
        "line_idx",
        "line",
        F.md5("line").alias("h"),
        (F.col("doc_id") * LINE_PACK + F.col("line_idx")).alias("k"),
    )
    winners = hashed.groupBy("h").agg(F.min("k").alias("w_k"))
    keep = F.col("k") == F.col("w_k")
    kept_struct = F.when(
        keep, F.struct(F.col("line_idx").alias("i"), F.col("line").alias("l"))
    )
    return (
        hashed.join(winners, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(keep.cast("bigint")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["l"]
                ),
                " ",
            ).alias("text_dedup"),
        )
    )


def _line_dedup_sql(w: int = LINE_W) -> str:
    return f"""
  WITH wd AS (SELECT doc_id, {textstats.WORDS_SQL} AS ws FROM documents),
  starts AS (SELECT doc_id, ws, unnest(range(0, len(ws), {w})) AS st FROM wd),
  lines AS (SELECT doc_id, st // {w} AS line_idx,
                   array_to_string(ws[st + 1 : st + {w}], ' ') AS line
            FROM starts),
  hashed AS (SELECT doc_id, line_idx, line, md5(line) AS h,
                    doc_id * {LINE_PACK} + line_idx AS k
             FROM lines),
  winners AS (SELECT h, MIN(k) AS w_k FROM hashed GROUP BY h)
  SELECT doc_id, COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN k = w_k THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         COALESCE(array_to_string(
           list(line ORDER BY line_idx) FILTER (WHERE k = w_k), ' '), '')
           AS text_dedup
  FROM hashed JOIN winners USING (h)
  GROUP BY doc_id"""


LINE_DEDUP_SQL = _line_dedup_sql()


# ---------------------------------------------------------------------------
# CCNet band sampling — the buckets' downstream use: sample the head band
# fully, the middle partially, the tail lightly (head-heavy quality
# weighting; the rates are the recipe knob). Deterministic md5-hash
# thresholding (corpus._doc_hash_sql — the engine's reproducible-sampling
# device), so re-runs select the identical corpus in both engines.

CCNET_RATES = {"head": 100, "middle": 60, "tail": 20}  # percent


def ccnet_sample(documents: DataFrame, k: int = textstats.PPLX_VOCAB_K) -> DataFrame:
    """(doc_id, n_tokens, ppl_bucket, keep_rate_pct): survivors of
    per-band downsampling over the perplexity terciles."""
    rate = (
        F.when(F.col("ppl_bucket") == "head", CCNET_RATES["head"])
        .when(F.col("ppl_bucket") == "middle", CCNET_RATES["middle"])
        .otherwise(CCNET_RATES["tail"])
    )
    h = F.expr(_doc_hash_sql(duck=False, mod=100))
    return (
        textstats.ccnet_buckets(documents, k)
        .withColumn("keep_rate_pct", rate)
        .withColumn("_h", h)
        .where(F.col("_h") < F.col("keep_rate_pct"))
        .select("doc_id", "n_tokens", "ppl_bucket", "keep_rate_pct")
    )


def _ccnet_sample_sql() -> str:
    return f"""
  WITH b AS ({textstats.CCNET_BUCKETS_SQL})
  SELECT doc_id, n_tokens, ppl_bucket,
         CASE ppl_bucket WHEN 'head' THEN {CCNET_RATES["head"]}
                         WHEN 'middle' THEN {CCNET_RATES["middle"]}
                         ELSE {CCNET_RATES["tail"]} END AS keep_rate_pct
  FROM b
  WHERE {_doc_hash_sql(duck=True, mod=100)} <
        CASE ppl_bucket WHEN 'head' THEN {CCNET_RATES["head"]}
                        WHEN 'middle' THEN {CCNET_RATES["middle"]}
                        ELSE {CCNET_RATES["tail"]} END"""


CCNET_SAMPLE_SQL = _ccnet_sample_sql()


# ---------------------------------------------------------------------------
# Temperature-based mixture rebalancing (α-sampling, Conneau et al. 2020
# XLM-R §3.1 / mT5): target share q_s ∝ p_s^α flattens the source
# distribution only PARTIALLY (α=1 keeps natural shares, α→0 goes uniform
# — mix_rebalance is the α=0 endpoint of this family). α is fixed at ½
# deliberately: p^0.5 = sqrt(), the one power IEEE 754 requires correctly
# rounded, so the whole plan stays engine-portable with no pow()/exp()
# (numerics.py plog2 rationale). The cross-source normalizer Σ√tokens is
# accumulated in DECIMAL(28,12) (the ts_perplexity device) so the sum is
# order-independent and bit-identical at any parallelism.
#
# Budget: the largest token budget where NO source up-samples past rate 1
# (epoch-limited sampling): budget = min_s tokens_s / q_s; the binding
# source keeps everything, every other source downsamples toward its
# temperature share. Same two-tiny-rollup shuffle story as mix_rebalance.

MIX_ALPHA = 0.5  # fixed: sqrt is the portable power


def mix_temperature(documents: DataFrame) -> DataFrame:
    """Per-source α=½ temperature sampling plan: (source, n_docs, tokens,
    nat_share, temp_share, keep_rate, expected_tokens).

    Exactness (r9 fix): √tokens is quantized per-row in INTEGER space —
    rt_q9 = floor(sqrt(tokens)·1e9) as BIGINT — and Z = Σ rt_q9 is an
    exact integer sum. The old form summed CAST(sqrt AS DECIMAL(28,12)),
    and a double→decimal cast is engine-divergent on short-expansion
    reprs (Spark rounds the exact binary, DuckDB the shortest repr — an
    sf0.1 source hit the class). sqrt and the ·1e9 multiply are
    correctly rounded identically per IEEE in both engines, floor is
    exact, so every downstream double derives from identical integers
    through identical expression trees — bit-identical by construction.
    rt_q9 ≤ 1e16 at 100 TB token counts (√1e14·1e9), inside BIGINT."""
    # per_src is the SOURCE-dim rollup (a handful of rows at any corpus
    # scale) but its lineage is the full corpus tokenize+count; it feeds
    # four plan branches (grand totals, the q projection, the budget min,
    # the final select) and Spark does not CSE across branches, so without
    # materialization the corpus scan ran once per branch. localCheckpoint
    # folds it once per execution (r12; guide §3.3): corpus scans 4 → 1.
    per_src = materialize(
        documents.select("source", F.size(textstats._words()).alias("_n"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_n").alias("tokens"))
    )
    rooted = per_src.withColumn(
        "_rtq",
        F.expr("CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1e9) AS BIGINT)"),
    )
    grand = rooted.agg(
        F.sum("tokens").alias("_total"),
        F.sum("_rtq").cast("bigint").alias("_zq"),
    )
    with_q = rooted.crossJoin(F.broadcast(grand)).withColumn(
        "_q", F.col("_rtq").cast("double") / F.col("_zq").cast("double")
    )
    budget = with_q.agg(
        F.min(F.col("tokens").cast("double") / F.col("_q")).alias("_budget")
    )
    return with_q.crossJoin(F.broadcast(budget)).select(
        "source",
        "n_docs",
        "tokens",
        (F.col("tokens").cast("double") / F.col("_total").cast("double")).alias("nat_share"),
        F.col("_q").alias("temp_share"),
        F.least(F.lit(1.0), F.col("_q") * F.col("_budget") / F.col("tokens").cast("double"))
        .alias("keep_rate"),
        F.least(F.col("tokens").cast("double"), F.col("_q") * F.col("_budget"))
        .alias("expected_tokens"),
    )


MIX_TEMPERATURE_SQL = f"""
  WITH t AS (SELECT source, COUNT(*) AS n_docs,
                    CAST(SUM(len({textstats.WORDS_SQL})) AS BIGINT) AS tokens
             FROM documents GROUP BY source),
  r AS (SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1e9) AS BIGINT)
                    AS rtq FROM t),
  g AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
               CAST(SUM(rtq) AS BIGINT) AS zq
        FROM r),
  q AS (SELECT r.*, g.total,
               CAST(r.rtq AS DOUBLE) / CAST(g.zq AS DOUBLE) AS qs
        FROM r CROSS JOIN g),
  b AS (SELECT MIN(CAST(tokens AS DOUBLE) / qs) AS budget FROM q)
  SELECT source, n_docs, tokens,
         CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE) AS nat_share,
         qs AS temp_share,
         LEAST(1.0, qs * budget / CAST(tokens AS DOUBLE)) AS keep_rate,
         LEAST(CAST(tokens AS DOUBLE), qs * budget) AS expected_tokens
  FROM q CROSS JOIN b"""


# ---------------------------------------------------------------------------
# Per-source quality calibration — raw heuristic scores are NOT comparable
# across sources (a boilerplate-heavy crawl scores systematically lower
# than a books corpus), so a single global threshold over-prunes whole
# sources. Rank-normalizing WITHIN source (percent_rank over a total
# order) maps every source onto [0,1] uniformly; a calibrated cut then
# removes the same per-source quantile everywhere — the practice behind
# per-language/per-domain thresholds in CCNet-style pipelines. One window
# pass per source partition (high-cardinality-safe); the total order
# (score, doc_id) makes percent_rank tie-free and engine-identical.

CALIBRATE_KEEP_Q = 0.2  # drop the bottom quintile of each source


def quality_calibrate(documents: DataFrame) -> DataFrame:
    """(doc_id, source, quality_score, calibrated, keep): percent_rank of
    the quality score within source; keep = calibrated ≥ CALIBRATE_KEEP_Q."""
    from pyspark.sql import Window

    scored = textstats.quality_score(documents).join(
        documents.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy("quality_score", "doc_id")
    return scored.select(
        "doc_id",
        "source",
        "quality_score",
        F.percent_rank().over(w).alias("calibrated"),
    ).withColumn("keep", F.col("calibrated") >= F.lit(CALIBRATE_KEEP_Q))


QUALITY_CALIBRATE_SQL = f"""
  WITH q AS ({textstats.QUALITY_SQL}),
  j AS (SELECT q.doc_id, d.source, q.quality_score
        FROM q JOIN documents d ON q.doc_id = d.doc_id)
  SELECT doc_id, source, quality_score,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY quality_score, doc_id) AS calibrated,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY quality_score, doc_id)
           >= {CALIBRATE_KEEP_Q!r} AS keep
  FROM j"""


# ---------------------------------------------------------------------------
# Leakage-safe dataset splits — the subtle practice naive random splits
# get wrong: near-duplicate documents placed on opposite sides of a
# train/test boundary leak training content into evaluation (the same
# mechanism as benchmark contamination, inside one's own eval split). The fix is to split by
# DUPLICATE CLUSTER, not by document: hash the cluster id (connected
# component of the MinHash near-dup graph; singleton docs are their own
# cluster), so every member of a cluster lands in the same split by
# construction. Deterministic md5 split — reproducible like every other
# sampling decision here.

SPLIT_MOD = 10  # 8/1/1 train/val/test


def _cluster_split_sql(duck: bool) -> str:
    """Uniform hash of 'split:'||cluster_id ∈ [0, SPLIT_MOD)."""
    if not duck:
        return (
            f"(CAST(conv(substr(md5('split:' || CAST(cluster_id AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT) % {SPLIT_MOD})"
        )
    md5e = "md5('split:' || CAST(cluster_id AS VARCHAR))"
    h = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr({md5e}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({h}) % {SPLIT_MOD})"


def leakage_safe_split(documents: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, split): every document assigned train/val/test
    by its near-dup cluster's hash — clusters never straddle splits."""
    from . import dedup

    clusters = dedup.neardup_clusters(documents)
    with_cluster = documents.select("doc_id").join(clusters, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )
    h = F.expr(_cluster_split_sql(duck=False))
    return with_cluster.select(
        "doc_id",
        "cluster_id",
        F.when(h < SPLIT_MOD - 2, "train")
        .when(h == SPLIT_MOD - 2, "val")
        .otherwise("test")
        .alias("split"),
    )


def _leakage_safe_split_sql() -> str:
    from .dedup import NEARDUP_CLUSTERS_SQL

    h = _cluster_split_sql(duck=True)
    return f"""
  WITH comp AS ({NEARDUP_CLUSTERS_SQL})
  SELECT d.doc_id,
         COALESCE(comp.cluster_id, d.doc_id) AS cluster_id,
         CASE WHEN {h.replace("cluster_id", "COALESCE(comp.cluster_id, d.doc_id)")}
                   < {SPLIT_MOD - 2} THEN 'train'
              WHEN {h.replace("cluster_id", "COALESCE(comp.cluster_id, d.doc_id)")}
                   = {SPLIT_MOD - 2} THEN 'val'
              ELSE 'test' END AS split
  FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id"""


# --- weighted sampling without replacement ----------------------------------

WS_K = 100  # sample size
_WS_BITS = 32  # uniform granularity: first 8 md5 nibbles = 32 bits


def _ws_u32_sql(duck: bool) -> str:
    """Seeded 32-bit uniform from doc_id: first 8 nibbles of
    md5('ws:' || doc_id) + 1 ∈ [1, 2^32] — engine-portable (the
    _doc_hash_sql nibble device), independent of every other sampler's
    hash stream via the 'ws:' seed."""
    if not duck:
        return (
            "(CAST(conv(substr(md5('ws:' || CAST(doc_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT) + 1)"
        )
    md5 = "md5('ws:' || CAST(doc_id AS VARCHAR))"
    terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr({md5}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({terms}) + 1)"


def _ws_key_sql(duck: bool) -> str:
    """A-ES key in log space: log2(u)/w = (plog2(u32) − 32) / w, u uniform
    on (0, 1], w the integer document weight (n_tokens).

    The raw double is QUANTIZED to DECIMAL(18,12) and re-emitted as DOUBLE:
    plog2 is bit-identical for every *quantized* consumer, but DuckDB
    contracts the polynomial's a*t+c steps into FMA, so the raw double can
    differ in the last ulp between engines (seen: 1-ulp divergence at
    sf0.001). Keys are in [−32, 0], so 12 decimals ≈ 13 significant digits
    (inside the repo's ≤14-digit cross-engine rule) while FMA noise is
    ≤ ~3e-15 — five orders of magnitude below the rounding grid. Ranking
    happens on the quantized key (doc_id tiebreak), so sample membership is
    engine-identical too."""
    from ..functions.numerics import plog2_sql

    raw = (
        f"((({plog2_sql(_ws_u32_sql(duck), duck=duck)}) - {_WS_BITS}.0)"
        " / CAST(w AS DOUBLE))"
    )
    return f"CAST(CAST({raw} AS DECIMAL(18,12)) AS DOUBLE)"


def weighted_sample(documents: DataFrame, k: int = WS_K) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k documents
    drawn with probability proportional to token count, via the
    Efraimidis–Spirakis A-ES scheme — key_i = u_i^(1/w_i), take the k
    largest. In log2 space (the portable-plog2 device, so both engines
    compute the identical key): key = log2(u)/w, u a seeded md5-derived
    uniform. Re-running the pipeline draws the SAME sample — reproducible
    eval sets — and union-merging per-shard top-k IS the global top-k
    (A-ES keys are independent per row), which is exactly what Spark's
    TakeOrderedAndProject does here: per-partition top-k, then a k-row
    merge on the driver — no global sort shuffle at any scale."""
    w = F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
    scored = (
        documents.withColumn("w", w)
        .where(F.col("w") >= 1)
        .withColumn("es_key", F.expr(_ws_key_sql(duck=False)))
    )
    return (
        scored.select("doc_id", "source", "lang", "w", "es_key")
        .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def weighted_sample_sql(k: int = WS_K) -> str:
    """DuckDB twin of :func:`weighted_sample`."""
    from .textstats import WORDS_SQL

    return f"""WITH weighted AS (
    SELECT doc_id, source, lang, len({WORDS_SQL}) AS w FROM documents),
  scored AS (
    SELECT doc_id, source, lang, w, {_ws_key_sql(duck=True)} AS es_key
    FROM weighted WHERE w >= 1)
SELECT doc_id, source, lang, w, es_key
FROM scored ORDER BY es_key DESC, doc_id ASC LIMIT {k}"""


# --- deterministic global shuffle + shard layout ----------------------------

SHUFFLE_SHARDS = 64


def _shuffle_key_sql(duck: bool) -> str:
    """Seeded shuffle key: md5('gs:' || doc_id) — a hex string, so plain
    string ordering IS the shuffled order in both engines. The 'gs:' seed
    keeps this hash stream independent of every sampler's."""
    s = "VARCHAR" if duck else "STRING"
    return f"md5('gs:' || CAST(doc_id AS {s}))"


def global_shuffle(
    documents: DataFrame, n_shards: int = SHUFFLE_SHARDS
) -> DataFrame:
    """Deterministic global shuffle of the corpus into `n_shards` training
    shards: every doc gets (shard, pos) — its file and offset in the
    shuffled training order. Training-data pipelines need exactly this
    before writing tokenized shards: a reproducible random order that no
    source/time locality survives (consecutive docs from one crawl batch
    must not land in one shard).

    shard = first 8 md5 nibbles mod n_shards; pos = rank of the full md5
    key within the shard. Re-runs produce the identical layout.

    Scale shape: ONE hash-partitioned exchange on `shard` + an in-partition
    sort (Spark's window does precisely repartition-by-key + sortWithin) —
    there is NO global sort; each shard orders independently, which is
    valid because shard membership already routed every row. At 100 TB
    with n_shards sized to ~1-4 GB of tokens per shard, this is the
    write-side layout pass before `partitionBy("shard")`."""
    # one conv() parse of skey's 8-hex-digit prefix (r12; same positional
    # value as the per-nibble instr sum — DuckDB twin keeps strpos)
    instr_terms = "CAST(conv(substr(skey, 1, 8), 16, 10) AS BIGINT)"
    keyed = documents.select(
        "doc_id",
        "source",
        F.expr(_shuffle_key_sql(duck=False)).alias("skey"),
    ).withColumn("shard", F.expr(f"({instr_terms}) % {n_shards}"))
    from pyspark.sql import Window

    win = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return keyed.select(
        "doc_id", "source", "shard", F.row_number().over(win).alias("pos")
    )


def global_shuffle_sql(n_shards: int = SHUFFLE_SHARDS) -> str:
    """DuckDB twin of :func:`global_shuffle`."""
    strpos_terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(skey, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""WITH keyed AS (
    SELECT doc_id, source, {_shuffle_key_sql(duck=True)} AS skey FROM documents),
  sharded AS (
    SELECT doc_id, source, skey, ({strpos_terms}) % {n_shards} AS shard
    FROM keyed)
SELECT doc_id, source, shard,
       row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS pos
FROM sharded"""


def shard_manifest(
    documents: DataFrame, n_shards: int = SHUFFLE_SHARDS
) -> DataFrame:
    """Per-shard manifest of the :func:`global_shuffle` layout — the
    sidecar a 100 TB export writes next to its shards so a trainer can
    plan reads without listing data: per shard the doc count, char
    volume, doc_id range, and two balance numbers in exact integer ppm
    (docs_share_ppm: this shard's share of docs; chars_balance_ppm:
    char volume vs the perfectly-even ideal, 1e6 == exactly even).

    Uses the SAME seeded md5 shard key as global_shuffle (by contract —
    the manifest must describe the layout that operator produced).

    Scale shape: one map-combinable groupBy on shard (n_shards groups),
    then a window over the n_shards-row aggregate. 128-bit staging keeps
    the ppm numbers exact past 1e14 total chars × 1e6 × n_shards."""
    # one conv() parse of skey's 8-hex-digit prefix (r12; same positional
    # value as the per-nibble instr sum — DuckDB twin keeps strpos)
    instr_terms = "CAST(conv(substr(skey, 1, 8), 16, 10) AS BIGINT)"
    keyed = documents.select(
        "doc_id",
        "n_chars",
        F.expr(_shuffle_key_sql(duck=False)).alias("skey"),
    ).withColumn("shard", F.expr(f"({instr_terms}) % {n_shards}"))
    per = keyed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    return (
        per.withColumn("total_docs", F.sum("n_docs").over(wall))
        .withColumn("total_chars", F.sum("n_chars").over(wall))
        .select(
            "shard",
            "n_docs",
            "n_chars",
            "min_doc_id",
            "max_doc_id",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * n_docs"
                " DIV total_docs AS BIGINT)"
            ).alias("docs_share_ppm"),
            F.expr(
                f"CAST(CAST(1000000 AS DECIMAL(38,0)) * {n_shards}"
                " * n_chars DIV total_chars AS BIGINT)"
            ).alias("chars_balance_ppm"),
        )
        .orderBy("shard")
    )


def shard_manifest_sql(n_shards: int = SHUFFLE_SHARDS) -> str:
    """DuckDB twin of :func:`shard_manifest`."""
    strpos_terms = " + ".join(
        f"CAST(strpos('0123456789abcdef', substr(skey, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""WITH keyed AS (
    SELECT doc_id, n_chars, {_shuffle_key_sql(duck=True)} AS skey
    FROM documents),
  sharded AS (
    SELECT doc_id, n_chars, ({strpos_terms}) % {n_shards} AS shard
    FROM keyed),
  per AS (
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM sharded GROUP BY shard)
SELECT shard, n_docs, n_chars, min_doc_id, max_doc_id,
       CAST(CAST(1000000 AS HUGEINT) * n_docs
            // (SUM(n_docs) OVER ()) AS BIGINT) AS docs_share_ppm,
       CAST(CAST(1000000 AS HUGEINT) * {n_shards} * n_chars
            // (SUM(n_chars) OVER ()) AS BIGINT) AS chars_balance_ppm
FROM per ORDER BY shard"""


# --- sequence-length histogram ----------------------------------------------


def seqlen_histogram(documents: DataFrame) -> DataFrame:
    """Power-of-two histogram of per-document token counts with cumulative
    token mass — the input a packing planner reads to choose max_seq_len
    and the pack budget (what fraction of token mass lives in docs longer
    than 2^k?).

    bucket = floor(log2(n_tokens)) computed EXACTLY from the bigint bit
    width (no float log); one scan-bound projection + one tiny groupBy
    (≤ ~40 buckets) + a running sum over the bucket-ordered result —
    the window runs over the bucket relation, not the corpus."""
    from pyspark.sql import Window

    n = F.size(textstats._words())
    per_doc = documents.select(n.alias("n_tokens")).where(F.col("n_tokens") >= 1)
    # floor(log2(n)) == bit_length(n) - 1, exactly (bin() trick JVM-side:
    # 63 - leading zeros). Spark: use log-free width via conv/bin length.
    bucket = (F.length(F.conv(F.col("n_tokens").cast("string"), 10, 2)) - 1)
    hist = (
        per_doc.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("token_mass"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        hist.withColumn("cum_docs", F.sum("n_docs").over(w).cast("bigint"))
        .withColumn("cum_token_mass", F.sum("token_mass").over(w).cast("bigint"))
        .select(
            "bucket",
            (F.lit(2) ** F.col("bucket")).cast("bigint").alias("len_lo"),
            "n_docs",
            "token_mass",
            "cum_docs",
            "cum_token_mass",
        )
        .orderBy("bucket")
    )


def seqlen_histogram_sql() -> str:
    """DuckDB twin of :func:`seqlen_histogram` (bit_length device: DuckDB
    has no conv(); floor(log2(n)) = length(bin-string) - 1 via printf)."""
    from .textstats import WORDS_SQL

    return f"""WITH per_doc AS (
    SELECT len({WORDS_SQL}) AS n_tokens FROM documents
    WHERE len({WORDS_SQL}) >= 1),
  hist AS (
    SELECT CAST(length(printf('%b', n_tokens)) - 1 AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS token_mass
    FROM per_doc GROUP BY 1)
SELECT bucket,
       CAST(power(2, bucket) AS BIGINT) AS len_lo,
       CAST(n_docs AS BIGINT) AS n_docs, token_mass,
       CAST(SUM(n_docs) OVER (ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
       CAST(SUM(token_mass) OVER (ORDER BY bucket
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_token_mass
FROM hist ORDER BY bucket"""


# ---------------------------------------------------------------------------
# Sliding-window document chunking — the embedding/retrieval prep stage of
# a training-data pipeline (every RAG/embedding corpus is built from
# overlapping chunks, not whole documents). pack_sequences (above) packs
# whole docs into budget-sized sequences; chunk_documents SPLITS one doc
# into size-S token windows advancing by S−V (V tokens of overlap), the
# dual operation.

CHUNK_SIZE = 64  # tokens per chunk
CHUNK_OVERLAP = 16  # tokens shared between consecutive chunks


def chunk_documents(
    documents: DataFrame, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP
) -> DataFrame:
    """One row per (doc_id, chunk_id): the chunk's token window, its text,
    and its 0-based token offset.

    Chunk k covers tokens [k·stride, k·stride + size) with
    stride = size − overlap; the last chunk is the first one whose window
    reaches the end of the doc (it may be shorter than `size`, and is the
    ONLY chunk per doc when n_tokens ≤ size — no empty/degenerate trailing
    chunks). n_chunks = 1 + ceil((n − size)/stride) for n > size, exact in
    integer arithmetic (no float division anywhere).

    100 TB shape: tokenize → explode → slice is entirely row-local (one
    scan, zero shuffles, whole-stage codegen); output rows fan out ~n/stride
    per doc, the same growth the downstream embedding job pays by necessity.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    n = F.size(F.col("t"))
    # integer ceil-div (no float /: repo rule — exact integer arithmetic
    # everywhere both engines compare values)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.expr(f"CAST((size(t) - {size} + {stride} - 1) DIV {stride} AS INT) + 1")
    )
    return (
        documents.select("doc_id", textstats._words().alias("t"))
        .where(F.size("t") >= 1)
        .select("doc_id", "t", n_chunks.alias("n_chunks"))
        .select(
            "doc_id",
            "t",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("bigint").alias("begin_tok"),
            F.slice(F.col("t"), F.col("chunk_id") * stride + 1, size).alias("c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "begin_tok",
            F.size("c").cast("bigint").alias("n_tokens_in_chunk"),
            F.array_join("c", " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> str:
    """DuckDB twin of :func:`chunk_documents` (1-based inclusive list
    slicing; range(n) is 0-based like Spark's sequence(0, n-1))."""
    from .textstats import WORDS_SQL

    stride = size - overlap
    return f"""WITH toks AS (
    SELECT doc_id, {WORDS_SQL} AS t FROM documents),
  sized AS (
    SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 1),
  counted AS (
    SELECT doc_id, t,
           CASE WHEN n <= {size} THEN 1
                ELSE CAST((n - {size} + {stride} - 1) // {stride} AS INTEGER) + 1
           END AS n_chunks
    FROM sized),
  exploded AS (
    SELECT doc_id, t, unnest(range(n_chunks)) AS chunk_id FROM counted)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {stride} AS BIGINT) AS begin_tok,
       CAST(len(t[chunk_id * {stride} + 1 : chunk_id * {stride} + {size}])
            AS BIGINT) AS n_tokens_in_chunk,
       array_to_string(t[chunk_id * {stride} + 1 : chunk_id * {stride} + {size}],
                       ' ') AS chunk_text
FROM exploded"""


CHUNK_DOCUMENTS_SQL = chunk_documents_sql()


# --- exact sample allocation (Hamilton / largest remainder) --------------------

ALLOC_BUDGET_DOCS = 10_000


def sample_allocation(
    documents: DataFrame, budget: int = ALLOC_BUDGET_DOCS
) -> DataFrame:
    """Exact integer allocation of a document budget across sources by the
    Hamilton (largest-remainder) method: every source gets
    floor(B·n_i/T), then the B − Σfloors leftover seats go to the
    largest remainders (source name breaks ties). The invariant a
    rate-based plan (mix_rebalance) cannot give you: quotas are INTEGERS
    that sum to EXACTLY min(budget, total) — what a sampler that must
    emit a fixed-size training set actually needs, with no stochastic
    rounding drift across runs or engines.

    Cap-safety: with effective budget B = min(budget, T), every quota
    f_i + 1 ≤ ceil(B·n_i/T) ≤ n_i, so no source is ever asked for more
    docs than it has; at B = T the remainders are all zero and the
    allocation degenerates to n_i exactly.

    Exact in BIGINT: B·n_i needs B·n_i < 2^63 — at B = 10⁴ that is
    ~9·10¹⁴ docs per source. One map-combinable source rollup, a
    broadcast grand total, and rank/sum windows over the
    value-domain-sized source table."""
    from pyspark.sql import Window

    # Source-dim rollup, two consumers (grand + quota projection):
    # materialize once per execution (r12; guide §3.3). Scans 2 → 1.
    per_src = materialize(
        documents.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    grand = per_src.agg(F.sum("n_docs").cast("bigint").alias("_total"))
    based = (
        per_src.crossJoin(F.broadcast(grand))
        .withColumn("_b", F.expr(f"least(CAST({budget} AS BIGINT), _total)"))
        .withColumn("floor_quota", F.expr("_b * n_docs DIV _total"))
        .withColumn("remainder", F.expr("_b * n_docs - floor_quota * _total"))
    )
    w_rank = Window.orderBy(F.col("remainder").desc(), F.col("source").asc())
    ranked = based.withColumn("_rk", F.row_number().over(w_rank)).withColumn(
        "_leftover", F.expr("_b - sum(floor_quota) OVER ()")
    )
    return (
        ranked.select(
            "source",
            "n_docs",
            "floor_quota",
            "remainder",
            (F.col("_rk") <= F.col("_leftover")).alias("plus_one"),
            F.expr(
                "floor_quota + CASE WHEN _rk <= _leftover THEN 1 ELSE 0 END"
            ).alias("allocation"),
        )
        .orderBy("source")
    )


def sample_allocation_sql(budget: int = ALLOC_BUDGET_DOCS) -> str:
    """DuckDB twin of :func:`sample_allocation` (reads `documents`)."""
    return f"""
  WITH per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM documents GROUP BY source),
  g AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM per_src),
  based AS (
    SELECT source, n_docs, total,
           LEAST(CAST({budget} AS BIGINT), total) AS b,
           LEAST(CAST({budget} AS BIGINT), total) * n_docs // total
             AS floor_quota,
           LEAST(CAST({budget} AS BIGINT), total) * n_docs
             - (LEAST(CAST({budget} AS BIGINT), total) * n_docs // total)
               * total AS remainder
    FROM per_src CROSS JOIN g),
  ranked AS (
    SELECT *, row_number() OVER (ORDER BY remainder DESC, source ASC) AS rk,
           b - SUM(floor_quota) OVER () AS leftover
    FROM based)
SELECT source, n_docs, floor_quota, remainder,
       rk <= leftover AS plus_one,
       CAST(floor_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS allocation
FROM ranked ORDER BY source"""


# ---------------------------------------------------------------------------
# Padding efficiency of batching strategies (round 11)

PAD_BATCH_SIZE = 8


def padding_efficiency(
    documents: DataFrame, batch_size: int = PAD_BATCH_SIZE
) -> DataFrame:
    """(source, strategy, n_docs, n_batches, token_mass, padded_mass,
    padding_tokens, padding_ppm): how many pad tokens each batching
    strategy burns, per source — 'arrival' batches docs in doc_id order,
    'sorted' batches them longest-first, and every batch pads its
    members to the batch max. The report a training-pipeline owner reads
    before picking a dataloader order: length-sorted batching typically
    cuts padding severalfold, and this measures it exactly on THIS
    corpus (all integer token arithmetic; padding_ppm stages through
    DECIMAL(38,0) like the other ppm shares).

    Scale: the token count is a row-local projection; both strategies'
    row_number windows partition BY SOURCE (shard-local batching — the
    realistic dataloader unit), never a global sort of the corpus; the
    per-batch and per-source aggregates are map-combinable. Two window
    passes over one cached projection, one small union."""
    per_doc = documents.select(
        "doc_id",
        "source",
        F.size(textstats._words()).cast("bigint").alias("n_tokens"),
    ).where(F.col("n_tokens") >= 1)

    def _one(strategy: str, order_cols) -> DataFrame:
        w = Window.partitionBy("source").orderBy(*order_cols)
        batched = per_doc.withColumn("_rn", F.row_number().over(w)).withColumn(
            "batch", F.expr(f"CAST((_rn - 1) DIV {batch_size} AS BIGINT)")
        )
        per_batch = batched.groupBy("source", "batch").agg(
            F.count(F.lit(1)).cast("bigint").alias("b_docs"),
            F.max("n_tokens").alias("b_max"),
            F.sum("n_tokens").cast("bigint").alias("b_mass"),
        )
        return per_batch.groupBy("source").agg(
            F.lit(strategy).alias("strategy"),
            F.sum("b_docs").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum("b_mass").cast("bigint").alias("token_mass"),
            F.sum(F.col("b_docs") * F.col("b_max")).cast("bigint").alias("padded_mass"),
        )

    both = _one("arrival", [F.col("doc_id").asc()]).unionByName(
        _one("sorted", [F.col("n_tokens").desc(), F.col("doc_id").asc()])
    )
    return both.select(
        "source",
        "strategy",
        "n_docs",
        "n_batches",
        "token_mass",
        "padded_mass",
        (F.col("padded_mass") - F.col("token_mass")).cast("bigint").alias("padding_tokens"),
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * (padded_mass - token_mass)"
            " DIV padded_mass AS BIGINT)"
        ).alias("padding_ppm"),
    )


def padding_efficiency_sql(batch_size: int = PAD_BATCH_SIZE) -> str:
    """DuckDB twin of :func:`padding_efficiency`."""
    from .textstats import WORDS_SQL

    def one(strategy: str, order_by: str) -> str:
        return f"""
    SELECT source, '{strategy}' AS strategy,
           CAST(SUM(b_docs) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(b_mass) AS BIGINT) AS token_mass,
           CAST(SUM(b_docs * b_max) AS BIGINT) AS padded_mass
    FROM (
      SELECT source, batch, CAST(COUNT(*) AS BIGINT) AS b_docs,
             MAX(n_tokens) AS b_max, CAST(SUM(n_tokens) AS BIGINT) AS b_mass
      FROM (
        SELECT source, n_tokens,
               (ROW_NUMBER() OVER (PARTITION BY source ORDER BY {order_by})
                - 1) // {batch_size} AS batch
        FROM per_doc) b
      GROUP BY source, batch) pb
    GROUP BY source"""

    return f"""
  WITH per_doc AS (
    SELECT doc_id, source, CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens
    FROM documents
    WHERE len({WORDS_SQL}) >= 1),
  strat AS ({one('arrival', 'doc_id ASC')}
    UNION ALL {one('sorted', 'n_tokens DESC, doc_id ASC')})
SELECT source, strategy, n_docs, n_batches, token_mass, padded_mass,
       CAST(padded_mass - token_mass AS BIGINT) AS padding_tokens,
       CAST(CAST(1000000 AS HUGEINT) * (padded_mass - token_mass)
            // padded_mass AS BIGINT) AS padding_ppm
FROM strat"""
