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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def _doc_hash_sql(duck: bool) -> str:
    """Engine-portable uniform hash of doc_id ∈ [0, 100) — md5-derived, so
    sampling decisions are identical in Spark, DuckDB, or anything else
    that can md5 a string. Deterministic sampling means a re-run of the
    pipeline selects the same corpus — reproducible training data."""
    instr = "strpos" if duck else "instr"
    h = " + ".join(
        f"CAST({instr}('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    if duck:
        h = h.replace("AS STRING", "AS VARCHAR")
    return f"(({h}) % 100)"


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
    corpus side is one scan + a broadcast semi-join-shaped aggregation —
    no shuffle of corpus shingles, no pairwise anything. The corpus-side
    groupBy keys on doc_id (high cardinality, skew-free)."""
    sh = dedup.shingles(documents, n)
    is_bench = F.col("doc_id") % DECON_MOD == 0
    bench = F.broadcast(sh.where(is_bench).select("sh").distinct())
    corpus_sh = sh.where(~is_bench)
    sizes = corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corpus_sh.join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            n_hits.alias("n_contaminated_ngrams"),
            (n_hits.cast("double") / F.col("n_shingles")).alias("contamination_ratio"),
            (n_hits > 0).alias("contaminated"),
        )
    )


def _decontaminate_sql() -> str:
    from .dedup import _shingle_sql

    return f"""
  WITH {_shingle_sql(DECON_N)},
  bench AS (SELECT DISTINCT sh FROM s WHERE doc_id % {DECON_MOD} = 0),
  corpus AS (SELECT * FROM s WHERE doc_id % {DECON_MOD} <> 0),
  sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id),
  hits AS (SELECT c.doc_id, COUNT(*) AS n_hits
           FROM corpus c JOIN bench b ON c.sh = b.sh GROUP BY c.doc_id)
  SELECT sizes.doc_id, sizes.n_shingles,
         COALESCE(hits.n_hits, 0) AS n_contaminated_ngrams,
         CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / sizes.n_shingles
           AS contamination_ratio,
         COALESCE(hits.n_hits, 0) > 0 AS contaminated
  FROM sizes LEFT JOIN hits ON sizes.doc_id = hits.doc_id"""


DECONTAMINATE_SQL = _decontaminate_sql()


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
