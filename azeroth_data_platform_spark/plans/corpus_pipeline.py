"""End-to-end training-corpus pipeline — the LLM-data operators composed
into ONE run, the way a data-curation team would actually ship a corpus:

  PII scrub → exact-substring span removal → corpus-wide line dedup →
  quality + near-dup clean → benchmark decontamination (drop) →
  stratified sample + shard → sequence packing (layout + materialized
  content) → shard layout on disk + deterministic training-order
  manifest (global_shuffle) (+ per-source health report and the
  sequence-length histogram the packing budget was sized from).

Same orchestration contract as plans/pipeline.py (X1-X5): lineage is the
DataFrame plan, run metadata is the returned dict, structured logging per
stage, idempotent re-runs via overwrite semantics of the writers. Every
stage is one of the engine's standalone oracle-checked operators; the
composition adds NO new semantics — which is what makes the end-to-end
output trustworthy without an end-to-end oracle.

Scale notes: the only driver-side values are the metadata counts; each is
one aggregate over an already-needed relation. The scrubbed/span-cleaned
document set is cached once — every downstream family (clean, decon,
report) re-reads it instead of re-running the scrub lineage.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus, dedup, textstats
from ..sources import writers

log = logging.getLogger(__name__)


def _rebuilt_docs(documents: DataFrame, new_text: DataFrame) -> DataFrame:
    """Swap the text column (scrubbed / span-cleaned) while keeping the
    documents schema so every downstream operator runs unchanged."""
    return (
        documents.drop("text", "n_chars")
        .join(new_text, "doc_id")
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            F.length("text").cast("long").alias("n_chars"),
        )
    )


def run_corpus_pipeline(
    spark: SparkSession,
    documents_path: str,
    out_dir: str,
    budget: int = corpus.PACK_BUDGET,
) -> dict[str, Any]:
    """Materialize a training corpus end-to-end; returns run metadata.

    ``meta["stage_sec"]`` records per-stage wall time (the time from the
    previous stage's last action to this stage's last action — Spark's
    laziness means a stage's lineage cost lands on whichever action first
    materializes it, which is exactly what a wall-clock budget cares
    about). bench.py's end-to-end scale probe reads it directly."""
    meta: dict[str, Any] = {}
    stage_sec: dict[str, float] = {}
    meta["stage_sec"] = stage_sec
    _t = time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t
        now = time.perf_counter()
        stage_sec[stage] = round(now - _t, 3)
        _t = now

    docs = spark.read.parquet(documents_path)
    meta["docs_in"] = docs.count()
    _mark("0_read")

    # --- 1. PII scrub: annotation happens on the REDACTED text ---
    scrubbed = textstats.pii_scrub(docs)
    meta["docs_with_pii"] = scrubbed.where("has_pii").count()
    docs = _rebuilt_docs(
        docs, scrubbed.select("doc_id", F.col("scrubbed_text").alias("text"))
    )
    _mark("1_pii_scrub")

    # --- 2. exact-substring dedup: cut repeated spans, keep the docs ---
    cleaned_text = dedup.remove_repeated_spans(docs)
    meta["span_tokens_removed"] = (
        cleaned_text.agg(F.sum("n_tokens_removed")).collect()[0][0] or 0
    )
    docs = _rebuilt_docs(
        docs, cleaned_text.select("doc_id", F.col("clean_text").alias("text"))
    )
    _mark("2_span_dedup")

    # --- 2b. corpus-wide line dedup (the CCNet/C4 paragraph rule): drop
    # every repeated pseudo-line beyond its first occurrence, rebuild the
    # documents from the survivors ---
    deduped = corpus.line_dedup(docs)
    meta["dup_lines_removed"] = (
        deduped.agg(F.sum(F.col("n_lines") - F.col("n_kept"))).collect()[0][0] or 0
    )
    # docs that were ENTIRELY repeated text reduce to '' — drop them here
    # (nothing left to train on; downstream ratio math assumes ≥1 token)
    docs = (
        _rebuilt_docs(
            docs, deduped.select("doc_id", F.col("text_dedup").alias("text"))
        )
        .where(F.length("text") > 0)
        .cache()
    )
    meta["docs_emptied_by_dedup"] = meta["docs_in"] - docs.count()
    _mark("2b_line_dedup")

    # --- 3. quality filter + near-dup removal + annotation ---
    cleaned = corpus.clean_corpus(docs)

    # --- 4. benchmark decontamination: drop flagged docs (the bench
    # slice itself never trains — decontaminate() excludes it) ---
    contaminated = (
        corpus.decontaminate(docs).where("contaminated").select("doc_id")
    )
    is_bench = F.col("doc_id") % corpus.DECON_MOD == 0
    train_pool = cleaned.where(~is_bench).join(
        F.broadcast(contaminated), "doc_id", "left_anti"
    )
    meta["train_pool_docs"] = train_pool.count()
    _mark("3_4_clean_decontaminate")

    # --- 5. stratified sample + shard assignment ---
    sampled = corpus.stratified_sample(train_pool)
    meta["sampled_docs"] = sampled.count()
    meta["sampled_tokens"] = sampled.agg(F.sum("n_tokens")).collect()[0][0] or 0
    _mark("5_sample")

    # --- 6. pack: layout + materialized sequences, laid out per shard ---
    layout = corpus.pack_sequences(sampled, budget=budget)
    writers.write_training_shards(layout, os.path.join(out_dir, "pack_layout"))
    packs = corpus.pack_contents(sampled, docs, budget=budget)
    writers.write_packed_corpus(packs, os.path.join(out_dir, "packs"))
    meta["packs"] = spark.read.parquet(os.path.join(out_dir, "packs")).count()
    meta["packed_tokens"] = (
        spark.read.parquet(os.path.join(out_dir, "packs"))
        .agg(F.sum("n_tokens_in_pack"))
        .collect()[0][0]
        or 0
    )
    _mark("6_pack")

    # --- 6b. training-order manifest: deterministic global shuffle of
    # the sampled docs into (shard, pos) — the order the trainer reads ---
    shuffle = corpus.global_shuffle(
        sampled.select("doc_id").join(docs.select("doc_id", "source"), "doc_id")
    )
    shuffle.write.mode("overwrite").parquet(os.path.join(out_dir, "order"))
    meta["order_rows"] = spark.read.parquet(os.path.join(out_dir, "order")).count()
    _mark("6b_global_shuffle")

    # --- 7. per-source health report for the curation dashboard ---
    corpus.corpus_report(docs).write.mode("overwrite").parquet(
        os.path.join(out_dir, "report")
    )
    meta["report_sources"] = spark.read.parquet(
        os.path.join(out_dir, "report")
    ).count()

    # --- 7b. sequence-length histogram: the packing planner's evidence
    # that `budget` was sized sensibly for this corpus ---
    corpus.seqlen_histogram(docs).write.mode("overwrite").parquet(
        os.path.join(out_dir, "seqlen")
    )
    meta["seqlen_buckets"] = spark.read.parquet(
        os.path.join(out_dir, "seqlen")
    ).count()
    _mark("7_report_seqlen")

    docs.unpersist()
    log.info("corpus pipeline run: %s", meta)
    return meta
