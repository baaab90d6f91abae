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
    """Survivors of quality + near-dup filtering, annotated for training."""
    quality = textstats.quality_score(documents).where(
        F.col("quality_score") >= quality_threshold
    )
    drop_list = (
        dedup.minhash_lsh_dedup(documents).select(F.col("d2").alias("doc_id")).distinct()
    )
    lang = textstats.language_id_ngram(documents).select("doc_id", "lang_pred")
    return (
        quality.join(F.broadcast(drop_list), "doc_id", "left_anti")
        .join(lang, "doc_id")
        .select("doc_id", "n_tokens", "quality_score", "lang_pred")
    )


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
