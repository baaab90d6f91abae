"""Streaming document ingestion for the training-data pipeline.

The batch dedup family (operators/dedup.py) has a streaming counterpart
problem: an at-least-once upstream (REST pollers, queue consumers, retried
uploads) re-delivers the same document bytes, and the bronze layer must not
double-count them. `streaming_dedup_ingest` is the Structured-Streaming
twin of `dedup.exact_dedup`'s grouping key: drop re-deliveries of the same
content hash within the watermark horizon.

Scale design: `dropDuplicatesWithinWatermark` keeps ONE state row per
distinct key seen inside the horizon and evicts keys older than the
watermark — state is bounded by (ingest rate × horizon), not by corpus
size, and the state store shuffles on the hash key (uniform, skew-free).
That bounded-state trade is exactly why the horizon parameter exists: a
duplicate arriving later than the horizon is no longer detected here and
falls through to the batch `exact_dedup` sweep — streaming dedup narrows
the window, the batch layer stays the source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_ingest(
    documents: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """First-delivery-wins stream of documents keyed by content hash.

    `documents` must be a streaming DataFrame carrying an `ingest_ts`
    event-time column (the delivery time, not a document attribute) plus
    the documents-table columns. Output schema = input + `content_hash`.
    """
    return (
        documents.withColumn("content_hash", F.md5("text"))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def annotate_ingest(documents: DataFrame) -> DataFrame:
    """Quality + language annotation applied to a document STREAM — the
    same fused projection `clean_corpus` runs in batch
    (textstats.corpus_annotations), demonstrating that the scan-bound
    ts_* operators are stateless and batch/stream-unified: identical
    expressions, identical results, no watermark needed."""
    from ..operators import textstats

    return textstats.corpus_annotations(documents)
