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


def ingest_pipeline(documents: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """The complete streaming bronze path: effectively-once content dedup →
    PII redaction AT THE BOUNDARY (raw text must never reach a persisted
    table — the scrub runs before any sink sees the row) → quality +
    language annotation. Output is the bronze row a downstream batch
    pipeline consumes: doc_id, content_hash, PII counts/flag, and the
    annotations — computed over the SCRUBBED text, since that is the text
    the corpus will actually contain.

    Shuffle story: the only stateful stage is the dedup's bounded state
    store; scrub and annotation are stateless projections fused into the
    same micro-batch stage — the stream twin of the batch
    `pii_scrub` ∘ `corpus_annotations` composition."""
    from ..operators import textstats
    from ..operators.textstats import PII_PATTERNS

    deduped = streaming_dedup_ingest(documents, watermark)
    counts = {
        name: F.expr(f"size(regexp_extract_all(text, '{pat}', 0))")
        for name, (pat, _) in PII_PATTERNS.items()
    }
    scrubbed_text = F.col("text")
    for pat, repl in PII_PATTERNS.values():
        scrubbed_text = F.regexp_replace(scrubbed_text, pat, repl)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    scrubbed = deduped.select(
        "doc_id",
        "lang",
        "source",
        "ingest_ts",
        "content_hash",
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        (total > 0).alias("has_pii"),
        scrubbed_text.alias("text"),
    )
    return textstats.corpus_annotations(
        scrubbed,
        carry=("content_hash", "has_pii", "n_email", "n_ipv4", "n_phone", "ingest_ts"),
    )


def score_ingest(
    documents: DataFrame, reference_docs: DataFrame, k: int | None = None
) -> DataFrame:
    """Perplexity-score a document STREAM against a unigram LM trained on a
    STATIC reference corpus — the stream side of the CCNet-style quality
    gate. The model folds into the plan as a ≤k-entry map literal
    (textstats.perplexity_scorer), so scoring is a stateless row-local
    projection: no stream-static join state, no watermark, and scores are
    bit-identical to the batch operator on the same model corpus
    (pinned in tests/test_streaming.py)."""
    from ..operators import textstats

    kw = {} if k is None else {"k": k}
    return textstats.perplexity_scorer(reference_docs, **kw)(documents)


def classify_ingest(documents: DataFrame) -> DataFrame:
    """Quality-classifier scoring on a document STREAM — the hashed linear
    classifier (operators/corpus.py hash_classifier) is a stateless
    row-local projection (weighted bigram sum via an aggregate HOF, model
    folded into the expression), so the batch operator applies to a
    readStream unchanged: no state, no watermark, bit-identical scores
    (pinned in tests/test_streaming.py)."""
    from ..operators import corpus

    return corpus.hash_classifier(documents)


def sketch_ingest(events: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """HyperLogLog distinct-count state maintained ON A STREAM: the batch
    sketch builder (operators/sketches.py hll_state) applies to a
    readStream unchanged — the register table IS a streaming aggregation
    (groupBy-max rho), and because max is the sketch's merge operation,
    Spark's incremental state update IS sketch union. State is bounded by
    #groups × 2^p registers regardless of stream volume — the property
    that makes distinct-count dashboards feasible over unbounded streams.
    Stream-final registers are bit-identical to the batch sketch over the
    same rows (pinned in tests/test_streaming.py); estimates read off via
    sketches.hll_estimate on the materialized state."""
    from ..operators import sketches

    return sketches.hll_state(events, group_col, key_col)


def lsh_index_ingest(embeddings: DataFrame, n_tables: int | None = None) -> DataFrame:
    """LSH index maintenance ON A STREAM — new vectors arrive, their
    (vec_id, c_nrm, tbl, bucket, dims) index rows leave. The corpus
    fan-out (operators/similarity.py _lsh_corpus_relation) is a stateless
    row-local projection + explode — no shuffle, no state, no watermark —
    so the batch index builder applies to a readStream unchanged, and
    appending each micro-batch to the persisted bucketed index
    (similarity.persist_lsh_index's layout) keeps the build-once index
    FRESH without rebuilds. Rows are bit-identical to the batch builder
    on the same vectors (pinned in tests/test_streaming.py)."""
    from ..operators import similarity

    nt = similarity.LSH_N_TABLES if n_tables is None else n_tables
    return similarity._lsh_corpus_relation(embeddings, nt)
