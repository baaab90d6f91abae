"""Pin: the LSH bucket pipelines COMPILE under whole-stage codegen.

The 36-plane multi-table bucket projection used to exceed janino's 64 KB
method limit and silently fall back to interpreted evaluation (~5-10×
slower — PERF.md "Multi-table bucket stage"). The named-dims layout
(functions/vectors.py) fixed that. `spark.sql.codegen.fallback=false`
turns any whole-stage compile failure into a hard error, so running the
operators under it IS the assertion: a future edit that regrows an
expression past the method limit fails here instead of shipping an
interpreted hot path.

(Reference parity: ppedro-vasco/azeroth-data-platform has no vector ops;
this pins the engine's own scale-path machinery.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azeroth_data_platform_spark.operators import dedup, similarity


@pytest.fixture()
def no_codegen_fallback(spark):
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", prev)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_multitable_lsh_compiles(no_codegen_fallback, emb):
    queries = emb.where(F.col("vec_id") < similarity.N_QUERIES)
    rows = similarity.lsh_multitable_topk(emb, queries).collect()
    assert len(rows) > 0


def test_single_table_lsh_compiles(no_codegen_fallback, emb):
    queries = emb.where(F.col("vec_id") < similarity.N_QUERIES)
    rows = similarity.lsh_bucketed_topk(emb, queries).collect()
    assert len(rows) > 0


def test_embed_lsh_banded_compiles(no_codegen_fallback, emb):
    rows = dedup.embedding_neardup_lsh_banded(emb).collect()
    assert len(rows) > 0


def test_embed_lsh_compiles(no_codegen_fallback, emb):
    rows = dedup.embedding_neardup_lsh(emb).collect()
    assert len(rows) > 0


def test_semantic_dedup_compiles(no_codegen_fallback, emb):
    rows = dedup.semantic_dedup(emb).collect()
    assert len(rows) > 0


def test_embedding_neardup_compiles(no_codegen_fallback, emb):
    """r12: the quadratic baseline's blocked equi-join + named-dims +
    precomputed-norm layout must whole-stage-compile — under the old BNL
    join this was the one deliberately-interpreted stage; the rewrite
    exists precisely to put the per-pair cosine into generated code."""
    rows = dedup.embedding_neardup(emb).collect()
    assert len(rows) > 0


def test_char_entropy_compiles(no_codegen_fallback, spark, sf_dir):
    """The 26-letter replace-count + plog2 polynomial tree is large but
    must stay inside whole-stage codegen (it is a pure string/arith
    projection — no HOFs)."""
    from azeroth_data_platform_spark.operators import textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = textstats.char_entropy(docs).collect()
    assert len(rows) > 0


def test_session2_wide_projections_compile(no_codegen_fallback, spark, sf_dir):
    """The session-2 hash-heavy projections (HLL 12-nibble parse + register
    arithmetic, CMS 4-way bucket fan-out, histogram bucketing, knn-graph
    bucket pipeline) compile under whole-stage codegen — a regrowth past
    janino's method limit fails here instead of shipping interpreted."""
    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.operators import profiling, similarity, sketches

    silver = harness._silver(spark, sf_dir)
    assert sketches.hll_distinct(silver, "time_left", "item_id").collect()
    docs = harness._docs(spark, sf_dir)
    assert sketches.cms_top_terms(docs, k=5).collect()
    ev = harness._events_ts(spark, sf_dir)
    assert profiling.histogram_quantiles(ev).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert similarity.knn_graph(emb).collect()
