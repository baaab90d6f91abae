"""The engine's reproducibility claim, tested head-on: result-bearing
aggregates must be bit-identical under different parallelism (partition
counts change float merge order — plain double sums would drift)."""

from __future__ import annotations

import pandas as pd

from azeroth_data_platform_spark import harness

CHECK = [
    "a1_daily_market_summary",
    "a3_rolling_zscore",
    "a6_market_index",
    "dd_minhash_lsh",
    "ts_fingerprint",
    # round-2 additions: packing (window cumsum), decontamination
    # (broadcast-join counting), repetition (HOF ratios)
    "tp_pack_sequences",
    "tp_decontaminate",
    "ts_repetition",
    # continuation additions: representative selection (window over the
    # clustered subset), semantic dedup (within-cluster pair counting),
    # global-quantile pruning (exact percentile), SQ8 quantization
    # (min/max codebook + double reconstruction arithmetic)
    "tp_keep_best",
    "dd_semantic",
    "tp_quality_prune",
    "ann_quantize_sq8",
    # round-3 additions: materialized packing (collect_list reassembly must
    # be order-insensitive via the offset sort), Bloom screening (bit_or
    # commutes), multi-table ANN (distinct over bit-equal cosines)
    "tp_pack_contents",
    "tp_decontaminate_bloom",
    "ann_topk_lsh_multi",
    "dd_exact_substring",
    "dd_remove_spans",
    # round-4 session-2 additions: incremental state merge (decimal
    # monoid), HLL registers (max monoid + exact-integer estimate),
    # bigram-LM NLL (decimal accumulation), PageRank (decimal-summed
    # contributions), CDC segmentation (window lag + hash groupBy), and
    # the funnel's collect_list path (sort_array makes it order-free)
    "x_incremental_gold",
    "x_hll_distinct",
    "ts_perplexity_bigram",
    "x_pagerank",
    "dd_cdc_segments",
    "w_funnel",
]


def _run(spark, name, sf_dir, partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = harness.ALL_QUERIES[name](spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    for c in cols:  # array columns (e.g. SQ8 codes) aren't sortable raw
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def test_results_identical_across_parallelism(spark, sf_dir):
    for name in CHECK:
        a = _run(spark, name, sf_dir, 3)
        b = _run(spark, name, sf_dir, 24)
        pd.testing.assert_frame_equal(a, b, check_exact=True, obj=name)
