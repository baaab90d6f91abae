"""Benchmark runner (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints:
  {"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its FULL physical plan via the noop data source (no sink
cost, no driver collect — the honest way to time a distributed plan).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.session import get_spark

    spark = get_spark("bench")

    # FROZEN headline set (established round 1): the benchmark metric must
    # stay comparable across rounds, so new queries added in later rounds do
    # NOT join this list — extend via a separate metric if needed. Excludes
    # trivially-small serving reads; keeps every operator that moves data.
    headline = [
        "a1_daily_market_summary",
        "a2_hourly_ohlc",
        "a3_rolling_zscore",
        "a3e_rolling_zscore_dense",
        "a4_sales_velocity",
        "a5_market_concentration",
        "a6_market_index",
        "a7_sector_trends",
        "a8_distinct_items",
        "j2_dim_enrichment",
        "o1_latest_daily_summaries",
        "p11_format_gold",
        "pj_json_kpis",
        "w_sessionize",
        "x_pivot_event_counts",
        "x_sector_rollup",
        "x_multiway_star_join",
        "x_topk_orders",
        "x_price_iqr_outliers",
        "dd_exact",
        "dd_ngram_jaccard",
        "dd_minhash_lsh",
        "dd_simhash",
        "dd_simhash_banded",
        "dd_embed_neardup",
        "ann_topk_bruteforce",
        "ann_topk_lsh",
        "ann_topk_ivf",
        "ts_token_stats",
        "ts_quality_score",
        "ts_language_id",
        "ts_language_id_ngram",
        "ts_fingerprint",
        "tp_clean_corpus",
        "tp_train_sample",
    ]
    # Round 2+: consolidated driver names live in QUERIES; frozen legacy
    # names resolve from ALL_QUERIES (same impls as round 1). Note the
    # round-2 surface changes inside frozen names: the five per-item gold
    # queries now include the ORM's item_name/icon_url broadcast denorm,
    # and ts_token_stats / ts_language_id absorbed their sibling columns.
    headline = [q for q in headline if q in harness.ALL_QUERIES]

    # Deliberately-quadratic exactness baselines (documented verify-stage
    # ops, not scale paths) — reported as their own metric line so they
    # don't obscure the scale-path headline. The frozen total still
    # includes them for cross-round comparability.
    quadratic = {"dd_ngram_jaccard", "dd_simhash", "dd_embed_neardup"}

    # New-in-round-2 scale-path queries: timed and reported separately,
    # NOT part of the frozen total.
    extra = [
        q
        for q in (
            "dd_embed_lsh",
            "dd_embed_lsh_banded",
            "ts_vocab_topk",
            "ts_tfidf_top_terms",
            "tp_decontaminate",
            "ts_repetition",
            "tp_pack_sequences",
            "tp_corpus_report",
            "ann_topk_lsh_multi",
            "ts_oov_ratio",
            "tp_chunk_documents",
            "tp_keep_best",
            "dd_semantic",
            "ts_pii_scrub",
            "tp_quality_prune",
            "dd_incremental",
            "ann_quantize_sq8",
            "ann_topk_sq8",
            "tp_pack_contents",
            "tp_decontaminate_bloom",
            "ann_pq_codes",
            "ann_topk_pq",
            "ann_topk_ivf_pq",
            "dd_exact_substring",
            "dd_remove_spans",
            "tp_mix_rebalance",
            "tp_mix_apply",
            "ts_pii_scrub_synth",
            "ts_perplexity",
            "ts_gopher_quality",
            "tp_dsir_weights",
            "mm_phash_dedup",
            "tp_bpe_merges",
            "tp_bpe_encode",
            "ts_hash_classifier",
            "ts_char_entropy",
            "tp_cluster_sample",
            "tp_line_dedup",
            "ts_gopher_repetition",
            "x_group_percentiles",
            "tp_ccnet_buckets",
            "mm_audio_segments",
            "tp_ccnet_sample",
            "x_incremental_gold",
            "w_funnel",
            "x_retention_cohorts",
            "x_hll_distinct",
            "x_cms_top_terms",
            "ts_perplexity_bigram",
            "x_table_stats",
            "x_histogram_quantiles",
            "ann_range_search",
            "tp_mix_temperature",
            "x_grouping_sets",
            "x_robust_outliers",
            "x_pagerank",
            "w_funnel_latency",
            "x_triangles",
            "x_scd2_history",
            "dd_containment",
            "tp_quality_calibrate",
            "x_hll_weekly_rollup",
            "x_scd2_asof",
            "x_monthly_rollup",
            "dd_cdc_segments",
            "tp_bpe_compression",
            "ann_knn_graph",
            "tp_leakage_safe_split",
            "x_dq_checks",
            "x_embed_centroids",
            "w_funnel_sessions",
            "x_asof_tolerance",
            "dd_doc_novelty",
            "tp_export_manifest",
            "mm_cdc_dedup",
            # round-6 additions (extras are not part of the frozen headline)
            "ts_pmi_collocations",
            "tp_global_shuffle",
            "ann_filtered_topk",
            "mm_resize",
            "a13_cusum_changepoint",
            "w_user_paths",
            "tp_seqlen_histogram",
            "ts_zipf_fit",
            "x_abtest_welch",
            "dd_jaccard_histogram",
            "a14_forecast_backtest",
            "x_skew_report",
            "x_benford_check",
            "dd_cluster_sizes",
            "ts_langid_confusion",
        )
        if q in harness.ALL_QUERIES
    ]

    # Warm the JVM + parquet footers once so timings measure the plans.
    harness.ALL_QUERIES["a8_distinct_items"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        harness.ALL_QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # Host-noise canary (FROZEN, round 3+): a constant parquet scan +
    # aggregate whose work never changes across rounds. Round-2 late-round
    # re-runs drifted ~1.25× uniformly with the host, which made r2/r1
    # per-query ratios ambiguous; the canary gives every round a same-host
    # denominator. Median of 3 runs; ratio lines below let the judge
    # separate engine regressions from host drift.
    def run_canary() -> float:
        from pyspark.sql import functions as F

        # 4 runs, first discarded (its own plan compiles on run 1 — measured
        # ~2.5× inflation pre-sweep), median of the remaining 3
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            (
                spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
                .select(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"),
                    F.sum("l_quantity").alias("q"),
                    F.count(F.lit(1)).alias("n"),
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            if i:
                times.append(time.perf_counter() - t0)
        return round(sorted(times)[1], 3)

    canary_sec = run_canary()
    timings = {name: run(name) for name in headline}
    extra_timings = {name: run(name) for name in extra}
    canary_sec_post = run_canary()

    # --- scale-growth probe (round 4+): run a scale-path subset at 10× the
    # bench SF (tools/gen_scale.py layout — same schema/join graph, keys
    # offset per copy) and report per-query growth vs the same-session
    # sf-dir timing. Linear operators should land ≈10×; anything beyond
    # ~15× is either explained in scaling["notes"] or a bug. Opt out with
    # SPARK_GRAFT_NO_SCALING=1 (the probe adds ~2-4 min).
    scaling = None
    if not os.environ.get("SPARK_GRAFT_NO_SCALING"):
        repo = os.path.dirname(os.path.abspath(__file__))
        scale_dir = os.environ.get(
            "SPARK_GRAFT_SCALE_DIR", os.path.join(repo, ".scaledata", "sf1")
        )
        if not os.path.exists(os.path.join(scale_dir, "lineitem.parquet")):
            import subprocess

            subprocess.run(
                [sys.executable, os.path.join(repo, "tools", "gen_scale.py"),
                 sf_dir, scale_dir, "10"],
                check=True, capture_output=True,
            )
        subset = [
            "a1_daily_market_summary",
            "w_sessionize",
            "dd_exact",
            "dd_minhash_lsh",
            "dd_simhash_banded",
            "dd_exact_substring",
            "ann_topk_lsh_multi",
            "dd_embed_lsh_banded",
            "ts_language_id_ngram",
            "tp_clean_corpus",
            "tp_pack_contents",
            "tp_bpe_encode",
            "tp_line_dedup",
            "x_incremental_gold",
            "x_hll_distinct",
            "ts_perplexity_bigram",
            "dd_cdc_segments",
            "x_pagerank",
            "tp_global_shuffle",
            "ts_pmi_collocations",
        ]
        base = {**timings, **extra_timings}

        # Budget guard: the probe must never endanger the driver's bench
        # timeout — stop launching scaled queries after this many seconds
        # and report what completed (truncated=True marks a partial probe).
        budget = float(os.environ.get("SPARK_GRAFT_SCALING_BUDGET_SEC", "300"))
        probe_t0 = time.perf_counter()

        def run_scaled(name: str) -> float:
            t0 = time.perf_counter()
            harness.ALL_QUERIES[name](spark, scale_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.perf_counter() - t0, 3)

        scaled = {}
        truncated = False
        for q in subset:
            if q not in harness.ALL_QUERIES:
                continue
            if time.perf_counter() - probe_t0 > budget:
                truncated = True
                break
            scaled[q] = run_scaled(q)
        scaling = {
            "factor": 10,
            "truncated": truncated,
            "scaled_sec": scaled,
            "growth": {
                q: round(scaled[q] / base[q], 2) for q in scaled if base.get(q)
            },
            "notes": {
                "dd_embed_lsh_banded": (
                    "expected superlinear at FIXED 64-bucket geometry: pairwise "
                    "verify within buckets is O(n^2/buckets); production scaling "
                    "raises planes (bucket count tracks n) to keep per-bucket "
                    "occupancy (and thus candidates/vector) constant"
                ),
            },
        }

        # --- dup-density probe (VERDICT r5 #5): MinHash-LSH on a
        # duplicate-HEAVY corpus — the regime LSH exists for, which the
        # (deliberately near-dup-free) uniform probe above cannot measure.
        # Clusters of size f at fixed cluster count ⇒ candidate pairs grow
        # ~C(f,2)·bands; pin that (a) candidate growth tracks that model,
        # not n², and (b) the verify join keeps its equi-join shape with NO
        # forced broadcast (dedup._verify_jaccard dropped its hint).
        from azeroth_data_platform_spark.operators import dedup as _dd
        from pyspark.sql import functions as F
        import subprocess as _sp

        dup = {}
        for f in (2, 4):
            ddir = os.path.join(repo, ".scaledata", f"dup{f}")
            if not os.path.exists(os.path.join(ddir, "documents.parquet")):
                _sp.run(
                    [sys.executable, os.path.join(repo, "tools", "gen_scale.py"),
                     "--dup-heavy", sf_dir, ddir, str(f)],
                    check=True, capture_output=True,
                )
            docs = spark.read.parquet(os.path.join(ddir, "documents.parquet"))
            sh = _dd.shingles(docs)
            bands = _dd._minhash_bands(sh)
            cand = (
                bands.alias("a")
                .join(bands.alias("b"), ["band", "band_key"])
                .where(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
                .distinct()
            )
            t0 = time.perf_counter()
            pairs = _dd.minhash_lsh_dedup(docs)
            plan = pairs._jdf.queryExecution().executedPlan().toString()
            n_pairs = pairs.count()
            sec = round(time.perf_counter() - t0, 3)
            dup[f"f{f}"] = {
                "docs": docs.count(),
                "cand_pairs": cand.count(),
                "dup_pairs": n_pairs,
                "sec": sec,
                "equi_join_only": (
                    "CartesianProduct" not in plan
                    and "BroadcastNestedLoopJoin" not in plan
                ),
            }
        scaling["dup_probe"] = {
            **dup,
            "cand_growth": round(dup["f4"]["cand_pairs"] / max(dup["f2"]["cand_pairs"], 1), 2),
            "model": "clusters of size f at fixed cluster count -> C(f,2) pairs: f2->f4 predicts ~6x cand, ~2x docs",
        }

    quad_total = round(sum(t for n, t in timings.items() if n in quadratic), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "quadratic_baselines_sec": quad_total,
        "scale_path_sec": round(sum(timings.values()) - quad_total, 3),
        "canary_sec": canary_sec,
        "canary_sec_post": canary_sec_post,
        # PRIMARY cross-round comparison number (round 4+): host drift moved
        # raw seconds ~1.25× between identical runs in earlier rounds; the
        # canary-normalized ratio is the host-honest series (r3 = 174.8).
        "headline_over_canary": round(sum(timings.values()) / canary_sec, 2),
    }
    # Two lines: a FULL detail record first (extra queries + scaling probe —
    # can exceed 2 kB), then the COMPACT required-schema record LAST so a
    # tail-capturing consumer always gets a complete, parseable JSON line
    # (BENCH_r05's `parsed: null` was the detail line overflowing the
    # driver's ~2000-char tail window).
    detail = dict(out)
    detail["extra_queries"] = extra_timings
    if scaling is not None:
        detail["scaling"] = scaling
    print(json.dumps(detail))
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
