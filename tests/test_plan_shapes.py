"""Physical-plan regression tests: the optimizations we rely on at scale
must actually appear in the executed plan (SURVEY.md §4 — predicate
pushdown, broadcast joins, whole-stage codegen). A correct-but-shuffling
plan is a silent 100×-at-scale regression; these tests pin the plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azeroth_data_platform_spark import harness
from azeroth_data_platform_spark.operators import adapters, gold


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_a7_dim_join_is_broadcast(spark, sf_dir):
    df = harness.QUERIES["a7_sector_trends"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # let AQE finalize
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact side must never shuffle for this join


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    silver = adapters.silver_auctions(spark, sf_dir)
    df = silver.where(F.col("item_id") == 42).select("item_id", "unit_price")
    plan = _plan(df)
    # Catalyst pushes the equality through the projection into the scan
    assert "PushedFilters: [" in plan and "l_partkey" in plan
    assert "IsNotNull(l_partkey)" in plan or "EqualTo(l_partkey,42)" in plan


def test_column_pruning_reads_only_needed_columns(spark, sf_dir):
    silver = adapters.silver_auctions(spark, sf_dir)
    df = silver.groupBy("item_id").agg(F.sum("quantity").alias("q"))
    plan = _plan(df)
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_partkey" in scan_line and "l_quantity" in scan_line
    assert "l_extendedprice" not in scan_line  # unused column must not be scanned


def test_gold_aggs_have_map_side_partial_aggregation(spark, sf_dir):
    df = gold.daily_market_summary(adapters.silver_auctions(spark, sf_dir))
    plan = _plan(df)
    # partial_ aggregate before the exchange = map-side combine
    assert "partial_" in plan


def test_serving_topn_uses_take_ordered(spark, sf_dir):
    df = harness.QUERIES["o1_latest_daily_summaries"](spark, sf_dir)
    plan = _plan(df)
    # order+limit must collapse to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_partition_pruning_on_date_partitioned_silver(spark, sf_dir, tmp_path_factory):
    # write silver date-partitioned (the production layout), read one day:
    # the scan must prune to that partition, not list-and-filter
    path = str(tmp_path_factory.mktemp("part") / "silver")
    silver = adapters.silver_auctions(spark, sf_dir).limit(5000)
    silver.write.partitionBy("snapshot_date").parquet(path)
    one_day = spark.read.parquet(path).where(F.col("snapshot_date") == "1995-01-02")
    plan = _plan(one_day)
    assert "PartitionFilters: [isnotnull(snapshot_date" in plan
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "snapshot_date" in scan_line


def test_ann_brute_force_broadcasts_queries(spark, sf_dir):
    df = harness.QUERIES["ann_topk_bruteforce"](spark, sf_dir)
    plan = _plan(df)
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan  # corpus must stream, not cross-shuffle


def test_embed_neardup_blocked_equi_join_keeps_cosine_out_of_condition(spark, sf_dir):
    """r12: the all-pairs generator is a blocked HASH join (pmod block key
    + exploded probe side), not a BroadcastNestedLoopJoin — the BNL
    operator's per-pair row copy and interpreted projection were the
    query's wall (measured 5.7 s → 1.1 s at sf0.1, bit-identical rows).
    The cosine threshold must still evaluate in a Filter above the
    projection — NOT inside the join condition, which would recompute the
    unrolled dot product (the rand-term barrier)."""
    df = harness.ALL_QUERIES["dd_embed_neardup"](spark, sf_dir)
    plan = _plan(df)
    assert "rand(" in plan  # the barrier survived optimization
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert join_lines, plan
    for l in join_lines:
        # no dim arithmetic in the join condition: dims are named _aN/_bN
        # attributes post-projection, so a leaked dot product would show
        # as a chain of multiplies; the condition must stay key-only
        assert "element_at" not in l and "SQRT" not in l, l


def test_range_search_single_join_keeps_cosine_out_of_condition(spark, sf_dir):
    """r12: ann_range_search is ONE equi-join on the composite
    (tbl, bucket) key (the E2LSH one-scan fan-out) — not a per-table
    scan→join→union chain — and the cosine threshold evaluates in a
    Filter above the projection, not inside the join condition (the
    before-plan showed the 64-term dot product pushed into all three
    join conditions, evaluated on the interpreted path per candidate).
    The rand-term barrier blocks that pushdown; output is bit-identical
    (rand·0 = 0)."""
    df = harness.ALL_QUERIES["ann_range_search"](spark, sf_dir)
    plan = _plan(df)
    assert "rand(" in plan  # the barrier survived optimization
    join_lines = [l for l in plan.splitlines() if "Join" in l and "type" not in l]
    assert len(join_lines) == 1, join_lines  # one candidate join, no union chain
    cond_lines = [l for l in plan.splitlines() if "Join condition" in l]
    for l in cond_lines:
        assert "_qd1" not in l and "SQRT" not in l, l  # cosine stayed out


def test_langid_trigram_scores_stay_in_codegen(spark, sf_dir):
    """Trigram scores are replace-count string expressions — the plan must
    contain NO per-row trigram-array materialization (the interpreted-HOF
    form this replaced: transform(sequence(...)) + filter lambdas) and the
    scoring projection must sit inside a whole-stage-codegen span."""
    for name in ("ts_language_id", "ts_language_id_ngram"):
        df = harness.ALL_QUERIES[name](spark, sf_dir)
        plan = _plan(df)
        assert plan.count("transform(sequence") == 0, name
        assert "replace(text" in plan, name
        assert "*(" in plan, name  # the scoring projection is codegen'd


def test_ann_final_rank_is_two_phase(spark, sf_dir):
    """Top-k ranking must not funnel the full candidate set into #queries
    partitions: the first rank exchange is keyed (q_vec_id, _salt); only the
    <= k*salts survivors hit the exchange keyed on q_vec_id alone."""
    for name in ("ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf"):
        plan = _plan(harness.QUERIES[name](spark, sf_dir))
        lines = plan.splitlines()
        salted = [i for i, l in enumerate(lines)
                  if "Exchange hashpartitioning" in l and "q_vec_id" in l and "_salt" in l]
        unsalted = [i for i, l in enumerate(lines)
                    if "Exchange hashpartitioning" in l and "q_vec_id" in l and "_salt" not in l]
        assert salted, f"{name}: salted partial-rank exchange missing"
        assert len(unsalted) == 1, f"{name}: expected exactly one final q_vec_id exchange"
        # executed plans print sinks first: the final (unsalted) exchange
        # must appear above the salted one it consumes
        assert unsalted[0] < salted[0], f"{name}: phase order wrong"


def test_market_index_first_stage_shuffles_on_composite_key(spark, sf_dir):
    """A6's first exchange must be keyed (snapshot_date, item_id) — a
    date-only key caps parallelism at #dates and puts a whole day of the
    fact table in one task at scale."""
    plan = _plan(harness.QUERIES["a6_market_index"](spark, sf_dir))
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex, plan
    # the bottom-most exchange is the fact-table stage (plans print sinks
    # first); it must carry both keys
    first_stage = ex[-1]
    assert "snapshot_date" in first_stage and "item_id" in first_stage, first_stage
    # and no exchange anywhere partitions the fact table by date alone
    for l in ex:
        if "snapshot_date" in l and "item_id" not in l:
            # allowed only for the tiny per-day rollup ABOVE the per-item
            # aggregate (printed earlier = closer to the sink)
            assert ex.index(l) < ex.index(first_stage), l


def test_range_join_is_bucketed_equi_join(spark, sf_dir):
    """The interval join must plan as a hash equi-join on the time bucket —
    never a per-key nested loop / cartesian expansion."""
    plan = _plan(harness.QUERIES["x_range_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gold_denorm_joins_are_broadcast(spark, sf_dir):
    """Every per-item gold output denormalizes the dim via broadcast —
    the fact side must never shuffle for the enrichment join."""
    for name in (
        "a1_daily_market_summary",
        "a3_rolling_zscore",
        "a4_sales_velocity",
        "a5_market_concentration",
        "a2_hourly_ohlc",
    ):
        plan = _plan(harness.QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_decontaminate_is_single_pass_broadcast(spark, sf_dir):
    """The benchmark shingle set must broadcast (it's the tiny side at any
    scale) and the corpus side must be aggregated in ONE pass — no
    SortMergeJoin anywhere, and exactly one corpus shingle-distinct
    exchange (a second one would mean the sizes/hits two-scan shape)."""
    from azeroth_data_platform_spark.operators import corpus

    docs = adapters.read_table(spark, sf_dir, "documents")
    plan = _plan(corpus.decontaminate(docs))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    distinct_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l and "sh#" in l
    ]
    # one for the corpus per-doc distinct + one inside the bench-side
    # distinct (pre-broadcast); a third means the corpus relation is
    # being computed twice
    assert len(distinct_exchanges) <= 2, distinct_exchanges


def test_pack_sequences_never_globally_orders(spark):
    """Sequence packing must key its one exchange on the shard column —
    a SinglePartition exchange here would mean a global running total
    (the classic packing-scales-to-one-task mistake)."""
    from azeroth_data_platform_spark.operators import corpus

    sampled = spark.createDataFrame(
        [(1, "hi", 10, "en", 0), (2, "hi", 20, "en", 1)],
        "doc_id long, band string, n_tokens long, lang_pred string, shard long",
    )
    plan = _plan(corpus.pack_sequences(sampled))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


def test_pack_contents_never_globally_orders(spark, sf_dir):
    """Materialized packing inherits pack_sequences' scale contract: the
    running total and the segment assembly both key on shard /
    (shard, pack_id) — no SinglePartition exchange, no cartesian join
    (the text join is a doc_id equi-join)."""
    from azeroth_data_platform_spark.operators import corpus

    docs = adapters.read_table(spark, sf_dir, "documents")
    sampled = corpus.stratified_sample(corpus.clean_corpus(docs))
    plan = _plan(corpus.pack_contents(sampled, docs))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(shard" in plan


def test_bloom_decontaminate_broadcasts_fixed_bitmap(spark, sf_dir):
    """The Bloom screen must join corpus shingles against the BROADCAST
    word bitmap (constant-size side) — a SortMergeJoin or cartesian here
    would mean the filter build lost its fixed-size contract."""
    from azeroth_data_platform_spark.operators import corpus

    docs = adapters.read_table(spark, sf_dir, "documents")
    plan = _plan(corpus.decontaminate_bloom(docs))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_minhash_signature_is_single_exchange(spark, sf_dir):
    """The MinHash signature must be ONE doc_id-keyed aggregation with a
    min-column per seed (map-side partial agg), never the exploded
    (doc_id, seed) form: that variant shuffles seeds x the shingle volume
    and adds two more exchanges (per-seed min, per-band rollup)."""
    from azeroth_data_platform_spark.operators import dedup

    df = dedup.minhash_lsh_dedup(harness._docs(spark, sf_dir))
    df.write.format("noop").mode("overwrite").save()
    plan = _plan(df)
    # no exchange may carry a seed/band attribute (the explode-form keys)
    assert "hashpartitioning(doc_id#" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "seed" not in line and "band" not in line, line
    # partial min aggregation of the 16 signature columns happens map-side
    assert "partial_min" in plan or "min(" in plan


def test_new_pipeline_ops_avoid_cross_products(spark, sf_dir):
    """The continuation families must keep their scale shapes: incremental
    dedup's candidate generation is a banded equi-join, semantic dedup's
    pair generation is an equi-join on the cluster id, and the only
    nested-loop joins anywhere are broadcast one-row scalars (SQ8
    codebook, quantile threshold)."""
    plan = _plan(harness.ALL_QUERIES["dd_incremental"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # banded equi-join only
    # dd_semantic: the ONLY nested loop allowed is the broadcast argmin
    # against the k-row centroid relation (IVF's assign); the pair join
    # must be an equi-join on cid
    plan = _plan(harness.ALL_QUERIES["dd_semantic"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    for name in ("ann_quantize_sq8", "tp_quality_prune", "ann_topk_sq8"):
        plan = _plan(harness.ALL_QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        # the scalar/codebook side must ride a broadcast, never a shuffle
        assert "Broadcast" in plan, name


def test_round4_ops_keep_their_scale_shapes(spark, sf_dir):
    """Round-4 operator plan pins: (1) classifier inference and char
    entropy are shuffle-free projections (zero Exchange — the whole
    operator is scan-bound); (2) BPE encoding's document side never
    shuffles (its only exchanges belong to the vocab-sized training
    aggregations, never to a documents scan); (3) line dedup's winner
    check is an equi-join (no nested-loop/cartesian) with map-side
    partial aggregation; (4) cluster sampling never degrades to a
    cartesian product and keeps the two-phase salted rank."""
    from azeroth_data_platform_spark import harness

    cls = _plan(harness.QUERIES["ts_hash_classifier"](spark, sf_dir))
    assert "Exchange" not in cls and "Join" not in cls

    ent = _plan(harness.QUERIES["ts_char_entropy"](spark, sf_dir))
    assert "Exchange" not in ent and "Join" not in ent

    enc = _plan(harness.QUERIES["tp_bpe_encode"](spark, sf_dir))
    assert "CartesianProduct" not in enc
    # every exchange in the encode plan sits above the materialized
    # vocab-sized merge relations (scanned as ExistingRDD), never above
    # the documents parquet scan: the document side is exchange-free
    for frag in enc.split("Exchange")[1:]:
        # fragment up to the next scan line shows what feeds the exchange
        scan = next(
            (
                l
                for l in frag.splitlines()
                if "Scan" in l and ("parquet" in l or "ExistingRDD" in l)
            ),
            "",
        )
        assert "documents" not in scan, "documents scan feeds an exchange"

    ld = _plan(harness.ALL_QUERIES["tp_line_dedup"](spark, sf_dir))
    assert "CartesianProduct" not in ld and "BroadcastNestedLoopJoin" not in ld
    assert "partial_" in ld  # line-hash groupBy keeps map-side combine

    cs = _plan(harness.QUERIES["tp_cluster_sample"](spark, sf_dir))
    assert "CartesianProduct" not in cs


def test_no_cartesian_product_in_any_registered_query(spark, sf_dir):
    """Blanket sweep: NO query in the full local registry may plan a
    CartesianProduct. The only nested-loop joins allowed anywhere are
    broadcast ones (one-row/k-row scalars, codebooks, thresholds — and
    the two documented quadratic exactness baselines, which are
    broadcast-NL, never cartesian). Queries whose CONSTRUCTION runs jobs
    (fixed-iteration training loops with localCheckpoint) are planned
    too — they only cost their small training time at this SF."""
    from azeroth_data_platform_spark import harness

    failures = []
    for name, fn in sorted(harness.ALL_QUERIES.items()):
        try:
            plan = _plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — surface as a sweep failure
            failures.append(f"{name}: plan build failed: {e}")
            continue
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        # row-at-a-time Python UDFs are banned everywhere — the only
        # Python surface is Arrow-batched mapInPandas (multimodal decode)
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-UDF (BatchEvalPython)")
    assert not failures, failures


def test_keyset_pagination_pushes_cursor_to_scan(spark, sf_dir):
    """o11: the keyset cursor predicate reaches the parquet scan (the whole
    point of seek-over-offset pagination) and the page collapses to
    TakeOrderedAndProject — O(limit) work regardless of page depth."""
    df = harness.ALL_QUERIES["o11_keyset_page"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "GreaterThan(p_partkey,100)" in plan
    assert "TakeOrderedAndProject" in plan


def test_search_after_composite_cursor_pushed_and_paged(spark, sf_dir):
    """o12: the COMPOSITE continuation predicate — date < d OR (date = d
    AND key > k) — reaches the parquet scan as one Or tree, the page
    collapses to TakeOrderedAndProject, and consecutive pages partition
    the full sort order exactly (no skip, no repeat)."""
    from azeroth_data_platform_spark.operators import adapters, serving

    df = harness.ALL_QUERIES["o12_search_after"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "Or(LessThan(o_orderdate" in plan
    assert "TakeOrderedAndProject" in plan

    orders = adapters.read_table(spark, sf_dir, "orders")
    p1 = serving.search_after_page(orders, "1995-06-15", 0, 50).collect()
    cursor = p1[-1]
    p2 = serving.search_after_page(
        orders, str(cursor.o_orderdate), int(cursor.o_orderkey), 50
    ).collect()
    both = [(r.o_orderdate, r.o_orderkey) for r in p1 + p2]
    assert len(set(both)) == len(both) == 100
    assert both == sorted(both, key=lambda t: (t[0].toordinal() * -1, t[1]))
    top = (
        serving.search_after_page(orders, "1995-06-15", 0, 100).collect()
    )
    assert [(r.o_orderdate, r.o_orderkey) for r in top] == both


def test_grouping_sets_is_one_scan_expand(spark, sf_dir):
    """x_grouping_sets: the three grouping sets ride ONE scan through an
    Expand (no per-set re-aggregation union)."""
    df = harness.ALL_QUERIES["x_grouping_sets"](spark, sf_dir)
    plan = _plan(df)
    assert "Expand" in plan
    assert plan.count("Scan parquet") <= 2  # fact + broadcast dim only


def test_hll_state_single_exchange(spark, sf_dir):
    """x_hll_distinct's sketch build shuffles ONCE, keyed on (group,
    register) — never on the raw key (the whole point: a 10^9-distinct
    column costs the same shuffle as a 10-distinct one)."""
    from azeroth_data_platform_spark.operators import sketches

    silver = harness._silver(spark, sf_dir)
    plan = _plan(sketches.hll_state(silver, "time_left", "item_id"))
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan  # map-side combine of registers


def test_funnel_is_single_shuffle(spark, sf_dir):
    """w_funnel: per-user arrays + row-local chain scan = ONE exchange
    (the user_id groupBy); counts ride a partial aggregate."""
    df = harness.ALL_QUERIES["w_funnel"](spark, sf_dir)
    plan = _plan(df)
    # one user_id exchange + the final single-row aggregation exchange
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan


def test_prefix_search_pushes_startswith_to_scan(spark, sf_dir):
    """o13: the typeahead prefix compiles to a StringStartsWith pushed into
    the parquet scan and the page is a TakeOrderedAndProject."""
    plan = _plan(harness.ALL_QUERIES["o13_prefix_search"](spark, sf_dir))
    assert "StringStartsWith(p_name,blue)" in plan
    assert "TakeOrderedAndProject" in plan


def test_fuzzy_match_blocked_equi_join_no_cross_product(spark, sf_dir):
    """x_fuzzy_match (operators/er.py): the candidate pair join is a plain
    equi-join on the block key — never CartesianProduct / nested loop —
    and the distinct-entity pre-reduce means the join inputs are
    aggregates, not raw dim rows."""
    df = harness.QUERIES["x_fuzzy_match"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # blocked join keyed on the head-noun block column
    assert "block" in plan


def test_global_shuffle_single_exchange_no_global_sort(spark, sf_dir):
    """tp_global_shuffle: ONE hash exchange on shard + in-partition sort —
    a global Range exchange (total sort) would be a 100 TB bottleneck."""
    df = harness.QUERIES["tp_global_shuffle"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()


def test_pmi_collocations_topk_and_min_count_before_joins(spark, sf_dir):
    """ts_pmi_collocations: final top-k is TakeOrderedAndProject (never a
    global sort), marginal joins are hash joins (no cartesian except the
    sanctioned 1-row scalar anchors), and the min-count filter sits on the
    aggregate BEFORE the marginal joins (prunes the bigram tail first)."""
    df = harness.QUERIES["ts_pmi_collocations"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # the c_ab >= 5 pruning filter lives under the join, on the aggregate
    assert "c_ab" in opt and ">= 5" in opt


def test_filtered_ann_prefilters_before_fanout(spark, sf_dir):
    """ann_filtered_topk: the metadata semi-join restricts the corpus
    BEFORE the LSH bucket fan-out (prefilter strategy) — the plan shows
    the documents-side filter under the bucket join, candidates stay an
    equi-join, and every returned candidate passes the predicate."""
    from azeroth_data_platform_spark.operators import adapters

    df = harness.QUERIES["ann_filtered_topk"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the documents scan participates with its predicate pushed
    assert "lang" in plan and "n_chars" in plan
    allowed = {
        r.doc_id
        for r in adapters.read_table(spark, sf_dir, "documents")
        .where((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .select("doc_id")
        .collect()
    }
    got = df.collect()
    assert got and all(r.c_vec_id in allowed for r in got)


def test_cusum_single_item_shuffle(spark, sf_dir):
    """a13_cusum_changepoint: all window passes ride ONE item_id exchange
    (plus the scalar anchor); the statistic never touches a float."""
    df = harness.QUERIES["a13_cusum_changepoint"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning(item_id") <= 1
    assert "CartesianProduct" not in plan
    row = df.first()
    assert isinstance(row.max_dev, int)


def test_user_paths_topk_no_global_sort(spark, sf_dir):
    """w_user_paths: final top-k is TakeOrderedAndProject; the transition
    build is one user_id window pass."""
    df = harness.QUERIES["w_user_paths"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_mad_outliers_single_item_exchange(spark, sf_dir):
    """a15_mad_outliers: both median passes and the flag filter ride ONE
    item_id exchange after the daily pre-aggregation; the anchor is a
    broadcast, never a cartesian."""
    import re

    df = harness.QUERIES["a15_mad_outliers"](spark, sf_dir)
    plan = _plan(df)
    # item-ONLY exchanges (the window host); the (item, day) groupBy
    # exchange is a separate, expected map-combined aggregation
    item_only = re.findall(r"Exchange hashpartitioning\(item_id#\d+L?, \d+\)", plan)
    assert len(item_only) <= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_classifier_eval_single_score_aggregate(spark, sf_dir):
    """ts_auc_langid / ts_pr_summary_langid: ONE map-combinable groupBy
    to distinct scores (partial_ before the exchange); everything after
    is value-domain-sized."""
    for q in ("ts_auc_langid", "ts_pr_summary_langid"):
        df = harness.QUERIES[q](spark, sf_dir)
        plan = _plan(df)
        assert "partial_" in plan, q
        assert plan.count("Exchange hashpartitioning(score") <= 1, q
        assert "CartesianProduct" not in plan, q


def test_shard_manifest_map_side_combine(spark, sf_dir):
    """tp_shard_manifest: the per-shard aggregate partial-aggregates
    before its single shard exchange; no row-sized window input."""
    df = harness.QUERIES["tp_shard_manifest"](spark, sf_dir)
    plan = _plan(df)
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning(shard") <= 1
    assert "CartesianProduct" not in plan


def test_selfjoin_density_never_joins_rows(spark, sf_dir):
    """x_selfjoin_density computes pair mass from the count table alone:
    partial aggregation before one exchange, top-k via
    TakeOrderedAndProject, and — the point of the operator — NO
    row-level self-join anywhere in the plan."""
    df = harness.QUERIES["x_selfjoin_density"](spark, sf_dir)
    plan = _plan(df)
    assert "partial_" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_recall_report_joins_stay_keyed(spark, sf_dir):
    """ann_recall_report: the truth/approx overlap is a keyed equi-join
    (never a cartesian); both top-k branches broadcast the query side."""
    df = harness.QUERIES["ann_recall_report"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# Partition-less window audit (r11 verdict #2)


def _partitionless_windows(plan: str) -> list[str]:
    """First-argument rule: in `windowspecdefinition(p1, .., o1 ASC, frame)`
    partition columns come first WITHOUT a sort direction, so a spec whose
    FIRST argument is sort-directed (or is directly the frame) has an empty
    partition clause — the WindowExec that warns `No Partition Defined` and
    moves the whole relation into one task."""
    import re

    hits = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        rest = plan[m.end() : m.end() + 200]
        depth, arg = 0, ""
        for ch in rest:
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                break
            arg += ch
        a = arg.strip()
        if a.startswith("specifiedwindowframe") or " ASC" in a or " DESC" in a:
            hits.append(a[:80])
    return hits


# Queries ALLOWED a partition-less window, each with the bounded-input
# justification (the a6 class: the window's input is an aggregate whose
# cardinality is fixed by calendar/config/domain, never by the fact rows).
_PARTITIONLESS_OK = {
    "a6_market_index": "lag over the per-date index (calendar-bounded)",
    "o6_latest_index": "serving read of a6 (calendar-bounded)",
    "w_funnel_wilson": "lag over per-step counts (len(FUNNEL_STEPS) rows)",
    "w_attribution": "share total over per-channel aggregate (channel-bounded)",
    "x_rfm_migration": "cell-share total over the <=36-cell segment matrix",
    "ts_hashclf_drift": "PSI total over per-bucket aggregate (128 buckets)",
    "ts_auc_langid": "rank over distinct quantized scores (score-domain-bounded)",
    "ts_auc_doclen": "rank over distinct doc word counts (length-domain-bounded)",
    "ts_auc_hashclf": "rank over distinct exported scores (score-domain-bounded)",
    "ts_auc_hashclf_bucketed": "rank over 128 bucket scores",
    "ts_pr_summary_langid": "scan over per-threshold curve (score-domain-bounded)",
    "ts_langid_prf": "macro average over per-class rows (language-bounded)",
    "tp_shard_manifest": "totals over per-shard aggregate (shard-count-bounded)",
    "tp_sample_allocation": "largest-remainder rank over per-source quotas",
    "tp_quality_curve": "cumulative over score-decile aggregate (10 rows)",
    "tp_seqlen_histogram": "cumulative over fixed length buckets",
    "ts_zipf_fit": "rank over the top-k vocabulary (k-bounded)",
    "x_zorder_ranked": "documented eval-scale exact ntile; scale path swaps in "
    "approx-quantile boundaries (see operator docstring)",
    "x_compaction_plan": "packing scan over <=256 z-order shards",
}


def test_rfm_has_no_partitionless_window(spark, sf_dir):
    """The r12 de-weak (r11 verdict #2): w_rfm_segments' three NTILE
    windows over the whole customer relation are gone — quintile scores
    now come from broadcast percentile_disc boundaries selected by a
    two-level radix histogram, so the plan carries NO ntile and NO
    partition-less window at all."""
    plan = _plan(harness.QUERIES["w_rfm_segments"](spark, sf_dir))
    assert "ntile(" not in plan
    assert _partitionless_windows(plan) == []


def test_partitionless_windows_only_on_bounded_inputs(spark, sf_dir):
    """Registry-wide audit: every driver query's plan is either free of
    partition-less windows or whitelisted above with its bounded-input
    justification. A new query that funnels an unbounded relation into one
    WindowExec task fails here before it ships."""
    flagged = {}
    for name, fn in harness.QUERIES.items():
        plan = _plan(fn(spark, sf_dir))
        hits = _partitionless_windows(plan)
        if hits:
            flagged[name] = hits
    unexplained = {k: v for k, v in flagged.items() if k not in _PARTITIONLESS_OK}
    assert not unexplained, (
        "partition-less windows without a bounded-input justification: "
        f"{unexplained}"
    )


def test_dedup_shared_relations_materialize_once(spark, sf_dir):
    """r12 #23 pin (r13: same plan shape, now through the pool-managed
    lifecycle.materialize): the shingle relation in minhash_lsh_dedup /
    lsh_recall_report and the fingerprint relation in simhash_dedup /
    simhash_banded_dedup feed 2-7 plan branches each, and Spark does not
    CSE across branches — the branches must consume ONE materialized
    relation (Scan ExistingRDD leaves), not re-run the corpus scan +
    tokenize/fingerprint per branch (zero parquet scans left in the
    final plan). ngram_jaccard_dedup is pinned to the OPPOSITE decision:
    its branches already fold via exchange reuse (A/B flat), so it must
    keep scanning parquet directly — a materialization appearing there
    means an unmeasured regression of the documented trade."""
    from azeroth_data_platform_spark.operators import dedup

    docs = harness._docs(spark, sf_dir)
    for fn in (
        dedup.minhash_lsh_dedup,
        dedup.lsh_recall_report,
        dedup.simhash_dedup,
        dedup.simhash_banded_dedup,
    ):
        plan = _plan(fn(docs))
        assert "Scan ExistingRDD" in plan, fn.__name__
        assert "Scan parquet" not in plan, fn.__name__
    ngram_plan = _plan(dedup.ngram_jaccard_dedup(docs))
    assert "Scan parquet" in ngram_plan
    assert "Scan ExistingRDD" not in ngram_plan
