"""Unit tests for dedup / similarity / textstats / multimodal operators on
tiny literal frames — planted duplicates with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from azeroth_data_platform_spark.operators import corpus, dedup, multimodal, similarity, textstats

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different content about spark shuffles and parquet footers here"


def _docs(spark):
    rows = [
        (1, BASE, "en", "web", len(BASE)),
        (2, BASE, "en", "web", len(BASE)),  # exact dup of 1
        (3, NEAR, "en", "web", len(NEAR)),  # near dup of 1/2
        (4, OTHER, "en", "web", len(OTHER)),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup_groups_identical_texts(spark):
    out = {r.content_hash: r for r in dedup.exact_dedup(_docs(spark)).collect()}
    counts = sorted(r.n_docs for r in out.values())
    assert counts == [1, 1, 2]
    dup_group = next(r for r in out.values() if r.n_docs == 2)
    assert dup_group.representative_doc_id == 1


def test_ngram_jaccard_finds_planted_pair(spark):
    pairs = {(r.d1, r.d2): r.jaccard for r in dedup.ngram_jaccard_dedup(_docs(spark)).collect()}
    assert pairs[(1, 2)] == 1.0  # identical
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.8  # near dup
    assert not any(4 in p for p in pairs)  # unrelated doc untouched


def test_minhash_lsh_agrees_with_exact_jaccard(spark):
    docs = _docs(spark)
    exact = {(r.d1, r.d2) for r in dedup.ngram_jaccard_dedup(docs).collect()}
    lsh = {(r.d1, r.d2) for r in dedup.minhash_lsh_dedup(docs).collect()}
    assert lsh <= exact  # LSH never invents pairs (it verifies with exact jaccard)
    assert (1, 2) in lsh  # identical docs always collide in every band


def test_simhash_identical_docs_hamming_zero(spark):
    out = {(r.d1, r.d2): r.hamming for r in dedup.simhash_dedup(_docs(spark)).collect()}
    assert out[(1, 2)] == 0
    assert all(4 not in p for p in out)
    # On tiny docs (~12 shingles) bit sums sit near zero, so even one
    # changed word flips many bits — SimHash is a large-doc sketch. Assert
    # the rank property instead: near-dup is closer than unrelated.
    fps = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(_docs(spark)).collect()}
    ham = lambda a, b: bin(fps[a] ^ fps[b]).count("1")  # noqa: E731
    assert ham(1, 3) < ham(1, 4)


def test_embedding_neardup_and_topk(spark):
    rows = [
        (0, [1.0] * 64, 0),
        (1, [1.0] * 64, 0),  # identical direction → cosine 1
        (2, [1.0] * 32 + [-1.0] * 32, 1),  # orthogonal to 0/1
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    dups = {(r.v1, r.v2): r.cosine for r in dedup.embedding_neardup(embs, 0.9).collect()}
    assert set(dups) == {(0, 1)} and abs(dups[(0, 1)] - 1.0) < 1e-12

    topk = similarity.brute_force_topk(embs, embs.where(F.col("vec_id") == 0), k=2).collect()
    assert [r.c_vec_id for r in sorted(topk, key=lambda r: r.rank)] == [1, 2]


def test_lsh_bucket_deterministic_and_preserves_identicals(spark):
    rows = [(i, [float(i % 3 - 1)] * 64, 0) for i in range(6)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    b1 = similarity.lsh_bucketed_topk(embs, embs.where(F.col("vec_id") < 2), k=3).collect()
    b2 = similarity.lsh_bucketed_topk(embs, embs.where(F.col("vec_id") < 2), k=3).collect()
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))  # deterministic


def test_token_stats_and_quality(spark):
    out = {r.doc_id: r for r in textstats.token_stats(_docs(spark)).collect()}
    assert out[1].n_tokens == len(BASE.split())
    assert out[1].n_chars_measured == len(BASE)
    q = {r.doc_id: r for r in textstats.quality_score(_docs(spark)).collect()}
    assert q[1].stopword_ratio > 0  # 'the' twice, 'and' once
    assert 0.0 <= q[4].quality_score <= 1.0


def test_language_id_markers(spark):
    rows = [
        (1, "the cat and the dog of a house", "en", "w", 30),
        (2, "le chat et la maison et le chien", "fr", "w", 32),
        (3, "der hund und die katze und das haus", "de", "w", 35),
        (4, "xyz qrs tuv", "zh", "w", 11),  # no markers → und
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r for r in textstats.language_id(docs).collect()}
    assert out[1].lang_pred == "en" and out[1].agrees_with_label
    assert out[2].lang_pred == "fr"
    assert out[3].lang_pred == "de"
    assert out[4].lang_pred == "und"


def test_fingerprint_matches_python_reference(spark):
    [r] = textstats.fingerprint(
        _docs(spark).where(F.col("doc_id") == 1)
    ).collect()
    h = 0
    for ch in BASE:
        h = (h * textstats.ROLLING_BASE + ord(ch)) % textstats.ROLLING_MOD
    assert r.fingerprint == h


def test_multimodal_feature_extraction_batches(spark):
    mm = multimodal.attach_binary(_docs(spark))
    feats = {r.doc_id: r for r in multimodal.extract_features(mm).collect()}
    assert feats[1].n_bytes == len(BASE.encode())
    assert feats[1].head_hex == BASE.encode()[:4].hex()
    assert feats[1].byte_checksum == sum(BASE.encode()) % 997
    meta = mm.select("meta.n_bytes").where(F.col("doc_id") == 1).collect()[0][0]
    assert meta == len(BASE.encode())


def test_image_decode_seam_feature_flag():
    """The decoder seam probes for Pillow at call time: NotImplementedError
    when absent (this container), a real decode when present. Both sides
    of the flag are pinned; the real path auto-activates in environments
    that ship an imaging library."""
    import importlib.util

    import pytest

    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG")
    else:  # pragma: no cover — container has no Pillow; runs elsewhere
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 4), (128, 0, 255)).save(buf, format="PNG")
        img = multimodal.decode_image(buf.getvalue())
        assert img.size == (4, 4)


def test_video_seam_feature_flag():
    import importlib.util

    import pytest

    if importlib.util.find_spec("av") is None:
        with pytest.raises(NotImplementedError):
            multimodal.sample_frames(b"\x00" * 64)


def test_neardup_clusters_transitive_chain(spark):
    # A≈B and B≈C but A,C share less — the cluster must still unite all
    # three transitively under min doc_id.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = base.replace("mu", "nu")
    c = b.replace("alpha", "omega")
    rows = [
        (10, base, "en", "w", len(base)),
        (11, b, "en", "w", len(b)),
        (12, c, "en", "w", len(c)),
        (13, "totally unrelated words here about nothing in particular today", "en", "w", 60),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r.cluster_id for r in dedup.neardup_clusters(docs).collect()}
    if 12 in out:  # chain closed through 11 (threshold-dependent)
        assert out[10] == out[11] == out[12] == 10
    else:
        assert out[10] == out[11] == 10
    assert 13 not in out  # unrelated doc joins no cluster


def test_neardup_clusters_raises_when_cap_too_low(spark):
    """An unconverged propagation must be loud (wrong cluster_ids otherwise):
    a 3-node chain needs 2 rounds, so a 1-round cap raises."""
    import pytest

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = base.replace("mu", "nu")
    rows = [
        (20, base, "en", "w", len(base)),
        (21, b, "en", "w", len(b)),
        (22, b.replace("alpha", "omega"), "en", "w", len(b)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.neardup_clusters(docs, max_iterations=1)


def test_vocab_topk_and_tfidf(spark):
    from azeroth_data_platform_spark.operators import textstats

    rows = [
        (1, "red fish blue fish", "en", "w", 18),
        (2, "red cat", "en", "w", 7),
        (3, "blue dog blue dog blue", "en", "w", 22),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    vocab = {r.token: r for r in textstats.vocab_topk(docs, k=10).collect()}
    assert vocab["blue"].n_occurrences == 4 and vocab["blue"].n_docs == 2
    assert vocab["fish"].n_occurrences == 2 and vocab["fish"].n_docs == 1
    assert vocab["red"].n_docs == 2

    top = {
        (r.doc_id, r.term_rank): r
        for r in textstats.tfidf_top_terms(docs, terms_per_doc=1).collect()
    }
    # doc 3: 'blue' tf=3 df=2 → 1.5, 'dog' tf=2 df=1 → 2.0 → dog wins
    assert top[(3, 1)].token == "dog" and top[(3, 1)].score == 2.0
    # doc 1: 'fish' tf=2 df=1 → 2.0 beats red/blue (tf=1, df=2 → 0.5)
    assert top[(1, 1)].token == "fish"


def test_frame_sampling_fans_out_rows(spark):
    """Frame-sample plumbing: payload → fixed-size frames → every Nth
    selected; one input row fans out to ceil(n_frames / every_n) rows with
    deterministic per-frame features."""
    from azeroth_data_platform_spark.operators import multimodal

    text = "x" * 100  # 100 bytes → 6 full 16-byte frames → indices 0, 4
    docs = spark.createDataFrame(
        [(1, text, "en", "w", 100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = multimodal.sample_frame_features(multimodal.attach_binary(docs)).collect()
    rows = {r.frame_index: r for r in out}
    assert sorted(rows) == [0, 4]
    assert all(r.n_frames == 6 for r in out)
    assert rows[0].frame_checksum == (ord("x") * 16) % 997


def test_repetition_stats_flags_repetitive_doc(spark):
    """A stuffed document (one word claiming most tokens, repeated bigrams)
    must be dropped; a diverse document must be kept; the metrics must
    equal hand-computed values."""
    diverse = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    stuffed = "spam spam spam spam spam spam spam spam spam eggs"
    docs = spark.createDataFrame(
        [(1, diverse, "en", "web", len(diverse)), (2, stuffed, "en", "web", len(stuffed))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in textstats.repetition_stats(docs).collect()}
    assert out[1].keep and not out[2].keep
    assert out[1].top_word_fraction == 0.1  # every word unique, 1/10
    assert out[1].dup_2gram_fraction == 0.0
    assert out[2].top_word_fraction == 0.9  # 9×spam / 10 words
    # bigrams: 8×"spam spam" + 1×"spam eggs" → 2 distinct of 9 → 7/9 dupes
    assert abs(out[2].dup_2gram_fraction - 7.0 / 9.0) < 1e-12
    assert out[2].distinct_word_ratio == 0.2


def test_decontaminate_flags_benchmark_overlap(spark):
    """A corpus doc sharing an 8-gram with a benchmark doc (doc_id % 10 == 0)
    is contaminated; an unrelated doc is clean; benchmark docs themselves
    are excluded from the output."""
    from azeroth_data_platform_spark.operators import corpus

    bench = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    leaked = "intro text then w1 w2 w3 w4 w5 w6 w7 w8 trailing words here"
    clean = "entirely unrelated content with no shared phrases at all in it"
    docs = spark.createDataFrame(
        [
            (10, bench, "en", "web", len(bench)),  # benchmark side
            (11, leaked, "en", "web", len(leaked)),  # shares the w1..w8 8-gram
            (12, clean, "en", "web", len(clean)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in corpus.decontaminate(docs).collect()}
    assert set(out) == {11, 12}  # benchmark doc 10 not scored
    assert out[11].contaminated and out[11].n_contaminated_ngrams == 1
    assert not out[12].contaminated and out[12].n_contaminated_ngrams == 0
    assert out[11].contamination_ratio == 1.0 / out[11].n_shingles


def test_pack_sequences_running_layout(spark):
    """Packing must produce a contiguous running layout per shard: offsets
    advance by n_tokens, pack_id = floor(running_start / budget), and a doc
    straddling the budget line is flagged."""
    from azeroth_data_platform_spark.operators import corpus

    sampled = spark.createDataFrame(
        [(1, "hi", 60, "en", 0), (2, "hi", 50, "en", 0), (3, "lo", 10, "en", 1)],
        "doc_id long, band string, n_tokens long, lang_pred string, shard long",
    )
    out = {r.doc_id: r for r in corpus.pack_sequences(sampled, budget=100).collect()}
    assert (out[1].pack_id, out[1].pack_offset, out[1].crosses_boundary) == (0, 0, False)
    # doc 2 starts at 60, spills past 100 → flagged, still pack 0
    assert (out[2].pack_id, out[2].pack_offset, out[2].crosses_boundary) == (0, 60, True)
    # shard 1 restarts its own running total
    assert (out[3].pack_id, out[3].pack_offset) == (0, 0)


def test_exact_substring_spans_finds_planted_repeats(spark):
    """A 12-token phrase shared by two docs must surface as one maximal
    span in each (positions correct); unique text yields no spans; two
    repeats separated by unique text stay separate islands."""
    from azeroth_data_platform_spark.operators import dedup

    phrase = " ".join(f"p{i}" for i in range(12))  # 12 shared tokens
    d1 = f"u1 u2 u3 {phrase} u4 u5"
    d2 = f"v1 {phrase} v2 v3 v4 v5 v6 v7 v8 v9 {phrase}"
    d3 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"  # all unique
    docs = spark.createDataFrame(
        [(1, d1, "en", "web", len(d1)), (2, d2, "en", "web", len(d2)),
         (3, d3, "en", "web", len(d3))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {}
    for r in dedup.exact_substring_spans(docs, w=10).collect():
        out.setdefault(r.doc_id, []).append((r.span_start, r.span_end, r.span_tokens))
    # d1: phrase occupies tokens 4..15 → windows 4..6 → span [4, 15]
    assert out[1] == [(4, 15, 12)]
    # d2: first at 2..13, then v2..v9 (tokens 14..21), second at 22..33 —
    # separated by >W-window gap in flagged positions → two islands
    assert sorted(out[2]) == [(2, 13, 12), (22, 33, 12)]
    assert 3 not in out  # unique doc untouched


def test_remove_repeated_spans_cuts_only_flagged_tokens(spark):
    """Applying the cut list must drop exactly the flagged span tokens,
    keep everything else in order, and pass unique docs through intact."""
    from azeroth_data_platform_spark.operators import dedup

    phrase = " ".join(f"p{i}" for i in range(12))
    d1 = f"u1 u2 u3 {phrase} u4 u5"
    d2 = f"v1 {phrase} v2"
    d3 = "w1 w2 w3"
    docs = spark.createDataFrame(
        [(1, d1, "en", "web", len(d1)), (2, d2, "en", "web", len(d2)),
         (3, d3, "en", "web", len(d3))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in dedup.remove_repeated_spans(docs, w=10).collect()}
    assert out[1].clean_text == "u1 u2 u3 u4 u5" and out[1].n_tokens_removed == 12
    assert out[2].clean_text == "v1 v2" and out[2].n_tokens_removed == 12
    assert out[3].clean_text == "w1 w2 w3" and out[3].n_tokens_removed == 0


def test_decontaminate_bloom_has_no_false_negatives(spark, sf_dir):
    """Bloom screening may over-flag (false positives bounded by the m/k/n
    trade) but must NEVER miss: every doc the exact shingle-set check marks
    contaminated must also be marked by the Bloom twin, and every exact hit
    count is a lower bound for the flagged count."""
    from azeroth_data_platform_spark.operators import corpus
    from azeroth_data_platform_spark.operators.adapters import read_table

    docs = read_table(spark, sf_dir, "documents")
    exact = {r.doc_id: r for r in corpus.decontaminate(docs).collect()}
    bloom = {r.doc_id: r for r in corpus.decontaminate_bloom(docs).collect()}
    assert set(exact) == set(bloom)  # same corpus side, same shingle counts
    for d, e in exact.items():
        b = bloom[d]
        assert b.n_shingles == e.n_shingles
        assert b.n_flagged_ngrams >= e.n_contaminated_ngrams, d
        if e.contaminated:
            assert b.contaminated, d  # no false negatives, ever


def test_pack_contents_assembles_across_boundaries(spark):
    """The materialized packs must concatenate doc tokens in layout order,
    splitting a boundary-crossing doc between consecutive packs, with token
    mass conserved exactly."""
    from azeroth_data_platform_spark.operators import corpus

    documents = spark.createDataFrame(
        [
            (1, "a1 a2 a3", "en", "web", 8),
            (2, "b1 b2 b3 b4", "en", "web", 11),
            (3, " ".join(f"c{i}" for i in range(1, 13)), "en", "web", 40),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sampled = spark.createDataFrame(
        [(1, "hi", 3, "en", 0), (2, "hi", 4, "en", 0), (3, "lo", 12, "en", 1)],
        "doc_id long, band string, n_tokens long, lang_pred string, shard long",
    )
    out = {
        (r.shard, r.pack_id): r
        for r in corpus.pack_contents(sampled, documents, budget=5).collect()
    }
    assert out[(0, 0)].pack_text == "a1 a2 a3 b1 b2"  # doc 2 split at the line
    assert out[(0, 1)].pack_text == "b3 b4"
    assert out[(0, 0)].n_docs_in_pack == 2 and out[(0, 1)].n_docs_in_pack == 1
    assert out[(1, 0)].pack_text == "c1 c2 c3 c4 c5"  # 12-token doc → 3 packs
    assert out[(1, 1)].pack_text == "c6 c7 c8 c9 c10"
    assert out[(1, 2)].pack_text == "c11 c12"
    # conservation: every input token lands in exactly one pack
    assert sum(r.n_tokens_in_pack for r in out.values()) == 3 + 4 + 12
    # every non-final pack per shard is exactly full
    for (shard, pack_id), r in out.items():
        last = max(p for s, p in out if s == shard)
        assert r.n_tokens_in_pack == (5 if pack_id < last else r.n_tokens_in_pack)


def test_mix_rebalance_plan_is_conservative(spark, sf_dir):
    """The sampling plan must target the uniform share exactly: rates ≤ 1,
    under-target sources keep everything (rate 1), over-target sources are
    cut to the target, and total expected tokens never exceed the corpus."""
    from azeroth_data_platform_spark.operators import corpus
    from azeroth_data_platform_spark.operators.adapters import read_table

    docs = read_table(spark, sf_dir, "documents")
    rows = corpus.mix_rebalance(docs).collect()
    total = sum(r.tokens for r in rows)
    target = total / len(rows)
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0
        assert abs(r.target_tokens - target) < 1e-6
        if r.tokens <= target:
            assert r.sample_rate == 1.0 and r.expected_tokens == r.tokens
        else:
            assert abs(r.expected_tokens - target) < 1e-6
    assert sum(r.expected_tokens for r in rows) <= total + 1e-6


def test_apply_mix_tracks_plan_rates(spark, sf_dir):
    """Applying the mix must keep everything from rate-1.0 sources and
    approximate the plan rate elsewhere (md5 thresholding is uniform but
    finite-sample); re-running selects the identical doc set."""
    from azeroth_data_platform_spark.operators import corpus
    from azeroth_data_platform_spark.operators.adapters import read_table

    docs = read_table(spark, sf_dir, "documents")
    plan = {r.source: r for r in corpus.mix_rebalance(docs).collect()}
    kept = corpus.apply_mix(docs).collect()
    by_src: dict[str, int] = {}
    for r in kept:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    for src, p in plan.items():
        k = by_src.get(src, 0)
        if p.sample_rate == 1.0:
            assert k == p.n_docs, src  # keep-all sources stay whole
        else:
            assert k <= p.n_docs, src
    # deterministic: a second run selects the same documents
    again = {r.doc_id for r in corpus.apply_mix(docs).collect()}
    assert again == {r.doc_id for r in kept}


def test_quality_prune_approx_tracks_exact(spark, sf_dir):
    """The approx_percentile scale path must land within sketch tolerance
    of the exact cut: thresholds close, and the survivor sets may differ
    only by docs whose score lies between the two thresholds."""
    from azeroth_data_platform_spark.operators import corpus
    from azeroth_data_platform_spark.operators.adapters import read_table

    docs = read_table(spark, sf_dir, "documents")
    exact = corpus.quality_prune(docs).select("doc_id", "quality_score", "q_cut")
    approx = corpus.quality_prune(docs, approx=True).select(
        "doc_id", "quality_score", "q_cut"
    )
    e = {r.doc_id: r for r in exact.collect()}
    a = {r.doc_id: r for r in approx.collect()}
    cut_e = next(iter(e.values())).q_cut
    cut_a = next(iter(a.values())).q_cut
    assert abs(cut_e - cut_a) < 0.05, (cut_e, cut_a)
    lo, hi = min(cut_e, cut_a), max(cut_e, cut_a)
    sym = set(e) ^ set(a)
    scores = {**{k: r.quality_score for k, r in e.items()},
              **{k: r.quality_score for k, r in a.items()}}
    assert all(lo <= scores[d] < hi for d in sym), "divergence outside the cut band"


def test_oov_ratio_against_planted_vocab(spark):
    """With k=2 the top-2 corpus tokens are in-vocab; a doc written
    entirely in rare tokens must be flagged high-OOV with ratio 1.0."""
    common = "aa bb aa bb aa bb aa bb"
    rare = "zz yy xx ww vv uu tt ss"
    docs = spark.createDataFrame(
        [(1, common, "en", "web", len(common)), (2, rare, "en", "web", len(rare))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in textstats.oov_ratio(docs, k=2).collect()}
    assert (out[1].n_oov, out[1].oov_ratio, out[1].high_oov) == (0, 0.0, False)
    assert (out[2].n_oov, out[2].oov_ratio, out[2].high_oov) == (8, 1.0, True)


def test_chunk_documents_sliding_windows(spark):
    """A 10-token doc at size=4/overlap=1 (stride 3) yields starts 0,3,6 —
    the round-8 consolidated semantics: the LAST chunk is the first whose
    window reaches the doc end, so no degenerate tail chunk (the old form
    also emitted a start at 9 whose 1-token chunk was a strict subset of
    the previous window — duplicate content downstream). Overlap regions
    must repeat verbatim."""
    from azeroth_data_platform_spark.operators import corpus

    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = spark.createDataFrame(
        [(1, text, "en", "web", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = sorted(
        corpus.chunk_documents(docs, size=4, overlap=1).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.chunk_id, r.begin_tok, r.n_tokens_in_chunk) for r in out] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4),
    ]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[1].chunk_text == "t3 t4 t5 t6"  # one-token overlap with chunk 0
    assert out[2].chunk_text == "t6 t7 t8 t9"  # reaches the end; no tail dup


def test_select_representatives_keeps_best_quality(spark):
    """Within a near-dup cluster the highest-quality member wins (not the
    lowest doc_id); docs outside any cluster are singleton representatives."""
    from azeroth_data_platform_spark.operators import corpus

    # Same 10-word unit repeated: the distinct 3-shingle set is identical
    # for any repeat count >= 2, so jaccard = 1.0 and the two docs cluster.
    # Doc 2 repeats past the 5000-char quality band -> lower quality than
    # doc 7, so the representative must be 7 despite its higher id.
    unit = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    low_q = unit * 90  # > 5000 chars -> quality 0.8
    near = unit * 6  # in-band -> quality 1.0
    other = "completely different content words " * 10
    docs = spark.createDataFrame(
        [
            (2, low_q, "en", "web", len(low_q)),
            (7, near, "en", "web", len(near)),
            (9, other, "en", "web", len(other)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in corpus.select_representatives(docs).collect()}
    assert set(out) == {2, 7, 9}
    assert out[2].cluster_id == out[7].cluster_id == 2  # min-label cluster id
    assert out[2].cluster_size == out[7].cluster_size == 2
    assert not out[2].is_representative  # lower quality loses despite lower id
    assert out[7].is_representative
    assert out[9].is_representative and out[9].cluster_size == 1
    assert out[9].cluster_id == 9


def test_semantic_dedup_within_cluster_only(spark):
    """A vector is dropped only when a LOWER-id vector in the SAME coarse
    cluster exceeds the cosine threshold; cross-cluster twins survive."""
    from azeroth_data_platform_spark.operators import dedup

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 62

    rows = [
        # centroids (vec_id < 2 with n_centroids=2): orthogonal anchors
        (0, vec(1, 0), 0),
        (1, vec(0, 1), 0),
        # near-dup of vec 0's cluster: same direction -> dropped (dup of 0)
        (5, vec(2, 0.1), 0),
        # assigned to cluster of centroid 1; cosine to 1 is high -> dropped
        (6, vec(0.1, 3), 0),
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        r.vec_id: r
        for r in dedup.semantic_dedup(embs, threshold=0.9, n_centroids=2).collect()
    }
    assert out[0].keep and out[1].keep  # lowest ids of their clusters
    assert out[0].cid == 0 and out[1].cid == 1
    assert out[5].cid == 0 and not out[5].keep and out[5].n_dups_lower == 1
    assert out[6].cid == 1 and not out[6].keep


def test_pii_scrub_redacts_planted_pii(spark):
    """Planted email/IP/phone are counted and redacted; clean text passes
    through byte-identical (the corpus-identity path the oracle checks)."""
    dirty = "mail bob.smith+x@example.co.uk from 192.168.1.254 or call 555-867-5309 now"
    clean = "no personal information in this perfectly ordinary sentence"
    docs = spark.createDataFrame(
        [(1, dirty, "en", "web", len(dirty)), (2, clean, "en", "web", len(clean))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in textstats.pii_scrub(docs).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 1, 1)
    assert out[1].has_pii
    assert out[1].scrubbed_text == "mail [EMAIL] from [IP] or call [PHONE] now"
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 0, 0)
    assert not out[2].has_pii
    assert out[2].scrubbed_text == clean


def test_quality_prune_cuts_at_global_quantile(spark):
    """With three distinct scores and quantile=0.5 the threshold is the
    median score; only docs at or above it survive, and the computed cut
    rides on every output row."""
    from azeroth_data_platform_spark.operators import corpus

    top = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    mid = "tiny text"  # under the 50-char band -> 0.8
    low = "the the the the"  # all stopwords + short -> 0.3
    docs = spark.createDataFrame(
        [
            (1, top, "en", "web", len(top)),
            (2, mid, "en", "web", len(mid)),
            (3, low, "en", "web", len(low)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in corpus.quality_prune(docs, quantile=0.5).collect()}
    assert set(out) == {1, 2}
    assert abs(out[1].q_cut - 0.8) < 1e-12 and abs(out[2].q_cut - 0.8) < 1e-12
    assert out[1].quality_score == 1.0


def test_incremental_dedup_flags_only_new_vs_reference(spark):
    """A new doc near-identical to a reference doc is flagged; near-dup
    pairs WITHIN the new batch are not (that's minhash_lsh_dedup's job);
    reference docs never appear on the new side."""
    unit = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    ref = unit * 6
    new_dup = unit * 8  # same distinct shingle set as ref -> jaccard 1.0
    new_dup2 = unit * 9  # dup of new_dup but also of ref
    unrelated = "totally different words about spark catalyst plans here today"
    docs = spark.createDataFrame(
        [
            (5, ref, "en", "web", len(ref)),  # doc_id % 5 == 0 -> reference
            (6, new_dup, "en", "web", len(new_dup)),
            (7, new_dup2, "en", "web", len(new_dup2)),
            (8, unrelated, "en", "web", len(unrelated)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {(r.d_new, r.d_ref): r.jaccard for r in dedup.incremental_dedup(docs).collect()}
    assert set(out) == {(6, 5), (7, 5)}  # new-vs-ref only, no (6, 7) pair
    assert out[(6, 5)] == 1.0


def test_incremental_dedup_indexed_matches_oneshot_and_never_rescans_ref(
    spark, tmp_path, sf_dir
):
    """r10 (verdict #5): the indexed path — delta joined against a
    STANDING persisted signature/band index — returns exactly the
    one-shot incremental_dedup result on the equivalent split, and its
    physical plan reads the reference side from the INDEX parquet, never
    from the reference documents (the 100 TB contract: a new crawl never
    re-shingles the corpus)."""
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    is_ref = F.col("doc_id") % dedup.INCR_REF_MOD == 0
    # persist the index the way a pipeline would, then read it back
    idx_dir = str(tmp_path / "dedup_index")
    built = dedup.build_dedup_index(docs.where(is_ref))
    for name, df in built.items():
        df.write.parquet(f"{idx_dir}/{name}")
    index = {
        name: spark.read.parquet(f"{idx_dir}/{name}") for name in built
    }
    delta = docs.where(~is_ref)
    got = dedup.incremental_dedup_indexed(delta, index)
    want = {
        (r.d_new, r.d_ref): r.jaccard
        for r in dedup.incremental_dedup(docs).collect()
    }
    assert {(r.d_new, r.d_ref): r.jaccard for r in got.collect()} == want
    # plan pin: every documents.parquet scan is a DELTA scan (carries the
    # pushed NOT (doc_id % 5 = 0) filter) — the reference side comes only
    # from the index files, never from re-reading reference text
    plan = got._jdf.queryExecution().executedPlan().toString()
    doc_scans = [
        ln for ln in plan.splitlines() if "documents.parquet" in ln
    ]
    assert doc_scans, plan
    for ln in doc_scans:
        assert "NOT" in ln and "% 5" in ln, ln
    assert "dedup_index" in plan
    # delta-only cost: a 1-row delta against the same index must do its
    # shingle work on 1 doc (semantic probe: returns only that doc's hits)
    one = delta.orderBy("doc_id").limit(1)
    sub = dedup.incremental_dedup_indexed(one, index).collect()
    one_id = one.collect()[0].doc_id
    assert all(r.d_new == one_id for r in sub)
    assert {(r.d_new, r.d_ref) for r in sub} == {
        p for p in want if p[0] == one_id
    }


def test_contamination_attribution_argmax_and_tiebreak(spark):
    """Crafted corpus: the leaked bench doc wins the argmax; exact-tie
    attribution breaks toward the smaller bench doc_id; the ppm share is
    the exact truncated rational; clean docs don't appear."""
    from azeroth_data_platform_spark.operators.corpus import (
        contamination_attribution,
    )

    w = lambda s, k: " ".join(s * k)  # noqa: E731
    b_words = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12".split()
    c_words = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12".split()
    bench_a = " ".join(b_words)             # doc 10
    bench_b = " ".join(c_words)             # doc 20
    # corpus doc 1: contains 3 bench_a 8-grams and 1 bench_b 8-gram
    corpus_1 = " ".join(b_words[:10] + ["zz"] + c_words[:8])
    # corpus doc 2: exactly one 8-gram from EACH bench doc -> tie -> 10
    corpus_2 = " ".join(b_words[:8] + ["qq"] + c_words[:8])
    clean = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"
    docs = spark.createDataFrame(
        [
            (10, bench_a, "en", "web", len(bench_a)),
            (20, bench_b, "en", "web", len(bench_b)),
            (1, corpus_1, "en", "web", len(corpus_1)),
            (2, corpus_2, "en", "web", len(corpus_2)),
            (3, clean, "en", "web", len(clean)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in contamination_attribution(docs).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1.bench_doc_id == 10
    assert r1.n_shared_ngrams == 3 and r1.total_pair_hits == 4
    assert r1.n_bench_docs_hit == 2
    assert r1.top_share_ppm == 750_000
    r2 = out[2]
    assert r2.bench_doc_id == 10  # tie (1 vs 1) -> smaller bench id
    assert r2.n_shared_ngrams == 1 and r2.total_pair_hits == 2
    assert r2.top_share_ppm == 500_000


def test_contamination_attribution_plan_broadcast_no_selfjoin(spark, sf_dir):
    """Plan pin: the bench (sh, bench_doc) side broadcasts; no
    SortMergeJoin of corpus against corpus, no CartesianProduct."""
    from azeroth_data_platform_spark import harness

    df = harness.ALL_QUERIES["tp_contamination_attribution"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantize_sq8_codes_and_error_bound(spark):
    """With a known per-dimension range the codes are exact: min maps to 0,
    max to 255 (the top level), and every reconstruction error is bounded
    by half a quantization step."""
    rows = [
        (0, [0.0] * 64, 0),
        (1, [1.0] * 64, 0),
        (2, [0.5] * 64, 0),
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.vec_id: r for r in similarity.quantize_sq8(embs).collect()}
    assert out[0].codes == [0] * 64
    assert out[1].codes == [255] * 64
    assert out[2].codes == [127] * 64  # floor(0.5 * 255) = 127
    step = 1.0 / 255
    for r in out.values():
        assert r.max_abs_err <= step / 2 + 1e-12


def test_perplexity_orders_docs_by_token_rarity(spark):
    """Unigram-LM NLL semantics: a doc of corpus-common tokens scores
    fewer bits/token than a doc of singletons/OOV; exact token accounting;
    and the portable plog2 tracks true log2 to ~1e-5 bits."""
    import math

    rows = (
        # 'common common common' repeated widely -> 'common' is cheap
        [(i, "common common common common", "en", "s") for i in range(30)]
        # one doc of unique-everywhere tokens -> max cost per token
        + [(100, "zzq1 zzq2 zzq3 zzq4", "en", "s")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r.doc_id: r for r in textstats.perplexity(docs, k=8).collect()}
    assert out[0].n_tokens == 4
    assert out[100].n_tokens == 4
    assert out[100].mean_nll_bits > out[0].mean_nll_bits + 3  # rare ≫ common
    # exact expected cost for the common doc: c('common') = 124, N = 124
    # tokens total... all docs: 30*4 + 4 = 124, c(common) = 120.
    n_total, k = 124, 8
    expected = math.log2(n_total + k + 1) - math.log2(120 + 1)
    assert abs(out[0].mean_nll_bits - expected) < 1e-4  # plog2 ≈ log2
    # OOV doc: every token unseen in vocab top-8? 'zzq*' are singletons —
    # the k=8 vocab is 'common' + 7 singletons (tie-broken by token asc),
    # so at least the non-vocab singleton tokens price at c=0
    assert out[100].mean_nll_bits <= math.log2(n_total + k + 1) + 1e-4


def test_gopher_quality_rules_fire_individually(spark):
    """Each Gopher rule trips on its planted violator and only there."""
    good = " ".join(["the quick brown fox jumps of and to a"] * 8)  # 64 words
    rows = [
        (1, good, "en", "s"),                                   # passes all
        (2, "the of " + " ".join(f"w{i}" for i in range(10)), "en", "s"),  # too short
        (3, " ".join(["a"] * 60), "en", "s"),                   # mean len < 3
        (4, good + " " + " ".join(["###"] * 20), "en", "s"),    # symbol ratio
        (5, " ".join(["the", "of"] + ["123"] * 60), "en", "s"), # alpha frac
        (6, " ".join(f"word{i}" for i in range(60)), "en", "s"),# no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r.doc_id: r for r in textstats.gopher_quality(docs).collect()}
    assert out[1].keep
    assert not out[2].ok_word_count and not out[2].keep
    assert not out[3].ok_mean_word_len and not out[3].keep
    assert not out[4].ok_symbol_ratio and not out[4].keep
    assert not out[5].ok_alpha_words and not out[5].keep
    assert not out[6].ok_stopwords and not out[6].keep


def test_dsir_weights_prefer_target_like_docs(spark):
    """DSIR log-ratio semantics: a doc built from target-domain bigrams
    outweighs a doc of off-domain bigrams; weights are finite and the
    feature accounting is exact (n_features = n_words - 1)."""
    target_text = "the model trains on clean data " * 10   # en-style
    off_text = "xyzzy plugh quux grault corge waldo " * 10  # off-domain
    rows = (
        [(i, target_text.strip(), "en", "s") for i in range(20)]
        + [(100 + i, off_text.strip(), "zh", "s") for i in range(5)]
        + [(200, target_text.strip(), "zh", "s")]   # target-LIKE, raw-labeled
        + [(201, off_text.strip(), "en", "s")]      # off-domain in target slice
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r.doc_id: r for r in corpus.dsir_weights(docs).collect()}
    assert out[0].n_features == 60 - 1
    # the target-like raw doc scores far above the off-domain docs…
    assert out[200].mean_log2_weight > out[100].mean_log2_weight + 0.5
    # …because scoring follows CONTENT, not the lang label
    assert abs(out[200].mean_log2_weight - out[0].mean_log2_weight) < 1e-9


def test_phash_dedup_finds_block_local_edits_only(spark):
    """Block-parity payload fingerprint: same-length block-local edits land
    within hamming ≤ 3 and pair up; unrelated payloads (~30/60 bits apart)
    never do."""
    base = "x" * 300 + "tail"
    rows = [
        (1, base, "en", "s"),
        (2, base[:-4] + "tbil", "en", "s"),        # one byte changed
        (3, "".join(chr(97 + i % 23) for i in range(304)), "en", "s"),  # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {(r.d1, r.d2): r.hamming for r in multimodal.phash_dedup(docs).collect()}
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert not any(3 in k for k in got)


def test_bpe_merges_learn_the_planted_pair_sequence(spark):
    """Classic BPE on a controlled vocab: the most frequent adjacent pair
    merges first, and later rounds see the MERGED symbol (the learned
    'es' must pair with 't' only after round 1 creates it)."""
    rows = [(i, "est est est nest", "en", "s") for i in range(5)] + [
        (100, "sun sun", "en", "s")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = corpus.bpe_merges(docs, n_merges=3).orderBy("merge_rank").collect()
    # word freqs: est×15, nest×5, sun×2 → pairs: (e,s)=20, (s,t)=20,
    # (n,e)=5, (s,u)=2, (u,n)=2 → tie (e,s)/(s,t) breaks to (e,s)
    assert (out[0].left, out[0].right, out[0].pair_count) == ("e", "s", 20)
    # after merging 'es': (es,t)=20 wins — round 2 sees the MERGED symbol
    assert (out[1].left, out[1].right, out[1].pair_count) == ("es", "t", 20)
    # after 'est': nest is n+est → (n,est)=5 beats the sun pairs
    assert (out[2].left, out[2].right, out[2].pair_count) == ("n", "est", 5)


def test_bpe_encode_segments_with_trained_merges(spark):
    """Encoding applies the trained merges in rank order: with the corpus
    above (merges e+s, es+t, n+est), 'est' becomes ONE token, 'nest'
    becomes one token after round 3, and unmerged words stay characters.
    Token-mass conservation: total token chars == total word chars."""
    rows = [(i, "est est est nest", "en", "s") for i in range(5)] + [
        (100, "sun sun", "en", "s")
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in corpus.bpe_encode(docs, n_merges=3).collect()}
    r0 = out[0]
    # 'est est est nest' → [est, est, est, nest]: both merged to single tokens
    assert r0.n_words == 4
    assert r0.n_bpe_tokens == 4
    assert r0.bpe_preview == "est est est nest"
    assert abs(r0.avg_token_len - (3 + 3 + 3 + 4) / 4) < 1e-12
    # 'sun sun': no merge touches it → pure characters
    r100 = out[100]
    assert r100.n_words == 2
    assert r100.n_bpe_tokens == 6
    assert r100.bpe_preview == "s u n s u n"


def test_char_entropy_known_values(spark):
    """Closed-form checks: two equiprobable letters → exactly 1 bit; a
    single repeated letter → 0 bits with modal fraction 1; no letters →
    NULL entropy; uniform over k letters → log2(k)."""
    import math

    from azeroth_data_platform_spark.operators import textstats as ts

    rows = [
        (1, "ab", "en", "s"),
        (2, "aaaa", "en", "s"),
        (3, "0123 456", "en", "s"),
        (4, "abcdefgh", "en", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in ts.char_entropy(docs).collect()}
    assert out[1].n_alpha == 2 and abs(out[1].char_entropy_bits - 1.0) < 1e-9
    assert abs(out[1].max_char_frac - 0.5) < 1e-12
    assert out[2].char_entropy_bits == 0.0 and out[2].max_char_frac == 1.0
    assert out[3].n_alpha == 0 and out[3].char_entropy_bits is None
    assert abs(out[4].char_entropy_bits - math.log2(8)) < 1e-5


def test_hash_classifier_deterministic_and_mean_scaled(spark):
    """The frozen hash-kernel weights are deterministic: the same text
    always gets the same logit; repeating a doc's bigrams (doubling the
    doc) leaves the MEAN logit unchanged (bag-of-features averaging); a
    one-word doc has no bigrams and is excluded."""
    t = "spark shuffles partition data across executors"
    rows = [
        (1, t, "en", "s"),
        (2, t, "en", "s"),
        (3, t + " " + t, "en", "s"),
        (4, "single", "en", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in corpus.hash_classifier(docs).collect()}
    assert out[1].logit == out[2].logit
    assert out[1].n_features == 5
    assert 4 not in out
    # doc 3 = doc 1's bigrams twice + one bridging bigram; mean stays in
    # the convex hull of per-bigram weights → bounded by ±1 + bias
    assert abs(out[3].logit) <= 1.0 + abs(corpus.FT_BIAS)
    assert out[1].keep == (out[1].logit > corpus.FT_THRESHOLD)


def test_cluster_sample_quota_and_balance(spark):
    """Per-cluster quota: no cluster exceeds m; every non-empty cluster is
    represented; ranks are 1..quota dense; and the sample is deterministic
    across partition counts (two-phase rank = one-phase rank)."""
    rows = [(i, [float(i % 4), float((i // 4) % 4)] * 32, 0) for i in range(64)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.cluster_sample(embs, k=4, m=5).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r.sample_rank)
    assert by_cluster, "no clusters sampled"
    for ranks in by_cluster.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    out2 = similarity.cluster_sample(embs.repartition(13), k=4, m=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    """A 16-word boilerplate line shared by three docs survives only in the
    lowest (doc_id, line_idx); unique lines all survive; reassembly
    preserves within-doc line order."""
    boiler = " ".join(f"b{i}" for i in range(16))
    u1 = " ".join(f"u{i}" for i in range(16))
    u2 = " ".join(f"v{i}" for i in range(16))
    rows = [
        (1, boiler + " " + u1, "en", "s"),
        (2, boiler + " " + u2, "en", "s"),
        (3, u2 + " " + boiler, "en", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in corpus.line_dedup(docs).collect()}
    assert out[1].n_lines == 2 and out[1].n_kept == 2
    assert out[1].text_dedup == boiler + " " + u1
    # doc 2: boilerplate removed (doc 1 line 0 wins), u2 kept (first occ)
    assert out[2].n_kept == 1 and out[2].text_dedup == u2
    # doc 3: both lines are dupes now — doc loses everything
    assert out[3].n_kept == 0 and out[3].text_dedup == ""


def test_gopher_repetition_flags_stuffed_docs(spark):
    """A keyword-stuffed doc (one bigram repeated) fails the top-2-gram
    rule; a doc with a repeated 5-gram accrues dup_5gram mass; a diverse
    doc passes both."""
    stuffed = "buy now " * 20  # bigram 'buy now' dominates
    phrase = "alpha beta gamma delta epsilon"
    rep5 = phrase + " filler one two three " + phrase + " other words here now"
    diverse = " ".join(f"w{i}" for i in range(40))
    rows = [(1, stuffed.strip(), "en", "s"), (2, rep5, "en", "s"), (3, diverse, "en", "s")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in textstats.gopher_repetition(docs).collect()}
    assert out[1].top_bigram_char_frac > 0.5 and not out[1].pass_repetition
    assert out[2].dup_5gram_char_frac > 0.15 and not out[2].pass_repetition
    assert out[3].dup_5gram_char_frac == 0.0 and out[3].pass_repetition


def test_ccnet_buckets_tercile_sizes_and_order(spark):
    """Banding is by perplexity order: each band is ~n/3 docs (exact split
    depends only on threshold ties), head docs have lower NLL than tail
    docs, and the partition covers every scored doc exactly once."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textstats.ccnet_buckets(docs).collect()
    n = len(out)
    by = {"head": [], "middle": [], "tail": []}
    for r in out:
        by[r.ppl_bucket].append(r.mean_nll_bits)
    assert sum(len(v) for v in by.values()) == n
    assert all(len(v) >= n // 4 for v in by.values())  # roughly balanced
    assert max(by["head"]) <= min(by["tail"])
    assert max(by["head"]) <= min(by["middle"]) or not by["middle"]


def test_audio_segments_windows_and_zero_crossings(spark):
    """Known payload: 130 bytes → 3 windows (64/64/2); peak/sum/ZCR match
    a python model, including the alternating high/low crossing case."""
    t = ("az" * 64) + "zz"  # 'a'=97 (<128)... all bytes < 128 → 0 crossings
    rows = [(1, t, "en", "s", len(t))]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    mm = multimodal.attach_binary(docs)
    out = sorted(multimodal.audio_segments(mm).collect(), key=lambda r: r.seg_id)
    assert [r.n_samples for r in out] == [64, 64, 2]
    bb = t.encode()
    for r in out:
        w = bb[r.seg_id * 64 : r.seg_id * 64 + 64]
        assert r.peak == max(w) and r.sum_amp == sum(w)
        assert r.n_zero_crossings == sum(
            1 for j in range(1, len(w)) if (w[j - 1] < 128) != (w[j] < 128)
        )


def test_ccnet_sample_rates_follow_bands(spark):
    """Band sampling keeps ~100% of head, less of middle, least of tail —
    and is deterministic (same survivors on re-run / repartition)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buckets = {r.doc_id: r.ppl_bucket for r in textstats.ccnet_buckets(docs).collect()}
    kept = {r.doc_id: r for r in corpus.ccnet_sample(docs).collect()}
    n_band = {b: sum(1 for v in buckets.values() if v == b) for b in ("head", "middle", "tail")}
    k_band = {b: sum(1 for d in kept if buckets[d] == b) for b in ("head", "middle", "tail")}
    assert k_band["head"] == n_band["head"]  # rate 100%
    assert k_band["middle"] < n_band["middle"]
    assert k_band["tail"] < k_band["middle"] or n_band["tail"] < n_band["middle"]
    for d, r in kept.items():
        assert r.ppl_bucket == buckets[d]
    kept2 = {r.doc_id for r in corpus.ccnet_sample(docs.repartition(7)).collect()}
    assert kept2 == set(kept)


def test_mix_temperature_flattens_partially(spark, sf_dir):
    """α=½ temperature shares sit BETWEEN natural shares and uniform:
    above-average sources shrink, below-average sources grow, ordering is
    preserved, shares sum to 1, and exactly the binding source keeps
    everything (rate 1)."""
    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.operators import corpus

    rows = corpus.mix_temperature(harness._docs(spark, sf_dir)).collect()
    n = len(rows)
    uniform = 1.0 / n
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0.0 < r.keep_rate <= 1.0
        assert r.expected_tokens <= r.tokens + 1e-6
        if r.nat_share > uniform:
            assert r.temp_share < r.nat_share  # shrunk toward uniform
        elif r.nat_share < uniform:
            assert r.temp_share > r.nat_share  # boosted toward uniform
    # ordering by share is preserved (monotone transform)
    by_nat = sorted(rows, key=lambda r: r.nat_share)
    by_tmp = sorted(rows, key=lambda r: r.temp_share)
    assert [r.source for r in by_nat] == [r.source for r in by_tmp]
    assert max(r.keep_rate for r in rows) > 0.999999  # a binding source exists


def test_containment_flags_embedded_document(spark):
    """A document fully contained in a longer one scores containment 1.0
    even though Jaccard < 1 — the asymmetric signal the operator adds on
    top of minhash_lsh's symmetric score."""
    from azeroth_data_platform_spark.operators import dedup

    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base + " extraone extratwo", "en", "s", len(base) + 18),
        (3, " ".join(f"other{i}" for i in range(40)), "en", "s", 200),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pairs = {(r.d1, r.d2): r for r in dedup.containment_pairs(docs).collect()}
    assert (1, 2) in pairs
    p = pairs[(1, 2)]
    assert p.containment == 1.0
    assert p.jaccard < 1.0
    assert all(3 not in k for k in pairs)


def test_quality_calibration_uniformizes_per_source(spark, sf_dir):
    """Within every source the calibrated score spans [0,1] and the keep
    cut removes ~the bottom quintile regardless of the source's raw-score
    distribution — the cross-source comparability the operator buys."""
    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.operators import corpus

    rows = corpus.quality_calibrate(harness._docs(spark, sf_dir)).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        cals = sorted(r.calibrated for r in rs)
        assert cals[0] == 0.0 and cals[-1] == 1.0, src
        kept = sum(1 for r in rs if r.keep) / len(rs)
        assert 0.7 <= kept <= 0.9, (src, kept)


def test_cdc_segments_survive_positional_shift(spark):
    """The CDC property: prepending a token shifts every fixed-window
    offset but leaves downstream content-defined boundaries intact, so the
    two documents still share segment hashes — the shift-robustness
    fixed-window substring dedup lacks."""
    from azeroth_data_platform_spark.operators import dedup

    base = " ".join(f"w{i * 7 % 97}x{i}" for i in range(80))
    rows = [
        (1, base, "en", "s", len(base)),
        (2, "inserted " + base, "en", "s", len(base) + 9),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    dups = dedup.cdc_segments(docs).collect()
    cross = [r for r in dups if r.n_docs == 2]
    assert cross, "no shared segments despite the shift"
    assert all(r.n_occurrences >= 2 for r in dups)


def test_leakage_safe_split_keeps_duplicates_together(spark, sf_dir):
    """The leakage property head-on: every MinHash near-dup PAIR lands in
    the same split; split sizes are roughly 8/1/1; all docs assigned."""
    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.operators import corpus, dedup

    docs = harness._docs(spark, sf_dir)
    split = {r.doc_id: r.split for r in corpus.leakage_safe_split(docs).collect()}
    assert len(split) == docs.count()
    pairs = dedup.minhash_lsh_dedup(docs).collect()
    assert pairs, "fixture corpus should contain near-dups"
    for p in pairs:
        assert split[p.d1] == split[p.d2], (p.d1, p.d2)
    from collections import Counter

    frac = Counter(split.values())
    n = len(split)
    assert 0.6 <= frac["train"] / n <= 0.95
    assert frac["val"] / n <= 0.25 and frac["test"] / n <= 0.25


def test_binary_cdc_chunks_survive_byte_shift(spark):
    """Binary CDC property: prepending bytes to a payload leaves downstream
    content-defined chunk hashes intact — the two payloads share chunks."""
    from azeroth_data_platform_spark.operators import multimodal

    base = " ".join(f"blob{i * 13 % 89}seg{i}" for i in range(60))
    rows = [
        (1, base, "en", "s", len(base)),
        (2, "shifted-prefix " + base, "en", "s", len(base) + 15),
        (3, "entirely different payload content here", "en", "s", 39),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    dups = multimodal.binary_cdc_dedup(multimodal.attach_binary(docs)).collect()
    assert any(r.n_docs == 2 for r in dups), "no shared chunks despite the shift"
    assert all(r.n_occurrences >= 2 for r in dups)


def test_contamination_report_run_semantics(spark):
    """Planted overlaps: a >=15-token verbatim span -> 'verbatim' with
    the exact run length and token-overlap arithmetic; a single shared
    8-gram -> 'scattered' with longest_run 1; no hits -> 'clean'.
    Pure-Python island recompute cross-checks the window algebra."""
    from azeroth_data_platform_spark.operators.corpus import (
        DECON_N,
        contamination_report,
    )

    bench_words = [f"b{i}" for i in range(20)]          # doc 10 (benchmark)
    verbatim_span = bench_words[2:18]                    # 16 tokens
    doc1 = ["x1", "x2"] + verbatim_span + ["y1", "y2"]   # verbatim hit
    doc2 = ["p" + str(i) for i in range(6)] + bench_words[0:8] + ["q1"]
    doc3 = [f"z{i}" for i in range(12)]                  # clean
    rows = [
        (10, " ".join(bench_words), "en"),
        (1, " ".join(doc1), "en"),
        (2, " ".join(doc2), "en"),
        (3, " ".join(doc3), "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in contamination_report(df).collect()}
    assert set(got) == {1, 2, 3}

    # doc1: 20 words -> 13 shingle positions; the 16-token span yields
    # 16 - 8 + 1 = 9 consecutive hit positions (positions 2..10)
    assert got[1].n_shingles == len(doc1) - DECON_N + 1
    assert got[1].longest_run == 9
    assert got[1].n_hit_positions == 9
    assert got[1].longest_overlap_tokens == 9 + DECON_N - 1 == 16
    assert got[1].severity == "verbatim"

    # doc2: exactly one shared 8-gram
    assert got[2].longest_run == 1
    assert got[2].severity == "scattered"
    assert got[2].longest_overlap_tokens == DECON_N

    assert got[3].n_hit_positions == 0
    assert got[3].longest_run == 0
    assert got[3].severity == "clean"


def test_contamination_report_plan_broadcast_no_selfjoin(spark, sf_dir):
    """Plan pin: benchmark shingles broadcast; no sort-merge self-join,
    no cartesian; the corpus side is scanned through one explode."""
    from azeroth_data_platform_spark import harness

    df = harness.QUERIES["tp_contamination_report"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_quality_curve_doc_share_expression_past_bigint(spark):
    """r10 (ADVICE #2): doc_share_ppm is staged through DECIMAL(38,0)/
    HUGEINT like token_share_ppm — the old BIGINT 1000000*cum_docs
    multiply wraps past ~9.2e12 docs, and DIVERGENTLY (Spark NULL,
    DuckDB error). Pin the literal expressions both engines now use in
    that regime."""
    import duckdb

    cum, tot = 10**13, 2 * 10**13  # 10T of 20T docs: 1e6*cum > 2**63
    assert 1_000_000 * cum > 2**63
    got_s = spark.sql(
        "SELECT CAST(CAST(1000000 AS DECIMAL(38,0)) * cum_docs"
        " DIV total_docs AS BIGINT) AS p FROM VALUES"
        f" (CAST({cum} AS BIGINT), CAST({tot} AS BIGINT))"
        " AS t(cum_docs, total_docs)"
    ).collect()[0].p
    got_d = duckdb.sql(
        "SELECT CAST(CAST(1000000 AS HUGEINT) * cum_docs // total_docs"
        f" AS BIGINT) AS p FROM (SELECT CAST({cum} AS BIGINT) cum_docs,"
        f" CAST({tot} AS BIGINT) total_docs)"
    ).fetchone()[0]
    assert got_s == got_d == 500_000


def test_quality_token_curve_invariants(spark):
    """Lorenz-curve invariants on a constructed corpus: monotone
    cumulative shares, exact conservation at the lowest occupied bucket
    (doc_share = token_share = 1e6), a planted long-high-quality doc
    bends token share above doc share, and a pure-Python recompute of
    the cumulative arithmetic matches."""
    from azeroth_data_platform_spark.operators.corpus import (
        quality_token_curve,
    )
    from azeroth_data_platform_spark.operators.textstats import quality_score

    rows = [
        # high-quality LONG docs: stopword-free, digit-free, in length band
        (1, "market data quarterly report analysis segment " * 20, "en"),
        (2, "market data quarterly report analysis segment " * 20, "en"),
        # low-quality SHORT docs: digit-heavy and under the length band
        (3, "123 456 789 000 111", "en"),
        (4, "123 456 789 000 222", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_token_curve(df).collect()
    # descending qb; shares monotone nondecreasing going down the list
    qbs = [r.qb for r in out]
    assert qbs == sorted(qbs, reverse=True)
    for a, b in zip(out, out[1:]):
        assert b.doc_share_ppm >= a.doc_share_ppm
        assert b.token_share_ppm >= a.token_share_ppm
    assert out[-1].doc_share_ppm == 1_000_000
    assert out[-1].token_share_ppm == 1_000_000
    assert out[-1].cum_docs == 4

    # pure-Python recompute from the per-doc scores
    scored = quality_score(df).collect()
    buckets = {}
    for r in scored:
        qb = int(r.quality_score * 1000 // 1)
        import math

        qb = math.floor(r.quality_score * 1000)
        d, t = buckets.get(qb, (0, 0))
        buckets[qb] = (d + 1, t + r.n_tokens)
    total_d = sum(d for d, _ in buckets.values())
    total_t = sum(t for _, t in buckets.values())
    cd = ct = 0
    exp = {}
    for qb in sorted(buckets, reverse=True):
        d, t = buckets[qb]
        cd, ct = cd + d, ct + t
        exp[qb] = (cd, ct, 10**6 * cd // total_d, 10**6 * ct // total_t)
    got = {r.qb: (r.cum_docs, r.cum_tokens, r.doc_share_ppm, r.token_share_ppm)
           for r in out}
    assert got == exp
    # the high-quality bucket holds 2/4 docs but far more than half the
    # tokens (long docs) -> token share leads doc share at the top
    top = out[0]
    assert top.token_share_ppm > top.doc_share_ppm
