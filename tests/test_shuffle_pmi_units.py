"""Unit/property pins for the round-6 operators: tp_global_shuffle and
ts_pmi_collocations (their cross-engine checks live in the parity suite;
these pin the semantic invariants the oracle can't express)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from azeroth_data_platform_spark.operators import corpus, textstats


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_global_shuffle_is_a_permutation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = docs.count()
    out = corpus.global_shuffle(docs).collect()
    # every doc appears exactly once
    assert len(out) == n and len({r.doc_id for r in out}) == n
    # within each shard, pos is contiguous 1..|shard|
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # shards are reasonably balanced (md5 uniformity): no shard > 3x mean
    mean = n / len(by_shard)
    assert max(len(v) for v in by_shard.values()) <= 3 * mean


def test_global_shuffle_deterministic_across_partitionings(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = sorted(map(tuple, corpus.global_shuffle(docs.repartition(3)).collect()))
    b = sorted(map(tuple, corpus.global_shuffle(docs.repartition(24)).collect()))
    assert a == b


def test_global_shuffle_breaks_source_locality(spark, sf_dir):
    """The point of the shuffle: consecutive positions within a shard must
    not be runs of one source (crawl-batch locality must die)."""
    out = corpus.global_shuffle(_docs(spark, sf_dir)).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append((r.pos, r.source))
    # longest same-source run across all shards stays small relative to n
    longest = 0
    for poss in by_shard.values():
        poss.sort()
        run, prev = 1, None
        for _, src in poss:
            run = run + 1 if src == prev else 1
            prev = src
            longest = max(longest, run)
    n_sources = len({r.source for r in out})
    assert n_sources >= 2
    # expected max run for uniform order ~ log(n)/log(n_sources) + slack
    assert longest <= 20, longest


def test_pmi_matches_bruteforce_python(spark):
    """PMI on a tiny hand-made corpus vs an independent Python computation
    (plain math.log2 — the plog2 device must agree to ~1e-6 bits, and the
    quantized output to 12 decimals must round the same values)."""
    texts = [
        "new york is a big city",
        "new york has new people",
        "york new city big",
        "a big city has people",
        "new york new york new york",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.v, r.w): (r.c_ab, r.c_a, r.c_b, r.pmi_bits)
        for r in textstats.pmi_collocations(docs, min_count=2, k=50).collect()
    }
    # brute force
    toks = [t.split() for t in texts]
    uni: dict[str, int] = {}
    bg: dict[tuple, int] = {}
    for ws in toks:
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    nu = sum(uni.values())
    nb = sum(bg.values())
    want = {
        p: (c, uni[p[0]], uni[p[1]],
            math.log2(c) + 2 * math.log2(nu) - math.log2(nb)
            - math.log2(uni[p[0]]) - math.log2(uni[p[1]]))
        for p, c in bg.items() if c >= 2
    }
    assert set(got) == set(want)
    for p, (c_ab, c_a, c_b, pmi) in got.items():
        wc_ab, wc_a, wc_b, wpmi = want[p]
        assert (c_ab, c_a, c_b) == (wc_ab, wc_a, wc_b), p
        assert abs(pmi - wpmi) < 1e-5, (p, pmi, wpmi)


def test_pmi_deterministic_across_partitionings(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = sorted(map(tuple, textstats.pmi_collocations(docs.repartition(3)).collect()))
    b = sorted(map(tuple, textstats.pmi_collocations(docs.repartition(24)).collect()))
    assert a == b


def test_shard_manifest_describes_global_shuffle_layout(spark, sf_dir):
    """Manifest counts must equal a direct groupBy over global_shuffle's
    shard assignment, shares must sum to ~1e6, and every doc is covered."""
    from azeroth_data_platform_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    man = corpus.shard_manifest(docs).collect()
    layout = {
        r["shard"]: r["cnt"]
        for r in corpus.global_shuffle(docs)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert {r["shard"]: r["n_docs"] for r in man} == layout
    n = docs.count()
    assert sum(r["n_docs"] for r in man) == n
    total_share = sum(r["docs_share_ppm"] for r in man)
    assert 1_000_000 - len(man) <= total_share <= 1_000_000
    for r in man:
        assert r["min_doc_id"] <= r["max_doc_id"]
        # seeded md5 sharding should be roughly even: each shard within
        # 5x of ideal on the sf0.001 corpus (loose, deterministic)
        assert 0 < r["chars_balance_ppm"] < 5_000_000
