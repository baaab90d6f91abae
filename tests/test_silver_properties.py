"""Property-based silver-transform invariants (hypothesis).

Random auction payloads — any mix of missing/garbage fields — must never
crash the transform, and the P4/P5/P6 defensive semantics must hold
row-by-row against a pure-Python model of transformation.py.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azeroth_data_platform_spark.operators.silver import silver_transform

SNAP = dt.date(2026, 3, 1)

price = st.one_of(
    st.none(),
    st.integers(min_value=0, max_value=10**12).map(str),
    st.just("garbage"),
)
auction = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=1, max_value=10**9),
        "item_id": st.one_of(st.none(), st.integers(min_value=1, max_value=10**6)),
        "unit_price": price,
        "buyout": price,
        "quantity": st.one_of(st.none(), st.integers(min_value=1, max_value=10**4).map(str)),
    }
)


def _model(a: dict) -> dict | None:
    """Pure-Python twin of the transform (transformation.py semantics)."""
    if a["item_id"] is None:
        return None

    def num(x):
        try:
            return int(x)
        except (TypeError, ValueError):
            return None

    qty = num(a["quantity"]) or 1
    up = num(a["unit_price"])
    if up is None and num(a["buyout"]) is not None:
        up = num(a["buyout"]) // qty
    return {"id": a["id"], "item_id": a["item_id"], "quantity": qty, "unit_price": up}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(auction, min_size=0, max_size=8, unique_by=lambda a: a["id"]))
def test_silver_matches_reference_model(spark, auctions):
    rows = [
        (
            a["id"],
            {"id": a["item_id"], "modifiers": None},
            a["unit_price"],
            a["buyout"],
            a["quantity"],
            "SHORT",
        )
        for a in auctions
    ]
    bronze = spark.createDataFrame(
        rows,
        "id long, item struct<id:bigint, modifiers:array<struct<type:int,value:int>>>, "
        "unit_price string, buyout string, quantity string, time_left string",
    )
    got = {r.id: r for r in silver_transform(bronze, SNAP).collect()}
    want = {m["id"]: m for m in (_model(a) for a in auctions) if m is not None}
    assert set(got) == set(want)
    for i, w in want.items():
        g = got[i]
        assert g.item_id == w["item_id"]
        assert g.quantity == w["quantity"]
        assert g.unit_price == w["unit_price"]
        assert g.snapshot_date == SNAP


# --- tokenizer parity: Spark _words() vs DuckDB WORDS_SQL vs Python ---------
#
# The round-2 verdict found empty tokens counted on trailing/double spaces;
# the fix pinned str.split-on-space semantics (split on ' ', drop empties)
# in BOTH engines. This property drives adversarial spacing through all
# three implementations and demands exact agreement.

word_chars = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=6,
)
spacey_text = st.lists(
    st.one_of(word_chars, st.sampled_from([" ", "  ", "   "])),
    min_size=0,
    max_size=12,
).map("".join)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(spacey_text, min_size=1, max_size=4))
def test_tokenizer_matches_python_split_semantics(spark, texts):
    import duckdb

    from azeroth_data_platform_spark.operators import textstats

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from pyspark.sql import functions as F

    got = {
        r.doc_id: (r.n, list(r.ws))
        for r in docs.select(
            "doc_id",
            textstats._words().alias("ws"),
            F.size(textstats._words()).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    import pandas as pd

    con.register("d", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    duck = {
        int(r[0]): (int(r[1]), list(r[2]))
        for r in con.execute(
            f"SELECT doc_id, len({textstats.WORDS_SQL}) AS n, {textstats.WORDS_SQL} AS ws FROM d"
        ).fetchall()
    }
    for i, t in enumerate(texts):
        expect = [w for w in t.split(" ") if w != ""]
        assert got[i] == (len(expect), expect), (t, got[i])
        assert duck[i] == (len(expect), expect), (t, duck[i])


# --- packing conservation property ------------------------------------------

pack_docs = st.lists(
    st.integers(min_value=1, max_value=40),  # n_tokens per doc
    min_size=1,
    max_size=10,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(pack_docs, st.integers(min_value=4, max_value=16))
def test_pack_contents_conserves_tokens_for_any_layout(spark, sizes, budget):
    """For ARBITRARY doc sizes and budgets: every token lands in exactly
    one pack, non-final packs are exactly full, and reassembled text
    matches the sampled token mass."""
    from azeroth_data_platform_spark.operators import corpus

    docs = [
        (i, " ".join(f"d{i}w{j}" for j in range(n)), "en", "web", 0)
        for i, n in enumerate(sizes)
    ]
    documents = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sampled = spark.createDataFrame(
        [(i, "hi", n, "en", i % 2) for i, n in enumerate(sizes)],
        "doc_id long, band string, n_tokens long, lang_pred string, shard long",
    )
    packs = corpus.pack_contents(sampled, documents, budget=budget).collect()
    assert sum(r.n_tokens_in_pack for r in packs) == sum(sizes)
    last = {}
    for r in packs:
        last[r.shard] = max(last.get(r.shard, -1), r.pack_id)
    for r in packs:
        assert len(r.pack_text.split()) == r.n_tokens_in_pack
        if r.pack_id < last[r.shard]:
            assert r.n_tokens_in_pack == budget


# --- Round-4 conservation properties ---------------------------------------
# BPE encoding must be a pure SEGMENTATION: concatenating each doc's tokens
# reproduces its words' characters exactly (no char created or lost by any
# merge sequence), for arbitrary texts. Line dedup must conserve the
# corpus's distinct line set: every kept line is a first occurrence, and
# the number of kept lines equals the number of distinct lines.

simple_text = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=5), min_size=1, max_size=10
).map(" ".join)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(simple_text, min_size=1, max_size=6))
def test_bpe_encode_conserves_characters(spark, texts):
    from pyspark.sql import functions as F

    from azeroth_data_platform_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )
    out = {r.doc_id: r for r in corpus.bpe_encode(docs, n_merges=3).collect()}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        assert out[i].n_words == len(words)
        total_chars = sum(len(w) for w in words)
        # avg_token_len * n_tokens == total chars (exact: both are derived
        # from integer counts)
        if out[i].n_bpe_tokens:
            assert (
                abs(out[i].avg_token_len * out[i].n_bpe_tokens - total_chars)
                < 1e-9
            )
        # tokens never exceed chars, never fewer than words
        assert len(words) <= out[i].n_bpe_tokens <= total_chars
    _ = F  # (imported for parity with sibling tests)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(simple_text, min_size=1, max_size=8))
def test_line_dedup_keeps_exactly_the_distinct_lines(spark, texts):
    from azeroth_data_platform_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )
    w = 3
    out = corpus.line_dedup(docs, w=w).collect()
    # reference model in python
    lines_by_doc = {}
    for i, t in enumerate(texts):
        ws = [x for x in t.split(" ") if x]
        lines_by_doc[i] = [
            " ".join(ws[j : j + w]) for j in range(0, len(ws), w)
        ]
    distinct = {ln for lines in lines_by_doc.values() for ln in lines}
    total_kept = sum(r.n_kept for r in out)
    assert total_kept == len(distinct)
    seen = set()
    for i in sorted(lines_by_doc):
        expect_kept = []
        for ln in lines_by_doc[i]:
            if ln not in seen:
                seen.add(ln)
                expect_kept.append(ln)
        row = next(r for r in out if r.doc_id == i)
        assert row.text_dedup == " ".join(expect_kept)
        assert row.n_lines == len(lines_by_doc[i])


def test_bigram_pplx_beats_unigram_on_self_trained_corpus(spark, sf_dir):
    """A self-trained interpolated bigram LM compresses the corpus better
    than the unigram LM on average (its ML term concentrates mass on seen
    transitions) — the signal that justifies the extra model state."""
    from azeroth_data_platform_spark import harness
    from azeroth_data_platform_spark.operators import textstats

    docs = harness._docs(spark, sf_dir)
    uni = textstats.perplexity(docs).agg({"mean_nll_bits": "avg"}).collect()[0][0]
    bi = textstats.perplexity_bigram(docs).agg({"mean_nll_bits": "avg"}).collect()[0][0]
    assert bi < uni, (bi, uni)
