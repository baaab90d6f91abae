"""Cross-engine property test for the ER Levenshtein score (operators/er.py).

The fuzzy-match operator hash-checks against DuckDB, so the two engines'
`levenshtein()` must agree EXACTLY (unit-cost DP edit distance) — and both
must agree with an independent reference DP. Hypothesis drives random
string pairs (including unicode, empty strings, and near-duplicates)
through all three implementations.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from azeroth_data_platform_spark.operators import er


def _lev_ref(a: str, b: str) -> int:
    """Textbook unit-cost DP, the independent oracle."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ASCII only: Spark's levenshtein counts CODEPOINTS while DuckDB's counts
# BYTES, so they diverge on multi-byte UTF-8 (levenshtein('', 'á') = 1 vs 2
# — pinned below). The catalog's names are ASCII, so the x_fuzzy_match
# oracle parity is sound; any future non-ASCII source must normalize first.
_name = st.text(
    alphabet=st.sampled_from("abcdexyz 0123"), min_size=0, max_size=12
)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(_name, _name), min_size=1, max_size=8))
def test_levenshtein_cross_engine_exact(spark, pairs):
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    sdf = (
        spark.createDataFrame(rows, "i int, a string, b string")
        .select("i", F.levenshtein("a", "b").alias("lev"))
        .collect()
    )
    spark_lev = {r.i: r.lev for r in sdf}
    con = duckdb.connect()
    for i, a, b in rows:
        (duck_lev,) = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()
        assert spark_lev[i] == duck_lev == _lev_ref(a, b), (a, b)


def test_levenshtein_engines_diverge_on_multibyte_utf8(spark):
    """The KNOWN divergence the ASCII restriction above guards: DuckDB's
    levenshtein is byte-based ('á' is 2 edits from ''), Spark's is
    codepoint-based (1). If either engine changes, revisit the ASCII
    normalization note in operators/er.py."""
    (row,) = (
        spark.createDataFrame([("", "á")], "a string, b string")
        .select(F.levenshtein("a", "b").alias("lev"))
        .collect()
    )
    assert row.lev == 1
    (duck,) = duckdb.connect().execute("SELECT levenshtein('', 'á')").fetchone()
    assert duck == 2


def test_fuzzy_match_set_cross_engine(spark, tmp_path):
    """End-to-end: the matched pair SET (not just scores) is identical in
    both engines on a catalog with planted near-duplicates."""
    names = [
        "red widget", "red widget", "rad widget", "blue widget",
        "red gadget", "copper ore", "copper orb", "kopper ore",
        "a widget", "widget",
    ]
    rows = [(i, n) for i, n in enumerate(names)]
    dim = spark.createDataFrame(rows, "item_id long, name string")
    got = {
        (r.name_a, r.name_b, r.lev)
        for r in er.fuzzy_name_matches(dim).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (item_id BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = {
        (r[1], r[2], r[3])
        for r in con.execute(er.fuzzy_name_matches_sql("SELECT * FROM d")).fetchall()
    }
    assert got == want
    # within-block near-dups surface ("red gadget"/"red widget" do NOT —
    # different head-noun blocks; that recall bound is the blocking tradeoff)
    pairs = {(a, b) for a, b, _ in got}
    assert ("rad widget", "red widget") in pairs
    assert ("copper ore", "kopper ore") in pairs
    assert ("red gadget", "red widget") not in pairs
