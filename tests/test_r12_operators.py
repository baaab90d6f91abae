"""Round-12 additions: mechanical recovery of an interrupted dedup-index
append (r11 verdict #5) and related invariants."""

from __future__ import annotations

import os


def _mk_batches(spark):
    unit = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    mk = lambda i, txt: (i, txt, "en", "web", len(txt))  # noqa: E731
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    batch_a = spark.createDataFrame(
        [
            mk(10, unit * 6),
            mk(20, "totally different words about spark plans here today"),
        ],
        schema,
    )
    batch_b = spark.createDataFrame(
        [
            mk(31, unit * 8),
            mk(32, "unrelated fresh content nothing shared with others at all"),
        ],
        schema,
    )
    return batch_a, batch_b


def _index_rows(spark, idx_dir):
    from azeroth_data_platform_spark.operators import dedup

    index = dedup.read_dedup_index(spark, idx_dir)
    return {
        name: sorted(map(tuple, index[name].collect()))
        for name in ("bands", "shingles", "sizes")
    }


def test_interrupted_append_is_repaired_by_one_recover_call(
    spark, tmp_path, monkeypatch
):
    """Kill the commit BETWEEN relation moves (r11 verdict #5): os.replace
    dies partway through the manifest's move list, leaving the live index
    with a partial batch. One recover_dedup_index call must roll the
    commit forward to exactly the union-from-scratch index, and a second
    call must be a no-op."""
    from azeroth_data_platform_spark.operators import dedup

    batch_a, batch_b = _mk_batches(spark)
    idx_dir = str(tmp_path / "standing_index")
    for name, df in dedup.build_dedup_index(batch_a).items():
        df.write.parquet(f"{idx_dir}/{name}")

    real_replace = os.replace
    calls = {"n": 0}

    def flaky_replace(src, dst):
        calls["n"] += 1
        # call 1 = the manifest's own temp+rename; the commit's move list
        # starts at call 2 — die after ONE live move so the failure sits
        # between relations (the window the r11 docstring left to a human)
        if calls["n"] >= 3:
            raise OSError("simulated crash mid-commit")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", flaky_replace)
    try:
        dedup.append_to_dedup_index(idx_dir, batch_b)
        raise AssertionError("append should have died mid-commit")
    except OSError:
        pass
    finally:
        monkeypatch.setattr(os, "replace", real_replace)

    staged = [d for d in os.listdir(idx_dir) if d.startswith("_staging_append_")]
    assert len(staged) == 1
    assert os.path.exists(os.path.join(idx_dir, staged[0], "_MANIFEST.json"))

    report = dedup.recover_dedup_index(idx_dir)
    assert report["rolled_forward"] == staged
    assert report["rolled_back"] == []
    assert not [
        d for d in os.listdir(idx_dir) if d.startswith("_staging_append_")
    ]

    union = dedup.build_dedup_index(batch_a.unionAll(batch_b))
    got = _index_rows(spark, idx_dir)
    for name in ("bands", "shingles", "sizes"):
        want = sorted(map(tuple, union[name].collect()))
        assert got[name] == want, name

    # recovered index serves the incremental path: resubmitting batch B
    # flags every doc against its own indexed copy (idempotence contract)
    index = dedup.read_dedup_index(spark, idx_dir)
    again = {
        (r.d_new, r.d_ref): r.jaccard
        for r in dedup.incremental_dedup_indexed(batch_b, index).collect()
    }
    assert again[(31, 31)] == 1.0 and again[(32, 32)] == 1.0

    # second recover call: nothing left to do
    assert dedup.recover_dedup_index(idx_dir) == {
        "rolled_forward": [],
        "rolled_back": [],
    }


def test_pre_commit_crash_rolls_back(spark, tmp_path):
    """A staging dir WITHOUT a manifest means the derivation phase died
    before any live mutation: recovery must drop it untouched and leave
    the live relations exactly as they were."""
    from azeroth_data_platform_spark.operators import dedup

    batch_a, _ = _mk_batches(spark)
    idx_dir = str(tmp_path / "standing_index")
    for name, df in dedup.build_dedup_index(batch_a).items():
        df.write.parquet(f"{idx_dir}/{name}")
    before = _index_rows(spark, idx_dir)

    staging = os.path.join(idx_dir, "_staging_append_dead00")
    os.makedirs(os.path.join(staging, "bands"))
    open(os.path.join(staging, "bands", "part-00000-orphan.parquet"), "w").close()

    report = dedup.recover_dedup_index(idx_dir)
    assert report == {"rolled_forward": [], "rolled_back": ["_staging_append_dead00"]}
    assert not os.path.exists(staging)
    assert _index_rows(spark, idx_dir) == before


# ---------------------------------------------------------------------------
# x_exact_quantiles / functions.ranks.exact_rank_values


def test_exact_quantiles_brute_force(spark, sf_dir):
    """The distributed two-level radix selection must agree with the
    trivial single-node recompute (sort + ceil-rank pick) on the real
    lineitem at the test SF, for every metric and percentile."""
    from azeroth_data_platform_spark.operators import adapters, profiling

    li = adapters.read_table(spark, sf_dir, "lineitem")
    got = {
        (r.metric, r.pct): r for r in profiling.exact_quantiles(li).collect()
    }
    import decimal

    def cents(x: float) -> int:
        # mirror Spark's CAST(double AS DECIMAL(28,2)): HALF_UP rounding
        # of the EXACT binary expansion, then ×100
        return int(
            decimal.Decimal(x).quantize(
                decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
            )
            * 100
        )

    rows = li.select("l_extendedprice", "l_quantity", "l_discount").collect()
    metrics = {
        "extended_cents": sorted(cents(r.l_extendedprice) for r in rows),
        "qty": sorted(int(r.l_quantity // 1) for r in rows),
        "disc_bp": sorted(int(r.l_discount * 10000 // 1) for r in rows),
    }
    for metric, s in metrics.items():
        n = len(s)
        for pct in (25, 50, 75, 90, 99):
            rank = -(-n * pct // 100)
            r = got[(metric, pct)]
            assert r.n_rows == n, (metric, pct)
            assert r.rank == rank, (metric, pct)
            assert r.value_units == s[rank - 1], (metric, pct)


def test_exact_rank_values_tie_and_negative_domains(spark):
    """Hand-built hostile domains for the shared selection helper: heavy
    ties (rank falls inside a tie run), negative values straddling the
    radix-0 bucket boundary (floor-div ordering), and a rank equal to n."""
    from azeroth_data_platform_spark.functions.ranks import exact_rank_values

    vals = [("t", v) for v in [5, 5, 5, 5, 7]] + [
        ("neg", v) for v in [-300000, -2, -1, 0, 1, 299999]
    ]
    df = spark.createDataFrame(vals, "metric string, _xu long")
    out = {
        (r.metric, r._b): (r._rank, r._q, r._n)
        for r in exact_rank_values(
            df, [(1, 1, 5), (4, 4, 5), (5, 5, 5)], radix_bits=6
        ).collect()
    }
    # ties: n=5 → ranks 1, 4, 5; values s=[5,5,5,5,7]
    assert out[("t", 1)] == (1, 5, 5)
    assert out[("t", 4)] == (4, 5, 5)
    assert out[("t", 5)] == (5, 7, 5)
    # negatives: n=6 → ranks ceil(6/5)=2, ceil(24/5)=5, 6
    s = sorted([-300000, -2, -1, 0, 1, 299999])
    assert out[("neg", 1)] == (2, s[1], 6)
    assert out[("neg", 4)] == (5, s[4], 6)
    assert out[("neg", 5)] == (6, s[5], 6)


def test_exact_rank_values_empty_input(spark):
    from azeroth_data_platform_spark.functions.ranks import exact_rank_values

    df = spark.createDataFrame([], "metric string, _xu long")
    assert exact_rank_values(df, [(1, 1, 2)]).count() == 0


def test_group_quantiles_radix_brute_force(spark, sf_dir):
    """Per-group radix quantiles equal the single-node recompute over each
    event_type's cent-quantized values (NULLs excluded)."""
    from azeroth_data_platform_spark.operators import adapters, profiling

    ev = adapters.read_table(spark, sf_dir, "events")
    got = {
        (r.event_type, r.pct): r
        for r in profiling.group_quantiles_radix(ev).collect()
    }
    import decimal
    from collections import defaultdict

    groups = defaultdict(list)
    for r in ev.select("event_type", "value").collect():
        if r.value is not None:
            groups[r.event_type].append(
                int(
                    decimal.Decimal(r.value).quantize(
                        decimal.Decimal("0.01"),
                        rounding=decimal.ROUND_HALF_UP,
                    )
                    * 100
                )
            )
    for et, xs in groups.items():
        s = sorted(xs)
        n = len(s)
        for pct in (25, 50, 75, 90, 99):
            rank = -(-n * pct // 100)
            r = got[(et, pct)]
            assert (r.n_rows, r.rank, r.value_units) == (n, rank, s[rank - 1]), (
                et,
                pct,
            )


# ---------------------------------------------------------------------------
# hypothesis property: the radix selector vs python brute force


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rank_cases = st.tuples(
    # multisets per metric: tie-heavy, negative-straddling, wide-domain
    st.lists(
        st.lists(
            st.one_of(
                st.integers(min_value=-5, max_value=5),
                st.integers(min_value=-(2**22), max_value=2**22),
            ),
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=3,
    ),
    # rank fractions (num <= den so ranks stay in [1, n])
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),
            st.integers(min_value=1, max_value=10),
        ).map(lambda t: (min(t), max(t))),
        min_size=1,
        max_size=4,
        unique=True,
    ),
    # radix width — degenerate 1-bit through wider-than-domain
    st.sampled_from([1, 3, 6, 12, 24]),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_rank_cases)
def test_exact_rank_values_property(spark, case):
    """For random multisets (ties, negatives, wide domains), random rank
    fractions, and radix widths from degenerate to wider-than-domain, the
    distributed selection equals the python sort + ceil-rank pick."""
    from azeroth_data_platform_spark.functions.ranks import exact_rank_values

    multisets, fracs_nd, radix_bits = case
    fracs = [(i + 1, num, den) for i, (num, den) in enumerate(fracs_nd)]
    rows = [
        (f"m{mi}", v) for mi, vs in enumerate(multisets) for v in vs
    ]
    df = spark.createDataFrame(rows, "metric string, _xu long")
    got = {
        (r.metric, r._b): (r._rank, r._q, r._n)
        for r in exact_rank_values(df, fracs, radix_bits=radix_bits).collect()
    }
    for mi, vs in enumerate(multisets):
        s = sorted(vs)
        n = len(s)
        for lab, num, den in fracs:
            rank = (n * num + den - 1) // den
            assert got[(f"m{mi}", lab)] == (rank, s[rank - 1], n), (
                mi,
                lab,
                radix_bits,
            )
