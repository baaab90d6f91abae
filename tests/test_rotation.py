"""Rotation-ledger invariants for the 50-slot driver head.

The external correctness harness records only the FIRST 50 keys of
harness.QUERIES each round (verified round 1). The rotation policy is
"max staleness <= 2 rounds": after the upcoming round's driver run, every
registry query's newest green driver row must be from one of the last
three rounds. That is satisfiable ONLY if every query whose newest row is
older than (latest recorded round - 1), plus every never-recorded query,
sits inside the declared 50-slot head — which this test asserts by
parsing the committed CORRECTNESS_r*.json files against the live dict
order (r9 verdict #1: the ledger had undercounted the stale set by hand;
this makes the bound mechanical, enforced before the gate can pass).

NOTE: this test is EXPECTED to fail in the window between the driver
dropping CORRECTNESS_r{N}.json (after the round-N gate has run) and the
r{N+1} head rotation landing as the first commit of the next round — it
is the forcing function that starts each round, not an engine
regression. At every gate-commit state it must be green.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_green_rows() -> tuple[dict[str, int], int]:
    newest: dict[str, int] = {}
    latest = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        latest = max(latest, rnd)
        with open(path) as fh:
            rows = json.load(fh)
        for name, rec in rows.items():
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match", True)
                and rec.get("hash_match", True)
                and not rec.get("err")
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest, latest


def test_head_covers_every_stale_query():
    from azeroth_data_platform_spark import harness

    newest, latest = _newest_green_rows()
    assert latest >= 9, "CORRECTNESS history missing"
    keys = list(harness.QUERIES)
    head = set(keys[:50])
    # stale = newest green row <= latest - 2 (would exceed 2-round
    # staleness after the upcoming run) or never recorded at all
    stale = [
        q for q in keys if newest.get(q, 0) <= latest - 2
    ]
    missing = sorted(set(stale) - head)
    assert not missing, (
        f"max-staleness<=2 is NOT satisfiable: {len(missing)} stale "
        f"queries sit outside the 50-slot head: {missing}"
    )
    # the head must never shrink below the driver's record budget
    assert len(keys) >= 50


def test_registry_oracle_bijection():
    """Every driver query has an oracle and vice versa (the weaker
    rows-only path is for legacy/streaming surfaces, never the head)."""
    from azeroth_data_platform_spark import harness

    assert set(harness.ORACLES) == set(harness.QUERIES)
