"""Differential tests: every harness query vs its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row-count + columns +
order-insensitive values), with exact value equality — stricter than a
hash compare.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.parity import compare, duck_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check ({len(sdf)} rows)")
    ddf = duck.execute(ORACLES[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    # A1 = 2 keys + item_name/icon_url denorm + 8 measures (models.py:30-44
    # plus the gold_market_history avg_price)
    assert len(df.columns) == 12
