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
