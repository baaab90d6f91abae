"""REST-edge helpers (SURVEY.md §2.1 S1/S2/S11) — driver-side, injectable.

The reference's ingestion edge (Blizzard API) is deliberately OUTSIDE the
engine (SURVEY.md §2.1: "engine starts at bronze files"). These helpers
reproduce its behavior with an injectable ``fetch`` callable so tests run
hermetically; production passes a real HTTP session.

  S1  auctions dump GET    /root/reference/data_pipeline/assets/bronze/ingestion.py:14-31
  S2  token cache          /root/reference/data_pipeline/utils/blizzard_auth.py:15-47
  S11 per-item dim lookup  /root/reference/data_pipeline/assets/silver/dimensions.py:29-66

Scale note (S11): the reference caps enrichment at 100 ids/run because each
is an HTTP round-trip — that stays a driver-side loop here (the id list is
collected from the J1 anti-join, bounded and tiny). If an API allowed bulk
lookup, this would become a mapInPandas over an ids DataFrame with
per-partition rate limiting.
"""

from __future__ import annotations

import datetime as dt
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

Fetch = Callable[[str], tuple[int, Any]]  # url -> (status_code, parsed_json)


@dataclass
class TokenCache:
    """S2: client-credentials token reused until 30 s before expiry."""

    fetch_token: Callable[[], tuple[str, float]]  # -> (token, expires_in_sec)
    _token: str | None = field(default=None, init=False)
    _expires_at: float = field(default=0.0, init=False)

    def get(self, now: float | None = None) -> str:
        now = time.time() if now is None else now
        if self._token is None or now >= self._expires_at - 30.0:
            token, expires_in = self.fetch_token()
            self._token = token
            self._expires_at = now + expires_in
        return self._token


def fetch_auctions_dump(fetch: Fetch, realm_id: int, day: dt.date) -> tuple[str, Any]:
    """S1: one day's dump → (bronze object key, payload). Raises on non-2xx
    like the reference (ingestion.py:27 raise_for_status)."""
    url = f"/data/wow/connected-realm/{realm_id}/auctions"
    status, payload = fetch(url)
    if not 200 <= status < 300:
        raise RuntimeError(f"auctions fetch failed: HTTP {status}")
    key = f"{day:%Y-%m-%d}/raw_auctions_{day:%Y-%m-%d}.json"
    return key, payload


DEFAULTS = {"quality": "Unknown", "item_class": "Miscellaneous", "item_subclass": "Junk"}


def enrich_items(
    fetch: Fetch,
    item_ids: list[int],
    sleep: Callable[[float], None] = time.sleep,
    now: Callable[[], dt.datetime] = dt.datetime.utcnow,
) -> list[dict[str, Any]]:
    """S11: per-id item lookups with the reference's exact branch behavior —
    200 → project fields with defaults; 404 → skip; other → back off 1 s
    and continue (dimensions.py:40-63)."""
    out: list[dict[str, Any]] = []
    for item_id in item_ids:
        status, data = fetch(f"/data/wow/item/{item_id}")
        if status == 404:
            continue
        if status != 200:
            sleep(1.0)
            continue
        out.append(
            {
                "item_id": item_id,
                "name": (data or {}).get("name", f"Item {item_id}"),
                "quality": ((data or {}).get("quality") or {}).get("name", DEFAULTS["quality"]),
                "item_class": ((data or {}).get("item_class") or {}).get(
                    "name", DEFAULTS["item_class"]
                ),
                "item_subclass": ((data or {}).get("item_subclass") or {}).get(
                    "name", DEFAULTS["item_subclass"]
                ),
                "icon_url": (data or {}).get("icon_url"),
                "last_updated": now(),
            }
        )
    return out
