"""Country derivation for Wikidata items
(``zavod/zavod/shed/wikidata/country.py``): walk P17/P27 then the
jurisdiction/part-of ladder up the administrative hierarchy until a
country is reached.

Re-expression note: the reference's base case is rigour's territory
registry (QID → ftm country). Compat derives the code from Wikidata's
OWN data instead — an item carrying an ISO 3166-1 alpha-2 claim (P297)
IS a country and contributes its code — so no static territory table is
needed; a deployment can still register rigour through the client it
wires. Cycle-guarded exactly like the reference (the seen tuple).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

from opensanctions_spark.shed.wikidata.model import WdText

#: places we refuse to derive a country from (country.py:9-19): cultural
#: and supranational regions whose P17 names every state they span
SKIP_PLACES: set[str] = {
    "Q234",        # Flanders (cultural region: BE, FR, NL)
    "Q210718",     # Asia
    "Q4412",       # West Africa
    "Q52062",      # Nordic countries
    "Q7785",       # Commonwealth of Nations
    "Q4264",       # Mercosur
    "Q18348382",   # Colony of New South Wales
    "Q2334526",    # Province of North Carolina
    "Q1070529",    # Colony of Virginia
}

#: type QIDs that mark a historical polity (country.py:30-36)
_HISTORICAL_TYPES = {
    "Q3024240",    # historical country
    "Q19953632",   # former administrative territorial entity
    "Q839954",     # archaeological site
}


@lru_cache(maxsize=5000)
def is_historical_country(client: Any, qid: str) -> bool:
    """country.py:22-37 minus the registry shortcut: type-based check."""
    item = client.fetch_item(qid)
    if item is None:
        return False
    return bool(set(item.types) & _HISTORICAL_TYPES)


def _own_country_code(item: Any) -> str | None:
    """The item's ISO 3166-1 alpha-2 (P297) — the data-driven base case."""
    for claim in item.claims:
        if claim.property == "P297" and not claim.is_ended():
            value = getattr(claim, "value", None) or claim.text.text
            if value:
                return str(value).lower()
    return None


@lru_cache(maxsize=5000)
def item_countries(client: Any, qid: str) -> set:
    """country.py:40-44: the countries an item resolves to, traversing
    jurisdiction/part-of upward."""
    return _crawl_item_countries(client, qid, (qid,))


def _crawl_item_countries(client: Any, qid: str, seen: tuple) -> set:
    """country.py:47-88: P17/P27 first; only if those yield nothing,
    the desperation ladder (jurisdiction, capital-of, part-of,
    parent org, headquarters, permit issuer) one property at a time."""
    if qid in SKIP_PLACES:
        return set()
    item = client.fetch_item(qid)
    if item is None:
        return set()
    code = _own_country_code(item)
    if code is not None:
        return {WdText(code, original=item.id)}
    next_seen = seen + (qid,)
    countries: set = set()
    for claim in item.claims:
        if claim.property in ("P17", "P27"):
            if claim.is_ended() or claim.qid is None or claim.qid in next_seen:
                continue
            countries.update(
                _crawl_item_countries(client, claim.qid, next_seen)
            )
    if countries:
        return countries
    for prop in ("P1001", "P1376", "P361", "P749", "P159", "P2389"):
        for claim in item.claims:
            if claim.property != prop:
                continue
            if claim.is_ended() or claim.qid is None or claim.qid in next_seen:
                continue
            countries.update(
                _crawl_item_countries(client, claim.qid, next_seen)
            )
            if countries:
                return countries
    return countries
