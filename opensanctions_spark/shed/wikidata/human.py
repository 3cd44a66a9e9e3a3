"""Person extraction from Wikidata items
(``zavod/zavod/shed/wikidata/human.py``): the filter + property mapping
the wikidata PEP crawlers run over every candidate item. Operates on
the client protocol (``client.py``); date windows re-expressed with the
engine's 365-day-year discipline like the reference's timedeltas.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Any

from opensanctions_spark.crawler import CrawlerContext, Entity
from opensanctions_spark.settings import RUN_TIME
from opensanctions_spark.shed.wikidata.country import (
    is_historical_country,
    item_countries,
)
from opensanctions_spark.shed.wikidata.model import clean_wikidata_name

#: items never emitted as persons (human.py:10)
BLOCKED_PERSONS = {"Q1045488"}

#: followthemoney registry.date.RELEVANCE_MIN: dates before this are
#: noise for sanctions-relevance purposes
RELEVANCE_MIN = "1001-01-01"


def wikidata_basic_human(
    context: CrawlerContext, client: Any, item: Any, strict: bool = False
) -> Entity | None:
    """human.py:13-88: Q5-typed, non-fictional, non-position items →
    Person with dated-life and citizenship/country derivation; strict
    mode drops the too-young, the dead, and the undated-historical."""
    if item.id in BLOCKED_PERSONS:
        return None
    types = set(item.types)
    if "Q5" not in types:
        return None
    if "Q4164871" in types:   # human that is also a position
        return None
    if "Q95074" in types:     # fictional character
        return None
    entity = context.make("Person")
    entity.id = item.id
    entity.add("wikidataId", item.id)

    too_young = (RUN_TIME - timedelta(days=365 * 18)).isoformat()
    too_old = (RUN_TIME - timedelta(days=365 * 110)).isoformat()
    is_dated = False
    is_historical = False
    for claim in item.claims:
        if claim.property == "P569":  # birth date
            date = claim.text
            if date.text is None:
                continue
            if date.text < RELEVANCE_MIN:
                return None
            if strict and date.text > too_young:
                return None
            if date.text < too_old:
                return None
            is_dated = True
            entity.add("birthDate", date.text)
        if claim.property == "P570":  # death date
            date = claim.text
            if strict and date.text is not None:
                return None
            entity.add("deathDate", date.text)
            is_dated = True
        if claim.property == "P27" and claim.qid is not None:
            if is_historical_country(client, claim.qid):
                is_historical = True
            for text in item_countries(client, claim.qid):
                text.apply(entity, "citizenship")

    if not entity.has("citizenship"):
        # increasingly desperate country linkage (human.py:70-79)
        for prop in ("P1001", "P17", "P19", "P945", "P495", "P937"):
            for claim in item.claims:
                if claim.qid is None:
                    continue
                if claim.property == prop:
                    for text in item_countries(client, claim.qid):
                        text.apply(entity, "country")
            if entity.has("country"):
                break

    if strict and (not is_dated and is_historical):
        return None
    if item.label is not None:
        item.label.apply(entity, "name", clean=clean_wikidata_name)
    return entity
