"""PEP position extraction from Wikidata items
(``zavod/zavod/shed/wikidata/position.py``): the candidate gate, topic
derivation, country attachment and occupancy construction behind the
wikidata PEP crawlers.

The type→topic tables, exclusion/allow lists, abolished cutoff and muni
country set are curated reference data reproduced verbatim (an
import-swapped crawler must gate identically); the LOGIC is re-expressed
on the compat surface. rigour's territory registry is re-expressed
data-driven: "is a country" means "carries an ISO 3166-1 alpha-2 claim"
for items (via the client) and "is a real two-letter code outside the
pseudo-countries" for code strings.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any

from opensanctions_spark import helpers as h
from opensanctions_spark.constants import ORIGIN_INFERRED
from opensanctions_spark.crawler import CrawlerContext, Entity
from opensanctions_spark.shed.trans import translate_position_name
from opensanctions_spark.shed.wikidata.client import WIKIDATA_QUERY_CACHE
from opensanctions_spark.shed.wikidata.country import (
    _own_country_code,
    is_historical_country,
    item_countries,
)
from opensanctions_spark.shed.wikidata.igo import INTL_ORGS, IntlOrg
from opensanctions_spark.shed.wikidata.model import clean_wikidata_name
from opensanctions_spark.stateful.positions import categorise, categorise_many
from opensanctions_spark.util import LangText

#: nomenklatura MULTI_LANG: Wikidata's "multiple languages" pseudo-code
MULTI_LANG = "mul"

POSITION_BASICS: set[str] = {
    "Q4164871",   # position
    "Q29645880",  # ambassador of a country
    "Q29645886",  # ambassador to a country
    "Q707492",    # military chief of staff
}

#: position.py:27-74: type → topics (curated reference data)
SUB_TYPES: dict[str, set[str]] = {
    "Q30185": {"role.pep", "gov.executive", "gov.muni"},
    "Q17279032": {"role.pep"},
    "Q109862464": {"gov.executive", "gov.muni"},
    "Q2285706": {"role.pep", "gov.head"},
    "Q48352": {"role.pep", "gov.head"},
    "Q3099723": {"role.pep", "gov.head"},
    "Q4175034": {"gov.legislative"},
    "Q486839": {"role.pep", "gov.legislative"},
    "Q83307": {"role.pep", "gov.executive"},
    "Q7330070": {"role.pep", "gov.executive"},
    "Q14212": {"gov.head", "gov.executive"},
    "Q15966511": {"role.pep", "gov.executive", "gov.state"},
    "Q132050": {"role.pep", "gov.executive"},
    "Q26204040": {"role.pep", "gov.executive"},
    "Q46403368": {"role.pep", "gov.national"},
    "Q20086425": {"role.pep", "gov.legislative"},
    "Q303329": {"role.pep", "gov.legislative"},
    "Q108290289": {"role.pep"},
    "Q16533": {"gov.judicial"},
    "Q6635529": {"role.pep", "gov.executive"},
    "Q3526627": {"role.pep", "gov.legislative", "gov.state"},
    "Q117826617": {"role.pep", "gov.judicial"},
    "Q55736868": {"role.pep", "gov.judicial", "gov.national"},
    "Q1501926": {"role.pep", "gov.judicial"},
    "Q3368517": {"role.pep", "gov.judicial"},
    "Q109607046": {"role.pep", "gov.judicial"},
    "Q107363151": {"role.pep", "gov.financial"},
    "Q1553195": {"role.pep", "pol.party"},
    "Q836971": {"pol.party"},
    "Q116182667": {"role.diplo"},
    "Q29645880": {"role.pep", "role.diplo"},
    "Q29645886": {"role.pep", "role.diplo"},
    "Q303618": {"role.diplo"},
    "Q707492": {"role.pep", "gov.national", "gov.security"},
}

#: positions dissolved before this never confer PEP status
POSITION_ABOLISHED_CUTOFF = "1990-12-26"

#: position.py:86-100: ancestries that are categorically never PEP
EXCLUDE_TYPES: set[str] = {
    "Q114962596", "Q193622", "Q60754876", "Q618779", "Q13424289",
    "Q4240305", "Q120560", "Q2977", "Q3320743", "Q42603",
    "Q11773926", "Q63187345",
}

#: allow beats exclude (cardinals; the Andorran Episcopal Co-Prince)
ALLOW_TYPES: set[str] = {
    "Q45722", "Q1729113", "Q2033341", "Q2361374", "Q19808790",
}
ALLOW_TYPES.update(SUB_TYPES.keys())

#: municipal PEPs included for these countries only
MUNI_COUNTRIES = {
    "au", "be", "br", "by", "ca", "co", "cz", "es", "fr", "gb", "gt",
    "hu", "id", "is", "it", "ke", "kr", "mx", "ni", "nl", "pl", "ro",
    "ru", "sk", "ua", "us", "ve", "za",
}

#: pseudo-country codes that say nothing about a person
_PSEUDO_COUNTRIES = {"zz", "un", "eu"}


def _is_real_country_code(code: str) -> bool:
    """rigour ``get_territory(code).is_country`` re-expressed: a real
    two-letter code outside the pseudo-countries."""
    return len(code) == 2 and code.lower() not in _PSEUDO_COUNTRIES


def _qid_is_country(client: Any, qid: str | None) -> bool:
    """rigour ``get_territory_by_qid(qid).is_country`` re-expressed:
    the item carries an ISO 3166-1 alpha-2 claim."""
    if qid is None:
        return False
    item = client.fetch_item(qid)
    return item is not None and _own_country_code(item) is not None


def wikidata_position(
    context: CrawlerContext, client: Any, item: Any
) -> Entity | None:
    """position.py:148-308: DB verdict beats heuristics, allow beats
    exclude; countries attach via direct claims, the intl-org registry,
    or the traversal; country-less and pre-cutoff-abolished positions
    drop unless a reviewer rescued them; non-English labels translate."""
    existing = categorise_many(context, [item.id])
    if len(existing) > 0 and existing[0].is_pep is False:
        return None
    db_is_pep = len(existing) > 0 and existing[0].is_pep is True

    types = set(item.types)
    if not db_is_pep and types.isdisjoint(ALLOW_TYPES):
        if types.isdisjoint(POSITION_BASICS):
            return None
        if not types.isdisjoint(EXCLUDE_TYPES):
            return None

    position = context.make("Position")
    position.id = item.id
    position.add("wikidataId", item.id)

    intl_org: IntlOrg | None = None
    for claim in item.claims:
        if claim.property in ("P2389", "P361") and claim.qid is not None:
            intl_org = INTL_ORGS.get(claim.qid)
            if intl_org is not None:
                break

    for claim in item.claims:
        if intl_org is None:
            if claim.property in ("P1001", "P17", "P27") and claim.qid is not None:
                # stale associations contribute no country but don't kill
                # the position (position.py:183-190)
                if claim.is_ended() or is_historical_country(client, claim.qid):
                    continue
                for country in item_countries(client, claim.qid):
                    country.apply(position, "country")
            if claim.property == "P1001":
                if not _qid_is_country(client, claim.qid):
                    claim.text.apply(position, "subnationalArea")
        if claim.property == "P571":
            claim.text.apply(position, "inceptionDate")
        if claim.property == "P576":
            claim.text.apply(position, "dissolutionDate")

    for claim in item.claims:
        if claim.property == "P580" and not position.has("inceptionDate"):
            claim.text.apply(position, "inceptionDate")
        if claim.property == "P582" and not position.has("dissolutionDate"):
            claim.text.apply(position, "dissolutionDate")

    if intl_org is not None:
        position.add("country", intl_org.country)
    if not position.has("country"):
        for country in item_countries(client, item.id):
            country.apply(position, "country")
    if not position.has("country") and not db_is_pep:
        return None

    end_date = max(position.get("dissolutionDate"), default=None)
    if (
        end_date is not None
        and end_date < POSITION_ABOLISHED_CUTOFF
        and not db_is_pep
    ):
        return None

    if item.label is not None and item.label.text is not None:
        if item.label.lang in ("eng", MULTI_LANG, None):
            item.label.apply(position, "name", clean=clean_wikidata_name)
        else:
            clean_label = clean_wikidata_name(item.label.text)
            if clean_label and clean_label.strip():
                result = translate_position_name(
                    context,
                    LangText(text=item.label.text, lang=item.label.lang),
                )
                translated = result.get_preferred_language()
                if translated is None:
                    item.label.apply(position, "name", clean=clean_wikidata_name)
                else:
                    position.add(
                        "name",
                        translated.text,
                        lang=translated.lang,
                        original_value=item.label.text,
                        origin=result.origin,
                    )

    topics: set[str] = set()
    for sub_type, type_topics in SUB_TYPES.items():
        if sub_type in types:
            topics.update(type_topics)
    if intl_org is not None:
        topics.update(intl_org.topics)

    is_pep: bool | None = "role.pep" in topics
    if intl_org is not None and is_pep is False:
        # registry membership vouches for the org; a human vouches for
        # the position (review as undecided, never auto-rejected)
        is_pep = None
    topics.discard("role.pep")
    if "gov.state" in topics:
        topics.discard("gov.muni")
    if "gov.national" in topics:
        topics.discard("gov.state")
    if "gov.igo" in topics:
        topics.discard("gov.national")
    if "gov.muni" in topics:
        topics.discard("gov.head")

    position.set("topics", sorted(topics))
    categorisation = categorise(context, position, default_is_pep=is_pep)
    if not categorisation.is_pep:
        return None
    real_topics = set(categorisation.topics)
    real_topics.discard("role.pep")
    if "gov.muni" in real_topics:
        real_topics.discard("gov.head")
        if MUNI_COUNTRIES.isdisjoint(
            v.lower() for v in position.get("country")
        ):
            return None
    position.set("topics", sorted(real_topics))
    return position


def position_holders(client: Any, item: Any) -> dict[str, datetime | None]:
    """position.py:311-344: inverted P39 lookup (SPARQL through the
    client) merged with the item's own P1308 officeholder claims; the
    modified timestamp drives person-cache invalidation."""
    query = f"""
    SELECT ?person ?modifiedAt WHERE {{
        ?person wdt:P39 wd:{item.id} .
        ?person wdt:P31 wd:Q5 .
        ?person schema:dateModified ?modifiedAt .
    }}
    """
    holders: dict[str, datetime | None] = {}
    response = client.query(query, cache_days=WIKIDATA_QUERY_CACHE)
    for result in response.results:
        person_qid = result.plain("person")
        modified_at = result.plain("modifiedAt")
        if person_qid is not None:
            ts = None
            if modified_at:
                try:
                    ts = datetime.fromisoformat(
                        str(modified_at).replace("Z", "+00:00")
                    )
                except ValueError:
                    ts = None
            holders[person_qid] = ts
    for claim in item.claims:
        if claim.property == "P1308" and claim.qid is not None:
            holders.setdefault(claim.qid, None)
    return holders


def wikidata_occupancy(
    context: CrawlerContext, person: Entity, position: Entity, claim: Any
) -> Entity | None:
    """position.py:347-408: Occupancy from a P39 claim's qualifiers
    (earliest start, latest end), holder country inference from the
    position (diplomatic posts and pseudo-countries excluded),
    reference URLs and electoral district carried over."""
    start_date: str | None = None
    for qual in claim.get_qualifier("P580"):
        qual_date = qual.text.text
        if qual_date is not None:
            start_date = qual_date if start_date is None else min(
                start_date, qual_date
            )
    end_date: str | None = None
    for qual in claim.get_qualifier("P582"):
        qual_date = qual.text.text
        if qual_date is not None:
            end_date = qual_date if end_date is None else max(
                end_date, qual_date
            )

    occupancy = h.make_occupancy(
        context,
        person,
        position,
        no_end_implies_current=False,
        start_date=start_date,
        end_date=end_date,
        key_prefix="wd_peps",
    )
    if occupancy is None:
        return None

    if "role.diplo" not in position.get("topics"):
        for country in position.get("country"):
            if not _is_real_country_code(country):
                continue
            if country not in person.get("country") and country not in (
                person.get("nationality")
            ):
                person.add("country", country, origin=ORIGIN_INFERRED)

    for ref in claim.references:
        for snak in ref.get("P854"):
            if snak.text is not None and snak.text.text is not None:
                snak.text.apply(occupancy, "sourceUrl")
    for qual in claim.get_qualifier("P768"):
        if qual.text is not None and qual.text.text is not None:
            qual.text.apply(occupancy, "constituency")
    return occupancy
