"""Beneficial Ownership Data Standard (BODS) statement parsing
(``zavod/zavod/shed/bods.py``): the register-dump format OpenOwnership
publishes. Person / entity / ownership statements map onto the FtM
graph; the scheme table is factual mapping data from the public
standard (scheme name → FtM property), so it matches the reference
entry-for-entry by necessity.
"""

from __future__ import annotations

import json
from typing import Any, BinaryIO

from opensanctions_spark.crawler import CrawlerContext

AUDIT_IGNORE = [
    "isComponent",
    "type",
    "entityType",
    "replacesStatements",
    "statementDate",
]

#: Org-Id scheme name → FtM property (None = recognized, not mapped)
SCHEME_PROPS: dict[str, str | None] = {
    "Not a valid Org-Id scheme, provided for backwards compatibility": "registrationNumber",  # noqa: E501
    "DK Centrale Virksomhedsregister": "registrationNumber",
    "Danish Central Business Register": "registrationNumber",
    "UA Edinyy Derzhavnyj Reestr": "registrationNumber",
    "United State Register": "registrationNumber",
    "Ministry of Justice Business Register": "registrationNumber",
    "SK Register Partnerov Verejného Sektora": "registrationNumber",
    "GB Persons Of Significant Control Register": None,
    "GB Persons Of Significant Control Register - Registration numbers": "registrationNumber",  # noqa: E501
    "OpenOwnership Register": "sourceUrl",
    "OpenCorporates": "opencorporatesUrl",
    "Global Legal Entity Identifier Index": "leiCode",
    "Global Legal Entity Identifier Index (2)": "leiCode",
    "Companies House": "registrationNumber",
}
#: the EITI 2013-2015 beneficial-ownership pilots all map to alias
for _cc in ("AF", "CM", "GB", "ZM", "GH", "HN", "ID", "BF", "MR", "CD",
            "TT", "TG", "TZ", "LR", "SC", "NG", "NO", "MG", "MM", "ML",
            "KG"):
    SCHEME_PROPS[f"{_cc} EITI 2013-2015 beneficial ownership pilot"] = "alias"
SCHEME_PROPS["EITI Structured Data - Côte d'Ivoire"] = "alias"


def parse_statement(context: CrawlerContext, data: dict[str, Any]) -> None:
    """bods.py:57-172: one BODS statement → one FtM proxy. Consumed keys
    pop off ``data`` so ``audit_data`` flags anything unhandled."""
    statement_type = data.pop("statementType")
    statement_id = data.pop("statementID")
    proxy_id = context.make_slug(statement_id)
    countries: set = set()

    if data.get("isComponent"):
        context.log.warn(f"Statement `{statement_id}` is component statement.")

    if statement_type == "personStatement":
        person_type = data.pop("personType")
        if person_type in ("unknownPerson", "anonymousPerson"):
            return
        assert person_type == "knownPerson", (person_type, data)
        proxy = context.make("Person")
        proxy.id = proxy_id
        proxy.add("birthDate", data.pop("birthDate", None))
        proxy.add("deathDate", data.pop("deathDate", None))
        for name in data.pop("names", []):
            proxy.add("name", name.pop("fullName"))
        for nat in data.pop("nationalities", []):
            countries.add(nat.pop("code"))
            proxy.add("nationality", nat.pop("name"))
        for country in data.pop("taxResidencies", []):
            countries.add(country.pop("code"))
        addr = data.pop("placeOfResidence", None)
        if addr is not None:
            proxy.add("address", addr.pop("address"))
            country = addr.pop("country", None)
            if country not in countries:
                countries.add(country)
                proxy.add("country", country)

    elif statement_type == "entityStatement":
        proxy = context.make("LegalEntity")
        proxy.id = proxy_id
        proxy.add("name", data.pop("name", None))
        proxy.add("alias", data.pop("alternateNames", []))
        proxy.add("incorporationDate", data.pop("foundingDate", None))
        proxy.add("dissolutionDate", data.pop("dissolutionDate", None))
        juris = data.pop("incorporatedInJurisdiction", {})
        juris_name = juris.pop("name", None)
        juris_code = juris.pop("code", juris_name)
        if len(juris):
            context.log.warn("Jurisdiction has extra data", juris=juris)
        countries.add(juris_code)
        proxy.add("jurisdiction", juris_code, original_value=juris_name)

    elif statement_type == "ownershipOrControlStatement":
        proxy = context.make("Ownership")
        proxy.id = proxy_id
        party = data.pop("interestedParty", {})
        proxy.add("owner", party.pop("describedByPersonStatement", None))
        proxy.add("owner", party.pop("describedByEntityStatement", None))
        subject = data.pop("subject", {})
        proxy.add("asset", subject.pop("describedByEntityStatement", None))
        proxy.add("date", data.pop("statementDate", None))
        for inter in data.pop("interests", []):
            proxy.add("role", inter.pop("type", None))
            proxy.add("summary", inter.pop("details", None))
            proxy.add("startDate", inter.pop("startDate", None))
            proxy.add("endDate", inter.pop("endDate", None))
    else:
        context.log.warn("Unknown statement type", statement_type=statement_type)
        return

    for addr in data.pop("addresses", []):
        proxy.add("address", addr.pop("address"))
        country = addr.pop("country", None)
        if country not in countries:
            countries.add(country)
            proxy.add("country", country)

    for ident in data.pop("identifiers", []):
        scheme = ident.pop("schemeName")
        value = ident.pop("uri", ident.pop("id", None))
        if scheme not in SCHEME_PROPS:
            context.log.warn("Unknown scheme", scheme=repr(scheme), value=value)
            continue
        if value is None:
            context.log.warn("Weird identifier", identifier=str(ident))
        prop = SCHEME_PROPS[scheme]
        if prop is not None and value is not None:
            if prop == "leiCode":
                value = value.split("/")[-1]
            proxy.add(prop, value)

    source = data.pop("source", {})
    proxy.add("publisher", source.pop("description", None))
    proxy.add("sourceUrl", source.pop("url", None))
    proxy.add("retrievedAt", source.pop("retrievedAt", None))
    publication = data.pop("publicationDetails", {})
    proxy.add("retrievedAt", publication.pop("publicationDate", None))
    publisher = publication.pop("publisher", {})
    proxy.add("publisher", publisher.pop("name", None))
    proxy.add("publisherUrl", publisher.pop("url", None))

    if statement_type in ("personStatement", "entityStatement"):
        proxy.add("country", [c for c in countries if c is not None])

    context.audit_data(data, AUDIT_IGNORE)
    context.emit(proxy)


def parse_bods_fh(context: CrawlerContext, fh: BinaryIO) -> None:
    """bods.py:175-182: JSON-lines stream of statements."""
    index = 0
    while line := fh.readline():
        parse_statement(context, json.loads(line))
        index += 1
        if index > 0 and index % 10000 == 0:
            context.log.info(f"BODS statements: {index}...")


def parse_bods_file(context: CrawlerContext, file_name: Any) -> None:
    with open(file_name, "rb") as fh:
        parse_bods_fh(context, fh)
