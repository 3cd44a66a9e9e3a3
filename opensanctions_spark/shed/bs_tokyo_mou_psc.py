"""Shared Port State Control (PSC) inspection-register crawler logic
(``zavod/zavod/shed/bs_tokyo_mou_psc.py``) — the Tokyo and Black Sea
MoU databases: paged POST search for ship UIDs, per-ship profile pages
parsed into Vessel / master Person / classification-society
Organization / operating Company entities tied by UnknownLink edges.

Re-expressed on the compat DOM: the reference's lxml XPath axes
(``following-sibling``, ``text()=`` predicates) become an explicit
walk (find the section heading, take the next table among its
siblings), and urllib3's Retry becomes a bounded attempt loop. Call
shapes and entity semantics are the reference's, cited per function.
"""

from __future__ import annotations

import re
from typing import Any

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


def make_search_data(page: int, search_data: dict[str, str]) -> dict[str, str]:
    """bs_tokyo_mou_psc.py:24-25."""
    return {**search_data, "Page": str(page)}


def parse_total_pages(tree: Any) -> int | None:
    """bs_tokyo_mou_psc.py:28-36: the "Found N records on M pages" line
    in the navigate list."""
    for ul in tree.iter("ul"):
        if ul.get("class") != "navigate":
            continue
        for li in ul.iter("li"):
            text = h.element_text(li) or ""
            if text.strip().startswith("Found"):
                match = re.search(r"on (\d+) page", text)
                return int(match.group(1)) if match else None
    return None


def section_table(doc: Any, heading: str) -> Any:
    """The first <table> following the <h2> with the given text — the
    compat walk for the reference's
    ``//h2[text()='...']/following-sibling::table[1]``."""
    for parent in doc.iter():
        children = list(parent)
        for i, child in enumerate(children):
            if child.tag == "h2" and (child.text or "").strip() == heading:
                for sibling in children[i + 1:]:
                    if sibling.tag == "table":
                        return sibling
    raise ValueError(f"no table after heading {heading!r}")


def emit_unknown_link(
    context: CrawlerContext,
    object: str | None,
    subject: str | None,
    role: str,
    date: str,
) -> None:
    """bs_tokyo_mou_psc.py:39-50."""
    link = context.make("UnknownLink")
    link.id = context.make_id(object, subject, role)
    if role:
        link.add("role", role)
    link.add("subject", subject)
    link.add("object", object)
    h.apply_date(link, "date", date)
    context.emit(link)


def crawl_vessel_row(
    context: CrawlerContext,
    str_row: dict[str, str | None],
    inspection_date: str,
) -> str:
    """bs_tokyo_mou_psc.py:53-100: the ship-data row → Vessel (+ master
    Person and classification-society Organization, linked)."""
    ship_name = str_row.pop("ship_name")
    imo = str_row.pop("imo_number")
    vessel = context.make("Vessel")
    vessel.id = context.make_id(ship_name, imo)
    vessel.add("name", ship_name)
    vessel.add("imoNumber", imo)
    vessel.add("type", str_row.pop("type"))
    vessel.add("callSign", str_row.pop("callsign"))
    vessel.add("mmsi", str_row.pop("mmsi"))
    vessel.add("grossRegisteredTonnage", str_row.pop("tonnage"))
    vessel.add("deadweightTonnage", str_row.pop("deadweight"))
    vessel.add("flag", str_row.pop("flag"))
    h.apply_date(vessel, "buildDate", str_row.pop("dateofkeellaid", None))
    context.emit(vessel)

    if captain := str_row.pop("name_of_ship_master", None):
        person = context.make("Person")
        person.id = context.make_id(captain, imo)
        person.add("name", captain)
        context.emit(person)
        emit_unknown_link(
            context, object=vessel.id, subject=person.id,
            role="Master", date=inspection_date,
        )
    if (
        class_soc := str_row.pop("classificationsociety", None)
    ) and class_soc.lower() != "other":
        org = context.make("Organization")
        org.id = context.make_id("org", class_soc)
        org.add("name", class_soc)
        context.emit(org)
        emit_unknown_link(
            context, object=vessel.id, subject=org.id,
            role="Classification society", date=inspection_date,
        )
    context.audit_data(str_row, ["date_keel_laid", "deadweight"])
    assert vessel.id is not None
    return vessel.id


def crawl_company_details(
    context: CrawlerContext, str_row: dict[str, str | None]
) -> str:
    """bs_tokyo_mou_psc.py:103-119."""
    company_name = str_row.pop("name")
    company_imo = str_row.pop("imo_number")
    company = context.make("Company")
    company.id = context.make_slug(company_name, company_imo)
    company.add("name", company_name)
    company.add("imoNumber", company_imo)
    company.add("mainCountry", str_row.pop("registered"))
    company.add("jurisdiction", str_row.pop("residence"))
    company.add("email", str_row.pop("email"))
    company.add("phone", str_row.pop("phone"))
    context.emit(company)
    context.audit_data(str_row, ["fax"])
    assert company.id is not None
    return company.id


def crawl_vessel_page(
    context: CrawlerContext,
    shipuid: str,
    headers: dict[str, str],
    getships_url: str,
    max_attempts: int = 4,
) -> None:
    """bs_tokyo_mou_psc.py:122-186: POST for the full ship profile; a
    body missing the expected tables evicts the cache entry and
    retries."""
    context.log.debug(f"Processing shipuid: {shipuid}")
    detail_data = {
        "MIME Type": "application/x-www-form-urlencoded",
        "UID": f"{shipuid}",
        "initiator": "insp",
    }
    for attempt in range(max_attempts):
        detail_doc = context.fetch_html(
            getships_url, data=detail_data, headers=headers,
            method="POST", cache_days=182,
        )
        try:
            inspection_table = section_table(detail_doc, "Inspection data")
            rows = list(h.parse_html_table(inspection_table))
            assert len(rows) == 1, len(rows)
            inspection_data = h.cells_to_str(rows[0])
            ship_table = section_table(detail_doc, "Ship data")
            rows = list(h.parse_html_table(ship_table))
            assert len(rows) == 1, len(rows)
            ship_data = h.cells_to_str(rows[0])
            company_data = section_table(detail_doc, "Company details")
            break
        except ValueError as err:
            context.log.info(
                "Failed to parse ship profile, retrying",
                shipuid=shipuid, err=str(err),
            )
            context.clear_url(getships_url, data=detail_data, method="POST")
            if attempt == max_attempts - 1:
                raise

    assert inspection_data["date"] is not None, "Inspection date is missing"
    vessel_id = crawl_vessel_row(context, ship_data, inspection_data["date"])
    for row in h.parse_html_table(company_data):
        str_row = h.cells_to_str(row)
        company_id = crawl_company_details(context, str_row)
        emit_unknown_link(
            context, object=vessel_id, subject=company_id,
            role="Company", date=inspection_data["date"],
        )
        context.audit_data(str_row, ["fax"])


def crawl_psc_records(
    context: CrawlerContext,
    *,
    headers: dict[str, str],
    search_data: dict[str, str],
    getinspection_url: str,
    getships_url: str,
) -> None:
    """bs_tokyo_mou_psc.py:189-220: page through the inspection search,
    one profile crawl per hidden ship UID."""
    page = 0
    total_pages = None
    while total_pages is None or page < total_pages:
        doc = context.fetch_html(
            getinspection_url,
            data=make_search_data(page, search_data),
            headers=headers,
            method="POST",
        )
        shipuids = []
        for tr in doc.iter("tr"):
            cls = tr.get("class") or ""
            if "even" in cls or "odd" in cls:
                for inp in tr.iter("input"):
                    if inp.get("type") == "hidden" and inp.get("value"):
                        shipuids.append(inp.get("value"))
        context.log.info(f"Found {len(shipuids)} shipuids on page {page}")
        if len(shipuids) < 1:
            context.log.warn("Not enough shipuids found, double check the logic.")
        for shipuid in shipuids:
            crawl_vessel_page(context, str(shipuid), headers, getships_url)
        total_pages = parse_total_pages(doc)
        assert total_pages is not None, "Failed to parse total pages"
        page += 1
