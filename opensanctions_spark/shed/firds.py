"""ESMA FIRDS reference-data helpers (``zavod/zavod/shed/firds.py``):
the securities-register parse family. Behavioral re-expression on the
stdlib: ElementTree incremental parse instead of lxml iterparse, and a
driver-side ISIN Luhn check that mirrors the engine's column validator
(``functions/identifiers.py valid_isin`` — two routes, one answer).
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from tempfile import TemporaryDirectory
from typing import Any, Iterable
from xml.etree import ElementTree
from zipfile import ZipFile

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext

REGEX_DATE = re.compile(r"_(20\d{6})_")
NS = "{urn:iso:std:iso:20022:tech:xsd:auth.017.001.02}"


def is_valid_isin(isin: str) -> bool:
    """Driver port of the engine's ``valid_isin`` column (2 letters +
    9 alnum + check digit, Luhn over base-36)."""
    isin = isin.upper()
    if not re.match(r"^[A-Z]{2}[A-Z0-9]{9}\d$", isin):
        return False
    expanded = "".join(
        ch if ch.isdigit() else str(ord(ch) - 55) for ch in isin
    )
    total = 0
    for i, ch in enumerate(reversed(expanded)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def parse_element(context: CrawlerContext, file_name: str, elem: Any) -> None:
    """firds.py:18-47: one RefData element → a Security (+ its LEI
    issuer Organization when present)."""
    attr = elem.find(f"./{NS}FinInstrmGnlAttrbts")
    if attr is None:
        return
    isin = attr.findtext(f"./{NS}Id")
    if isin is None:
        context.log.warn("No ISIN", elem=str(elem))
        return
    if not is_valid_isin(isin):
        # skip OTC derivatives and other special-case securities
        return
    security = h.make_security(context, isin)
    security.add("name", attr.findtext(f"./{NS}FullNm"))
    security.add("alias", attr.findtext(f"./{NS}ShrtNm"))
    security.add("classification", attr.findtext(f"./{NS}ClssfctnTp"))
    security.add("currency", attr.findtext(f"./{NS}NtnlCcy"))
    trading = elem.find(f"./{NS}TradgVnRltdAttrbts")
    if trading is not None:
        security.add(
            "createdAt", trading.findtext(f"./{NS}AdmssnApprvlDtByIssr")
        )
    lei = elem.findtext(f"./{NS}Issr")
    if lei is not None:
        lei_id = f"lei-{lei}"
        issuer = context.make("Organization")
        issuer.id = lei_id
        issuer.add("leiCode", lei)
        context.emit(issuer, origin=file_name)
        security.add("issuer", lei_id)
    context.emit(security, origin=file_name)


def parse_xml_doc(context: CrawlerContext, file_name: str, path: str) -> None:
    """firds.py:50-55: streaming parse, elements freed as consumed —
    the multi-GB FIRDS dumps never materialize as one tree."""
    for event, elem in ElementTree.iterparse(path, events=("end",)):
        if elem.tag == f"{NS}RefData":
            parse_element(context, file_name, elem)
            elem.clear()


def parse_xml_file(context: CrawlerContext, path: Any) -> None:
    """firds.py:58-67: extract each XML member of the dump zip into a
    temp dir, parse, delete."""
    with TemporaryDirectory() as tmpdir:
        with ZipFile(path) as archive:
            for name in archive.namelist():
                if not name.endswith(".xml"):
                    continue
                tmpfile = archive.extract(name, path=tmpdir)
                context.log.info("Reading XML file", path=tmpfile)
                parse_xml_doc(context, name, tmpfile)
                os.unlink(tmpfile)


def latest_full_set(
    context: CrawlerContext, dump_urls: Iterable[tuple[str, str]]
) -> list[tuple[str, str]]:
    """firds.py:70-84: keep only the newest dated dump set."""
    date_sets: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for file_name, url in dump_urls:
        match = REGEX_DATE.search(url)
        if not match:
            context.log.warning(
                f"URL {url} does not match expected date format."
            )
            continue
        date_sets[match.group(1)].append((file_name, url))
    latest = max(date_sets.keys())
    return date_sets[latest]
