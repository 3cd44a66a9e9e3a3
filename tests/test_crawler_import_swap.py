"""One REAL reference crawler run end-to-end through the compat layer
(VERDICT r5 #8): the crawl body below is the exact shape of
``datasets/us/irs_ffi/crawler.py`` — a production CSV sanctions-adjacent
list — with only the import swapped (``zavod`` →
``opensanctions_spark.crawler``/``helpers``), proving the import-swap
story on non-fixture crawler code. The source CSV is a synthesized
fixture in the FFI list's column shape (GIIN/FINm/CountryNm); the run
then goes statements → archive → assemble → export and asserts counts
and artifacts like ``zavod/zavod/tests/exporters/test_exporters.py:70-110``.
"""

from __future__ import annotations

import csv
import json
import os
from types import SimpleNamespace

import pytest

from opensanctions_spark.crawler import CrawlerContext, crawl
from opensanctions_spark.plans import DatasetConfig, run_dataset
from opensanctions_spark.sources.archive import StatementArchive

CSV_MIME = "text/csv"  # rigour.mime.types.CSV


# -- the reference crawler, import-swapped --------------------------------
# verbatim logic of datasets/us/irs_ffi/crawler.py (11 lines of body):
# fetch → export_resource → DictReader → make/make_id/add×4 → emit.
def crawl_ffi(context: CrawlerContext) -> None:
    path = context.fetch_resource("source.csv", context.data_url)
    context.export_resource(path, CSV_MIME, title=context.SOURCE_TITLE)
    with open(path) as fh:
        for row in csv.DictReader(fh):
            giin = row.pop("GIIN")
            name = row.pop("FINm")
            country = row.pop("CountryNm")
            entity = context.make("Company")
            entity.id = context.make_id(giin, name, country)
            entity.add("name", name)
            entity.add("country", country)
            entity.add("giiNumber", giin)
            entity.add("topics", "fin")
            context.emit(entity)


FIXTURE_ROWS = [
    # (GIIN, FINm, CountryNm) — synthesized, FFI-list column shape
    ("98Q96B.00000.LE.250", "Alpha Bank International", "Austria"),
    ("8T3NQ0.00001.ME.276", "Beta Capital Partners", "Germany"),
    ("M7K2LP.00002.BR.036", "Gamma Trust Co", "Australia"),
    ("M7K2LP.00002.BR.036", "Gamma Trust Co", "Australia"),  # dup row
    ("ZZ9XW1.00004.SL.392", "Delta Holdings KK", "Japan"),
    ("Q1A2B3.00005.LE.756", "Epsilon Finanz AG", "Switzerland"),
]


@pytest.fixture()
def ffi_csv(tmp_path):
    path = tmp_path / "FFIListFull.csv"
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["GIIN", "FINm", "CountryNm"])
        w.writerows(FIXTURE_ROWS)
    return str(path)


def test_irs_ffi_crawler_import_swap_e2e(spark, ffi_csv, tmp_path):
    config = SimpleNamespace(
        name="us_irs_ffi",
        metadata={"data": {"url": ffi_csv}},
        lookups={},
    )
    statements, ctx = crawl(
        spark, config, crawl_ffi, work_dir=str(tmp_path / "work"),
        run_time="2026-08-15T00:00:00",
    )
    # the crawler fetched + registered the source document
    assert ctx.resources and ctx.resources[0]["name"] == "source.csv"
    assert os.path.exists(ctx.resources[0]["path"])

    # duplicate source row → same deterministic id → one entity; the dup
    # statements collapse in assembly (distinct values per prop)
    out_dir = str(tmp_path / "out")
    archive = StatementArchive(spark, str(tmp_path / "archive"))
    result = run_dataset(
        spark, statements, DatasetConfig(name="us_irs_ffi"), archive,
        out_dir=out_dir, run_time="2026-08-15T00:00:00",
        version="20260815-000000",
    )
    assert result.entity_count == 5
    assert result.schema_counts == {"Company": 5}
    assert result.target_count == 0  # 'fin' is not a RISK topic

    # exported artifacts parse and carry the crawled names (the
    # reference's test_export assertions, compat rendering)
    assert result.export_counts["entities.ftm.json"] == 5

    def read_artifact(name: str) -> list[str]:
        # Spark text sinks are part-file directories; post-publish
        # single-file copies are plain files — accept both
        path = os.path.join(out_dir, name)
        if os.path.isfile(path):
            return open(path).read().splitlines()
        lines: list[str] = []
        for part in sorted(os.listdir(path)):
            if part.startswith(("part-", "0")):
                lines += open(os.path.join(path, part)).read().splitlines()
        return lines

    names = read_artifact("names.txt")
    assert "Alpha Bank International" in names
    assert "Gamma Trust Co" in names
    assert len(names) == 5

    with open(os.path.join(out_dir, "index.json")) as fh:
        index = json.load(fh)
    assert index["name"] == "us_irs_ffi"
    assert index["entity_count"] == 5

    senzing = [json.loads(line) for line in read_artifact("senzing.json")]
    assert len(senzing) == 5
    assert {e["RECORD_TYPE"] for e in senzing} == {"ORGANIZATION"}  # Company maps to ORGANIZATION

    # two-route id parity: the compat crawler's ids match the engine's
    # column-side make_id on the same parts (the import-swap guarantee)
    giin, name, country = FIXTURE_ROWS[0]
    expected = (
        "osp-"
        + __import__("hashlib")
        .md5("|".join(["us_irs_ffi", giin, name, country]).encode())
        .hexdigest()
    )
    got = [
        r["canonical_id"]
        for r in statements.select("canonical_id").distinct().collect()
    ]
    assert expected in got


# -- the eu/fsf reference crawler, import-swapped ---------------------------
# VERBATIM body of datasets/eu/fsf/crawler.py (the round-6 shed family's
# first non-fixture consumer): fetch → export_resource → parse_resource_xml
# → remove_namespace → parse_entry per sanctionEntity → assert_all_accepted.
# Only the import homes are swapped (zavod → opensanctions_spark).
from opensanctions_spark import helpers as h  # noqa: E402
from opensanctions_spark.shed.fsf import parse_entry  # noqa: E402
from opensanctions_spark.stateful.review import assert_all_accepted  # noqa: E402


def crawl_fsf(context: CrawlerContext) -> None:
    path = context.fetch_resource("source.xml", context.data_url)
    context.export_resource(path, "text/xml", title=context.SOURCE_TITLE)
    doc = context.parse_resource_xml(path)
    doc_ = h.remove_namespace(doc)
    for entry in doc_.findall(".//sanctionEntity"):
        parse_entry(context, entry)

    assert_all_accepted(context, raise_on_unaccepted=False)


FSF_EXPORT_XML = """<?xml version="1.0" encoding="UTF-8"?>
<export xmlns="http://eu.europa.eu/fpi/fsd/export" generationDate="2026-08-15">
<sanctionEntity euReferenceNumber="EU.100.1" designationDate="2014-07-31">
  <subjectType code="person"/>
  <regulation programme="UKR" numberTitle="269/2014 (OJ L78)"
              entryIntoForceDate="2014-03-17" publicationDate="2014-03-21">
    <publicationUrl>https://eur-lex.example/reg269</publicationUrl>
  </regulation>
  <nameAlias wholeName="Anna Test" firstName="Anna" lastName="Test"
             strong="true" nameLanguage="en" gender="female"/>
  <nameAlias wholeName="Anna Test a.k.a. Ann T" strong="true"
             nameLanguage="en"/>
  <nameAlias wholeName="Annie T" strong="false" nameLanguage="en"/>
  <birthdate year="1970" month="1" day="5" countryIso2Code="RU"
             countryDescription="Russia"/>
  <citizenship countryIso2Code="RU" countryDescription="Russia"/>
</sanctionEntity>
<sanctionEntity euReferenceNumber="EU.200.2" designationDate="2022-02-25">
  <subjectType code="enterprise"/>
  <regulation programme="RUS" numberTitle="2022/336 (OJ L58)"
              entryIntoForceDate="2022-02-28" publicationDate="2022-03-01">
    <publicationUrl>https://eur-lex.example/reg336</publicationUrl>
  </regulation>
  <nameAlias wholeName="Test Corp" strong="true" nameLanguage="en"/>
</sanctionEntity>
<sanctionEntity euReferenceNumber="EU.300.3">
  <subjectType code="vessel"/>
  <nameAlias wholeName="MV Ghost" strong="true"/>
</sanctionEntity>
</export>"""


@pytest.fixture()
def fsf_xml(tmp_path):
    path = tmp_path / "source_fsf.xml"
    path.write_text(FSF_EXPORT_XML)
    return str(path)


def _fsf_lookups():
    from opensanctions_spark.functions.lookups import Lookup, LookupOption

    return {
        "subject_type": Lookup("subject_type", [
            LookupOption(match=["person"], result={"value": "Person"}),
            LookupOption(match=["enterprise"],
                         result={"value": "Organization"}),
        ]),
        "identification_type": Lookup("identification_type", []),
        "contact_info": Lookup("contact_info", []),
        "sanction.program": Lookup("sanction.program", [
            LookupOption(match=["UKR"], result={"value": "EU-UKR"}),
            LookupOption(match=["RUS"], result={"value": "EU-RUS"}),
        ]),
    }


def test_eu_fsf_crawler_import_swap_e2e(spark, fsf_xml, tmp_path):
    """Runs the VERBATIM datasets/eu/fsf/crawler.py body over an FSF-shaped
    namespaced XML export, then the full dataset plan — the second real
    reference crawler through the compat layer (VERDICT r6 task 2)."""
    config = SimpleNamespace(
        name="eu_fsf",
        metadata={"data": {"url": fsf_xml}},
        lookups=_fsf_lookups(),
    )
    statements, ctx = crawl(
        spark, config, crawl_fsf, work_dir=str(tmp_path / "work"),
        run_time="2026-08-15T00:00:00",
    )
    # source doc fetched + registered (export_resource)
    assert ctx.resources and ctx.resources[0]["name"] == "source.xml"
    assert os.path.exists(ctx.resources[0]["path"])
    # the unknown subject type (vessel) was skipped with a warning
    assert any("Unknown subject type" in i["message"] for i in ctx.issues)
    # assert_all_accepted(raise_on_unaccepted=False): the weak-name review
    # is posted but unaccepted → the warning path, not an abort
    assert any("unaccepted" in i["message"] for i in ctx.issues)

    rows = {}
    for r in statements.collect():
        rows.setdefault((r["entity_id"], r["prop"]), []).append(r["value"])
    person = "eu-fsf-eu-100-1"
    org = "eu-fsf-eu-200-2"
    # the a.k.a. string is IRREGULAR → review posted, unaccepted → the
    # ORIGINAL categorisation applies (both strong names stay on "name")
    assert sorted(rows[(person, "name")]) == [
        "Anna Test", "Anna Test a.k.a. Ann T",
    ]
    assert rows[(person, "weakAlias")] == ["Annie T"]
    assert rows[(person, "firstName")] == ["Anna"]
    assert rows[(person, "gender")] == ["female"]
    assert "1970-01-05" in rows[(person, "birthDate")]
    assert rows[(person, "nationality")] == ["ru"]
    assert rows[(org, "name")] == ["Test Corp"]
    # the vessel entry emitted nothing
    assert not any(e.startswith("eu-fsf-eu-300") for (e, _p) in rows)
    # sanctions: one per regulation, start = earliest of designation/EIF
    sanction_starts = {
        e: v for (e, p), v in rows.items() if p == "startDate"
    }
    assert len(sanction_starts) == 2
    assert sorted(sum(sanction_starts.values(), [])) == [
        "2014-03-17", "2022-02-25",
    ]

    # full dataset plan over the crawl output
    out_dir = str(tmp_path / "out")
    archive = StatementArchive(spark, str(tmp_path / "archive"))
    result = run_dataset(
        spark, statements, DatasetConfig(name="eu_fsf"), archive,
        out_dir=out_dir, run_time="2026-08-15T00:00:00",
        version="20260815-000000",
    )
    assert result.schema_counts.get("Person") == 1
    assert result.schema_counts.get("Organization") == 1
    assert result.schema_counts.get("Sanction") == 2
    assert result.target_count == 2  # 'sanction' IS a risk topic
    with open(os.path.join(out_dir, "index.json")) as fh:
        index = json.load(fh)
    assert index["name"] == "eu_fsf"


# -- the eu/travel_bans reference crawler, import-swapped -------------------
# VERBATIM body of datasets/eu/travel_bans/crawler.py: fetch_json over the
# file-manifest API → per-file fetch_resource over HTTP (exercises the
# register_http_fetcher seam) → parse_entry, with subjectType-less entries
# routed through salvage_entity (name split + parse_sanctions keyed by
# numberTitle). Only the import homes are swapped.
from opensanctions_spark.shed.fsf import parse_sanctions  # noqa: E402
from opensanctions_spark.util import Element, ElementOrTree  # noqa: E402

TB_URL = "https://www.sanctionsmap.eu/api/v1/travelbans/file/%s"


def salvage_entity(context: CrawlerContext, entry: Element) -> None:
    texts = [t.text for t in entry.findall("./remark")]
    assert len(texts) == 2, texts
    name, details = texts
    assert name is not None
    name = name.split("(", 1)[0]
    entity = context.make("LegalEntity")
    entity.id = context.make_id(name)
    entity.add("name", name)
    entity.add("notes", details)
    entity.add("topics", "sanction")
    parse_sanctions(context, entity, entry, program_attrib="numberTitle")
    context.emit(entity)


def crawl_travel_bans(context: CrawlerContext) -> None:
    data = context.fetch_json(context.data_url)
    for ban in data.get("data", {}).get("travelBansFiles"):
        if not ban.get("fileName").endswith(".xml"):
            continue
        data_url = TB_URL % ban.get("id")
        path = context.fetch_resource("source.xml", data_url)
        context.export_resource(path, "text/xml", title=context.SOURCE_TITLE)
        doc: ElementOrTree = context.parse_resource_xml(path)
        doc = h.remove_namespace(doc)
        for entry in doc.findall(".//sanctionEntity"):
            subject_type = entry.find("./subjectType")
            if subject_type is None:
                salvage_entity(context, entry)
                continue
            parse_entry(context, entry)

    assert_all_accepted(context, raise_on_unaccepted=False)


TB_XML = """<?xml version="1.0" encoding="UTF-8"?>
<export xmlns="http://eu.europa.eu/fpi/fsd/export">
<sanctionEntity euReferenceNumber="EU.400.4" designationDate="2023-01-01">
  <subjectType code="person"/>
  <regulation numberTitle="2023/111 (OJ L1)" entryIntoForceDate="2023-01-05"
              publicationDate="2023-01-06">
    <publicationUrl>https://eur-lex.example/reg111</publicationUrl>
  </regulation>
  <nameAlias wholeName="Boris Banned" firstName="Boris" lastName="Banned"
             strong="true" nameLanguage="en"/>
</sanctionEntity>
<sanctionEntity designationDate="2023-02-01">
  <remark>Shadow Shipping Ltd (aka SS Ltd)</remark>
  <remark>Entity listed only in the national annex</remark>
  <regulation numberTitle="2023/222 (OJ L2)" entryIntoForceDate="2023-02-05">
    <publicationUrl>https://eur-lex.example/reg222</publicationUrl>
  </regulation>
</sanctionEntity>
</export>"""


def test_eu_travel_bans_crawler_import_swap_e2e(spark, tmp_path):
    """VERBATIM datasets/eu/travel_bans/crawler.py body: manifest JSON →
    HTTP fetch through the registered fetcher seam → parse_entry +
    salvage_entity (subjectType-less entries, crawler.py:10-22)."""
    import json as _json

    from opensanctions_spark.crawler import register_http_fetcher

    manifest = tmp_path / "manifest.json"
    manifest.write_text(_json.dumps({
        "data": {"travelBansFiles": [
            {"id": 7, "fileName": "travelBans.xml"},
            {"id": 8, "fileName": "readme.txt"},   # non-xml: skipped
        ]}
    }))

    fetched_urls: list[str] = []

    def fake_http(url: str, **kw) -> bytes:
        fetched_urls.append(url)
        assert url == TB_URL % 7
        return TB_XML.encode()

    register_http_fetcher(fake_http)
    try:
        config = SimpleNamespace(
            name="eu_travel_bans",
            metadata={"data": {"url": str(manifest)}},
            lookups=_fsf_lookups(),
        )
        statements, ctx = crawl(
            spark, config, crawl_travel_bans,
            work_dir=str(tmp_path / "work"),
            run_time="2026-08-15T00:00:00",
        )
    finally:
        register_http_fetcher(None)

    # only the .xml manifest entry was fetched, through the http seam
    assert fetched_urls == [TB_URL % 7]

    rows = {}
    for r in statements.collect():
        rows.setdefault((r["entity_id"], r["prop"]), []).append(r["value"])
    person = "eu-fsf-eu-400-4"  # parse_entry's slug prefix is fixed
    assert rows[(person, "name")] == ["Boris Banned"]
    assert rows[(person, "topics")] == ["sanction"]

    # the salvage path: name truncated at '(' (whitespace stripped by the
    # P5 emit guard), notes + sanction via the numberTitle program attr
    salvaged = [
        e for (e, p), v in rows.items()
        if p == "name" and v == ["Shadow Shipping Ltd"]
    ]
    assert len(salvaged) == 1
    sid = salvaged[0]
    assert rows[(sid, "notes")] == ["Entity listed only in the national annex"]
    # its sanction: start = earliest of designation / entry-into-force
    s_ids = [e for (e, p), v in rows.items()
             if p == "reason" and v == ["2023/222 (OJ L2)"]]
    assert len(s_ids) == 1
    assert rows[(s_ids[0], "startDate")] == ["2023-02-01"]


# -- the gb/fca_firds reference crawler, import-swapped ---------------------
# VERBATIM body of datasets/gb/fca_firds/crawler.py: paginated fetch_json
# over the FCA search API → latest_full_set → per-file fetch_resource →
# shed.firds.parse_xml_file (zip of ISO-20022 instrument dumps). Only the
# import homes are swapped.
from urllib.parse import urlencode  # noqa: E402
from datetime import datetime, timedelta  # noqa: E402
from collections.abc import Iterator  # noqa: E402

from opensanctions_spark.shed.firds import (  # noqa: E402
    latest_full_set,
    parse_xml_file,
)


def get_recent_full_dump_urls(context: CrawlerContext) -> "Iterator[tuple[str, str]]":
    from_date = (datetime.now() - timedelta(days=30)).isoformat()[:10]
    to_date = datetime.now().isoformat()[:10]
    params = {
        "q": f"file_type:FULINS AND publication_date:[{from_date} TO {to_date}]",
        "from": 0,
        "size": 100,
        "pretty": "true",
        "sort": "file_name:asc",
    }
    offset: int = 0
    total: "int | None" = None
    while total is None or offset <= total:
        params["from"] = offset
        url = f"{context.data_url}?{urlencode(params)}"
        data = context.fetch_json(url)
        total = data["hits"]["total"]
        for hit in data["hits"]["hits"]:
            src = hit["_source"]
            yield src["file_name"], src["download_link"]

        offset += 100


def crawl_fca_firds(context: CrawlerContext) -> None:
    for file_name, url in latest_full_set(
        context, get_recent_full_dump_urls(context)
    ):
        context.log.info(f"Fetching {file_name}", url=url)
        path = context.fetch_resource(file_name, url)
        parse_xml_file(context, path)


_FIRDS_NS = "urn:iso:std:iso:20022:tech:xsd:auth.017.001.02"


def _firds_zip_bytes(isin, name, issuer_lei) -> bytes:
    import io
    import zipfile

    xml = f"""<?xml version="1.0"?>
<Doc xmlns="{_FIRDS_NS}">
  <RefData>
    <FinInstrmGnlAttrbts>
      <Id>{isin}</Id>
      <FullNm>{name}</FullNm>
      <NtnlCcy>GBP</NtnlCcy>
    </FinInstrmGnlAttrbts>
    <Issr>{issuer_lei}</Issr>
  </RefData>
</Doc>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("instruments.xml", xml)
    return buf.getvalue()


def test_gb_fca_firds_crawler_import_swap_e2e(spark, tmp_path):
    """VERBATIM datasets/gb/fca_firds/crawler.py body: two API pages
    (pagination loop), a stale dump filtered by latest_full_set, two
    latest-set zips parsed into securities + issuers."""
    import json as _json

    from opensanctions_spark.crawler import register_http_fetcher

    api = "https://api.data.fca.example/fca_data_firds_files"
    files = {
        "FULINS_E_20260810_01of02.zip": _firds_zip_bytes(
            "GB0002634946", "BAE Systems", "8SVCSVGJIVUVD2NG1Q67"
        ),
        "FULINS_E_20260810_02of02.zip": _firds_zip_bytes(
            "GB00B03MLX29", "Shell plc", "21380068P1DRHMJ8KU70"
        ),
        # an older publication that latest_full_set must drop
        "FULINS_E_20260701_01of01.zip": _firds_zip_bytes(
            "GB00OLD00000", "Stale Co", "STALESTALESTALE00000"
        ),
    }

    def page(hits, total):
        return _json.dumps({
            "hits": {
                "total": total,
                "hits": [
                    {"_source": {
                        "file_name": n,
                        "download_link": f"https://dl.example/{n}",
                    }}
                    for n in hits
                ],
            }
        })

    names = sorted(files)  # file_name:asc, like the API sort param

    def fake_http(url: str, **kw) -> bytes:
        if url.startswith(api):
            frm = int(url.split("from=")[1].split("&")[0])
            # two pages: total 101 forces the second fetch (offset 100)
            if frm == 0:
                return page(names, 101).encode()
            return page([], 101).encode()
        name = url.rsplit("/", 1)[1]
        return files[name]

    register_http_fetcher(fake_http)
    try:
        config = SimpleNamespace(
            name="gb_fca_firds",
            metadata={"data": {"url": api}},
            lookups={},
        )
        statements, ctx = crawl(
            spark, config, crawl_fca_firds,
            work_dir=str(tmp_path / "work"),
            run_time="2026-08-15T00:00:00",
        )
    finally:
        register_http_fetcher(None)

    rows = {}
    for r in statements.collect():
        rows.setdefault((r["entity_id"], r["prop"]), []).append(r["value"])
    # both latest-set files parsed: securities keyed by ISIN, issuer by LEI
    assert rows[("isin-GB0002634946", "name")] == ["BAE Systems"]
    assert rows[("isin-GB00B03MLX29", "name")] == ["Shell plc"]
    assert rows[("isin-GB0002634946", "issuer")] == [
        "lei-8SVCSVGJIVUVD2NG1Q67"
    ]
    assert rows[("lei-21380068P1DRHMJ8KU70", "leiCode")] == [
        "21380068P1DRHMJ8KU70"
    ]
    # the stale publication never parsed
    assert not any("OLD" in e for (e, _p) in rows)


def test_fetch_resource_requires_registered_fetcher_for_http(spark, tmp_path):
    ctx = CrawlerContext(
        spark,
        SimpleNamespace(name="x", metadata={}, lookups={}),
        work_dir=str(tmp_path),
    )
    with pytest.raises(NotImplementedError, match="register_http_fetcher"):
        ctx.fetch_resource("f.csv", "https://example.com/data.csv")


def test_fetch_resource_file_url(spark, tmp_path):
    src = tmp_path / "in.txt"
    src.write_text("payload")
    ctx = CrawlerContext(
        spark,
        SimpleNamespace(name="x", metadata={}, lookups={}),
        work_dir=str(tmp_path / "work"),
    )
    dest = ctx.fetch_resource("in.txt", f"file://{src}")
    assert open(dest).read() == "payload"


# -- the FIFTH verbatim reference crawler: datasets/dk/cvr/crawler.py -------
# (VERDICT r8 task 4): the exact 19-line body — TemporaryDirectory →
# fetch_resource zip → extract each .json member → parse_bods_fh — with
# only the import homes swapped (zavod → opensanctions_spark.crawler,
# zavod.shed.bods → opensanctions_spark.shed.bods).


def crawl_cvr(context: CrawlerContext) -> None:
    import zipfile
    from tempfile import TemporaryDirectory

    from opensanctions_spark.shed.bods import parse_bods_fh

    with TemporaryDirectory() as tmpdir:
        fn = context.fetch_resource("source.zip", context.data_url)
        with zipfile.ZipFile(fn, "r") as zf:
            for name in zf.namelist():
                if not name.endswith(".json"):
                    continue
                tmpfile = zf.extract(name, path=tmpdir)
                with open(tmpfile, "rb") as fh:
                    parse_bods_fh(context, fh)
                os.unlink(tmpfile)


@pytest.fixture()
def cvr_zip(tmp_path):
    """A CVR-shaped BODS export: two JSON-lines members plus a non-JSON
    member the crawler must skip."""
    import zipfile

    person = {
        "statementType": "personStatement",
        "statementID": "p-1",
        "isComponent": False,
        "personType": "knownPerson",
        "names": [{"type": "individual", "fullName": "Jane Owner"}],
        "nationalities": [{"code": "dk", "name": "Denmark"}],
    }
    entity = {
        "statementType": "entityStatement",
        "statementID": "e-1",
        "isComponent": False,
        "name": "Acme ApS",
        "incorporatedInJurisdiction": {"code": "dk", "name": "Denmark"},
    }
    own = {
        "statementType": "ownershipOrControlStatement",
        "statementID": "o-1",
        "isComponent": False,
        "statementDate": "2020-01-01",
        "interestedParty": {"describedByPersonStatement": "p-1"},
        "subject": {"describedByEntityStatement": "e-1"},
        "interests": [{"type": "shareholding", "startDate": "2019-01-01"}],
    }
    path = tmp_path / "cvr.zip"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("part-0001.json", json.dumps(person) + "\n" + json.dumps(entity) + "\n")
        zf.writestr("part-0002.json", json.dumps(own) + "\n")
        zf.writestr("README.txt", "not bods")
    return str(path)


def test_dk_cvr_crawler_import_swap_e2e(spark, cvr_zip, tmp_path):
    config = SimpleNamespace(
        name="dk_cvr",
        metadata={"data": {"url": cvr_zip}},
        lookups={},
    )
    statements, ctx = crawl(
        spark, config, crawl_cvr, work_dir=str(tmp_path / "work"),
        run_time="2026-08-15T00:00:00",
    )
    rows = {}
    for r in statements.collect():
        rows.setdefault((r["entity_id"], r["prop"]), []).append(r["value"])

    # entity counts: person + entity + ownership edge, nothing from the
    # non-JSON member
    entity_ids = {e for (e, _p) in rows}
    assert entity_ids == {"dk_cvr-p-1", "dk_cvr-e-1", "dk_cvr-o-1"}
    schemas = dict(
        statements.select("entity_id", "schema").distinct().collect()
    )
    # entityStatement → LegalEntity (reference bods.py:93-95)
    assert schemas == {
        "dk_cvr-p-1": "Person",
        "dk_cvr-e-1": "LegalEntity",
        "dk_cvr-o-1": "Ownership",
    }
    assert rows[("dk_cvr-p-1", "name")] == ["Jane Owner"]
    assert rows[("dk_cvr-e-1", "jurisdiction")] == ["dk"]
    # the edge keeps RAW statement ids (resolution is integration-time)
    assert rows[("dk_cvr-o-1", "owner")] == ["p-1"]
    assert rows[("dk_cvr-o-1", "asset")] == ["e-1"]
    # the fetched zip landed in the work dir via the compat fetch boundary
    assert os.path.exists(os.path.join(str(tmp_path / "work"), "source.zip"))


# -- the SIXTH verbatim reference crawler:
# datasets/_global/tokyo_mou/psc/crawler.py — the full 78-line body
# (module constants, solve_arithmetic, crawl: login-page fetch →
# arithmetic-CAPTCHA solve → POST login → crawl_psc_records) with only
# the import homes swapped (zavod → opensanctions_spark, zavod.shed /
# zavod.stateful → opensanctions_spark.shed / .stateful).

import re
from datetime import datetime, timedelta
from urllib.parse import urljoin

from opensanctions_spark import helpers as h
from opensanctions_spark.stateful.positions import YEAR_DAYS

TODAY = datetime.today()
HEADERS = {
    "Content-Type": "application/x-www-form-urlencoded",
    "Referer": "https://apcis.tmou.org/public/",
    "User-Agent": "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.2 Safari/605.1.15",
    "X-Requested-With": "XMLHttpRequest",
    "Origin": "https://apcis.tmou.org",
}
SEARCH_DATA = {
    "Param": "0",
    "callsign": "",
    "name": "",
    "compimo": "",
    "compname": "",
    # Go back ~1 year (approximate as 365 days)
    "From": f"{(TODAY - timedelta(days=YEAR_DAYS)).strftime('%d.%m.%Y')}",
    "Till": f"{TODAY.strftime('%d.%m.%Y')}",
    "authority": "0",
    "flag": "0",
    "class": "0",
    "ro": "0",
    "type": "0",
    "result": "0",
    "insptype": "-1",
    "sort1": "0",
    "sort2": "DESC",
    "sort3": "0",
    "sort4": "DESC",
}


def solve_arithmetic(expression: str) -> str:
    """Parse and solve a simple arithmetic question like '7 + 8'."""
    match = re.search(r"^(\d+)\s*([+\-*/])\s*(\d+)$", expression)
    if not match:
        raise ValueError(f"Invalid CAPTCHA expression: {expression}")
    a, op, b = match.groups()
    a, b = int(a), int(b)
    if op == "+":
        return str(a + b)
    if op == "-":
        return str(a - b)
    raise ValueError(f"Unknown op: {op}")


def crawl_psc(context: CrawlerContext) -> None:
    from opensanctions_spark.shed.bs_tokyo_mou_psc import crawl_psc_records

    # Submit login form
    login_page = context.fetch_html(context.data_url)
    # Solve the arithmetic CAPTCHA
    question = h.xpath_string(
        login_page, "//span[contains(text(), '=')]/text()"
    ).strip(" =")
    answer = solve_arithmetic(question)

    login_data = {"captcha": answer}
    login_resp = context.fetch_html(
        urljoin(context.data_url, "?action=login"),
        data=login_data,
        headers=HEADERS,
        method="POST",
    )
    assert login_resp is not None, "Login failed, response is None"

    crawl_psc_records(
        context,
        headers=HEADERS,
        search_data=SEARCH_DATA,
        getinspection_url=urljoin(context.data_url, "?action=getinspections"),
        getships_url=urljoin(context.data_url, "?action=getshipinsp"),
    )


PSC_LOGIN_HTML = """<html><body><form id="login">
<label>Prove you are human:</label> <span>7 + 8 =</span>
<input name="captcha"/>
</form></body></html>"""

PSC_OK_HTML = """<html><body><div id="main">welcome</div></body></html>"""

PSC_SEARCH_HTML = """<html><body>
<table>
<tr class="even"><td><input type="hidden" value="UID-1"/></td></tr>
</table>
<ul class="navigate"><li>Found 1 records on 1 pages</li></ul>
</body></html>"""

PSC_SHIP_HTML = """<html><body>
<h2>Inspection data</h2>
<table><tr><th>Date</th><th>Port</th></tr>
<tr><td>2024-03-05</td><td>Busan</td></tr></table>
<h2>Ship data</h2>
<table><tr><th>Ship name</th><th>IMO number</th><th>Type</th><th>Callsign</th>
<th>MMSI</th><th>Tonnage</th><th>Deadweight</th><th>Flag</th>
<th>Name of ship master</th><th>ClassificationSociety</th></tr>
<tr><td>MV Test</td><td>9999999</td><td>Bulk carrier</td><td>ABCD</td>
<td>123456789</td><td>30000</td><td>52000</td><td>Panama</td>
<td>John Master</td><td>Test Class Society</td></tr></table>
<h2>Company details</h2>
<table><tr><th>Name</th><th>IMO number</th><th>Registered</th>
<th>Residence</th><th>Email</th><th>Phone</th><th>Fax</th></tr>
<tr><td>Test Shipping Co</td><td>555</td><td>Panama</td><td>Greece</td>
<td>a@b.c</td><td>+30 1</td><td>+30 2</td></tr></table>
</body></html>"""


def test_tokyo_mou_psc_crawler_import_swap_e2e(spark, tmp_path):
    from opensanctions_spark.crawler import register_http_fetcher

    seen_posts = []

    def fetcher(url, **kwargs):
        if "action=login" in url:
            seen_posts.append((kwargs.get("method"), dict(kwargs.get("data") or {})))
            return PSC_OK_HTML
        if "action=getinspections" in url:
            return PSC_SEARCH_HTML
        if "action=getshipinsp" in url:
            return PSC_SHIP_HTML
        return PSC_LOGIN_HTML

    register_http_fetcher(fetcher)
    try:
        config = SimpleNamespace(
            name="tokyo_mou_psc",
            metadata={"data": {"url": "https://apcis.example/public/"}},
            lookups={},
        )
        statements, ctx = crawl(
            spark, config, crawl_psc, work_dir=str(tmp_path / "work"),
            run_time="2026-08-15T00:00:00",
        )
    finally:
        register_http_fetcher(None)

    # the CAPTCHA was solved and POSTed through the fetch boundary
    assert seen_posts == [("POST", {"captcha": "15"})]
    rows = {}
    for r in statements.collect():
        rows.setdefault((r["schema"], r["prop"]), []).append(r["value"])
    assert rows[("Vessel", "name")] == ["MV Test"]
    assert rows[("Vessel", "imoNumber")] == ["9999999"]
    assert rows[("Person", "name")] == ["John Master"]
    assert rows[("Company", "name")] == ["Test Shipping Co"]
    # ship↔master/class-society/company links
    assert sorted(rows[("UnknownLink", "role")]) == [
        "Classification society", "Company", "Master",
    ]
