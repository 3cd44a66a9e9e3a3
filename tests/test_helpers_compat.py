"""Driver-side crawler helpers (``opensanctions_spark.helpers``) —
unit semantics pinned to ``zavod/zavod/helpers/*`` plus TWO-ROUTE PARITY:
the entity factories must produce byte-identical statements to the
engine's DataFrame statement factories on the same inputs, so a crawler
emitting through the compat layer and a bulk melt converge on the same
entities."""

from __future__ import annotations

from datetime import datetime, timedelta
from types import SimpleNamespace

import pytest

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


def _context(spark=None, name="testds", metadata=None, lookups=None):
    config = SimpleNamespace(
        name=name, metadata=metadata or {}, lookups=lookups or {}
    )
    return CrawlerContext(spark, config)


STMT_COLS = ["entity_id", "schema", "prop", "value", "origin", "original_value"]


def _rows(df):
    out = [tuple(r[c] for c in STMT_COLS) for r in df.select(*STMT_COLS).collect()]
    return sorted(out)


# --------------------------------------------------------------------------
# text


def test_clean_note_strips_interpol_links():
    text = (
        "INTERPOL-UN Security Council Special Notice web link: "
        "https://www.interpol.int/foo/bar actual note content"
    )
    assert h.clean_note(text) == ["actual note content"]
    assert h.clean_note(None) == []
    assert h.clean_note([text, None, "other"]) == ["actual note content", "other"]
    assert h.clean_note("https://www.interpol.int/x") == []


def test_multi_split_longest_splitter_first():
    # "a) test b) other c) misc" — the reference's itemised-list case
    assert h.multi_split("a) test b) other c) misc", ["a)", "b)", "c)"]) == [
        "test", "other", "misc",
    ]
    assert h.multi_split("test,other/misc", [",", "/"]) == [
        "test", "other", "misc",
    ]
    assert h.multi_split(None, [","]) == []
    assert h.multi_split(["x;y", None], [";"]) == ["x", "y"]


def test_is_empty_and_remove_bracketed():
    assert h.is_empty(None) and h.is_empty("  ") and not h.is_empty("x")
    assert h.remove_bracketed("Russia (former USSR)").strip() == "Russia"
    assert h.remove_bracketed(None) is None


# --------------------------------------------------------------------------
# dates


def test_parse_formats_precision_follows_format():
    assert h.parse_formats("2001-02-03", ["%Y-%m-%d"]).text == "2001-02-03"
    assert h.parse_formats("02/2001", ["%m/%Y"]).text == "2001-02"
    assert h.parse_formats("2001", ["%Y"]).text == "2001"
    assert h.parse_formats("bogus", ["%Y"]).text is None


def test_parse_formats_two_digit_year_base():
    # birth dates: %y years land in [base, base+100)
    base = h.TWO_DIGIT_BIRTH_YEAR_BASE  # RUN_TIME year - 100
    parsed = h.parse_formats("03.05.99", ["%d.%m.%y"], two_digit_year_base=base)
    year = int(parsed.text[:4])
    assert base <= year < base + 100
    assert parsed.text.endswith("-05-03")


def test_extract_date_dataset_formats_and_fallback():
    ds = SimpleNamespace(dates={"formats": ["%d.%m.%Y"]})
    assert h.extract_date(ds, "03.05.1999") == ["1999-05-03"]
    assert h.extract_date(ds, "2001-07") == ["2001-07"]  # ALWAYS_FORMATS
    assert h.extract_date(ds, "circa nineteen") == ["circa nineteen"]
    with pytest.raises(ValueError):
        h.extract_date(ds, "circa nineteen", fallback_to_original=False)


def test_extract_date_year_only_and_months():
    ds = SimpleNamespace(
        dates={
            "formats": ["%d %m %Y"],
            "months": {"03": ["März", "Mars"]},
            "year_only": True,
        }
    )
    assert h.extract_date(ds, "12 März 1980") == ["1980-03-12"]
    assert h.extract_date(ds, "circa 1990") == ["1990"]


def test_apply_date_and_original_value():
    ds = SimpleNamespace(dates={"formats": ["%d.%m.%Y"]})
    e = _context().make("Person")
    h.apply_date(e, "birthDate", "03.05.1999", dataset=ds)
    assert e.get("birthDate") == ["1999-05-03"]
    # original_value recorded because it differs from the parsed date
    assert e.statements[0][4] == "03.05.1999"
    h.apply_date(e, "deathDate", "2001-01-01", dataset=ds)
    # already-ISO values carry no redundant original_value
    assert [s for s in e.statements if s[0] == "deathDate"][0][4] is None


def test_backdate_and_within_max_age():
    assert h.backdate(datetime(2020, 3, 15), timedelta(days=14)) == "2020-03-01"
    ctx = _context()
    run_year = int(h.RUN_TIME[:4])
    assert h.within_max_age(ctx, f"{run_year - 1}-01-01")
    assert not h.within_max_age(ctx, f"{run_year - 9}-01-01")
    # prefix dates expand to their LAST covered day for the cutoff test
    assert h.within_max_age(ctx, str(run_year - 5))


def test_extract_years_bounds():
    assert sorted(h.extract_years("between 1990 and 2005")) == ["1990", "2005"]
    assert h.extract_years("42 things in 1990") == ["1990"]


# --------------------------------------------------------------------------
# names


def test_make_name_order_and_full_override():
    assert h.make_name(first_name="Jane", last_name="Doe") == "Jane Doe"
    assert h.make_name(full="  Jane   Doe ") == "Jane Doe"
    assert (
        h.make_name(prefix="Dr", first_name="Jane", patronymic="Ivanovna",
                    last_name="Doe", suffix="Jr")
        == "Dr Jane Ivanovna Doe Jr"
    )
    assert h.make_name() is None


def test_apply_name_parts_and_inferred_origin():
    e = _context().make("Person")
    h.apply_name(e, first_name="Jane", last_name="Doe")
    assert e.get("firstName") == ["Jane"]
    assert e.get("lastName") == ["Doe"]
    name_stmt = [s for s in e.statements if s[0] == "name"][0]
    assert name_stmt[1] == "Jane Doe"
    assert name_stmt[3] == "inferred"  # composed, not given

    e2 = _context().make("Person")
    h.apply_name(e2, full="Jane Doe", alias=True)
    assert e2.get("alias") == ["Jane Doe"]
    assert [s for s in e2.statements if s[0] == "alias"][0][3] is None

    e3 = _context().make("Person")
    h.apply_name(e3, full="J", first_name="Jane", is_weak=True)
    assert e3.get("weakAlias") == ["J"]
    assert e3.get("firstName") == []  # weak names don't set parts


def test_strip_name_titles():
    ctx = _context(metadata={
        "names": {"prefixes_strip": ["Hon.", "Dr."], "suffixes_strip": [", MP"]}
    })
    assert h.strip_name_titles(ctx, "Hon. Dr. Ada Example, MP") == "Ada Example"
    # bare-word boundary: "Hon" must not eat into "Honorata"
    ctx2 = _context(metadata={"names": {"prefixes_strip": ["Hon"]}})
    assert h.strip_name_titles(ctx2, "Honorata Smith") == "Honorata Smith"
    # all-affix names warn and return None
    assert h.strip_name_titles(ctx, "Hon. Dr.") is None
    assert ctx.issues, "all-affix name should log a warning"


def test_split_comma_names():
    ctx = _context()
    assert h.split_comma_names(ctx, "Alpha Corp, Beta LLC, Gamma Inc") == [
        "Alpha Corp", "Beta LLC", "Gamma Inc"
    ]
    # "Lastname, Firstname" stays whole
    assert h.split_comma_names(ctx, "Smith, Jane") == ["Smith, Jane"]
    # unsplittable and/comma mix warns and returns whole
    out = h.split_comma_names(ctx, "A, B and C Trading, D Corp")
    assert out == ["A, B and C Trading, D Corp"]
    assert ctx.issues


def test_name_regularity_heuristics():
    ctx = _context(metadata={"names": {"min_length": 3, "require_space": True}})
    e = ctx.make("Person")
    e.dataset = ctx.dataset  # helpers read the spec off the entity
    assert h.is_name_irregular(e, "n/a")
    assert h.is_name_irregular(e, "John Smith aka Johnny S")
    assert h.is_name_irregular(e, "Cher")  # require_space
    assert not h.is_name_irregular(e, "John Smith")
    assert not h.is_name_irregular(e, "김정은")  # dense script exempt


# --------------------------------------------------------------------------
# addresses / vessels / crypto / numbers scalars


def test_postcode_pobox():
    assert h.postcode_pobox("PO Box 1234") == (None, "PO Box 1234")
    assert h.postcode_pobox("10115") == ("10115", None)
    assert h.postcode_pobox(None) == (None, None)


def test_make_vessel_imo_id():
    # 9074729 is a checksum-valid IMO (sum of digit*weight mod 10)
    assert h.make_vessel_imo_id("IMO 9074729") == "imo-vsl-9074729"
    assert h.make_org_imo_id("9074729") == "imo-org-9074729"
    # invalid checksum falls back to a slug, not None
    assert h.make_vessel_imo_id("IMO 9074721") == "imo-vsl-imo-9074721"
    assert h.make_vessel_imo_id(None) is None


def test_extract_cryptos():
    text = (
        "wallets 0x52B539757B9C0D3C85Fa2Cb51bd2c0b1E4e3a4cf and "
        "bc1qar0srrr7xfkvy5l643lydnw9re59gtzzwf5mdq"
    )
    out = h.extract_cryptos(text)
    assert out["0x52B539757B9C0D3C85Fa2Cb51bd2c0b1E4e3a4cf"] == "ETH"
    assert any(v == "BTC" for v in out.values())


def test_apply_number_rendering():
    e = _context().make("Thing")
    h.apply_number(e, "amount", "1,250.00")
    assert e.get("amount") == ["1250"]
    h.apply_number(e, "weight", "2.5 kg")
    # units are normalized by NAME, never factor-converted (reference
    # rigour semantics; the factor table is the separate column path)
    assert e.get("weight") == ["2.50 kg"]
    h.apply_number(e, "height", 1.255)
    assert e.get("height") == ["1.25"] or e.get("height") == ["1.26"]


def test_remove_namespace():
    import xml.etree.ElementTree as ET

    el = ET.fromstring(
        '<root xmlns="http://x"><child attr="1"/></root>'
    )
    h.remove_namespace(el)
    assert el.tag == "root"
    assert el.find("child") is not None


# --------------------------------------------------------------------------
# two-route parity: driver factories vs DataFrame statement factories


ADDRESS_ROWS = [
    # (full, street, city, postal, state, region, country, code_in, key, holder)
    ("Main Street 5", None, "City 1", None, None, None, "Germany", None, None, "c-1"),
    (None, "Street 7", "City 2", "10115", "Texas", "North", "United States", "US", None, "c-2"),
    (None, "Street 9", None, None, "Bavaria", "Bavaria", "Germany", None, "k9", "c-3"),
    (None, None, None, None, None, None, "fr", None, None, "c-4"),       # country-code only
    (None, None, None, None, None, None, None, None, None, "c-5"),       # all-null: dropped
    (None, "Rue 1", "Paris", "75001", None, None, "fr", None, "k2", "c-6"),
]


def test_make_address_parity_with_statement_factory(spark):
    from opensanctions_spark.functions.addresses import make_address_statements

    df = spark.createDataFrame(
        ADDRESS_ROWS,
        "full_raw STRING, street STRING, city STRING, postal STRING, "
        "state STRING, region STRING, country STRING, code_in STRING, "
        "key STRING, holder_id STRING",
    )
    column_route = make_address_statements(
        df, dataset="testds", full_col="full_raw", street_col="street",
        city_col="city", postal_code_col="postal", state_col="state",
        region_col="region", country_col="country",
        country_code_col="code_in", key_col="key", holder_col="holder_id",
        holder_schema="LegalEntity",
    )

    ctx = _context(spark)
    for (full, street, city, postal, state, region,
         country, code_in, key, holder_id) in ADDRESS_ROWS:
        addr = h.make_address(
            ctx, full=full, street=street, city=city, postal_code=postal,
            state=state, region=region, country=country,
            country_code=code_in, key=key,
        )
        if addr is None:
            continue
        holder = ctx.make("LegalEntity")
        holder.id = holder_id
        h.apply_address(ctx, holder, addr)
        if not addr.has("full"):
            # apply_address only emits full-bearing addresses; the column
            # factory emits every id-bearing row — align the routes
            ctx.emit(addr)
        ctx.emit(holder)
    driver_route = ctx.statements_df()

    assert _rows(driver_route) == _rows(column_route)


SANCTION_ROWS = [
    # (entity_id, key, program_name, program_key, src_key, start, end)
    ("e-1", None, "Prog Uno", "OS-P1", "SRC-1", "2020-01-01", None),
    ("e-2", "k1", None, "OS-P1", None, None, "2021"),
    ("e-3", None, "Prog Dos", "OS-UNKNOWN", "SRC-3", "2019", "2099-12-31"),
    ("e-4", "k2", "Prog Tres", None, None, None, None),
]


def test_make_sanction_parity_with_statement_factory(spark):
    from opensanctions_spark.functions.sanctions import make_sanction_statements

    program_urls = {"OS-P1": "https://programs.example/p1"}
    df = spark.createDataFrame(
        SANCTION_ROWS,
        "entity_id STRING, key STRING, program_name STRING, "
        "program_key STRING, src_key STRING, start STRING, end STRING",
    )
    column_route = make_sanction_statements(
        df, dataset="testds", entity_col="entity_id",
        publisher_name="Test Authority", publisher_country="de",
        source_url="https://src.example", key_col="key",
        program_name_col="program_name", program_key_col="program_key",
        source_program_key_col="src_key", start_col="start", end_col="end",
        entity_schema="Thing", program_urls=program_urls,
    )

    ctx = _context(
        spark,
        metadata={
            "publisher": {"name": "Test Authority", "country": "de"},
            "url": "https://src.example",
        },
    )
    programs = {"OS-P1": SimpleNamespace(url="https://programs.example/p1")}
    for eid, key, pname, pkey, src, start, end in SANCTION_ROWS:
        subject = ctx.make("Thing")
        subject.id = eid
        sanction = h.make_sanction(
            ctx, subject, key=key, program_name=pname, program_key=pkey,
            source_program_key=src, start_date=start, end_date=end,
            programs=programs,
        )
        ctx.emit(sanction)
        ctx.emit(subject)
    driver_route = ctx.statements_df()

    assert _rows(driver_route) == _rows(column_route)


OCCUPANCY_ROWS = [
    # (person, position, start, end, topic)
    ("p-1", "pos-1", "2020-01-01", None, "gov.national"),
    ("p-2", "pos-1", "2001-01-01", "2004-06-30", "gov.national"),   # beyond grace → dropped
    ("p-3", "pos-2", None, "2099-01-01", "gov.state"),
    ("p-4", "pos-2", None, None, "gov.muni"),
]


def test_make_occupancy_parity_with_statement_factory(spark):
    from opensanctions_spark.functions.positions import make_occupancy_statements

    df = spark.createDataFrame(
        OCCUPANCY_ROWS,
        "person STRING, position STRING, start STRING, end STRING, topic STRING",
    )
    column_route = make_occupancy_statements(
        df, dataset="testds", person_col="person", position_col="position",
        start_col="start", end_col="end", topic_col="topic",
        no_end_implies_current=True,
    )

    ctx = _context(spark)
    for person_id, position_id, start, end, topic in OCCUPANCY_ROWS:
        person = ctx.make("Person")
        person.id = person_id
        position = ctx.make("Position")
        position.id = position_id
        position.add("topics", topic)
        occ = h.make_occupancy(
            ctx, person, position, start_date=start, end_date=end,
        )
        if occ is None:
            continue
        ctx.emit(occ)
        # only the inferred topic back-ref is part of the factory's emit
        # set; strip the fixture's own props before emitting
        person._stmts = [s for s in person._stmts if s[0] == "topics"]
        ctx.emit(person)
    driver_route = ctx.statements_df()

    assert _rows(driver_route) == _rows(column_route)


IDENT_ROWS = [
    # (holder, number, doc_type, key, passport)
    ("p-1", "P100", "passport", "k1", True),
    ("p-2", "N-55", "national id", "k2", False),
]


def test_make_identification_parity_with_statement_factory(spark):
    from opensanctions_spark.functions.identifications import (
        make_identification_statements,
    )

    for holder_id, number, doc_type, key, passport in IDENT_ROWS:
        df = spark.createDataFrame(
            [(holder_id, number, doc_type, key)],
            "holder STRING, number STRING, doc_type STRING, key STRING",
        )
        column_route = make_identification_statements(
            df, dataset="testds", holder_col="holder", number_col="number",
            doc_type_col="doc_type", key_col="key", passport=passport,
            holder_schema="Person",
        )
        ctx = _context(spark)
        holder = ctx.make("Person")
        holder.id = holder_id
        ident = h.make_identification(
            ctx, holder, number, doc_type=doc_type, key=key, passport=passport,
        )
        ctx.emit(ident)
        ctx.emit(holder)
        assert _rows(ctx.statements_df()) == _rows(column_route)


def test_make_position_parity_with_statement_factory(spark):
    from opensanctions_spark.functions.positions import make_position_statements

    rows = [
        ("Minister of X", "de", "2001", None, None),
        ("Mayor of Y", "fr", None, "2020", "Paris"),
    ]
    df = spark.createDataFrame(
        rows,
        "name STRING, country STRING, inception STRING, dissolution STRING, "
        "subnational STRING",
    )
    column_route = make_position_statements(
        df, dataset="testds", name_col="name", country_col="country",
        inception_col="inception", dissolution_col="dissolution",
        subnational_col="subnational",
    )
    ctx = _context(spark)
    for name, country, inception, dissolution, subnational in rows:
        pos = h.make_position(
            ctx, name, country=country,
            inception_date=[inception] if inception else None,
            dissolution_date=[dissolution] if dissolution else None,
            subnational_area=subnational,
        )
        ctx.emit(pos)
    assert _rows(ctx.statements_df()) == _rows(column_route)


def test_make_security_matches_column_factory_id():
    ctx = _context()
    sec = h.make_security(ctx, "us0378331005")
    assert sec.id == "isin-US0378331005"
    assert sec.get("isin") == ["US0378331005"]
    assert sec.get("country") == ["us"]
    xs = h.make_security(ctx, "XS1234567890")
    assert xs.get("country") == []


def test_make_article_and_documentation():
    ctx = _context()
    art = h.make_article(ctx, "https://news.example/a1", title="T",
                         published_at="2021-05-01")
    assert art.id == ctx.make_id("Article", "https://news.example/a1", None)
    assert art.get("publishedAt") == ["2021-05-01"]
    ent = ctx.make("Person")
    ent.id = "p-1"
    doc = h.make_documentation(ctx, ent, art)
    assert doc.get("entity") == ["p-1"]
    assert doc.get("document") == [art.id]
    assert doc.get("date") == ["2021-05-01"]  # inherited from the article


# --------------------------------------------------------------------------
# html / change / excel / pdf bridges


HTML_DOC = """
<html><body>
<h1>Title</h1>
<table id="main">
  <tr><th>Name</th><th>Country Code</th><th></th></tr>
  <tr><td><a href="/p/1">Ada</a></td><td>de</td><td>x</td></tr>
  <tr><td>Bob</td><td>us</td><td>y</td></tr>
</table>
<p>first<br>second</p>
</body></html>
"""


def test_parse_html_and_element_text():
    doc = h.parse_html(HTML_DOC)
    assert doc.tag == "html"
    h1 = doc.find(".//h1")
    assert h.element_text(h1) == "Title"
    assert h.element_text(None) == ""


def test_parse_html_table_and_cells():
    doc = h.parse_html(HTML_DOC)
    table = doc.find(".//table")
    rows = list(h.parse_html_table(table, index_empty_headers=True))
    assert len(rows) == 2
    assert sorted(rows[0]) == ["column_2", "country_code", "name"]
    first = h.cells_to_str(rows[0])
    assert first["name"] == "Ada"
    assert first["country_code"] == "de"
    links = h.links_to_dict(rows[0]["name"])
    assert links == {"ada": "/p/1"}


def test_parse_html_table_nested_tables_excluded():
    doc = h.parse_html(
        "<table><tr><th>a</th></tr>"
        "<tr><td><table><tr><td>inner</td></tr></table></td></tr></table>"
    )
    table = doc.find(".//table")
    rows = list(h.parse_html_table(table))
    assert len(rows) == 1  # the nested table's row is not a row of ours


def test_xpath_helpers():
    doc = h.parse_html(HTML_DOC)
    table = h.xpath_element(doc, ".//table")
    assert table.get("id") == "main"
    assert len(h.xpath_elements(table, ".//td")) == 6
    hrefs = h.xpath_strings(doc, ".//a/@href")
    assert hrefs == ["/p/1"]
    assert h.xpath_string(doc, ".//h1/text()") == "Title"
    with pytest.raises(ValueError):
        h.xpath_elements(doc, ".//h1", expect_exactly=2)


def test_split_html_newline_tags():
    assert h.split_html_newline_tags("first<br>second<p>third</p>") == [
        "first", "second", "third"
    ]


def test_element_text_hash_empty_is_sha1_of_nothing():
    doc = h.parse_html("<div></div>")
    el = doc.find(".//div")
    assert h.element_text_hash(el) == "da39a3ee5e6b4b0d3255bfef95601890afd80709"


def test_change_asserts(tmp_path):
    import hashlib as hl

    p = tmp_path / "doc.txt"
    p.write_bytes(b"stable content")
    good = hl.sha1(b"stable content").hexdigest()
    assert h.assert_file_hash(p, good)
    assert not h.assert_file_hash(p, "0" * 40)
    with pytest.raises(AssertionError):
        h.assert_file_hash(p, "0" * 40, raise_exc=True)

    ctx = _context()
    url = p.as_uri()
    assert h.assert_url_hash(ctx, url, good)
    assert not h.assert_url_hash(ctx, url, "0" * 40)
    assert ctx.issues

    doc = h.parse_html("<div>Some <b>content</b></div>")
    node = doc.find(".//div")
    pinned = h._dom_hash(node)
    assert h.assert_dom_hash(node, pinned)
    assert not h.assert_dom_hash(node, "0" * 40)
    # text-only hash survives markup-only changes
    doc2 = h.parse_html("<div>Some <i>content</i></div>")
    assert h._dom_hash(doc2.find(".//div"), text_only=True) == h._dom_hash(
        node, text_only=True
    )


def test_html_url_hash(tmp_path):
    p = tmp_path / "page.html"
    p.write_text("<html><body><div id='x'>Pinned</div></body></html>")
    ctx = _context()
    doc = h.parse_html(p.read_text())
    pinned = h._dom_hash(doc.find(".//div"))
    assert h.assert_html_url_hash(ctx, p.as_uri(), pinned, path=".//div")
    assert not h.assert_html_url_hash(ctx, p.as_uri(), "0" * 40, path=".//div")


def test_convert_excel_date_and_cell():
    # 2020-03-15 is serial 43905 from the 1899-12-30 epoch; the output
    # always carries T00:00:00 and fractional serials truncate to the
    # day, matching the reference (excel.py:47-69)
    assert h.convert_excel_date(43905) == "2020-03-15T00:00:00"
    assert h.convert_excel_date("43905.5") == "2020-03-15T00:00:00"
    assert h.convert_excel_date("not a number") is None
    assert h.convert_excel_date(None) is None
    # the reference's plausibility window: serials below 4000 or above
    # 100000 (row numbers, phone-ish cells) null out
    assert h.convert_excel_date(44876) == "2022-11-11T00:00:00"
    assert h.convert_excel_date("44876.0") == "2022-11-11T00:00:00"
    for bad in (0, 1, 3_999, 100_001):
        assert h.convert_excel_date(bad) is None
    assert h.convert_excel_cell(5.0) == "5"
    assert h.convert_excel_cell(" x ") == "x"
    assert h.convert_excel_cell("") is None


def test_parse_xlsx_and_xls_sheets(tmp_path):
    from opensanctions_spark.sources import write_xlsx
    from opensanctions_spark.sources.xls import write_xls

    xlsx = str(tmp_path / "t.xlsx")
    # the fixture writer stringifies values, so empty = "" (not None)
    write_xlsx(xlsx, ["Full Name", "Country"], [["Ada", "de"], ["Bob", ""]])
    rows = list(h.parse_xlsx_sheet(_context(), xlsx))
    assert rows == [
        {"full_name": "Ada", "country": "de"},
        {"full_name": "Bob", "country": None},
    ]

    xls = str(tmp_path / "t.xls")
    write_xls(xls, ["Full Name", "Country"], [["Ada", "de"]])
    rows = list(h.parse_xls_sheet(_context(), xls))
    assert rows == [{"full_name": "Ada", "country": "de"}]


def test_parse_pdf_table_bridge(tmp_path):
    from opensanctions_spark.sources.pdf import write_pdf_table

    pdf = str(tmp_path / "t.pdf")
    write_pdf_table(pdf, ["Name", "Code"], [["Ada", "P1"], ["Bob", "P2"]])
    rows = list(h.parse_pdf_table(_context(), pdf))
    assert rows == [
        {"name": "Ada", "code": "P1"},
        {"name": "Bob", "code": "P2"},
    ]


def test_xpath_contains_text_predicate_and_absolute_prefix():
    """The lxml-isms production crawlers use (leading ``//`` and a
    ``contains(text(), '…')`` predicate on the final step,
    ``datasets/_global/tokyo_mou/psc/crawler.py``) work through the
    stdlib-backed compat xpath."""
    from opensanctions_spark.helpers import parse_html, xpath_string, xpath_strings

    doc = parse_html(
        "<html><body><span>hello</span><span>7 + 8 =</span>"
        "<div><span>also =</span></div></body></html>"
    )
    assert xpath_strings(doc, "//span[contains(text(), '=')]/text()") == [
        "7 + 8 =", "also =",
    ]
    assert xpath_string(
        doc, "//span[contains(text(), '7')]/text()"
    ).strip(" =") == "7 + 8"


def test_xpath_contains_text_is_final_step_only_and_direct_text():
    """A mid-path contains(text()) predicate fails LOUDLY (silently
    filtering the wrong step would scrape wrong data), and the
    predicate tests the element's DIRECT text nodes — nested markup
    text does not match, per XPath text() semantics."""
    import pytest as _pytest

    from opensanctions_spark.helpers import parse_html, xpath_elements, xpath_strings

    doc = parse_html(
        "<html><body><div><span>label<b>=</b></span>"
        "<span>7 + 8 =</span></div></body></html>"
    )
    # nested <b>=</b> must NOT make the first span match
    assert xpath_strings(doc, "//span[contains(text(), '=')]/text()") == [
        "7 + 8 =",
    ]
    with _pytest.raises(ValueError, match="final"):
        xpath_elements(doc, "//div[contains(text(), 'x')]/span")
