"""Ported reference suite: ``zavod/zavod/tests/helpers/test_excel.py``
(round-11 closure campaign).

The reference's cases run over xlrd/openpyxl workbook objects; here the
same behavioral cases run over fixtures produced by the engine's own
stdlib writers and parsed by its OLE2/BIFF8 and zip+XML readers — the
assertions are the reference's. One declared divergence: BIFF date
CELLS (test_excel_cell's "2023-07-26T00:00:00" case and the xls
sheet's date column) format through the cell's XF number-format, which
the engine's reader does not model — dates ride as serials and convert
explicitly through ``convert_excel_date``, pinned here the same way.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


def _context():
    return CrawlerContext(None, SimpleNamespace(name="t", metadata={}, lookups={}))


def test_excel_date_reference_cases():
    """excel.py convert_excel_date, the reference's exact case table."""
    assert h.convert_excel_date(44876) == "2022-11-11T00:00:00"
    assert h.convert_excel_date(44876.0) == "2022-11-11T00:00:00"
    assert h.convert_excel_date("44876") == "2022-11-11T00:00:00"
    assert h.convert_excel_date("44876.0") == "2022-11-11T00:00:00"
    assert h.convert_excel_date("foo") is None
    assert h.convert_excel_date(0) is None
    assert h.convert_excel_date(1) is None
    assert h.convert_excel_date(3_999) is None
    assert h.convert_excel_date(100_001) is None
    assert h.convert_excel_date(None) is None


def test_excel_cell_value_semantics():
    """convert_excel_cell: whole floats print bare (the reference's
    numeric "1" case); date cells are the declared serial divergence —
    the serial converts through convert_excel_date instead."""
    assert h.convert_excel_cell(1.0) == "1"
    assert h.convert_excel_cell(2.5) == "2.5"
    assert h.convert_excel_cell(None) is None
    assert h.convert_excel_date(45133) == "2023-07-26T00:00:00"


def test_parse_xls_sheet_links(tmp_path):
    """The reference's "basic" sheet: one data row; hyperlinked cells
    add <header>_url keys (xlrd hyperlink_map ↔ BIFF HLINK records)."""
    from opensanctions_spark.sources.xls import write_xls

    xls = str(tmp_path / "book.xls")
    write_xls(
        xls,
        ["numeric", "text", "date"],
        [[1, "Hello, World!", "2023-07-26"]],
        links={
            (1, 0): "http://example.com/1",
            (1, 1): "http://example.com/hello",
        },
    )
    rows = list(h.parse_xls_sheet(_context(), xls))
    assert len(rows) == 1, rows
    assert rows[0] == {
        "numeric": "1",
        "text": "Hello, World!",
        "date": "2023-07-26",
        "numeric_url": "http://example.com/1",
        "text_url": "http://example.com/hello",
    }


def test_parse_xls_sheet_split_header(tmp_path):
    """The reference's "split headers" sheet: skiprows + join_header_rows
    fold a two-row header into a_thing_b-style keys."""
    from opensanctions_spark.sources.xls import write_xls

    xls = str(tmp_path / "split.xls")
    write_xls(
        xls,
        ["junk", "junk", "junk"],
        [["a", "thing", "thing"], ["", "b", "c"], ["aa", "bb", "cc"]],
    )
    rows = list(h.parse_xls_sheet(_context(), xls, skiprows=1, join_header_rows=1))
    assert len(rows) == 1, rows
    assert rows[0] == {"a": "aa", "thing_b": "bb", "thing_c": "cc"}


def test_parse_xls_sheet_duplicate_headers(tmp_path):
    """Headers that collide after slugification would silently drop the
    earlier column's cell — the reference asserts, so do we."""
    from opensanctions_spark.sources.xls import write_xls

    xls = str(tmp_path / "dup.xls")
    write_xls(xls, ["Name", "Name", "DOB"], [["original", "latin", "1970"]])
    with pytest.raises(AssertionError, match="Duplicate headers"):
        list(h.parse_xls_sheet(_context(), xls))


def test_parse_xlsx_sheet_blank_headers_and_links(tmp_path):
    """The reference's book.xlsx shape: a blank first header and a
    right-most value under a blank header (the Google-Sheets case) name
    themselves column_N; extract_links adds <header>_url keys."""
    from opensanctions_spark.sources import write_xlsx

    xlsx = str(tmp_path / "book.xlsx")
    write_xlsx(
        xlsx,
        [None, "numeric", "text", "date", None],
        [[None, "1", "Hello, World!", "2023-07-26", "blank_header_value"]],
        links={
            (1, 1): "http://example.com/1",
            (1, 2): "http://example.com/hello",
        },
    )
    rows = list(h.parse_xlsx_sheet(_context(), xlsx, extract_links=True))
    assert len(rows) == 1
    assert rows[0] == {
        "column_0": None,
        "numeric": "1",
        "text": "Hello, World!",
        "date": "2023-07-26",
        "numeric_url": "http://example.com/1",
        "text_url": "http://example.com/hello",
        "column_4": "blank_header_value",
    }


def test_parse_xlsx_sheet_duplicate_headers(tmp_path):
    from opensanctions_spark.sources import write_xlsx

    xlsx = str(tmp_path / "dup.xlsx")
    write_xlsx(xlsx, ["Name", "Name", "DOB"], [["original", "latin", "1970"]])
    with pytest.raises(AssertionError, match="Duplicate headers"):
        list(h.parse_xlsx_sheet(_context(), xlsx))


def test_parse_sheets_skip_all_none_rows(tmp_path):
    """Both parsers drop rows whose every value is None (the reference's
    trailing-blank-row guard)."""
    from opensanctions_spark.sources import write_xlsx
    from opensanctions_spark.sources.xls import write_xls

    xlsx = str(tmp_path / "blank.xlsx")
    write_xlsx(xlsx, ["a", "b"], [["x", "y"], [None, None], ["", ""]])
    assert list(h.parse_xlsx_sheet(_context(), xlsx)) == [{"a": "x", "b": "y"}]

    xls = str(tmp_path / "blank.xls")
    write_xls(xls, ["a", "b"], [["x", "y"], [None, None]])
    assert list(h.parse_xls_sheet(_context(), xls)) == [{"a": "x", "b": "y"}]
