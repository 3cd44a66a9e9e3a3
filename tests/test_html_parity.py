"""Parity port of the reference HTML-helper suite
(``zavod/zavod/tests/helpers/test_html.py``) over the engine's stdlib
DOM (``opensanctions_spark.dom``; the reference hands crawlers lxml
trees): table parsing with link extraction, duplicate-header rejection,
element text/NBSP handling, the normalized text hash, and newline-tag
splitting."""

from __future__ import annotations

import pytest

from opensanctions_spark import helpers as h
from opensanctions_spark.dom import parse_html

HTML = """
<html>
  <table>
    <thead>
      <tr>
        <th>First Name</th>
        <th>Read More</th>
      </tr>
    </thead>
    <tbody>
      <tr>
        <td>James Bond</td>
        <td>
          <a href="/james-bond">Read More</a>
          but also
          <a href="/james-bond-extra">Extra</a>
        </td>
      </tr>
      <tr>
        <td>Jason Bourne</td>
        <td>12345</td>
    </tbody>
  </table>
</html>
"""

DUPLICATE_HEADERS_HTML = """
<html>
  <table>
    <tr><th>Name</th><th>Name</th><th>DOB</th></tr>
    <tr><td>original script</td><td>latin script</td><td>1970</td></tr>
  </table>
</html>
"""


def test_parse_html_table():
    doc = parse_html(HTML)
    table = doc.findall(".//table")[0]
    rows = list(h.parse_html_table(table))

    assert len(rows) == 2, rows
    str_row_1 = h.cells_to_str(rows[0])
    assert str_row_1["first_name"] == "James Bond", str_row_1
    assert str_row_1["read_more"] == "Read More but also Extra", str_row_1
    str_row_2 = h.cells_to_str(rows[1])
    assert str_row_2["read_more"] == "12345", str_row_2

    links_dict = h.links_to_dict(rows[0]["read_more"])
    assert links_dict["read_more"] == "/james-bond", links_dict
    assert links_dict["extra"] == "/james-bond-extra", links_dict


def test_parse_html_table_duplicate_headers():
    # headers that collide after slugification would silently drop the
    # earlier column's cell
    doc = parse_html(DUPLICATE_HEADERS_HTML)
    table = doc.findall(".//table")[0]
    with pytest.raises(AssertionError, match="Duplicate headers"):
        list(h.parse_html_table(table))


def test_element_text():
    doc = parse_html("<span>&nbsp; </span>")
    assert h.element_text(doc) == ""
    assert h.element_text(doc, squash=False) == "\xa0 "
    doc = parse_html("<span> Hello, <div>World!</div> &nbsp;</span>")
    assert h.element_text(doc) == "Hello, World!"


def test_element_text_hash():
    doc = parse_html("<span>&nbsp; </span>")
    assert h.element_text_hash(doc) == (
        "da39a3ee5e6b4b0d3255bfef95601890afd80709"
    )

    expected = h.text_hash("Hello, World!")
    doc = parse_html("<span> Hello, <div>World!</div> &nbsp;</span>")
    assert h.element_text_hash(doc) == expected
    doc = parse_html("<span> Hello, <div>World!</div><h3>&nbsp;</h3></span>")
    assert h.element_text_hash(doc) == expected
    # case- and punctuation-insensitive, like rigour's text_hash
    doc = parse_html("<span> HELLO, <div>WORLD</div> &nbsp;</span>")
    assert h.element_text_hash(doc) == expected


def test_split_html_newline_tags():
    split = h.split_html_newline_tags
    assert split("John Smith<br>Jane Doe") == ["John Smith", "Jane Doe"]
    assert split("<p>Ground one</p><p>Ground two</p>") == [
        "Ground one", "Ground two",
    ]
    # self-closing and upper-case variants
    assert split("one<br/>two") == ["one", "two"]
    assert split("one<BR>two") == ["one", "two"]
    assert split("one<br />two") == ["one", "two"]
    # empty and whitespace-only chunks are dropped
    assert split("one<br>  <br>two") == ["one", "two"]
    assert split("") == []
    assert split("no tags here") == ["no tags here"]
