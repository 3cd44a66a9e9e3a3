"""Lenient HTML → ``xml.etree.ElementTree`` parser for driver-side
crawler code.

The reference hands crawlers lxml ``HtmlElement`` trees
(``zavod/zavod/context.py`` ``fetch_html``). This container is
stdlib-only, so the compat layer builds standard ElementTree elements
from real-world (tag-soup) HTML: void elements self-close, ``</p>``-less
paragraphs and unclosed ``<li>``/``<tr>``/``<td>`` rows are auto-closed
when a sibling opens, and stray end tags are ignored. The resulting
elements support the ElementPath subset (``.findall('.//tr')``,
``.get('href')``, ``.itertext()``) that the helper functions in
``opensanctions_spark.helpers`` are written against — the same engine
that powers the S4/S5 DataFrame scans (``sources/__init__.py``
``parse_html_dom``), lifted to a reusable driver-side tree.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from html.parser import HTMLParser

#: elements that never carry content (HTML5 void elements)
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

#: tag → set of open tags a new occurrence implicitly closes
_IMPLICIT_CLOSE = {
    "li": {"li"},
    "option": {"option"},
    "p": {"p"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "thead": {"thead", "tbody", "tr", "td", "th"},
    "tbody": {"thead", "tbody", "tr", "td", "th"},
}


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = ET.Element("document")
        self._stack: list[ET.Element] = [self.root]

    # -- helpers ----------------------------------------------------------
    def _implicit_close(self, tag: str) -> None:
        closes = _IMPLICIT_CLOSE.get(tag)
        if not closes:
            return
        # close the nearest matching open tag, but never across a table
        # or list boundary (a <td> must not close the enclosing <tr>'s
        # parent row in another table)
        for i in range(len(self._stack) - 1, 0, -1):
            open_tag = self._stack[i].tag
            if open_tag in closes:
                del self._stack[i:]
                return
            if open_tag in ("table", "ul", "ol", "document"):
                return

    # -- parser events ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._implicit_close(tag)
        el = ET.SubElement(
            self._stack[-1], tag,
            {k: (v if v is not None else "") for k, v in attrs},
        )
        if tag not in VOID_TAGS:
            self._stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        ET.SubElement(
            self._stack[-1], tag,
            {k: (v if v is not None else "") for k, v in attrs},
        )

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # stray end tag: ignore (tag soup)

    def handle_data(self, data: str) -> None:
        if not data:
            return
        parent = self._stack[-1]
        if len(parent):
            last = parent[-1]
            last.tail = (last.tail or "") + data
        else:
            parent.text = (parent.text or "") + data


def parse_html(text: str) -> ET.Element:
    """Parse (possibly malformed) HTML into an ElementTree element.

    Returns the ``<html>`` element when the document has one, else a
    synthetic ``<document>`` root wrapping the fragments.
    """
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    root = builder.root
    for child in root:
        if child.tag == "html":
            return child
    return root
