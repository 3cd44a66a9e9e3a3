"""Compat ``zavod.util`` subset (``zavod/zavod/util.py``): the DOM type
aliases crawlers annotate with. The reference aliases lxml's element
types; the compat DOM is stdlib ElementTree (see ``dom.py``)."""

from __future__ import annotations

from xml.etree.ElementTree import Element, ElementTree

from opensanctions_spark.helpers import LangText  # noqa: F401 (re-export)

ElementOrTree = Element | ElementTree

__all__ = ["Element", "ElementOrTree", "LangText"]
