"""Parity port of the reference XSS-safety suite
(``zavod/zavod/tests/runtime/test_safety.py``) over the engine's F14
pattern — asserted BOTH on the shared pattern string via Python re and
through the Spark column function, so the Java-regex and RE2 engines
stay in agreement with the reference semantics."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.functions.text import (
    HTML_ENTITY_PATTERN,
    XSS_PATTERN,
    has_html_entities,
    looks_unsafe,
)

XSS_RE = re.compile(XSS_PATTERN)

MATCHES = [
    "<script>alert(1)</script>",
    "click <a href='x'>here</a>",
    'href="javascript:alert(1)"',
    "src=data:text/html;base64,AAAA",
    " data:text/html",
    "onload=alert(1)",
    "&#x41;",
]

NON_MATCHES = [
    # schemes embedded in longer words must not match: the alternatives
    # require a word boundary before them
    "POSLANIČKOG MANDATA: 2. Decembar 2020.",
    "ERRATA: see footnote",
    "plain biography text without markup",
]


@pytest.mark.parametrize("value", MATCHES)
def test_xss_pattern_matches(value):
    assert XSS_RE.search(value) is not None


@pytest.mark.parametrize("value", NON_MATCHES)
def test_xss_pattern_ignores_words_ending_in_scheme(value):
    assert XSS_RE.search(value) is None


def test_column_function_agrees_with_pattern(spark):
    df = spark.createDataFrame(
        [(v, True) for v in MATCHES] + [(v, False) for v in NON_MATCHES],
        "v string, expected boolean",
    )
    rows = df.select("v", "expected", looks_unsafe(F.col("v")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"], r["v"]


def test_html_entity_pattern():
    ent = re.compile(HTML_ENTITY_PATTERN)
    assert ent.search("&#65;") is not None       # decimal
    assert ent.search("&#x41;") is not None      # hex
    assert ent.search("&#X41;") is not None      # hex, capital X
    assert ent.search("AT&T and M&S") is None    # bare ampersands


def test_html_entity_column(spark):
    df = spark.createDataFrame(
        [("&#65;", True), ("&#x41;", True), ("AT&T", False)],
        "v string, expected boolean",
    )
    for r in df.select("expected", has_html_entities(F.col("v")).alias("got")).collect():
        assert r["got"] == r["expected"]
