"""Parity port of the reference title-stripping suite
(``zavod/zavod/tests/helpers/names/test_title_stripping.py``) over the
engine's ``strip_name_titles`` compat helper: stacked prefixes,
parenthesized titles, repeated suffixes, word-boundary safety for bare
terms, the affix-only-name warning, and empty/None passthrough."""

from __future__ import annotations

from types import SimpleNamespace

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


def _ctx(prefixes=None, suffixes=None):
    config = SimpleNamespace(
        name="testds",
        metadata={
            "names": {
                "prefixes_strip": prefixes or [],
                "suffixes_strip": suffixes or [],
            }
        },
        lookups={},
    )
    return CrawlerContext(None, config)


def test_names_spec_accepts_title_strip_config():
    ctx = _ctx(prefixes=["Hon ", "(Dr.)"], suffixes=[", MP"])
    spec = h.names_spec(ctx.dataset)
    assert spec.prefixes_strip == ["Hon ", "(Dr.)"]
    assert spec.suffixes_strip == [", MP"]


def test_strip_stacked_malaysian_prefixes():
    ctx = _ctx(prefixes=[
        "Yang Berhormat ", "Datuk Seri Panglima ", "Datuk Seri ",
        "YB ", "Dato' ", "Datuk ",
    ])
    assert h.strip_name_titles(
        ctx, "Yang Berhormat Datuk Seri Panglima Tengku Zafrul bin Tengku Abdul Aziz"
    ) == "Tengku Zafrul bin Tengku Abdul Aziz"
    assert h.strip_name_titles(ctx, "YB Dato' Syed Ibrahim") == "Syed Ibrahim"


def test_strip_preserves_unconfigured_malaysian_particles():
    ctx = _ctx(prefixes=["YB ", "Datuk ", "Dato' "])
    for name in (
        "Tengku Zafrul bin Tengku Abdul Aziz",
        "Syed Saddiq bin Syed Abdul Rahman",
        "Raja Kamarul Bahrin Shah",
        "Wan Junaidi bin Tuanku Jaafar",
    ):
        assert h.strip_name_titles(ctx, name) == name


def test_strip_kenyan_prefixes_and_parenthesized_titles():
    ctx = _ctx(prefixes=["Hon. ", "(Dr.)", "(Rtd)", "Gen "])
    assert h.strip_name_titles(ctx, "Hon. (Dr.) Jane Doe") == "Jane Doe"
    assert h.strip_name_titles(ctx, "(Rtd) Gen John Doe") == "John Doe"
    assert h.strip_name_titles(ctx, "Hon. (CPA) Jane Doe") == "(CPA) Jane Doe"


def test_strip_repeated_suffixes():
    ctx = _ctx(suffixes=[", CBS", ", MP", " OGW", " MP", " (MP)"])
    assert h.strip_name_titles(ctx, "Jane Doe, CBS, MP") == "Jane Doe"
    assert h.strip_name_titles(ctx, "Jane Doe OGW MP") == "Jane Doe"
    assert h.strip_name_titles(ctx, "Jane Doe (MP)") == "Jane Doe"


def test_strip_leaves_unknown_comma_tail_visible():
    ctx = _ctx(suffixes=[", CBS", ", MP"])
    assert h.strip_name_titles(ctx, "Jane Doe, Party Leader") == (
        "Jane Doe, Party Leader"
    )
    assert h.strip_name_titles(ctx, "Jane Doe, CBS, Party Leader") == (
        "Jane Doe, CBS, Party Leader"
    )


def test_strip_bare_prefix_requires_word_boundary():
    # ug_parliament's production config: an unbounded "Hon" term must
    # not truncate names that merely start with those letters.
    ctx = _ctx(prefixes=["Hon.", "Hon"])
    assert h.strip_name_titles(ctx, "Honorata Nabakooza") == "Honorata Nabakooza"
    assert h.strip_name_titles(ctx, "Hon. Honey Kaggwa") == "Honey Kaggwa"
    assert h.strip_name_titles(ctx, "Hon Rebecca Kadaga") == "Rebecca Kadaga"
    assert h.strip_name_titles(ctx, "Hon. Hon Honorata Doe") == "Honorata Doe"


def test_strip_bare_suffix_requires_word_boundary():
    ctx = _ctx(suffixes=["MP"])
    assert h.strip_name_titles(ctx, "Jane Kamp") == "Jane Kamp"
    assert h.strip_name_titles(ctx, "Jane Doe MP") == "Jane Doe"


def test_strip_stacked_titles():
    ctx = _ctx(prefixes=["Hon.", "Hon", "Dr."])
    assert h.strip_name_titles(ctx, "Hon. Dr. Jane Doe") == "Jane Doe"
    assert h.strip_name_titles(ctx, "Hon Dr. Honorata Doe") == "Honorata Doe"


def test_strip_all_title_name_warns_and_returns_none():
    ctx = _ctx(prefixes=["Hon.", "Hon"], suffixes=[", MP"])
    assert h.strip_name_titles(ctx, "Hon. Hon") is None
    warnings = [i for i in ctx.issues if i["level"] == "warning"]
    assert any(
        i["message"] == "Name consists only of title affixes"
        and i["data"].get("name") == "Hon. Hon"
        for i in warnings
    )
    # An empty input string was never a name; it passes through unchanged.
    assert h.strip_name_titles(ctx, "") == ""


def test_strip_is_idempotent_for_unmatched_names():
    ctx = _ctx(prefixes=["Hon "], suffixes=[", MP"])
    assert h.strip_name_titles(ctx, "Honour Mwangi") == "Honour Mwangi"
    assert h.strip_name_titles(ctx, "Hon. Jane Doe") == "Hon. Jane Doe"
    assert h.strip_name_titles(ctx, "Jane Doe") == "Jane Doe"
    assert h.strip_name_titles(ctx, None) is None
