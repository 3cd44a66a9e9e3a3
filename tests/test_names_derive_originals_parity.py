"""Parity port of the reference derive-originals suite
(``zavod/zavod/tests/helpers/names/test_derive_originals.py``) over the
engine's ``derive_original_values`` compat helper: exact-match
suppression, the single-original shortcut, substring containment with
alphabetic-first stable selection, cross-property matching, and
LangText/str mixing."""

from __future__ import annotations

from opensanctions_spark.helpers import LangText, Names, derive_original_values


def test_single_original():
    result = derive_original_values(
        Names(name="John/Jon Doe"), Names(name=["John Doe"], alias="Jon Doe")
    )
    assert result == {
        "John Doe": "John/Jon Doe",
        "Jon Doe": "John/Jon Doe",
    }


def test_identical_single_original():
    assert derive_original_values(Names(name="Jim Doe"), Names(name="Jim Doe")) == {}


def test_single_original_partial_exact_match():
    result = derive_original_values(
        Names(name="Jim Doe"), Names(name="Jim Doe", alias="Jim")
    )
    assert result == {"Jim": "Jim Doe"}


def test_exact_match():
    result = derive_original_values(
        Names(name=["John/Jon .. Doe", "John Doe"]),
        Names(name="John Doe", alias="Jon Doe"),
    )
    assert result == {}


def test_substring_match():
    result = derive_original_values(
        Names(name="John Doe; Brandon Doe", alias="John Doe"),
        Names(name="John Doe", alias="Brandon Doe"),
    )
    assert result == {"Brandon Doe": "John Doe; Brandon Doe"}


def test_substring_match_stable_selection():
    # multiple containing originals: the alphabetic first wins,
    # regardless of input order
    result = derive_original_values(
        Names(name=["b) Jonathan", "a) Jonny", "c) Jon"]), Names(name="Jon")
    )
    assert result == {"Jon": "a) Jonny"}


def test_no_match():
    result = derive_original_values(
        Names(name=["Johnn Doee", "Johnnn Doe"]), Names(name="John Doe")
    )
    assert result == {}


def test_empty_original():
    assert derive_original_values(Names(), Names(name="John Doe")) == {}


def test_empty_extracted():
    assert derive_original_values(Names(name="John Doe"), Names()) == {}


def test_cross_property_matching():
    result = derive_original_values(
        Names(alias="John Brandon Doe"), Names(name="John", weakAlias="Brandon")
    )
    assert result == {
        "John": "John Brandon Doe",
        "Brandon": "John Brandon Doe",
    }


def test_multiple_originals_different_props():
    result = derive_original_values(
        Names(name="John Doe", alias="J. Doe"), Names(name="John", alias="J.")
    )
    assert result == {"John": "John Doe", "J.": "J. Doe"}


def test_complex_scenario():
    result = derive_original_values(
        Names(name=["John Brandon Doe", "Jane Smith"], alias="JBD"),
        Names(name=["Jane", "Brandon Doe"], alias="Brandon", weakAlias="Smith"),
    )
    assert result == {
        "Jane": "Jane Smith",
        "Brandon Doe": "John Brandon Doe",
        "Brandon": "John Brandon Doe",
        "Smith": "Jane Smith",
    }


def test_single_original_multiple_props():
    result = derive_original_values(
        Names(name="John Brandon Doe"),
        Names(name="John Doe", alias="Brandon", weakAlias="JBD"),
    )
    assert result == {
        "John Doe": "John Brandon Doe",
        "Brandon": "John Brandon Doe",
        "JBD": "John Brandon Doe",
    }


def test_with_langtext():
    # LangText original, str extracted ("Jon" defeats the single-original
    # shortcut)
    result = derive_original_values(
        Names(name=[LangText(text="John/Jon Doe", lang="eng")], weakAlias="Jon"),
        Names(name="John Doe", alias="Jon Doe"),
    )
    assert result == {"Jon Doe": "John/Jon Doe"}

    # str original, LangText extracted
    result = derive_original_values(
        Names(name="John Doe; Brandon Doe", weakAlias="Jon"),
        Names(alias=[LangText(text="Brandon Doe", lang="eng")]),
    )
    assert result == {"Brandon Doe": "John Doe; Brandon Doe"}

    # mixed str and LangText originals
    result = derive_original_values(
        Names(name=[LangText(text="2. Jane Doe", lang="eng"), "1. Jane Smith"]),
        Names(name="Jane Doe", alias="Jane Smith"),
    )
    assert result == {
        "Jane Doe": "2. Jane Doe",
        "Jane Smith": "1. Jane Smith",
    }
