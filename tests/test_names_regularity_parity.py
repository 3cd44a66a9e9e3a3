"""Parity port of the reference name-regularity suite
(``zavod/zavod/tests/helpers/names/test_regularity.py``) over the
engine's compat helpers, using testdataset1's exact names config
(``zavod/zavod/tests/fixtures/testdataset1/testdataset1.yml:34-44``):
Organization schema rule (reject_chars ",", reject_strings
[" and ", " or "], min_length 3, single_token_min_length 4,
reject_leading_digit) + the three suggestion flags. The suite pins the
reference's MERGE semantics (meta/names.py:112-127): a dataset that
configures only Organization keeps the built-in Person
require-space/reject-chars baselines."""

from __future__ import annotations

from types import SimpleNamespace

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext

TESTDATASET1_NAMES = {
    "schema_rules": {
        "Organization": {
            "reject_chars": ",",
            "reject_strings": [" and ", " or "],
            "min_length": 3,
            "single_token_min_length": 4,
            "reject_leading_digit": True,
        }
    },
    "suggest_weak_alias_person_single_token": True,
    "suggest_abbreviation_uppercase_org_single_token_shorter_than": 8,
    "suggest_abbreviation_non_person_single_token_shorter_than": 5,
}


def _ctx(metadata=None):
    config = SimpleNamespace(name="testds", metadata=metadata or {}, lookups={})
    return CrawlerContext(None, config)


def _entity(ctx, schema, eid):
    e = ctx.make(schema)
    e.id = eid
    e.dataset = ctx.dataset
    return e


def _fixtures():
    ctx = _ctx(metadata={"names": TESTDATASET1_NAMES})
    return (
        _entity(ctx, "Organization", "doe"),
        _entity(ctx, "Person", "jon"),
        _entity(ctx, "LegalEntity", "le"),
    )


def test_is_name_irregular():
    """test_regularity.py:10-43."""
    org, person, _ = _fixtures()

    assert not h.is_name_irregular(org, "Org NPO")

    # rejected chars (the dataset's "," ADDS to the baseline)
    assert h.is_name_irregular(org, "Org NPO, Org Charitable")

    # rejected strings, case-insensitive
    assert h.is_name_irregular(org, "Company Alpha and Company Beta")
    assert h.is_name_irregular(org, "Company Alpha OR Company Beta")
    assert not h.is_name_irregular(org, "Org NPO")

    # nullwords
    assert h.is_name_irregular(org, "Unknown")

    # min_length — but not for dense scripts (Hangul)
    assert h.is_name_irregular(org, "a")
    assert not h.is_name_irregular(org, "A a")
    assert not h.is_name_irregular(org, "벡셀")

    # single_token_min_length (4 for Organization in this dataset)
    assert h.is_name_irregular(org, "Aaa")
    assert not h.is_name_irregular(org, "Aaaa")

    # require_space: Person default survives the Organization-only
    # dataset config (the merge-semantics pin); dense scripts exempt
    assert h.is_name_irregular(person, "Johnson")
    assert not h.is_name_irregular(org, "Johnson")
    assert not h.is_name_irregular(person, "김정은")


def test_suggest_person_single_token():
    """test_regularity.py:46-62."""
    _, person, _ = _fixtures()

    reg = h.check_name_regularity(person, "Johnson")
    assert reg.is_irregular
    assert reg.suggested_prop == "weakAlias"

    # honorific prefix stripped to a single token still suggests
    reg = h.check_name_regularity(person, "Mr. Johnson")
    assert reg.is_irregular
    assert reg.suggested_prop == "weakAlias"

    reg = h.check_name_regularity(person, "John Smith")
    assert not reg.is_irregular


def test_suggest_weak_alias_uppercase_org_single_token_shorter_than():
    """test_regularity.py:65-86 (threshold 8)."""
    org, _, _ = _fixtures()

    reg = h.check_name_regularity(org, "ABC")
    assert reg.is_irregular
    assert reg.suggested_prop == "abbreviation"

    # at/above the threshold: not caught (len 8, not < 8)
    reg = h.check_name_regularity(org, "ABCDEFGH")
    assert not reg.is_irregular

    # has lowercase / has space: not caught
    reg = h.check_name_regularity(org, "Abcde")
    assert not reg.is_irregular
    reg = h.check_name_regularity(org, "AB CD")
    assert not reg.is_irregular


def test_suggest_abbreviation_non_person_single_token_shorter_than():
    """test_regularity.py:89-116 (threshold 5)."""
    _, person, legal = _fixtures()

    reg = h.check_name_regularity(legal, "ABCD")
    assert reg.is_irregular
    assert reg.suggested_prop == "abbreviation"

    # a Person is caught FIRST by the person-single-token heuristic
    reg = h.check_name_regularity(person, "ABCD")
    assert reg.is_irregular
    assert reg.suggested_prop == "weakAlias"

    # at/above threshold or has lowercase: not caught
    reg = h.check_name_regularity(legal, "ABCDE")
    assert not reg.is_irregular
    reg = h.check_name_regularity(legal, "Abcd")
    assert not reg.is_irregular


def test_reject_leading_digit():
    """test_regularity.py:119-133: flag on in testdataset1; a dataset
    with NO names config leaves leading digits regular."""
    org, _, _ = _fixtures()
    assert h.is_name_irregular(org, "1 Some Organization")
    assert not h.is_name_irregular(org, "Some Organization 1")

    ctx2 = _ctx()
    org2 = _entity(ctx2, "Organization", "b")
    assert not h.is_name_irregular(org2, "1 Some Organization")


def test_allow_chars_subtracts_from_baseline():
    """meta/names.py:54-59 reject_chars_consolidated: allow_chars remove
    otherwise-rejected characters for that schema."""
    ctx = _ctx(metadata={"names": {
        "schema_rules": {"Person": {"allow_chars": ":"}}
    }})
    person = _entity(ctx, "Person", "p")
    # ":" is in the Person baseline but allowed here
    assert not h.is_name_irregular(person, "John: Smith")
    # the rest of the baseline still applies
    assert h.is_name_irregular(person, "John (Smith)")


def test_supplied_rule_defaults_floor_to_two():
    """A dataset-supplied rule for a schema with no built-in default
    still gets the reference CleaningSpec's min_length=2 /
    single_token_min_length=2 floors."""
    ctx = _ctx(metadata={"names": {
        "schema_rules": {"Organization": {"reject_chars": ","}}
    }})
    org = _entity(ctx, "Organization", "o")
    assert h.is_name_irregular(org, "a")          # min_length 2
    assert not h.is_name_irregular(org, "ab")     # single token, len 2


# -- NamesSpec validation (reference test_names_spec.py) ---------------------


def _spec_from(metadata):
    ctx = _ctx(metadata=metadata)
    return h.names_spec(ctx.dataset)


def test_typo_in_default_schema_override_raises():
    import pytest

    with pytest.raises(ValueError):
        _spec_from({"names": {
            "schema_rules": {"Person": {"rejct_strings": ["and"]}}
        }})


def test_wrong_type_in_default_schema_override_raises():
    import pytest

    with pytest.raises(ValueError):
        _spec_from({"names": {
            "schema_rules": {"Person": {"reject_chars": [",", ";"]}}
        }})


def test_non_dict_default_schema_override_raises():
    import pytest

    with pytest.raises(ValueError):
        _spec_from({"names": {"schema_rules": {"Person": None}}})


def test_typo_in_new_schema_raises():
    import pytest

    with pytest.raises(ValueError):
        _spec_from({"names": {
            "schema_rules": {"Organization": {"rejct_strings": ["and"]}}
        }})


def test_typo_in_top_level_key_raises():
    import pytest

    with pytest.raises(ValueError):
        _spec_from({"names": {"prefixes_stripp": ["Hon "]}})


def test_default_schema_override_merges_with_defaults():
    spec = _spec_from({"names": {
        "schema_rules": {"Person": {"reject_strings": [" and "]}}
    }})
    rule = spec.get_rule(SimpleNamespace(is_a=lambda n: n == "Person"))
    # the override applies; default baseline and require_space retained
    assert rule["reject_strings"] == [" and "]
    assert ";" in rule["reject_chars_baseline"]
    assert rule["require_space"] is True
    # other default schemata untouched
    vessel = spec.get_rule(SimpleNamespace(is_a=lambda n: n == "Vessel"))
    assert vessel is not None and ";" in vessel["reject_chars_baseline"]


def test_input_dict_is_not_mutated():
    meta = {"names": {"schema_rules": {"Person": {"reject_strings": [" and "]}}}}
    first = _spec_from(meta)
    assert meta == {
        "names": {"schema_rules": {"Person": {"reject_strings": [" and "]}}}
    }
    second = _spec_from(meta)
    p1 = first.get_rule(SimpleNamespace(is_a=lambda n: n == "Person"))
    p2 = second.get_rule(SimpleNamespace(is_a=lambda n: n == "Person"))
    assert p1 == p2
    assert p2["reject_strings"] == [" and "]
