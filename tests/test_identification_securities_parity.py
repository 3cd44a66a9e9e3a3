"""Parity ports of the reference identification, securities, and
name-model suites (``zavod/zavod/tests/helpers/test_identification.py``,
``helpers/test_securities.py``, ``extract/names/test_clean.py``) over
the engine's compat helpers."""

from __future__ import annotations

from types import SimpleNamespace

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


def _ctx():
    return CrawlerContext(
        None, SimpleNamespace(name="testds", metadata={}, lookups={})
    )


def _stmts(entity, prop):
    return [s for s in entity._stmts if s[0] == prop]


# -- identification (test_identification.py) ---------------------------------


def test_make_identification_helper():
    ctx = _ctx()
    person = ctx.make("Person")
    person.id = "jeff"

    ident = h.make_identification(
        ctx, person, number=None, doc_type="drivers license"
    )
    assert ident is None

    ident = h.make_identification(ctx, person, number="1234567")
    assert ident is not None
    assert ident.schema.name == "Identification"
    assert ident.get("holder") == [person.id]
    assert ident.get("number") == ["1234567"]
    assert ident.id is not None

    ident = h.make_identification(ctx, person, number="1234567", passport=True)
    assert ident is not None
    assert ident.schema.name == "Passport"


def test_make_identification_origin():
    ctx = _ctx()
    person = ctx.make("Person")
    person.id = "jeff"
    ident = h.make_identification(
        ctx, person,
        number="1234567", doc_type="passport", passport=True,
        origin="some-model",
    )
    assert ident is not None
    number_stmt = _stmts(ident, "number")[0]
    assert number_stmt[3] == "some-model"  # origin
    holder_stmts = _stmts(person, "passportNumber")
    assert any(s[3] == "some-model" for s in holder_stmts)


# -- securities (test_securities.py) ------------------------------------------


def test_make_security():
    ctx = _ctx()
    entity = h.make_security(ctx, "XS1234567890")
    assert entity.id == "isin-XS1234567890"
    assert entity.schema.name == "Security"
    assert entity.get("isin") == ["XS1234567890"]
    assert not len(entity.get("country"))

    entity = h.make_security(ctx, "DE1234567890")
    assert entity.id == "isin-DE1234567890"
    assert entity.schema.name == "Security"
    assert entity.get("country") == ["de"]


# -- LangText / Names model (extract/names/test_clean.py) ---------------------


def test_lang_text_equality():
    LT = h.LangText
    assert LT(text="John Doe", lang="eng") == LT(text="John Doe", lang="eng")
    assert LT(text="John Doe", lang=None) == LT(text="John Doe", lang=None)
    assert LT(text="John Doe", lang="eng") != LT(text="John Doe", lang=None)
    assert LT(text="John Doe", lang="eng") != LT(text="Jane Doe", lang="eng")
    assert LT(text="John Doe", lang="eng") != LT(text="John Doe", lang="fra")


def test_names_equality():
    N, LT = h.Names, h.LangText
    assert N() == N()
    assert N(name="John Doe") == N(name="John Doe")
    assert N(name="John Doe") != N(name="Jane Doe")
    assert N(name="John Doe") == N(name=["John Doe"])
    assert N(name="John Doe") == N(name=[LT(text="John Doe", lang=None)])
    assert N(name="John Doe") != N(name=[LT(text="John Doe", lang="eng")])
    assert N(name=["A", "B"]) == N(name=["A", "B"])
    assert N(name=["A", "B"]) == N(name=["B", "A"])  # order doesn't matter
    assert N(name=["A"]) != N(alias=["A"])
    assert N(name=["A"]) != N()


def test_names_simplified():
    N, LT = h.Names, h.LangText
    assert N(name=["John Doe"]).simplified().name == "John Doe"
    assert N(name=["John Doe", "Jane Doe"]).simplified().name == [
        "John Doe", "Jane Doe",
    ]
    assert N(name=[LT(text="John Doe", lang=None)]).simplified().name == "John Doe"
    simp = N(name=[LT(text="John Doe", lang="eng")]).simplified().name
    assert set(simp) == {LT(text="John Doe", lang="eng")}
    mixed = N(
        name=[LT(text="John Doe", lang=None), LT(text="جون دو", lang="ara")]
    ).simplified().name
    assert set(mixed) == {"John Doe", LT(text="جون دو", lang="ara")}
    # empty list simplifies to absent
    assert N(name=[]).simplified().name is None


def test_names_tolerates_unknown_keys_on_validation():
    N = h.Names
    # a reviewer-edited payload with an unknown key
    names = N.model_validate({"name": ["John Doe"], "fullName": ["J. Doe"]})
    assert names.name == ["John Doe"]
    # a legacy payload keyed with fields that no longer exist
    names = N.model_validate({"name": ["John Doe"], "firstName": "John"})
    assert names.name == ["John Doe"]
    # a stored-review-shaped dump round-trips
    names = N(name=["John Doe"], alias="Johnny")
    assert N.model_validate(names.model_dump()) == names
