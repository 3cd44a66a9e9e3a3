"""Parity ports of the reference export-consolidation suites
(``zavod/zavod/tests/exporters/test_consolidate_dates.py``,
``test_consolidate_edges.py``) over the driver-side twins, plus the
DataFrame A8 operator on the same fixture."""

from __future__ import annotations

from types import SimpleNamespace

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


def _ctx():
    return CrawlerContext(
        None, SimpleNamespace(name="testds", metadata={}, lookups={})
    )


def _entity(schema, eid, **props):
    ctx = _ctx()
    e = ctx.make(schema)
    e.id = eid
    for prop, values in props.items():
        e.add(prop, values)
    return e


def _values(entity, prop):
    return [s[1] for s in entity._stmts if s[0] == prop]


def test_simplify_dates():
    entity = _entity(
        "Person", "demo",
        birthDate=["1972", "1972-04", "1972-04-12"],
        createdAt=["2023-01-01", "2023-03-03"],
    )
    assert len(_values(entity, "birthDate")) == 3
    assert len(_values(entity, "createdAt")) == 2
    simple = h.simplify_dates(entity)
    assert _values(simple, "birthDate") == ["1972-04-12"]
    assert _values(simple, "createdAt") == ["2023-01-01"]


def test_simplify_dates_modified_keeps_max():
    entity = _entity(
        "Person", "demo", modifiedAt=["2023-01-01", "2023-03-03"]
    )
    assert _values(h.simplify_dates(entity), "modifiedAt") == ["2023-03-03"]


def test_simplify_dates_dataframe_operator_agrees(spark):
    # the distributed A8 form drops the same prefix values
    from opensanctions_spark.operators.consolidate import drop_prefix_values

    df = spark.createDataFrame(
        [("demo", v) for v in ("1972", "1972-04", "1972-04-12")],
        "entity_id string, value string",
    )
    out = {r["value"] for r in drop_prefix_values(df, keys=["entity_id"]).collect()}
    assert out == {"1972-04-12"}


def test_family_simplified():
    ent = _entity(
        "Family", "test",
        person=["Q7747", "ofac-2332"], relative=["Q7747", "ofac-2332"],
    )
    assert len(_values(ent, "person")) == 2
    simp = h.simplify_undirected(ent)
    assert simp.schema.name == "Family"
    # the stronger Identifier (QID) keeps the source slot
    assert _values(simp, "person") == ["Q7747"]
    assert _values(simp, "relative") == ["ofac-2332"]

    # already-clean edges pass through untouched (no reordering)
    ent = _entity("Family", "test", person=["ofac-2332"], relative=["Q7747"])
    simp = h.simplify_undirected(ent)
    assert _values(simp, "person") == ["ofac-2332"]
    assert _values(simp, "relative") == ["Q7747"]


def test_qid_identifier_ordering_is_numeric():
    # Q7747 outranks Q123 numerically, not lexicographically
    ent = _entity(
        "Family", "test",
        person=["Q7747", "Q123"], relative=["Q7747", "Q123"],
    )
    simp = h.simplify_undirected(ent)
    assert _values(simp, "person") == ["Q7747"]
    assert _values(simp, "relative") == ["Q123"]


def test_directed_edge_untouched():
    # a directed edge with doubled endpoints is NOT simplified (the
    # reference's Payment case: directed edges return unchanged)
    ent = _entity(
        "Ownership", "test",
        owner=["Q7747", "ofac-2332"], asset=["Q7747", "ofac-2332"],
    )
    simp = h.simplify_undirected(ent)
    assert sorted(_values(simp, "owner")) == sorted(["Q7747", "ofac-2332"])
    assert sorted(_values(simp, "asset")) == sorted(["Q7747", "ofac-2332"])


def test_non_two_common_untouched():
    # only EXACTLY two common ids trigger the fix
    ent = _entity(
        "Family", "test",
        person=["Q7747", "ofac-2332", "x-3"],
        relative=["Q7747", "ofac-2332", "x-3"],
    )
    simp = h.simplify_undirected(ent)
    assert len(_values(simp, "person")) == 3
    assert len(_values(simp, "relative")) == 3
