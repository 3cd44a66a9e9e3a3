"""Ported reference suite: ``zavod/zavod/tests/enrich/test_util.py``
(round-11 closure campaign): publishability of expanded entities —
supporting schemata, topic gates, all-endpoints edge promotion, and the
unpublishable-reference prune. The matching/judgement/expansion halves
of the enrich lifecycle are covered by ``tests/test_enrich_plan.py``."""

from __future__ import annotations

from pyspark.sql import functions as F

from opensanctions_spark.plans.enrich import (
    promotable_edges,
    prune_unpublishable_references,
    publishable_ids,
    supporting_schemata,
)

ENRICH_TOPICS = ["role.pep", "sanction"]


def _entities(spark, rows):
    return spark.createDataFrame(
        rows,
        "canonical_id string, schema string, properties map<string,array<string>>",
    )


def test_is_supporting_schema():
    """runner/util.py:31-38 — Address/Identification/Sanction (and
    descendants like Passport) are supporting; risk-carrying schemata
    are not."""
    sup = supporting_schemata()
    assert {"Address", "Sanction", "Identification", "Passport"} <= sup
    assert "Person" not in sup
    assert "Company" not in sup
    assert "Ownership" not in sup


def test_publishable_non_edges(spark):
    """A non-edge entity is publishable via schema (supporting) or via
    a matching enrichment topic — never merely by existing."""
    ents = _entities(
        spark,
        [
            ("addr-1", "Address", {"full": ["1 Main St"]}),
            ("pep-1", "Person", {"topics": ["role.pep"]}),
            ("plain-1", "Person", {"name": ["No Topic"]}),
            ("sanc-1", "Sanction", {}),
            ("offtopic", "Company", {"topics": ["export.control"]}),
        ],
    )
    got = {r["id"] for r in publishable_ids(ents, ENRICH_TOPICS).collect()}
    assert got == {"addr-1", "pep-1", "sanc-1"}


def test_should_promote_edges(spark):
    """Edges promote iff EVERY endpoint is publishable
    (runner/util.py:100-111)."""
    publishable = spark.createDataFrame([("a",), ("b",)], "id string")
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "x"), ("x", "b"), ("x", "y")], "src string, dst string"
    )
    got = {(r["src"], r["dst"]) for r in
           promotable_edges(edges, publishable).collect()}
    assert got == {("a", "b")}


def test_prune_unpublishable_references(spark):
    """References from a publishable non-edge entity to unpublishable
    ids are removed from the published view and returned for external
    re-emission (runner/util.py:114-160)."""
    ents = _entities(
        spark,
        [
            (
                "sec-1",
                "Security",
                {"name": ["Bond"], "issuer": ["pub-co", "dark-co"]},
            ),
        ],
    )
    publishable = spark.createDataFrame([("pub-co",), ("sec-1",)], "id string")
    pruned, removed = prune_unpublishable_references(ents, publishable)
    props = dict(pruned.collect()[0]["properties"])
    assert props["issuer"] == ["pub-co"]
    assert props["name"] == ["Bond"]
    assert [(r["canonical_id"], r["prop"], r["ref"]) for r in removed.collect()] == [
        ("sec-1", "issuer", "dark-co")
    ]
