"""Unit tests: prefix-date consolidation (SURVEY A8/T4) — semantics from
zavod/zavod/exporters/consolidate.py:48-90."""

from __future__ import annotations

from opensanctions_spark.operators.consolidate import (
    collapse_undirected_edges,
    drop_prefix_values,
    min_max_dates,
)


def test_prefix_values_dropped(spark):
    df = spark.createDataFrame(
        [("e1", "1990"), ("e1", "1990-05"), ("e1", "1990-05-01"),
         ("e1", "1991"), ("e2", "1990")],
        ["entity_id", "value"],
    )
    out = drop_prefix_values(df, keys=["entity_id"])
    got = {(r["entity_id"], r["value"]) for r in out.collect()}
    assert got == {("e1", "1990-05-01"), ("e1", "1991"), ("e2", "1990")}


def test_non_prefix_same_year_kept(spark):
    df = spark.createDataFrame(
        [("e1", "1990-05"), ("e1", "1990-06"), ("e1", "1990")],
        ["entity_id", "value"],
    )
    out = {r["value"] for r in drop_prefix_values(df, keys=["entity_id"]).collect()}
    assert out == {"1990-05", "1990-06"}


def test_duplicates_collapse(spark):
    df = spark.createDataFrame(
        [("e1", "1990"), ("e1", "1990")], ["entity_id", "value"]
    )
    assert drop_prefix_values(df, keys=["entity_id"]).count() == 1


def test_min_max_dates(spark):
    # prefix dates order correctly as strings (the reference exploits this,
    # zavod/zavod/helpers/sanctions.py:106-112)
    df = spark.createDataFrame(
        [("e1", "1990-05"), ("e1", "1990-05-01"), ("e1", "1989")],
        ["entity_id", "value"],
    )
    row = min_max_dates(df, keys=["entity_id"]).collect()[0]
    assert row["min_value"] == "1989"
    assert row["max_value"] == "1990-05-01"


def test_collapse_undirected_edges(spark):
    df = spark.createDataFrame(
        [("b", "a", "Family"), ("a", "b", "Family")], ["src", "dst", "schema"]
    )
    out = collapse_undirected_edges(df, "src", "dst")
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got == {("a", "b")}


def _view(spark, rows):
    """(canonical_id, schema, {prop: [values]}) → entity view frame."""
    return spark.createDataFrame(
        rows,
        "canonical_id string, schema string, properties map<string,array<string>>",
    )


def test_prov_min_dates_drop_prefixes_first(spark):
    """_simplify_dates removes prefix date values BEFORE the provenance
    min reduction (consolidate.py:71-81): createdAt={'2023','2023-01-05'}
    exports '2023-01-05', not '2023'. max props are unaffected by
    construction (a proper prefix sorts before its extension)."""
    from opensanctions_spark.operators.consolidate import consolidate_entities

    view = _view(
        spark,
        [
            ("e1", "Person", {
                "createdAt": ["2023", "2023-01-05"],
                "modifiedAt": ["2024", "2024-02-01"],
            }),
        ],
    )
    row = consolidate_entities(view).collect()[0]
    assert row["properties"]["createdAt"] == ["2023-01-05"]
    assert row["properties"]["modifiedAt"] == ["2024-02-01"]


def test_name_simplification_legal_entities_only(spark):
    """simplify_names early-returns unless schema.is_a('LegalEntity')
    (consolidate.py:124-126): case-duplicate names on a Position stay,
    the same names on a Person collapse; weakAlias demotion likewise
    only fires on the LegalEntity subtree."""
    from opensanctions_spark.operators.consolidate import consolidate_entities

    view = _view(
        spark,
        [
            ("pos", "Position", {"name": ["JOHN DOE", "John Doe"],
                                 "weakAlias": ["John Doe"]}),
            ("per", "Person", {"name": ["JOHN DOE", "John Doe"]}),
        ],
    )
    rows = {r["canonical_id"]: r for r in consolidate_entities(view).collect()}
    assert sorted(rows["pos"]["properties"]["name"]) == ["JOHN DOE", "John Doe"]
    assert rows["per"]["properties"]["name"] == ["John Doe"]
