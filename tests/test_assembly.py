"""Unit tests: statement→entity assembly (SURVEY A1/A6, schema widening)."""

from __future__ import annotations

from opensanctions_spark.model.melt import finish_statements
from opensanctions_spark.operators.assembly import assemble_entities


def _stmts(spark, rows):
    # rows: (entity_id, prop, value, schema)
    df = spark.createDataFrame(rows, ["entity_id", "prop", "value", "schema"])
    return finish_statements(df, dataset="test")


def test_multivalued_props_sorted_distinct(spark):
    stmts = _stmts(
        spark,
        [
            ("e1", "name", "Bob", "Person"),
            ("e1", "name", "Robert", "Person"),
            ("e1", "name", "Bob", "Person"),  # duplicate
        ],
    )
    ents = assemble_entities(stmts).collect()
    assert len(ents) == 1
    assert ents[0]["properties"]["name"] == ["Bob", "Robert"]


def test_schema_widening_to_most_specific(spark):
    # LegalEntity + Person statements → Person (common descendant), as in
    # zavod/zavod/entity.py:155-162.
    stmts = _stmts(
        spark,
        [
            ("e1", "name", "Bob", "LegalEntity"),
            ("e1", "birthDate", "1990", "Person"),
            ("e2", "name", "Acme", "LegalEntity"),
        ],
    )
    out = {r["canonical_id"]: r["schema"] for r in assemble_entities(stmts).collect()}
    assert out == {"e1": "Person", "e2": "LegalEntity"}


def test_empty_values_dropped(spark):
    df = spark.createDataFrame(
        [("e1", "name", "Bob", "Person"), ("e1", "name", "", "Person"),
         ("e1", "notes", None, "Person")],
        ["entity_id", "prop", "value", "schema"],
    )
    stmts = finish_statements(df, dataset="test")
    ents = assemble_entities(stmts).collect()
    assert ents[0]["properties"] == {"name": ["Bob"]}


def test_first_last_seen_rollup(spark):
    stmts = _stmts(spark, [("e1", "name", "Bob", "Person"),
                           ("e1", "name", "Robert", "Person")])
    import pyspark.sql.functions as F

    stmts = stmts.withColumn(
        "first_seen",
        F.when(F.col("value") == "Bob", "2020-01-01T00:00:00").otherwise(
            "2021-01-01T00:00:00"
        ),
    ).withColumn(
        "last_seen",
        F.when(F.col("value") == "Bob", "2025-01-01T00:00:00").otherwise(
            "2024-01-01T00:00:00"
        ),
    )
    row = assemble_entities(stmts).collect()[0]
    assert row["first_seen"] == "2020-01-01T00:00:00"
    assert row["last_seen"] == "2025-01-01T00:00:00"
