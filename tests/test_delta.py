"""Unit tests: entity hashing + version diff (SURVEY D0/D1) — the
A/B/C/CX/D sequence of zavod/zavod/tests/exporters/test_delta.py:18-60."""

from __future__ import annotations

from opensanctions_spark.model.melt import finish_statements
from opensanctions_spark.operators.delta import hashed_entities, version_diff


def _hashed(spark, rows):
    df = spark.createDataFrame(rows, ["entity_id", "prop", "value", "schema"])
    return hashed_entities(finish_statements(df, dataset="test"))


def test_add_mod_del(spark):
    prev = _hashed(
        spark,
        [("a", "name", "Alice", "Person"),
         ("b", "name", "Bob", "Person"),
         ("c", "name", "Carl", "Person")],
    )
    curr = _hashed(
        spark,
        [("a", "name", "Alice", "Person"),        # unchanged
         ("c", "name", "Carl Sagan", "Person"),   # modified
         ("d", "name", "Dora", "Person")],        # added; b deleted
    )
    ops = {r["canonical_id"]: r["op"] for r in version_diff(prev, curr).collect()}
    assert ops == {"b": "DEL", "c": "MOD", "d": "ADD"}


def test_hash_invariant_to_statement_order_and_dupes(spark):
    h1 = _hashed(spark, [("a", "name", "X", "Person"), ("a", "notes", "n", "Person")])
    h2 = _hashed(
        spark,
        [("a", "notes", "n", "Person"), ("a", "name", "X", "Person"),
         ("a", "name", "X", "Person")],
    )
    assert h1.collect()[0]["entity_hash"] == h2.collect()[0]["entity_hash"]
