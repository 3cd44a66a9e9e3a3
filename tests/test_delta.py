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


def test_scd2_intervals_collapse_and_current(spark):
    from opensanctions_spark.operators.delta import scd2_intervals

    hist = spark.createDataFrame(
        [
            # e1: h1 for v1-v2, h2 from v3 on -> two intervals
            ("e1", 1, "h1"), ("e1", 2, "h1"), ("e1", 3, "h2"),
            # e2: never changes -> one open interval
            ("e2", 1, "hx"), ("e2", 2, "hx"), ("e2", 3, "hx"),
            # e3: flip-flop -> three intervals (runs, not distinct hashes)
            ("e3", 1, "a"), ("e3", 2, "b"), ("e3", 3, "a"),
        ],
        "entity_id STRING, version INT, entity_hash STRING",
    )
    rows = {
        (r["entity_id"], r["valid_from"]): (
            r["entity_hash"], r["valid_to"], r["is_current"]
        )
        for r in scd2_intervals(hist).collect()
    }
    assert rows[("e1", 1)] == ("h1", 3, False)
    assert rows[("e1", 3)] == ("h2", None, True)
    assert rows[("e2", 1)] == ("hx", None, True)
    assert rows[("e3", 1)] == ("a", 2, False)
    assert rows[("e3", 2)] == ("b", 3, False)
    assert rows[("e3", 3)] == ("a", None, True)
    assert len(rows) == 6
