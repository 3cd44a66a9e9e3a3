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
