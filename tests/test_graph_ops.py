"""Graph traversal, match rules and name reduction unit tests
(SURVEY J4/J9/J11, A9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opensanctions_spark.operators.consolidate import reduce_names
from opensanctions_spark.operators.graph import expand_subgraph, self_reference_cycles


def test_expand_subgraph_min_depth(spark):
    # diamond: a→b, a→c, b→d, c→d, d→e ; seed a, depth 2 must NOT reach e,
    # and d gets depth 2 once despite two paths
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
        "src STRING, dst STRING",
    )
    seeds = spark.createDataFrame([("a",)], "node STRING")
    got = {(r["node"], r["depth"]) for r in expand_subgraph(edges, seeds, 2).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 1), ("d", 2)}


def test_expand_subgraph_cycle_safe(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src STRING, dst STRING")
    seeds = spark.createDataFrame([("a",)], "node STRING")
    got = {(r["node"], r["depth"]) for r in expand_subgraph(edges, seeds, 3).collect()}
    assert got == {("a", 0), ("b", 1)}


def test_self_reference_cycles(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("x", "x")], "src STRING, dst STRING"
    )
    got = {r["node"] for r in self_reference_cycles(edges).collect()}
    assert got == {"a", "b"}  # x→x is a self-loop, not a 2-cycle


def test_reduce_names_protected_weak_alias_survives(spark):
    rows = spark.createDataFrame(
        [
            ("e1", "Alpha Corp", "name", False),
            ("e1", "ALPHA CORP", "alias", False),
            ("e1", "The A", "weakAlias", False),
            ("e2", "Beta", "weakAlias", True),   # protected: kept
            ("e3", "Gamma", "weakAlias", False), # no strong name: kept
        ],
        "canonical_id STRING, name STRING, kind STRING, protected BOOLEAN",
    )
    out = {(r["canonical_id"], r["name"], r["kind"]) for r in reduce_names(rows).collect()}
    assert ("e1", "ALPHA CORP", "name") in out          # ci-dedupe, kind wins
    assert all(n != "The A" for _, n, _ in out)          # weak demoted
    assert ("e2", "Beta", "weakAlias") in out
    assert ("e3", "Gamma", "weakAlias") in out
