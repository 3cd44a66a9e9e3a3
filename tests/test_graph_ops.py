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


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    from pyspark.sql import functions as F

    from opensanctions_spark.catalog import load
    from opensanctions_spark.operators.skew import salted_sum_count

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("decimal(18,2)").alias("qty")
    )
    salted = {
        (r["l_returnflag"]): (str(r["total"]), r["n_rows"])
        for r in salted_sum_count(li, ["l_returnflag"], "qty").collect()
    }
    plain = {
        (r["l_returnflag"]): (str(r["total"]), r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("qty").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert salted == plain


def test_replicated_salt_join_equals_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from opensanctions_spark.catalog import load
    from opensanctions_spark.operators.skew import replicate_broadcast_join

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    got = replicate_broadcast_join(orders, cust, "o_custkey", "c_custkey")
    assert got.count() == orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    assert set(got.columns) == {"o_orderkey", "o_custkey", "c_custkey", "c_name"}


def test_asof_join_semantics(spark):
    from opensanctions_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k LONG, t LONG, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, 7, "r7"), (1, 10, "r10"), (1, 15, "r15"), (3, 1, "rx")],
        "k LONG, rt LONG, val STRING",
    )
    out = asof_join(left, right, key="k", left_ts="t", right_ts="rt",
                    payload=["val", "rt"])
    got = {r["tag"]: (r["val"], r["rt"]) for r in out.collect()}
    assert got["a"] == ("r10", 10)      # tie at t=10 matches (>= semantics)
    assert got["b"] == ("r15", 15)      # latest of several priors
    assert got["c"] == (None, None)     # nothing at-or-before t=5
    assert got["d"] == (None, None)     # key has no right rows at all
    assert out.count() == 4             # left-join cardinality preserved
