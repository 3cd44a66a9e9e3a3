"""Graph traversal operators (SURVEY J4, J11).

The entity model is a graph via entity-typed properties; the reference
walks it with bounded recursion (enrichment expansion
``zavod/zavod/runner/local_enricher.py:123-147``; nested export
``zavod/zavod/entity.py:174-198``) and checks 2-hop self-reference cycles
(``zavod/zavod/validators/__init__.py:31-46``).

Spark-first: iterate a join k times (k is small and fixed — 1..3) with a
visited-set anti-join so each frontier only carries NEW nodes. Each
iteration is one shuffle; the visited anti-join keeps frontier size
monotone non-increasing on dense graphs — the property that makes depth-k
BFS safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_subgraph(edges: DataFrame, seeds: DataFrame, depth: int) -> DataFrame:
    """Depth-bounded BFS: reachable nodes with their minimal depth.

    edges: (src, dst); seeds: (node). Returns (node, depth) with depth =
    shortest hop count from any seed (0 for seeds themselves).
    """
    visited = seeds.select(F.col("node"), F.lit(0).alias("depth"))
    frontier = visited
    for d in range(1, depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        fresh = nxt.join(visited.select("node"), "node", "left_anti").withColumn(
            "depth", F.lit(d)
        )
        visited = visited.unionByName(fresh)
        frontier = fresh
    return visited


def self_reference_cycles(edges: DataFrame) -> DataFrame:
    """2-hop cycle detection (J11): nodes u with u→v and v→u (u ≠ v).

    One self-join on reversed endpoints; emits each cycling node once.
    """
    fwd = edges.select("src", "dst").distinct()
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        fwd.join(rev, ["src", "dst"], "left_semi")
        .filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("node"))
        .distinct()
    )
