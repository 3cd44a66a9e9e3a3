"""Unit tests: union-find canonicalization (SURVEY J2/J6)."""

from __future__ import annotations

from opensanctions_spark.operators.resolve import (
    canonical_map,
    connected_components,
    negative_violations,
)


def _decisions(spark, rows):
    return spark.createDataFrame(rows, ["left_id", "right_id", "judgement"])


def test_chain_merges_into_one_cluster(spark):
    # a-b, b-c, c-d: diameter-3 chain → single cluster rooted at min
    d = _decisions(
        spark,
        [(1, 2, "POSITIVE"), (2, 3, "POSITIVE"), (3, 4, "POSITIVE")],
    )
    out = {r["entity_id"]: r["canonical_id"] for r in canonical_map(d).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_negative_edges_never_merge(spark):
    d = _decisions(
        spark,
        [(1, 2, "POSITIVE"), (3, 4, "POSITIVE"), (2, 3, "NEGATIVE")],
    )
    mapping = canonical_map(d)
    out = {r["entity_id"]: r["canonical_id"] for r in mapping.collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 3}
    assert negative_violations(mapping, d).count() == 0


def test_two_components_and_star(spark):
    d = _decisions(
        spark,
        [(10, 2, "POSITIVE"), (10, 3, "POSITIVE"), (10, 4, "POSITIVE"),
         (20, 21, "POSITIVE")],
    )
    out = {r["entity_id"]: r["canonical_id"] for r in canonical_map(d).collect()}
    assert out == {10: 2, 2: 2, 3: 2, 4: 2, 20: 20, 21: 20}


def test_long_chain_converges_logarithmically(spark):
    # 64-node chain: naive propagation needs 63 rounds; pointer jumping
    # must finish well inside max_iter=25. driver_max_edges=None forces
    # the distributed path (the small-graph fast path would hide it).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["src", "dst"]
    )
    cc = connected_components(edges, max_iter=25, driver_max_edges=None)
    comps = {r["component"] for r in cc.collect()}
    assert comps == {0}


def test_driver_and_distributed_paths_agree(spark):
    # mixed chains + stars + isolates-in-edges: both physical strategies
    # must produce the identical (node -> min member) labeling.
    pairs = (
        [(i, i + 1) for i in range(0, 20)]          # chain 0..20
        + [(100, k) for k in (101, 102, 103)]        # star
        + [(200, 201), (202, 203), (201, 202)]       # merged pairs
    )
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    fast = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(edges, driver_max_edges=None).collect()
    }
    assert fast == dist
    assert {c for _, c in fast} == {0, 100, 200}


def test_incremental_matches_full_recompute(spark):
    from opensanctions_spark.operators.resolve import incremental_canonical_map

    old = _decisions(
        spark, [(1, 2, "POSITIVE"), (3, 4, "POSITIVE"), (10, 11, "POSITIVE")]
    )
    base = canonical_map(old)
    # identity rows for entities the resolver never touched
    extra = spark.createDataFrame([(20, 20)], ["entity_id", "canonical_id"])
    mapping = base.unionByName(extra)
    # new: bridge clusters {1,2} and {3,4}; link brand-new entity 99 to 20;
    # NEGATIVE edges must be ignored
    new = _decisions(
        spark,
        [(2, 3, "POSITIVE"), (99, 20, "POSITIVE"), (4, 10, "NEGATIVE")],
    )
    got = {
        r["entity_id"]: r["canonical_id"]
        for r in incremental_canonical_map(mapping, new).collect()
    }
    full = canonical_map(
        old.unionByName(new.filter("judgement = 'POSITIVE'"))
    )
    want = {r["entity_id"]: r["canonical_id"] for r in full.collect()}
    # the full recompute sees only edge-connected nodes; entity 20's
    # identity row rides in via the mapping, so compare on shared keys
    assert {k: v for k, v in got.items() if k in want} == want
    assert got[1] == got[4] == 1          # bridged cluster
    assert got[10] == got[11] == 10       # untouched cluster passes through
    assert got[99] == got[20] == 20       # new entity joins via identity comp


def test_explode_cluster_detaches_entity_and_resolves_rest(spark):
    from opensanctions_spark.operators.resolve import explode_cluster

    # chain 1-2-3-4 plus separate pair (10,11); explode entity 2
    old = _decisions(
        spark,
        [(1, 2, "POSITIVE"), (2, 3, "POSITIVE"), (3, 4, "POSITIVE"),
         (10, 11, "POSITIVE")],
    )
    base = canonical_map(old)
    new_map, retained = explode_cluster(base, old, 2)
    got = {r["entity_id"]: r["canonical_id"] for r in new_map.collect()}
    # 2 detaches to itself; 3-4 stay merged via the surviving edge;
    # 1 loses its only link; the (10,11) cluster is untouched
    assert got == {1: 1, 2: 2, 3: 3, 4: 3, 10: 10, 11: 10}
    # retracted judgements are gone from the decision log
    kept = {(r["left_id"], r["right_id"]) for r in retained.collect()}
    assert kept == {(3, 4), (10, 11)}
