"""Canonicalization: union-find over judgement edges (SURVEY J2/J6).

The reference keeps an in-memory union-find resolver over POSITIVE
judgement edges and snapshots it into an immutable entity_id→canonical_id
mapping (``zavod/zavod/integration/dedupe.py:22-39,93-128``). That is
inherently single-node; the Spark-native equivalent is distributed
connected components over the decision edge list.

Algorithm: iterative minimum-label propagation with pointer jumping
(path compression), the DataFrame rendering of the classic
large-star/small-star approach — converges in O(log d) shuffle rounds for
diameter d instead of O(d) for naive propagation, which is what makes it
viable when the decisions table has billions of edges. Each round is two
hash joins on (node) — AQE handles any skewed mega-cluster.

NEGATIVE judgements are filtered out before CC (they must never merge) and
can be re-checked afterwards with `negative_violations`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from opensanctions_spark.session import materialize


#: Edge-count cutoff below which the component solve runs on the driver.
#: The same size-adaptive physical choice Spark makes for broadcast vs
#: shuffle joins: resolver decision tables are human/threshold-curated and
#: stay broadcast-sized even when the statement corpus is 100 TB, so one
#: collect + union-find beats O(log d) shuffle rounds by an order of
#: magnitude. Edge lists past the cutoff (e.g. LSH near-dup graphs over a
#: full crawl) take the distributed pointer-jumping path.
DRIVER_CC_MAX_EDGES = 2_000_000


def _driver_union_find(pairs: list) -> list:
    """In-memory union-find with min-root tracking: same (node, min-label)
    output as the distributed path, exactly (path halving + union by the
    smaller label so the root IS the minimum member)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        # union under the smaller label -> root == min(component)
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    return [(n, find(n)) for n in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_max_edges: int | None = DRIVER_CC_MAX_EDGES,
    distinct_edges: bool = True,
) -> DataFrame:
    """Label each node with the minimum node id of its component.

    `edges` columns src/dst may be any orderable type (use numeric ids for
    scale). Returns DataFrame(node, component). Size-adaptive: edge lists
    under `driver_max_edges` solve as driver union-find (one collect);
    larger graphs run distributed min-label propagation with pointer
    jumping. Pass driver_max_edges=None/0 to force the distributed path.
    """
    from pyspark.storagelevel import StorageLevel

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    if driver_max_edges:
        # ONE bounded Arrow collect of the DISTINCT directional edges
        # decides the path AND delivers the data: union-find is
        # insensitive to edge direction, so symmetrization and a persist
        # + separate probe action are driver-path waste, but dedup keeps
        # duplicate-heavy inputs (e.g. LSH band pairs pre-dedup) on the
        # cheap driver path whenever their DISTINCT size fits — one
        # map-side-combined shuffle vs the far costlier distributed
        # solve. Callers whose edges come out of an aggregation (already
        # one row per pair) pass distinct_edges=False and skip that
        # shuffle entirely. If the limit still overflows, fall through
        # to the distributed solve (the collected prefix is discarded).
        bounded = e.distinct() if distinct_edges else e
        pdf = bounded.limit(driver_max_edges + 1).toPandas()
        if len(pdf) <= driver_max_edges:
            from pyspark.sql.types import StructField, StructType

            labels = _driver_union_find(
                list(zip(pdf["a"].tolist(), pdf["b"].tolist()))
            )
            schema = StructType(
                [
                    StructField("node", e.schema["a"].dataType),
                    StructField("component", e.schema["b"].dataType),
                ]
            )
            if not labels:
                return edges.sparkSession.createDataFrame([], schema=schema)
            # ship the label table back through Arrow (pandas) — ~3× faster
            # than row-at-a-time tuple pickling for big components
            import pandas as pd

            pdf_out = pd.DataFrame(labels, columns=["node", "component"])
            return edges.sparkSession.createDataFrame(pdf_out, schema=schema)
    sym = e.union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull()).distinct()
    # The symmetrized edge list is consumed once per propagation round and
    # its upstream can be an expensive pipeline (e.g. the LSH stage
    # feeding near-dup clustering) — persist it so that pipeline runs
    # exactly once.
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    # initial label = min(self, min neighbor)
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("min_nbr"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("min_nbr")).alias("component"),
        )
    )
    labels = labels.transform(materialize, eager=True, sever=True)

    for _ in range(max_iter):
        # propagate: candidate label for each node = min over neighbor labels
        nbr = (
            sym.join(labels.withColumnRenamed("node", "b_node"),
                     sym.b == F.col("b_node"), "inner")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
            .select(F.col("a").alias("node"), "nbr_component")
        )
        merged = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.col("component").alias("old_component"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # pointer jumping: component = component's component (path compression)
        parent = merged.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_component")
        )
        # carry the pre-round label through so convergence is a filter on
        # the checkpointed frame, not an extra join+action per round
        jumped = merged.join(
            parent, merged.component == F.col("p_node"), "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("p_component"), F.col("component")),
            ).alias("component"),
            "old_component",
        )
        # second pointer jump: compresses paths twice per round, cutting
        # the number of (expensive) propagation rounds for long chains
        parent2 = jumped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_component")
        )
        jumped = jumped.join(
            parent2, jumped.component == F.col("p_node"), "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("p_component"), F.col("component")),
            ).alias("component"),
            "old_component",
        )
        jumped = jumped.transform(materialize, eager=True, sever=True)
        changed = (
            jumped.filter(F.col("component") != F.col("old_component"))
            .limit(1)
            .count()
        )
        labels = jumped.drop("old_component")
        if changed == 0:
            break
    sym.unpersist()  # labels are checkpointed; sym is no longer needed
    return labels


def canonical_map(decisions: DataFrame) -> DataFrame:
    """decisions(left_id, right_id, judgement) → (entity_id, canonical_id).

    POSITIVE edges union into clusters (canonical = min id); NEGATIVE and
    UNSURE edges are excluded, mirroring the resolver semantics of
    ``zavod/zavod/integration/dedupe.py:93-128``.
    """
    pos = decisions.filter(F.col("judgement") == "POSITIVE")
    # decision edges are one row per judged pair — no dedup shuffle needed
    cc = connected_components(
        pos, src="left_id", dst="right_id", distinct_edges=False
    )
    return cc.select(
        F.col("node").alias("entity_id"), F.col("component").alias("canonical_id")
    )


def mapping_fingerprint(mapping: DataFrame) -> str:
    """Order-insensitive content fingerprint of a canonical map:
    ``<row count>:<exact sum of xxhash64(entity_id, canonical_id)>:
    <bit_xor of the same hashes>``.

    The sum runs in DECIMAL(38,0) so it is exact (never wraps) at any
    map size; combined with the count and the xor it is a far stronger
    set digest than xor alone — this string gates a CORRECTNESS
    decision (skipping the prev-side rekey in run/export), and a pure
    64-bit xor cancels whenever equal-count maps differ by rows whose
    hashes xor to zero; a sum only cancels when the differing hashes
    also sum equal, and both only together on an engineered collision.

    One distributed aggregation, no collect of the map itself. The run
    plan records it in the archive manifest at write time so an
    incremental run can PROVE the previous version was written under
    the identical resolver snapshot and skip the prev-side rekey —
    keeping the bucketed version's canonical_id clustering alive for
    the J1 probe and the D0/D1 hash diff (SCALE.md §21c). A format
    change degrades safely: old-format manifests simply mismatch and
    the run pays the one-time rekey it would have skipped."""
    row = mapping.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "sum(cast(xxhash64(entity_id, canonical_id) as decimal(38,0)))"
        ).alias("s"),
        F.expr("bit_xor(xxhash64(entity_id, canonical_id))").alias("x"),
    ).collect()[0]
    return f"{row['n']}:{row['s']}:{row['x']}"


def apply_canonical(statements: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite statement canonical ids through the resolver mapping (J2).

    The mapping is tiny relative to the statements (decisions are
    human/threshold curated) — broadcast it so the rewrite is map-side.
    """
    m = F.broadcast(mapping.withColumnRenamed("canonical_id", "_canon"))
    return (
        statements.join(m, statements.entity_id == m.entity_id, "left")
        .drop(m.entity_id)
        .withColumn("canonical_id", F.coalesce(F.col("_canon"), F.col("entity_id")))
        .drop("_canon")
    )


def canonicalize_values(
    statements: DataFrame,
    mapping: DataFrame,
    props: list[str] | None = None,
) -> DataFrame:
    """Rewrite entity-REFERENCE values through the resolver mapping.

    ``apply_canonical`` rewrites the statement's own canonical id; this
    rewrites the VALUES of entity-typed properties (``holder``, ``owner``,
    ``asset``, …) so edges keep pointing at the surviving canonical
    entity after a merge — the reference store rewrites these via
    ``linker.get_canonical`` when writing statements (nomenklatura store
    writer wrapped at ``zavod/zavod/store.py:36-74``). Without this, an
    Occupancy whose ``holder`` names a merged-away id dangles and the
    holder silently loses its adjacency.

    Only properties registered entity-typed are rewritten (a plain string
    value that happens to collide with an entity id is data, not an
    edge). Map-side: the mapping broadcasts, same as ``apply_canonical``.
    """
    from opensanctions_spark.model.registry import ENTITY_PROPS

    props = list(ENTITY_PROPS) if props is None else props
    m = F.broadcast(
        mapping.select(
            F.col("entity_id").alias("_ref_id"),
            F.col("canonical_id").alias("_ref_canon"),
        )
    )
    return (
        statements.join(
            m,
            (statements.value == m._ref_id) & statements.prop.isin(props),
            "left",
        )
        .withColumn("value", F.coalesce(F.col("_ref_canon"), F.col("value")))
        .drop("_ref_id", "_ref_canon")
    )


def incremental_canonical_map(
    mapping: DataFrame, new_decisions: DataFrame
) -> DataFrame:
    """Apply NEW judgements to an existing canonical mapping, re-running
    connected components only over the affected components (SURVEY §7.3
    "genuinely hard (b)": resolver incrementality).

    `mapping` is a full (entity_id, canonical_id) snapshot (identity rows
    for unmerged entities). Components containing an endpoint of a new
    POSITIVE edge are dissolved into star edges (member → canonical),
    unioned with the new edges, and re-solved; every other component
    passes through untouched — so a nightly xref increment over a 100 TB
    corpus costs O(affected subgraph), not a global recompute.
    """
    pos = new_decisions.filter(F.col("judgement") == "POSITIVE")
    touched_nodes = (
        pos.select(F.col("left_id").alias("entity_id"))
        .union(pos.select(F.col("right_id").alias("entity_id")))
        .distinct()
    )
    touched_comps = (
        mapping.join(touched_nodes, "entity_id", "left_semi")
        .select("canonical_id")
        .distinct()
    )
    affected = mapping.join(
        F.broadcast(touched_comps), "canonical_id", "left_semi"
    )
    old_edges = affected.filter(
        F.col("entity_id") != F.col("canonical_id")
    ).select(
        F.col("entity_id").alias("left_id"),
        F.col("canonical_id").alias("right_id"),
    )
    edges = old_edges.unionByName(pos.select("left_id", "right_id"))
    cc = connected_components(
        edges, src="left_id", dst="right_id", distinct_edges=False
    )
    updated = cc.select(
        F.col("node").alias("entity_id"), F.col("component").alias("canonical_id")
    )
    untouched = mapping.join(
        F.broadcast(touched_comps), "canonical_id", "left_anti"
    )
    return untouched.select("entity_id", "canonical_id").unionByName(updated)


def explode_cluster(
    mapping: DataFrame, decisions: DataFrame, entity_id
) -> tuple[DataFrame, DataFrame]:
    """Undo resolution around one entity (the reference's explode-cluster
    op, ``zavod/zavod/integration/dedupe.py:93-128``): every POSITIVE
    judgement touching `entity_id` is retracted and ONLY its former
    component re-solves from the surviving edges; the rest of the mapping
    passes through untouched.

    Returns (new_mapping, retained_decisions)."""
    target_comp = (
        mapping.filter(F.col("entity_id") == entity_id)
        .select("canonical_id")
        .limit(1)
    )
    members = mapping.join(
        F.broadcast(target_comp), "canonical_id", "left_semi"
    ).select("entity_id")
    touching = (F.col("left_id") == entity_id) | (F.col("right_id") == entity_id)
    retained = decisions.filter(
        ~(touching & (F.col("judgement") == "POSITIVE"))
    )
    # surviving POSITIVE edges inside the exploded component
    comp_edges = (
        retained.filter(F.col("judgement") == "POSITIVE")
        .join(
            F.broadcast(members.withColumnRenamed("entity_id", "left_id")),
            "left_id",
            "left_semi",
        )
    )
    resolved = connected_components(
        comp_edges, src="left_id", dst="right_id", distinct_edges=False
    )
    re_mapped = members.join(
        resolved.withColumnRenamed("node", "entity_id"), "entity_id", "left"
    ).select(
        "entity_id",
        F.coalesce(F.col("component"), F.col("entity_id")).alias("canonical_id"),
    )
    untouched = mapping.join(
        F.broadcast(target_comp), "canonical_id", "left_anti"
    ).select("entity_id", "canonical_id")
    return untouched.unionByName(re_mapped), retained


def negative_violations(mapping: DataFrame, decisions: DataFrame) -> DataFrame:
    """NEGATIVE pairs that ended up in one cluster — must be empty."""
    neg = decisions.filter(F.col("judgement") == "NEGATIVE")
    left = mapping.withColumnRenamed("entity_id", "left_id").withColumnRenamed(
        "canonical_id", "left_canon"
    )
    right = mapping.withColumnRenamed("entity_id", "right_id").withColumnRenamed(
        "canonical_id", "right_canon"
    )
    return (
        neg.join(left, "left_id", "inner")
        .join(right, "right_id", "inner")
        .filter(F.col("left_canon") == F.col("right_canon"))
    )
