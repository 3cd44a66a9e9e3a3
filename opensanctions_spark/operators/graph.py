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
from opensanctions_spark.session import materialize


def expand_subgraph(edges: DataFrame, seeds: DataFrame, depth: int) -> DataFrame:
    """Depth-bounded BFS: reachable nodes with their minimal depth.

    edges: (src, dst); seeds: (node). Returns (node, depth) with depth =
    shortest hop count from any seed (0 for seeds themselves).

    The seed level and each fresh level are lazily localCheckpoint-ed:
    level k is referenced from every later level TWICE (the frontier
    join and the visited anti-join), so an un-materialized plan embeds
    the seed subtree 2^depth-ish times — pipeline_enrich_expand's
    physical plan carried its whole blocking+judgement pipeline EIGHT
    times at depth 2 (plans/r13). The lazy checkpoint computes each
    level once and later levels read its cached blocks; plan build
    stays job-free.

    The edge list is likewise materialized once when more than one hop
    consumes it (the connected-components sym-persist discipline): the
    per-depth joins are NOT exchange-reusable — each join injects its
    own runtime filter on the frontier keys, so the edge pipeline's
    distinct exchange executed once PER DEPTH (profiled: two 17 MB
    writes + two reads of the same exchange in
    pipeline_enrich_expand)."""
    if depth > 1:
        edges = edges.transform(materialize, eager=False)
    visited = seeds.select(F.col("node"), F.lit(0).alias("depth")).transform(
        materialize, eager=False, sever=True
    )
    frontier = visited
    for d in range(1, depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        fresh = (
            nxt.join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
            .transform(materialize, eager=False, sever=True)
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


# -- distributed risk-topic propagation --------------------------------------

#: edge schemata counted as "broad adjacency" for sanction propagation
#: (datasets/_analysis/ann_graph_topics/analyzer.py SANCTION_ADJACENCY_EDGES)
SANCTION_ADJACENCY_EDGES = (
    "Ownership", "Directorship", "Membership", "Employment",
    "Associate", "Family", "Succession",
)
_SANCTION_SEEDS = ("sanction", "sanction.linked")
_CONTROL_SEEDS = ("sanction", "sanction.control")
_EXPORT_SEEDS = ("export.control", "export.control.linked")


def propagate_risk_topics(
    entities: DataFrame,
    topics: DataFrame,
    edges: DataFrame,
    securities: DataFrame | None = None,
    seed_topics: DataFrame | None = None,
    end_dated_entities: DataFrame | None = None,
) -> DataFrame:
    """One propagation hop of the graph risk rules, fully distributed.

    The DataFrame-native counterpart of the reference's
    ``ann_graph_topics`` analyzer
    (``datasets/_analysis/ann_graph_topics/analyzer.py`` — rule parity
    pinned by the differential test in
    ``tests/test_ann_graph_topics_verbatim.py``): the compat
    :class:`opensanctions_spark.store.Store` walk is driver-local by
    design; THIS is the shape that runs the same rules over a 100 TB
    statement graph. One hop per invocation, converging across runs,
    exactly like the reference.

    Inputs:

    - ``entities``: (entity_id, schema) — node schemata (the Person
      check of the RCA rule).
    - ``topics``: (entity_id, topic) — topics contributed by OTHER
      datasets (the caller applies the analyzer's self-exclusion);
      used for the already-tagged SUPPRESSION side.
    - ``edges``: (schema, source_id, target_id, end_dated) — one row
      per edge entity; ``end_dated`` edges terminate propagation.
    - ``securities``: optional (security_id, issuer_id) — the direct
      Company ↔ Security relation (no intermediate edge entity).
    - ``seed_topics``: optional (entity_id, topic) — the SEED side when
      it differs from the suppression side. The reference seeds from
      ALL topics on the source entity (``get_type_values`` has no
      dataset filter — the self-observing descent) but suppresses only
      on other-dataset topics (``non_graph_topics``); pass the
      unfiltered topic set here and the filtered one as ``topics``.
      Defaults to ``topics``.
    - ``end_dated_entities``: optional (entity_id) — entities whose
      ``endDate`` makes them skippable as a direct ADJACENT (the
      analyzer skips end-dated adjacents; for edge-mediated rules the
      edge's own ``end_dated`` flag covers this, but the securities
      relation has no edge entity, so its TARGETS are anti-joined
      against this set).

    Returns the distinct (entity_id, topic) patch set:

    - ``role.rca`` on Persons across a ``Family`` edge from a
      ``role.pep`` source (skipped if already rca/pep);
    - ``sanction.linked`` on broad-adjacency neighbors of ``sanction``
      entities and across the securities relation (skipped if already
      sanction/sanction.linked);
    - ``sanction.control`` one ``Ownership`` hop downward
      (owner → asset) from sanction/sanction.control seeds, with the
      ``sanction.linked`` co-emit (control is suppressed by control
      seeds, the co-emit additionally by sanction seeds);
    - ``export.control.linked`` one Ownership hop downward from
      export.control/export.control.linked seeds (ownership-only,
      downward-only, NO sanctions co-emit — the reference is explicit
      that the ``.linked`` suffix carries control semantics here).

    Scale shape: every rule is a semi-join (seed gate) plus an
    anti-join (already-tagged suppression) on entity ids —
    high-cardinality, near-uniform keys, so the shuffles partition
    evenly; nothing collects, no Python row path, and the final
    ``distinct`` is the only extra exchange. The seed/suppression
    frames are topic-filtered (tiny vs the graph) — AQE broadcasts
    them when they fit.
    """
    seed_side = topics if seed_topics is None else seed_topics

    def seeds(*names: str) -> DataFrame:
        return (
            seed_side.filter(F.col("topic").isin(list(names)))
            .select("entity_id")
            .distinct()
        )

    def blocked(*names: str) -> DataFrame:
        return (
            topics.filter(F.col("topic").isin(list(names)))
            .select("entity_id")
            .distinct()
        )

    live = edges.filter(~F.col("end_dated"))
    # broad adjacency is walked from EITHER endpoint to the counterpart
    sym = (
        live.filter(F.col("schema").isin(list(SANCTION_ADJACENCY_EDGES)))
        .select("schema", F.col("source_id").alias("a"), F.col("target_id").alias("b"))
        .unionByName(
            live.filter(F.col("schema").isin(list(SANCTION_ADJACENCY_EDGES)))
            .select("schema", F.col("target_id").alias("a"), F.col("source_id").alias("b"))
        )
    )

    def _gate(pairs: DataFrame, src_seeds: DataFrame, blocked: DataFrame) -> DataFrame:
        """pairs(a, b) whose a is seeded and whose b is not blocked → b."""
        return (
            pairs.join(src_seeds.withColumnRenamed("entity_id", "a"), "a", "left_semi")
            .select(F.col("b").alias("entity_id"))
            .join(blocked, "entity_id", "left_anti")
        )

    sanction_src = seeds("sanction")
    linked_blocked = blocked(*_SANCTION_SEEDS)

    # rule_pep_family_to_rca: Persons across a Family edge from a PEP
    persons = entities.filter(F.col("schema") == "Person").select("entity_id")
    rca = (
        _gate(
            sym.filter(F.col("schema") == "Family").select("a", "b"),
            seeds("role.pep"),
            blocked("role.rca", "role.pep"),
        )
        .join(persons, "entity_id", "left_semi")
        .withColumn("topic", F.lit("role.rca"))
    )

    # rule_sanction_adjacency over the broad edge schemata
    linked = _gate(sym.select("a", "b"), sanction_src, linked_blocked).withColumn(
        "topic", F.lit("sanction.linked")
    )

    # ...and over the direct Company ↔ Security relation, both directions
    if securities is not None:
        sec_pairs = securities.select(
            F.col("security_id").alias("a"), F.col("issuer_id").alias("b")
        )
        sec_sym = sec_pairs.unionByName(
            sec_pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        sec_hits = _gate(sec_sym, sanction_src, linked_blocked)
        if end_dated_entities is not None:
            # no edge entity carries the endDate here: the TARGET is the
            # adjacent the analyzer skips when end-dated
            sec_hits = sec_hits.join(
                end_dated_entities.select("entity_id"), "entity_id", "left_anti"
            )
        linked = linked.unionByName(
            sec_hits.withColumn("topic", F.lit("sanction.linked"))
        )

    # the two descent rules: Ownership, owner → asset only
    own = live.filter(F.col("schema") == "Ownership").select(
        F.col("source_id").alias("a"), F.col("target_id").alias("b")
    )
    ctl_hits = _gate(own, seeds(*_CONTROL_SEEDS), blocked(*_CONTROL_SEEDS))
    control = ctl_hits.withColumn("topic", F.lit("sanction.control"))
    control_coemit = ctl_hits.join(linked_blocked, "entity_id", "left_anti").withColumn(
        "topic", F.lit("sanction.linked")
    )
    export = _gate(own, seeds(*_EXPORT_SEEDS), blocked(*_EXPORT_SEEDS)).withColumn(
        "topic", F.lit("export.control.linked")
    )

    return (
        rca.unionByName(linked)
        .unionByName(control)
        .unionByName(control_coemit)
        .unionByName(export)
        .distinct()
    )


def propagate_risk_topics_converged(
    entities: DataFrame,
    topics: DataFrame,
    edges: DataFrame,
    securities: DataFrame | None = None,
    max_hops: int = 10,
) -> DataFrame:
    """Iterate :func:`propagate_risk_topics` to its fixpoint.

    The reference analyzer advances ownership descent ONE hop per
    dataset run and relies on successive nightly runs to converge
    (``ann_graph_topics`` module docstring: "a single pass is not
    sufficient"). On Spark the loop is cheap to run to convergence in
    one invocation: each round feeds the emitted patches back into the
    topic set and stops when a round emits nothing new. ``max_hops``
    bounds pathological chains (a 100 TB corporate hierarchy deeper
    than ~10 tiers is data corruption, not structure); hitting the
    bound raises rather than silently truncating.

    Scale shape: per hop the same join plan as the one-shot operator;
    the per-hop fresh patch set and the accumulated topic set are
    ``localCheckpoint``-ed so lineage and the hop plan stay flat (the
    connected-components discipline, ``operators/resolve.py``), and the
    emitted-count check is the only driver-side state. The returned
    patch set is the plain union of the per-hop fresh sets — they are
    pairwise disjoint by construction (hop k's anti-join excludes
    everything accumulated through hop k-1) and each is internally
    distinct (the one-shot operator ends in ``distinct``), so no
    accumulated-set dedup or per-hop re-materialization of the emitted
    side is needed. Returns the distinct (entity_id, topic) patch set
    relative to the INPUT topics (what a converged patch dataset would
    publish).
    """
    emitted_frames: list[DataFrame] = []
    current = topics.transform(materialize, eager=True, sever=True)
    frontier = current
    for _hop in range(max_hops):
        # frontier seeding: only entities whose topics CHANGED last
        # hop can produce new emissions (suppression only grows, so
        # anything an older seed could emit was already emitted the
        # hop after the seed appeared) — each hop joins the edges
        # against the fresh topic delta, not the whole accumulated
        # set
        patch = propagate_risk_topics(
            entities, current, edges, securities, seed_topics=frontier
        )
        fresh = patch.join(current, ["entity_id", "topic"], "left_anti")
        fresh = fresh.transform(materialize, eager=True, sever=True)
        if fresh.limit(1).count() == 0:
            break
        emitted_frames.append(fresh)
        # current stays ONE checkpointed frame per hop: the hop plan
        # references it ~6 times (seed/suppression distincts + the
        # anti-join), so an un-materialized union of k pieces would
        # multiply the optimizer's per-hop work by the hop count
        # (A/B'd: the union-of-checkpoints form measured 12.1 s vs
        # 9.1 s min-of-5 at sf0.1)
        current = current.unionByName(fresh).transform(materialize, eager=True, sever=True)
        frontier = fresh
    else:
        raise ValueError(
            f"risk propagation did not converge within {max_hops} hops"
        )
    if not emitted_frames:
        spark = topics.sparkSession
        return spark.createDataFrame([], "entity_id string, topic string")
    out = emitted_frames[0]
    for f in emitted_frames[1:]:
        out = out.unionByName(f)
    return out


def risk_propagation_statements(
    statements: DataFrame,
    analyzer_dataset: str,
    seed_topics: DataFrame | None = None,
) -> DataFrame:
    """The whole analyzer as ONE plan: canonical statements IR in, patch
    statements out (one hop).

    ``seed_topics`` (entity_id, topic) optionally REPLACES the derived
    seed side — the frontier hook for convergence drivers (the
    ``analyze`` CLI verb passes only the previous hop's fresh patches,
    the same bound :func:`propagate_risk_topics_converged` uses);
    suppression always derives from the statements.

    Everything ``datasets/_analysis/ann_graph_topics/analyzer.py`` does
    around the rules, distributed: the graph inputs (entity schemata,
    non-own-dataset topics — the self-exclusion invariant, edge
    endpoints with end-date gating, the securities relation with the
    adjacent-entity end-date skip), the rules via
    :func:`propagate_risk_topics`, then the patch shaping — schema
    reduced to LegalEntity for legal-entity subtypes, and the
    external-ness rule: a patch is internal iff the target has at least
    one internal statement from a non-analyzer dataset (BASE_ID
    checksum rows discounted). Output is the canonical statements IR
    (``finish_statements`` under ``analyzer_dataset``), ready for the
    archive/export pipeline.

    Scale shape: input derivation is three filters and one
    schema-resolution aggregate over the statements; the substance set
    and end-date set are filtered projections joined back semi/anti —
    nothing leaves the cluster.
    """
    from opensanctions_spark.constants import (
        ANALYZER_DATASETS,
        BASE_ID,
        ORIGIN_INFERRED,
    )
    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.model.registry import (
        EDGE_SCHEMATA,
        SCHEMA_PARENTS,
        common_schema_rank_column,
    )

    st = statements
    entities = st.groupBy("canonical_id").agg(
        F.max_by("schema", common_schema_rank_column(F.col("schema"))).alias(
            "schema"
        )
    ).select(F.col("canonical_id").alias("entity_id"), "schema")
    # SEED side: ALL topics, including the analyzer's own prior-run
    # patches (get_type_values has no dataset filter — the
    # self-observing descent that lets nightly runs advance one hop);
    # SUPPRESSION side: other-dataset topics only (non_graph_topics)
    all_topics = seed_topics
    if all_topics is None:
        all_topics = (
            st.filter(F.col("prop") == "topics")
            .select(
                F.col("canonical_id").alias("entity_id"),
                F.col("value").alias("topic"),
            )
            .distinct()
        )
    topics = (
        st.filter(
            (F.col("prop") == "topics")
            & (F.col("dataset") != F.lit(analyzer_dataset))
        )
        .select(F.col("canonical_id").alias("entity_id"), F.col("value").alias("topic"))
        .distinct()
    )
    end_dated = (
        st.filter(F.col("prop") == "endDate")
        .select(F.col("canonical_id").alias("entity_id"))
        .distinct()
    )

    # edge entities → (schema, source_id, target_id, end_dated)
    src_map = F.create_map(
        *[F.lit(x) for s, spec in EDGE_SCHEMATA.items() for x in (s, spec[0])]
    )
    tgt_map = F.create_map(
        *[F.lit(x) for s, spec in EDGE_SCHEMATA.items() for x in (s, spec[1])]
    )
    edge_st = st.filter(F.col("schema").isin(list(EDGE_SCHEMATA)))
    srcs = edge_st.filter(F.col("prop") == src_map[F.col("schema")]).select(
        "canonical_id", "schema", F.col("value").alias("source_id")
    )
    tgts = edge_st.filter(F.col("prop") == tgt_map[F.col("schema")]).select(
        "canonical_id", "schema", F.col("value").alias("target_id")
    )
    edges = (
        srcs.join(tgts, ["canonical_id", "schema"])
        .join(
            end_dated.select(F.col("entity_id").alias("canonical_id")).withColumn(
                "end_dated", F.lit(True)
            ),
            "canonical_id",
            "left",
        )
        .select(
            "schema",
            "source_id",
            "target_id",
            F.coalesce(F.col("end_dated"), F.lit(False)).alias("end_dated"),
        )
    )

    sec_pairs = st.filter(
        (F.col("schema") == "Security") & (F.col("prop") == "issuer")
    ).select(
        F.col("canonical_id").alias("security_id"), F.col("value").alias("issuer_id")
    )
    patches = propagate_risk_topics(
        entities,
        topics,
        edges,
        securities=sec_pairs,
        seed_topics=all_topics,
        end_dated_entities=end_dated,
    )

    # patch shaping: LegalEntity reduction + the published-substance rule
    legal = [
        s
        for s, parents in SCHEMA_PARENTS.items()
        if s == "LegalEntity" or "LegalEntity" in parents
    ]
    substance = (
        st.filter(
            (~F.col("external"))
            & (~F.col("dataset").isin(list(ANALYZER_DATASETS)))
            & (F.col("prop") != BASE_ID)
        )
        .select(F.col("canonical_id").alias("entity_id"))
        .distinct()
        .withColumn("_substance", F.lit(True))
    )
    out = (
        patches.join(entities, "entity_id")
        .join(substance, "entity_id", "left")
        .select(
            "entity_id",
            F.when(F.col("schema").isin(legal), F.lit("LegalEntity"))
            .otherwise(F.col("schema"))
            .alias("schema"),
            F.lit("topics").alias("prop"),
            F.col("topic").alias("value"),
            F.lit(ORIGIN_INFERRED).alias("origin"),
            (~F.coalesce(F.col("_substance"), F.lit(False))).alias("external"),
        )
    )
    return finish_statements(out, dataset=analyzer_dataset)
