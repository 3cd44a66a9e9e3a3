"""The enrichment lifecycle as ONE composed plan (SURVEY §3.2).

Mirrors an enrichment run (``zavod/zavod/runner/enrich.py:202-268`` +
``zavod/zavod/runner/local_enricher.py:33-147``): subject entities are
matched against an enrichment target dataset — same-ID equi-join (J8)
plus the blocking/similarity matcher (J5) with the reference's candidate
budgets (cutoff 0.5, top-10; ``local_enricher.py:36-54,79-80``) — then
each match consults the resolver's judgements:

- POSITIVE → the match's subgraph is expanded to bounded depth (J4,
  ``local_enricher.py:123-147``) gated by the publishable-topic semi-join
  (J12, ``zavod/zavod/runner/util.py:50-80``) and emitted as internal
  statements,
- NEGATIVE → dropped,
- no judgement / UNSURE → the match is emitted as an ``external=True``
  candidate for review (``runner/enrich.py:161-199``).

Spark shape: the subject×target matcher is the BIPARTITE bucket join
(one groupBy(token) shuffle, pairs expand strictly across sides — the
self-join form would waste both same-side quadrants); judgement lookup
is a broadcast join on the normalized pair key; expansion is the depth-k
BFS with a visited anti-join. No stage shuffles the unpruned pair table
twice.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.operators.blocking import (
    bipartite_jaccard_pairs,
    tokenize,
    top_k_per_subject,
)
from opensanctions_spark.operators.graph import expand_subgraph


@dataclass
class EnrichConfig:
    cutoff: float = 0.5            # score cutoff (local_enricher.py:53)
    top_k: int = 10                # matches kept per subject (T1)
    min_score_ratio: float | None = None  # ≥ ratio×best (local_enricher.py:36-44)
    max_token_freq: int | None = 100  # blocking DF cap on the target side
    expand_depth: int = 2          # bounded J4 expansion


def enrich_matches(
    subjects: DataFrame, targets: DataFrame, config: EnrichConfig
) -> DataFrame:
    """Match subjects(id, name) against targets(id, name).

    Returns (subject_id, candidate_id, score, via) — ``via`` is
    ``same_id`` (J8, score 1.0) or ``blocking`` (J5), same-ID wins when
    both propose the pair. Top-k per subject, deterministic ties.
    """
    same = (
        subjects.select(F.col("id").alias("subject_id"))
        .join(
            targets.select(F.col("id").alias("candidate_id")),
            F.col("subject_id") == F.col("candidate_id"),
        )
        .select(
            "subject_id",
            "candidate_id",
            F.lit(1.0).alias("score"),
            F.lit("same_id").alias("via"),
        )
    )
    blocked = (
        bipartite_jaccard_pairs(
            tokenize(subjects, "id", "name"),
            tokenize(targets, "id", "name"),
            max_token_freq=config.max_token_freq,
        )
        .filter(F.col("score") >= config.cutoff)
        .select(
            "subject_id",
            "candidate_id",
            "score",
            F.lit("blocking").alias("via"),
        )
    )
    # ONE exchange for both pair-table stages: clustering by subject_id
    # satisfies the (subject, candidate) dedupe aggregation (subset
    # clustering) AND the top-k window's partitioning — without it the
    # pair table shuffles twice (groupBy on the pair, window on the
    # subject), the dominant cost of the whole stage at scale (the
    # sf10 rehearsal's 15M-pair frame, SCALE.md §21d)
    merged = (
        same.unionByName(blocked)
        .repartition("subject_id")
        .groupBy("subject_id", "candidate_id")
        .agg(F.max("score").alias("score"), F.max("via").alias("via"))
    )
    return top_k_per_subject(
        merged, config.top_k, min_score_ratio=config.min_score_ratio
    ).drop("rank")


def enrich(
    subjects: DataFrame,
    targets: DataFrame,
    edges: DataFrame,
    judgements: DataFrame,
    publishable: DataFrame,
    config: EnrichConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full §3.2 run. Inputs:

    - subjects/targets: (id, name) matchable views of the two scopes,
    - edges: (src, dst) target-graph adjacency for expansion,
    - judgements: (left_id, right_id, judgement) resolver decisions,
      orientation-free (normalized on the least/greatest key here),
    - publishable: (id) targets whose topics allow internal emission
      (the J12 gate set).

    Returns (candidates, internal): ``candidates`` are judged matches to
    emit as ``external=True`` statements or queue for review —
    (subject_id, candidate_id, score, via, judgement NULL/UNSURE);
    ``internal`` is the expanded subgraph to emit as internal statements
    — (node, depth) with depth ≤ config.expand_depth from any
    POSITIVE-judged, publishable match.
    """
    config = config or EnrichConfig()
    judged = enrich_judged(subjects, targets, judgements, config)
    return enrich_outputs(judged, edges, publishable, config)


def enrich_judged(
    subjects: DataFrame,
    targets: DataFrame,
    judgements: DataFrame,
    config: EnrichConfig | None = None,
) -> DataFrame:
    """The shared upstream of both §3.2 outputs: blocking matches with
    resolver judgements attached. Exposed separately so a caller
    consuming BOTH outputs (the CLI verb writes candidates AND the
    internal subgraph) can persist this frame once instead of paying the
    subject×target matching twice."""
    config = config or EnrichConfig()
    matches = enrich_matches(subjects, targets, config)
    j = F.broadcast(
        judgements.select(
            F.least("left_id", "right_id").alias("_a"),
            F.greatest("left_id", "right_id").alias("_b"),
            "judgement",
        )
    )
    return matches.join(
        j,
        (F.least("subject_id", "candidate_id") == F.col("_a"))
        & (F.greatest("subject_id", "candidate_id") == F.col("_b")),
        "left",
    ).drop("_a", "_b")


def enrich_outputs(
    judged: DataFrame,
    edges: DataFrame,
    publishable: DataFrame,
    config: EnrichConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Derive (candidates, internal) from a judged-matches frame — see
    ``enrich`` for the semantics."""
    config = config or EnrichConfig()
    candidates = judged.filter(
        F.col("judgement").isNull() | (F.col("judgement") == "UNSURE")
    )
    seeds = (
        judged.filter(F.col("judgement") == "POSITIVE")
        .join(
            publishable.select(F.col("id").alias("candidate_id")),
            "candidate_id",
            "left_semi",
        )
        .select(F.col("candidate_id").alias("node"))
        .distinct()
    )
    internal = expand_subgraph(edges, seeds, depth=config.expand_depth)
    return candidates, internal


# ---------------------------------------------------------------------------
# Publishability + promotion (``zavod/zavod/runner/util.py:13-130``):
# which expanded entities may be emitted as internal statements.

#: runner/util.py:13-18 — schemata that carry no risk topics themselves
#: but appear in expansion as context around risk targets
SUPPORTING_SCHEMATA = ("Address", "Analyzable", "Identification", "Sanction")


def supporting_schemata() -> frozenset[str]:
    """All schema names in the engine's lattice that are (or descend
    from) a supporting schema — ``is_supporting_schema`` resolved once
    against the registry (the lattice is bounded, so this is a literal
    set, never a join)."""
    from opensanctions_spark.model.registry import SCHEMA_PARENTS

    sup = set(SUPPORTING_SCHEMATA)
    return frozenset(
        name
        for name, parents in SCHEMA_PARENTS.items()
        if name in sup or sup.intersection(parents)
    )


def publishable_ids(entities: DataFrame, enrich_topics: list[str]) -> DataFrame:
    """(id) — the publishable set (runner/util.py:52-63): a non-edge
    entity is publishable when its schema is supporting, or when any of
    its topics intersects the enrichment topics. One filter over the
    entity view; the schema test is a literal ``isin`` against the
    bounded supporting set."""
    topics = F.coalesce(F.col("properties")["topics"], F.array())
    cond = F.col("schema").isin(*sorted(supporting_schemata()))
    if enrich_topics:
        cond = cond | F.arrays_overlap(
            topics, F.array(*[F.lit(t) for t in enrich_topics])
        )
    return entities.filter(cond).select(F.col("canonical_id").alias("id"))


def promotable_edges(edges: DataFrame, publishable: DataFrame) -> DataFrame:
    """Edges are promotable iff ALL endpoints are publishable
    (``should_promote``, runner/util.py:100-111) — two semi-joins
    against the publishable set, never a per-edge collect."""
    pub_src = publishable.select(F.col("id").alias("src"))
    pub_dst = publishable.select(F.col("id").alias("dst"))
    return edges.join(pub_src, "src", "left_semi").join(
        pub_dst, "dst", "left_semi"
    )


def prune_unpublishable_references(
    entities: DataFrame, publishable: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Drop entity-typed references from NON-EDGE entities to ids that
    will not be published (runner/util.py:114-160) so published
    entities carry no dangling references. Returns (pruned_entities,
    removed) where ``removed`` is (canonical_id, prop, ref) — the pairs
    the caller re-emits as external statements so the relationship
    stays visible to the analyzers.

    Shape: explode the entity-typed props once, anti-join the refs
    against the publishable set (one shuffle on the ref id), and
    subtract the removed values from the properties map with a map-only
    rewrite."""
    from opensanctions_spark.model.registry import ENTITY_PROPS

    props = sorted(ENTITY_PROPS)

    def tag(p: str):
        # single-arg closure factory: a default-arg lambda would bind the
        # array INDEX as a second lambda parameter (the F.transform trap)
        return lambda v: F.struct(F.lit(p).alias("prop"), v.alias("ref"))

    refs = entities.select(
        "canonical_id",
        F.explode(
            F.flatten(
                F.array(
                    *[
                        F.transform(
                            F.coalesce(F.col("properties")[p], F.array()),
                            tag(p),
                        )
                        for p in props
                    ]
                )
            )
        ).alias("r"),
    ).select("canonical_id", "r.prop", "r.ref")
    removed = refs.join(
        publishable.select(F.col("id").alias("ref")), "ref", "left_anti"
    )
    removed_map = (
        removed.groupBy("canonical_id", "prop")
        .agg(F.collect_set("ref").alias("_rm"))
        .groupBy("canonical_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("prop", "_rm"))
            ).alias("_removed")
        )
    )
    pruned = (
        entities.join(removed_map, "canonical_id", "left")
        .withColumn(
            "properties",
            F.when(F.col("_removed").isNull(), F.col("properties")).otherwise(
                F.transform_values(
                    "properties",
                    lambda k, v: F.when(
                        F.col("_removed")[k].isNotNull(),
                        F.array_except(v, F.col("_removed")[k]),
                    ).otherwise(v),
                )
            ),
        )
        .drop("_removed")
    )
    return pruned, removed
