"""The xref / dedupe lifecycle as ONE composed plan (SURVEY §3.3).

Mirrors ``zavod xref`` (``zavod/zavod/cli/dedupe.py:20-56`` →
``zavod/zavod/integration/dedupe.py:42-90``): a blocking index proposes
scored candidate pairs, deterministic match heuristics
(``zavod/zavod/integration/logic.py:131-148``) force or veto merges,
pairs above the auto-threshold become POSITIVE judgements, the rest
queue for human review, and the accumulated judgements resolve into an
immutable entity_id→canonical_id snapshot consumed by every downstream
read (J2 in ``plans/run.py``).

Spark shape — each stage is the already-proven operator, chained with no
extra shuffles beyond the inventory in SCALE.md §2:

1. token blocking + Jaccard scoring (J5): ONE groupBy(token) shuffle,
   pairs expand inside buckets, DF cap bounds the quadratic term,
2. top-k per subject (T1) + global candidate cap (T3): one window /
   one ordered limit over the already-pruned pair table,
3. attribute attach: the pruned pair table (≤ k·n rows) joins the
   subject attributes twice — AFTER pruning, so the heavy unpruned pair
   table never re-shuffles,
4. match rules (J9): pure column logic, a map stage,
5. connected components over POSITIVE edges (J6) → canonical map,
   size-adaptive (driver union-find under the broadcast cutoff).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.operators.blocking import (
    jaccard_scored_pairs,
    tokenize,
    top_k_per_subject,
)
from opensanctions_spark.operators.match_rules import apply_match_rules
from opensanctions_spark.operators.resolve import canonical_map


@dataclass
class XrefConfig:
    """The reference's candidate budgets (`dedupe.py:47-56`,
    `local_enricher.py:36-54`) as explicit knobs."""

    threshold: float = 0.7        # score ≥ threshold → POSITIVE (auto-merge)
    top_k: int = 10               # T1: matches kept per subject
    min_score_ratio: float | None = None  # candidate must score ≥ ratio×best
    limit: int | None = 5000      # T3: global candidate cap (xref limit)
    max_token_freq: int | None = 100  # blocking DF cap (skew guard)
    #: pair-scoring algorithm (the reference's ``algorithm=`` plug,
    #: ``dedupe.py:50,67-69``): "jaccard" keeps the blocking score;
    #: "reference" re-scores surviving pairs with the feature-based
    #: default (name/phonetic/DOB/identifier — ``operators/scoring.py``)
    algorithm: str = "jaccard"


def xref_pairs(subjects: DataFrame, config: XrefConfig) -> DataFrame:
    """subjects(id, name, strong_ids, id_numbers) → judged decision pairs.

    Returns (left_id, right_id, score, judgement) with left_id < right_id
    (pairs are undirected for dedupe — the reference buckets unordered
    pairs the same way). ``strong_ids`` / ``id_numbers`` are
    array<string> (empty = none) feeding the J9 force/veto rules.
    """
    tokens = tokenize(subjects, "id", "name")
    scored = jaccard_scored_pairs(tokens, max_token_freq=config.max_token_freq)
    # undirect: every pair appears twice in the directional frame with
    # identical score — keep the (smaller, larger) orientation only
    pairs = scored.filter(F.col("subject_id") < F.col("candidate_id"))
    pairs = top_k_per_subject(
        pairs, config.top_k, min_score_ratio=config.min_score_ratio
    ).drop("rank")
    if config.limit is not None:
        # deterministic global cap: total order, ties broken by ids
        pairs = pairs.orderBy(
            F.col("score").desc(), "subject_id", "candidate_id"
        ).limit(config.limit)
    if config.algorithm == "reference":
        # re-score the PRUNED pairs with the feature-based default — the
        # blocking Jaccard remains the candidate-generation metric, the
        # reference algorithm decides the judgement (exactly the
        # reference's index-then-score split)
        from opensanctions_spark.operators.scoring import reference_score_pairs

        pairs = reference_score_pairs(
            pairs.drop("score"), subjects, ids_col="id_numbers"
        ).drop(
            "a_name", "b_name", "a_dob", "b_dob", "a_ids", "b_ids", "score_ppm"
        )
    elif config.algorithm != "jaccard":
        raise ValueError(f"unknown xref algorithm: {config.algorithm!r}")
    attrs = subjects.select("id", "strong_ids", "id_numbers")
    pairs = (
        pairs.join(
            attrs.select(
                F.col("id").alias("subject_id"),
                F.col("strong_ids").alias("left_strong_ids"),
                F.col("id_numbers").alias("left_id_numbers"),
            ),
            "subject_id",
        )
        .join(
            attrs.select(
                F.col("id").alias("candidate_id"),
                F.col("strong_ids").alias("right_strong_ids"),
                F.col("id_numbers").alias("right_id_numbers"),
            ),
            "candidate_id",
        )
    )
    judged = apply_match_rules(pairs, threshold=config.threshold)
    return judged.select(
        F.col("subject_id").alias("left_id"),
        F.col("candidate_id").alias("right_id"),
        "score",
        "judgement",
    )


def review_queue(decisions: DataFrame) -> DataFrame:
    """UNSURE pairs ordered best-first — the human-TUI queue analogue
    (``zavod/zavod/cli/dedupe.py:72-84``). Feed accepted rows back as
    POSITIVE decisions (see ``sources/review.py`` for the S12 workflow).
    """
    return decisions.filter(F.col("judgement") == "UNSURE").orderBy(
        F.col("score").desc(), "left_id", "right_id"
    )


def strong_id_edges(subjects: DataFrame) -> DataFrame:
    """LINEAR exact-duplicate resolution for shared strong identifiers:
    explode ``strong_ids``, group by identifier, and emit one spanning
    edge per member to the group's min-id anchor — (d−1) edges for a
    d-way duplicate group instead of the d(d−1)/2 pairs the blocking
    path would expand.

    Semantically identical to the J9 perfect-strong-id force rule (a
    shared strong id is POSITIVE regardless of score, logic.py:11-107),
    because union-find closes over the spanning edges exactly as it
    would over the full clique. The cost difference is the point at
    scale: a corpus whose duplication factor grows with its size (the
    replicated-names shape) makes Σ d² per group quadratic while Σ d
    stays linear — measured at sf10 in SCALE.md §21. One explode + one
    groupBy(strong_id) shuffle, no pair expansion anywhere.

    Returns (left_id, right_id, score=1.0, judgement='POSITIVE') rows,
    union-compatible with ``xref_pairs`` decisions."""
    exploded = subjects.select(
        "id", F.explode(F.col("strong_ids")).alias("sid")
    )
    anchors = exploded.groupBy("sid").agg(F.min("id").alias("anchor"))
    return (
        exploded.join(anchors, "sid")
        .filter(F.col("id") != F.col("anchor"))
        .select(
            F.least(F.col("anchor"), F.col("id")).alias("left_id"),
            F.greatest(F.col("anchor"), F.col("id")).alias("right_id"),
            F.lit(1.0).alias("score"),
            F.lit("POSITIVE").alias("judgement"),
        )
        .distinct()
    )


def xref_and_resolve(
    subjects: DataFrame, config: XrefConfig | None = None,
    exact_strong_ids: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Full §3.3 lifecycle: subjects → decisions → canonical map.

    Returns (decisions, mapping); the mapping plugs straight into
    ``run_dataset(..., canonical_map=mapping)`` / ``apply_canonical``.
    The decisions frame is consumed twice (resolve + persistence /
    review) — callers writing both should persist it.

    ``exact_strong_ids=True`` adds the linear :func:`strong_id_edges`
    path: exact strong-identifier groups resolve through one groupBy
    instead of the blocking pair expansion, letting the blocking cap
    (``max_token_freq``) be tuned for the FUZZY candidate budget alone.
    """
    config = config or XrefConfig()
    decisions = xref_pairs(subjects, config)
    if exact_strong_ids:
        # Deterministic per-pair resolution: when a pair arrives from
        # BOTH the blocking path and the spanning-edge path the
        # judgement necessarily agrees (a spanning pair shares a strong
        # id, so the blocking path force-judges it POSITIVE —
        # force > veto in apply_match_rules, matching logic_decide),
        # but the surviving score must not be partition-order
        # dependent: keep the max score, breaking judgement ties by
        # rank so persisted decisions are byte-stable across runs.
        j_rank = F.when(F.col("judgement") == "POSITIVE", 2).when(
            F.col("judgement") == "NEGATIVE", 1
        ).otherwise(0)
        decisions = (
            decisions.unionByName(strong_id_edges(subjects))
            .groupBy("left_id", "right_id")
            .agg(
                F.max("score").alias("score"),
                F.max_by(
                    "judgement", F.struct(j_rank.alias("r"), F.col("judgement"))
                ).alias("judgement"),
            )
        )
    mapping = canonical_map(decisions)
    return decisions, mapping


def prune_decisions(decisions: DataFrame) -> DataFrame:
    """``zavod xref-prune`` analogue (``zavod/zavod/cli/dedupe.py:60-69``,
    ``Resolver.prune``): drop the undecided candidate edges (UNSURE) so
    the persisted resolver state carries only human/auto judgements —
    the next xref run regenerates candidates from scratch instead of
    replaying stale ones."""
    return decisions.filter(F.col("judgement") != "UNSURE")


def apply_judgement(
    decisions: DataFrame, left_id: str, right_id: str, judgement: str
) -> DataFrame:
    """Record one human judgement on a candidate pair — the headless form
    of the reference's interactive dedupe queue
    (``zavod/zavod/cli/dedupe.py:72-84``: the TUI pops the best UNSURE
    candidate and writes POSITIVE/NEGATIVE into the resolver; here the
    decision store is the decisions frame and the UI is whatever drives
    the CLI). Pairs are undirected, so the ids are normalized to the
    stored (smaller, larger) orientation. Unknown pairs are appended
    (score 1.0 — a human assertion outranks any blocking score), known
    pairs are overwritten.
    """
    judgement = judgement.upper()
    if judgement not in ("POSITIVE", "NEGATIVE", "UNSURE"):
        raise ValueError(f"bad judgement: {judgement}")
    lo, hi = sorted([left_id, right_id])
    spark = decisions.sparkSession
    match = (F.col("left_id") == lo) & (F.col("right_id") == hi)
    updated = decisions.withColumn(
        "judgement",
        F.when(match, F.lit(judgement)).otherwise(F.col("judgement")),
    )
    new_row = spark.createDataFrame(
        [(lo, hi, 1.0, judgement)],
        "left_id STRING, right_id STRING, score DOUBLE, judgement STRING",
    )
    # append only when the pair is genuinely new (anti-join keeps the
    # plan distributed; the build side is the 1-row assertion)
    missing = new_row.join(
        decisions.select("left_id", "right_id"),
        ["left_id", "right_id"],
        "left_anti",
    )
    return updated.unionByName(missing)


def apply_judgements(
    decisions: DataFrame,
    judgements: list[tuple[str, str, str]],
) -> DataFrame:
    """Bulk form of :func:`apply_judgement` — one broadcast join for a
    whole review session's worth of human decisions instead of one plan
    layer per pair (an interactive session of N judgements would
    otherwise build an N-deep lineage). The judgement table is bounded by
    analyst throughput, so the broadcast is defensible at any corpus
    scale (same argument as the S12 review tables)."""
    if not judgements:
        return decisions
    rows = []
    seen: set[tuple[str, str]] = set()
    # last judgement per pair wins (the reference TUI lets you re-judge)
    for left_id, right_id, judgement in judgements:
        judgement = judgement.upper()
        if judgement not in ("POSITIVE", "NEGATIVE", "UNSURE"):
            raise ValueError(f"bad judgement: {judgement}")
        lo, hi = sorted([left_id, right_id])
        rows.append((lo, hi, 1.0, judgement))
    dedup: dict[tuple[str, str], tuple] = {}
    for r in rows:
        dedup[(r[0], r[1])] = r
    spark = decisions.sparkSession
    jt = spark.createDataFrame(
        list(dedup.values()),
        "left_id STRING, right_id STRING, score DOUBLE, judgement STRING",
    )
    j = F.broadcast(
        jt.select(
            "left_id", "right_id", F.col("judgement").alias("_j"),
        )
    )
    updated = (
        decisions.join(j, ["left_id", "right_id"], "left")
        .withColumn("judgement", F.coalesce(F.col("_j"), F.col("judgement")))
        .drop("_j")
    )
    missing = jt.join(
        decisions.select("left_id", "right_id"),
        ["left_id", "right_id"],
        "left_anti",
    )
    return updated.unionByName(missing)
