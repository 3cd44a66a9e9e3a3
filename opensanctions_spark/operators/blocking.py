"""Blocking / candidate similarity join + top-k (SURVEY J5, T1, T3).

The reference's xref builds a blocking index that proposes candidate pairs,
scores each pair, and keeps top-k above a cutoff
(``zavod/zavod/integration/dedupe.py:42-90``,
``zavod/zavod/runner/local_enricher.py:33-121``). The Spark-native shape:

1. tokenize the blocking key (names) → explode → (token, id),
2. group by token into buckets (ONE shuffle of the token set) and expand
   candidate pairs inside each bucket with JVM array functions; hot
   tokens are the skew hazard, so a per-token document-frequency cap
   drops stopword-ish tokens before bucketing (the analogue of the
   reference's candidate budgets),
3. score pairs (here: token-overlap Jaccard — pluggable),
4. top-k per subject via row_number window, ties broken by candidate id.

At 100 TB the pair-generation stage dominates; the DF cap bounds each
token bucket to B ids → ≤ B² pairs per token, making worst-case cost
explicit and tunable (exactly why the reference has
max_candidates/patience knobs). The bucket form shuffles the token set
once where an equi-self-join would shuffle it twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _parallelism(df: DataFrame) -> int:
    """Target task count for fan-out stages: the session's shuffle
    partition setting (executor-count × cores on a real cluster)."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def _hot_tokens(tokens: DataFrame, max_token_freq: int) -> DataFrame:
    """Tokens whose document frequency exceeds the skew cap — the
    stopword-ish blocking keys the reference's candidate budgets exist to
    suppress (``zavod/zavod/integration/dedupe.py:47-56``).

    This is the side that gets broadcast: it is SMALL BY CONSTRUCTION
    (only tokens shared by > max_token_freq entities — a few thousand
    stopwords at any corpus size), whereas the kept vocabulary grows
    without bound with the corpus. Broadcasting the kept side would blow
    the broadcast limit at 100 TB; anti-joining against the hot side is
    a map-side filter whose build never grows past the cap's own math
    (≤ total_token_occurrences / max_token_freq distinct tokens)."""
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > max_token_freq)
        .select("token")
    )


def _drop_hot_tokens(
    annotated: DataFrame, tokens: DataFrame, max_token_freq: int
) -> DataFrame:
    """Remove skew-capped tokens via a broadcast LEFT ANTI join against the
    hot-token set (see ``_hot_tokens`` for why this side, never the kept
    vocabulary, is the broadcast build)."""
    return annotated.join(
        F.broadcast(_hot_tokens(tokens, max_token_freq)), "token", "left_anti"
    )


_PAIR_CHUNK = 256


def _chunked_subjects(
    buckets: DataFrame,
    members_col: str,
    directional: bool,
    extra_cols: tuple[str, ...] = (),
    chunk: int = _PAIR_CHUNK,
) -> DataFrame:
    """One row per SUBJECT position of each bucket (members array riding
    along) — the streaming replacement for a single
    ``explode(flatten(transform(members, ...)))`` expansion, whose outer
    array materializes EVERY pair struct of a bucket as ONE value:
    O(|bucket|²) bytes in a single allocation. A 5,000-member bucket
    builds a ~300 MB array before the explode can stream it — observed
    as a GCLocker retry storm and a near-OOM death spiral on
    j5_reference_scorer at sf0.1 (293 s for a query whose pair count is
    ~1.1 B). Here the bucket row explodes into chunk rows (subject
    positions in strides of ``chunk``), is re-spread, then explodes into
    per-subject rows; every allocation on the way is O(|bucket|) and the
    pair structs stream straight into the downstream partial aggregate.

    The re-spread moves chunk rows — a B-member bucket ships
    ceil(B/chunk) copies of its members array (bounded), and in exchange
    the quadratic expansion is balanced at chunk granularity: one
    mega-bucket spreads over ceil(B/chunk) tasks instead of serializing
    on a single straggler (the 100 TB skew shape the rehearsal gates).
    Buckets at or below ``chunk`` members emit exactly one chunk row, so
    the common small-bucket regime shuffles the same rows as before.

    ``directional=False``: subjects iterate positions 0..size-2 (the
    ordered i < j pair form); ``True``: 0..size-1 (every member is a
    subject). Output: ``members_col``, ``extra_cols``, and ``_i`` (the
    0-based subject position)."""
    size = F.size(members_col)
    last = size - 1 if directional else size - 2
    keep = [members_col, *extra_cols]
    starts = buckets.select(
        *keep,
        F.explode(F.sequence(F.lit(0), last, F.lit(chunk))).alias("_start"),
    )
    # re-spread the chunk rows (not the bucket rows): AQE sizes the
    # post-groupBy stage on the tiny pre-explode bytes and would coalesce
    # the quadratic work onto a handful of tasks
    starts = starts.repartition(_parallelism(buckets))
    return starts.select(
        *keep,
        F.explode(
            F.sequence(
                F.col("_start"),
                F.least(F.col("_start") + F.lit(chunk - 1), last),
            )
        ).alias("_i"),
    )


def tokenize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, n_tokens) rows: lowercase, split on non-alnum, distinct
    within each id. Dedup and the per-id token count are computed ROW-WISE
    with array functions before the explode — zero shuffles, where a
    cross-row distinct + count-window would cost two full shuffles of the
    token set. Requires one row per id (the blocking-key contract).

    explode_outer + null filter, NOT plain explode: explode of a computed
    array column triggers InferFiltersFromGenerate, and predicate
    pushdown substitutes the full token expression into the inferred
    size() filter — re-evaluating it per row (measured 25× slower on
    the shingle analogue). The outer form infers nothing; the null
    filter restores inner semantics."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .select(
            "id",
            F.explode_outer("_toks").alias("token"),
            F.size("_toks").alias("n_tokens"),
        )
        .filter(F.col("token").isNotNull())
    )


def candidate_pairs(
    tokens: DataFrame, max_token_freq: int | None = None
) -> DataFrame:
    """Directional candidate pairs (subject_id, candidate_id, shared) from a
    (id, token) frame. Skew guard: tokens appearing in more than
    `max_token_freq` ids are dropped before the self-join."""
    t = tokens
    if max_token_freq is not None:
        t = _drop_hot_tokens(tokens, tokens, max_token_freq)
    buckets = (
        t.groupBy("token")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # ordered (i < j) streaming expansion + mirror AFTER the aggregation:
    # half the quadratic work and half the pre-agg rows of the old
    # directional form, with identical directional output (shared counts
    # are symmetric); see _chunked_subjects for the allocation story.
    subj = _chunked_subjects(buckets, "ids", directional=False)
    x = F.element_at(F.col("ids"), F.col("_i") + 1)
    pair = F.explode(
        F.transform(
            F.slice(F.col("ids"), F.col("_i") + 2, F.size("ids")),
            lambda y: F.struct(x.alias("left_id"), y.alias("right_id")),
        )
    )
    half = (
        subj.select(pair.alias("p"))
        .select("p.left_id", "p.right_id")
        .groupBy("left_id", "right_id")
        .agg(F.count("*").alias("shared"))
    )
    both = F.explode(
        F.array(
            F.struct(
                F.col("left_id").alias("subject_id"),
                F.col("right_id").alias("candidate_id"),
                F.col("shared").alias("shared"),
            ),
            F.struct(
                F.col("right_id").alias("subject_id"),
                F.col("left_id").alias("candidate_id"),
                F.col("shared").alias("shared"),
            ),
        )
    )
    return half.select(both.alias("p")).select("p.*")


def jaccard_scored_pairs(tokens: DataFrame, max_token_freq: int | None = None) -> DataFrame:
    """Candidate pairs with token-set Jaccard score.

    The per-id token counts (the Jaccard denominators) are attached to the
    token rows BEFORE bucketing and ride through pair expansion, so the
    pair table — the largest relation in the whole xref — is never
    re-shuffled against a sizes table. At scale sizes is one row per
    entity (not broadcastable), so carrying two ints through the bucket
    stage replaces two full shuffles of the pair table. Counts come from
    the unfiltered token sets: the DF cap prunes candidate *generation*
    only, never the denominator.

    Pair generation is the single-shuffle bucket form: one groupBy(token)
    shuffle of the annotated token set, then UNORDERED (id_a < id_b) pairs
    expand INSIDE each bucket with JVM array functions — exactly
    n(n-1)/2 structs per bucket via the sorted-members slice trick — and
    the directional view is mirrored AFTER the pair aggregation, when the
    relation has already collapsed to one row per pair. Half the quadratic
    expansion and half the pair-shuffle volume of a directional expansion;
    the equi-self-join alternative would shuffle the token set twice."""
    if "n_tokens" in tokens.columns:
        t = tokens  # per-id counts precomputed row-wise (see tokenize)
    else:
        t = tokens.withColumn(
            "n_tokens", F.count("*").over(Window.partitionBy("id"))
        )
    if max_token_freq is not None:
        t = _drop_hot_tokens(t, tokens, max_token_freq)
    buckets = (
        t.groupBy("token")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("id"), F.col("n_tokens")))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    # Streaming ordered expansion (see _chunked_subjects): per-subject
    # rows, O(|bucket|) allocations, chunk-level balance — replaces the
    # explode(flatten(...)) whose outer array materialized every pair
    # struct of a bucket as one O(|bucket|²) value.
    subj = _chunked_subjects(buckets, "members", directional=False)
    x = F.element_at(F.col("members"), F.col("_i") + 1)
    pair = F.explode(
        F.transform(
            F.slice(F.col("members"), F.col("_i") + 2, F.size("members")),
            lambda y: F.struct(
                x["id"].alias("left_id"),
                y["id"].alias("right_id"),
                x["n_tokens"].alias("left_n"),
                y["n_tokens"].alias("right_n"),
            ),
        )
    )
    half = (
        subj.select(pair.alias("p"))
        .select("p.left_id", "p.right_id", "p.left_n", "p.right_n")
        .groupBy("left_id", "right_id")
        .agg(
            F.count("*").alias("shared"),
            F.first("left_n").alias("left_n"),
            F.first("right_n").alias("right_n"),
        )
        .withColumn(
            "score",
            F.col("shared")
            / (F.col("left_n") + F.col("right_n") - F.col("shared")),
        )
    )
    # mirror to the directional view AFTER aggregation, inside one plan
    # (explode of a 2-struct array, map-side) — a union of two selects
    # over `half` would compile to two subplans and recompute the whole
    # expansion stage twice
    both = F.explode(
        F.array(
            F.struct(
                F.col("left_id").alias("subject_id"),
                F.col("right_id").alias("candidate_id"),
                F.col("shared").alias("shared"),
                F.col("left_n").alias("subject_n"),
                F.col("right_n").alias("candidate_n"),
                F.col("score").alias("score"),
            ),
            F.struct(
                F.col("right_id").alias("subject_id"),
                F.col("left_id").alias("candidate_id"),
                F.col("shared").alias("shared"),
                F.col("right_n").alias("subject_n"),
                F.col("left_n").alias("candidate_n"),
                F.col("score").alias("score"),
            ),
        )
    )
    return half.select(both.alias("p")).select("p.*")


def top_k_per_subject(
    scored: DataFrame,
    k: int,
    subject_col: str = "subject_id",
    order_cols: list | None = None,
    min_score_ratio: float | None = None,
) -> DataFrame:
    """Deterministic top-k matches per subject (T1: limit 10, score desc;
    tie-break by candidate id so results are reproducible).

    ``min_score_ratio`` is the reference's second candidate budget
    (``zavod/zavod/runner/local_enricher.py:36-44``, default 0.1 there):
    a candidate must score at least that fraction of its subject's BEST
    candidate — pruning the long tail of weak matches before the matcher
    spends CPU on them. The per-subject max rides the same window
    partitioning as the rank, so the ratio costs no extra exchange."""
    order = order_cols or [F.col("score").desc(), F.col("candidate_id").asc()]
    w = Window.partitionBy(subject_col).orderBy(*order)
    out = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    if min_score_ratio is not None:
        best = F.max("score").over(Window.partitionBy(subject_col))
        out = (
            out.withColumn("_best", best)
            .filter(F.col("score") >= F.lit(min_score_ratio) * F.col("_best"))
            .drop("_best")
        )
    return out


def bipartite_jaccard_pairs(
    subject_tokens: DataFrame,
    target_tokens: DataFrame,
    max_token_freq: int | None = None,
) -> DataFrame:
    """Cross-frame candidate pairs: subjects match TARGETS only, never each
    other — the enrichment matcher's shape (SURVEY §3.2: subject scope vs
    the full_dataset target store, ``zavod/zavod/runner/local_enricher.py:
    62-102``), where the self-join form would waste the whole
    subject×subject and target×target quadrants.

    Same single-shuffle bucket construction as ``jaccard_scored_pairs``:
    both (id, token) frames are annotated with their per-id token counts,
    tagged with a side marker, unioned, and bucketed by token in ONE
    groupBy; pairs expand inside each bucket strictly across sides. The DF
    cap is measured on the TARGET side (the big one at 100 TB — the
    reference's max_candidates budget is per-subject for the same reason).

    Returns (subject_id, candidate_id, shared, score) with Jaccard over
    the union of both token sets.
    """
    def _counted(frame: DataFrame) -> DataFrame:
        if "n_tokens" in frame.columns:  # precomputed row-wise (tokenize)
            return frame
        return frame.withColumn(
            "n_tokens", F.count("*").over(Window.partitionBy("id"))
        )

    s = _counted(subject_tokens).withColumn("side", F.lit("s"))
    t = _counted(target_tokens).withColumn("side", F.lit("t"))
    if max_token_freq is not None:
        # Hot set measured on the TARGET side (the big one at 100 TB);
        # subject tokens absent from the target frame survive the anti-join
        # but can never pair (the bucket filter needs both sides), so the
        # pair output is identical to the old inner-join-on-kept form.
        hot = F.broadcast(_hot_tokens(target_tokens, max_token_freq))
        s = s.join(hot, "token", "left_anti")
        t = t.join(hot, "token", "left_anti")
    both = s.unionByName(t)
    buckets = (
        both.groupBy("token")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("side") == "s",
                        F.struct(F.col("id"), F.col("n_tokens")),
                    )
                )
            ).alias("subjects"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("side") == "t",
                        F.struct(F.col("id"), F.col("n_tokens")),
                    )
                )
            ).alias("targets"),
        )
        .filter((F.size("subjects") > 0) & (F.size("targets") > 0))
    )
    # streaming |subjects|×|targets| expansion (see _chunked_subjects):
    # one row per subject position, the targets array riding along — the
    # old explode(flatten(...)) materialized the full cross product of a
    # bucket as one O(|subjects|·|targets|) array value
    subj = _chunked_subjects(
        buckets, "subjects", directional=True, extra_cols=("targets",)
    )
    x = F.element_at(F.col("subjects"), F.col("_i") + 1)
    pair = F.explode(
        F.transform(
            F.col("targets"),
            lambda y: F.struct(
                x["id"].alias("subject_id"),
                y["id"].alias("candidate_id"),
                x["n_tokens"].alias("subject_n"),
                y["n_tokens"].alias("candidate_n"),
            ),
        )
    )
    return (
        subj.select(pair.alias("p"))
        .select("p.subject_id", "p.candidate_id", "p.subject_n", "p.candidate_n")
        .groupBy("subject_id", "candidate_id")
        .agg(
            F.count("*").alias("shared"),
            F.first("subject_n").alias("subject_n"),
            F.first("candidate_n").alias("candidate_n"),
        )
        .withColumn(
            "score",
            F.col("shared")
            / (F.col("subject_n") + F.col("candidate_n") - F.col("shared")),
        )
        .drop("subject_n", "candidate_n")
    )


def top_k_blocked_matches(
    tokens: DataFrame,
    k: int,
    max_token_freq: int | None = None,
) -> DataFrame:
    """Fused J5+T1: blocking candidates, Jaccard scores and the per-subject
    top-k in a plan with ONE pair-table exchange.

    ``jaccard_scored_pairs`` + ``top_k_per_subject`` aggregates unordered
    pairs (one exchange), mirrors to the directional view, then the
    window re-shuffles by subject (a second exchange of the full pair
    table). Here the in-bucket expansion emits BOTH directions up front
    and the single exchange is keyed on the SUBJECT alone — hash
    partitioning on a subset of the grouping keys satisfies the
    (subject, candidate) aggregation AND the subject-partitioned rank
    window, so the pair table crosses the wire exactly once (the A1
    subset-clustering trick applied to linkage). At 100 TB that halves
    the dominant shuffle; at bench scale it removes one full stage.
    Output: (subject_id, candidate_id, shared, subject_n, candidate_n,
    score, rank ≤ k)."""
    if "n_tokens" in tokens.columns:
        t = tokens
    else:
        t = tokens.withColumn(
            "n_tokens", F.count("*").over(Window.partitionBy("id"))
        )
    if max_token_freq is not None:
        t = _drop_hot_tokens(t, tokens, max_token_freq)
    buckets = (
        t.groupBy("token")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("id"), F.col("n_tokens")))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    # streaming DIRECTIONAL expansion (see _chunked_subjects): every
    # member is a subject, its candidates are the other members — both
    # directions are emitted pre-shuffle by construction so the single
    # subject-keyed exchange below still serves the agg AND the window
    subj = _chunked_subjects(buckets, "members", directional=True)
    x = F.element_at(F.col("members"), F.col("_i") + 1)
    pair = F.explode(
        F.transform(
            F.filter(F.col("members"), lambda y: y["id"] != x["id"]),
            lambda y: F.struct(
                x["id"].alias("subject_id"),
                y["id"].alias("candidate_id"),
                x["n_tokens"].alias("subject_n"),
                y["n_tokens"].alias("candidate_n"),
            ),
        )
    )
    directional = subj.select(pair.alias("p")).select(
        "p.subject_id", "p.candidate_id", "p.subject_n", "p.candidate_n"
    )
    # THE one exchange: subject-keyed, reused by the agg and the window
    directional = directional.repartition(F.col("subject_id"))
    agg = (
        directional.groupBy("subject_id", "candidate_id")
        .agg(
            F.count("*").alias("shared"),
            F.first("subject_n").alias("subject_n"),
            F.first("candidate_n").alias("candidate_n"),
        )
        .withColumn(
            "score",
            F.col("shared")
            / (F.col("subject_n") + F.col("candidate_n") - F.col("shared")),
        )
    )
    w = Window.partitionBy("subject_id").orderBy(
        F.col("score").desc(), F.col("candidate_id").asc()
    )
    return agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
