"""Record-linkage catalog queries: blocking join, top-k, interval overlap.

SURVEY J5 (blocking/candidate similarity join), T1/T3 (top-k per subject,
candidate caps), J7 (interval-overlap range join inside edge dedupe).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opensanctions_spark.catalog import load, register
from opensanctions_spark.operators.blocking import (
    jaccard_scored_pairs,
    top_k_per_subject,
)


@register(
    "j5_t1_blocking_topk",
    oracle="""
WITH raw_tokens AS (
  SELECT p_partkey AS id,
         unnest(string_split(p_name, ' ')) AS tok,
         p_brand AS brand
  FROM part
),
tokens AS (
  SELECT DISTINCT id, tok || '#' || brand AS token FROM raw_tokens
),
sizes AS (SELECT id, COUNT(*) AS n_tokens FROM tokens GROUP BY id),
pairs AS (
  SELECT a.id AS subject_id, b.id AS candidate_id, COUNT(*) AS shared
  FROM tokens a JOIN tokens b ON a.token = b.token AND a.id <> b.id
  GROUP BY a.id, b.id
),
scored AS (
  SELECT p.subject_id, p.candidate_id, p.shared,
         CAST(p.shared AS DOUBLE)
             / CAST(sa.n_tokens + sb.n_tokens - p.shared AS DOUBLE) AS score
  FROM pairs p
  JOIN sizes sa ON p.subject_id = sa.id
  JOIN sizes sb ON p.candidate_id = sb.id
),
ranked AS (
  SELECT subject_id, candidate_id, shared, score,
         row_number() OVER (PARTITION BY subject_id
                            ORDER BY score DESC, candidate_id) AS rank
  FROM scored
)
SELECT subject_id, candidate_id, shared, score, rank
FROM ranked WHERE rank <= 5
""",
)
def j5_t1_blocking_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking similarity join + deterministic top-k (J5 + T1).

    Token blocking on (word, brand) compound keys bounds bucket size — the
    Spark analogue of the reference's candidate budgets
    (``zavod/zavod/runner/local_enricher.py:36-44``: ≤75 candidates,
    min_score_ratio). Pairs sharing a blocking key are scored with token
    Jaccard, then row_number keeps top-5 per subject, ties broken by
    candidate id. In-bucket pair expansion is the scale-dominant stage
    (one groupBy(token) shuffle, pairs built JVM-side inside buckets): a
    document-frequency cap (operators.blocking.candidate_pairs) bounds it
    to O(buckets × B²)."""
    part = load(spark, sf_dir, "part")
    # compound tokens + per-id counts built row-wise (array_distinct /
    # size before the explode): zero shuffles where a cross-row distinct
    # + count-window would cost two
    toks = F.array_distinct(
        F.transform(
            F.split(F.col("p_name"), " "),
            lambda w: F.concat(w, F.lit("#"), F.col("p_brand")),
        )
    )
    tokens = (
        part.select(F.col("p_partkey").alias("id"), toks.alias("_toks"))
        .select(
            "id",
            # outer + null filter: explode of a computed array column
            # triggers InferFiltersFromGenerate expression duplication
            # (see operators/blocking.tokenize)
            F.explode_outer("_toks").alias("token"),
            F.size("_toks").alias("n_tokens"),
        )
        .filter(F.col("token").isNotNull())
    )
    # fused J5+T1 (operators/blocking.top_k_blocked_matches): the pair
    # table crosses the wire once, keyed on subject — the agg and the
    # rank window share that single exchange
    from opensanctions_spark.operators.blocking import top_k_blocked_matches

    top = top_k_blocked_matches(tokens, k=5)
    return top.select(
        "subject_id",
        "candidate_id",
        "shared",
        (F.col("shared").cast("double")
         / (F.col("subject_n") + F.col("candidate_n") - F.col("shared")).cast("double")
         ).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "j5_min_score_ratio",
    oracle="""
WITH raw_tokens AS (
  SELECT DISTINCT p_partkey AS id,
         unnest(string_split(p_name, ' ')) AS tok,
         p_brand AS brand
  FROM part
),
tokens AS (
  SELECT DISTINCT id, tok || '#' || brand AS token FROM raw_tokens
),
sizes AS (SELECT id, COUNT(*) AS n_tokens FROM tokens GROUP BY id),
pairs AS (
  SELECT a.id AS subject_id, b.id AS candidate_id, COUNT(*) AS shared
  FROM tokens a JOIN tokens b ON a.token = b.token AND a.id <> b.id
  GROUP BY a.id, b.id
),
scored AS (
  SELECT p.subject_id, p.candidate_id, p.shared,
         CAST(p.shared AS DOUBLE)
             / CAST(sa.n_tokens + sb.n_tokens - p.shared AS DOUBLE) AS score
  FROM pairs p
  JOIN sizes sa ON p.subject_id = sa.id
  JOIN sizes sb ON p.candidate_id = sb.id
),
ranked AS (
  SELECT subject_id, candidate_id, shared, score,
         row_number() OVER (PARTITION BY subject_id
                            ORDER BY score DESC, candidate_id) AS rank,
         MAX(score) OVER (PARTITION BY subject_id) AS best
  FROM scored
)
SELECT subject_id, candidate_id, shared, score, rank
FROM ranked WHERE rank <= 5 AND score >= 0.5 * best
""",
)
def j5_min_score_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocking top-k under BOTH reference candidate budgets
    (``zavod/zavod/runner/local_enricher.py:36-44``): top-5 per subject
    AND score ≥ 0.5 × the subject's best — the relative budget that
    prunes the weak-match tail before matcher CPU. Same single-shuffle
    bucket construction as ``j5_t1_blocking_topk``; the ratio's
    per-subject max rides the rank window's partitioning, so the second
    budget costs zero additional exchanges."""
    from opensanctions_spark.operators.blocking import (
        jaccard_scored_pairs,
        top_k_per_subject,
    )

    part = load(spark, sf_dir, "part")
    toks = F.array_distinct(
        F.transform(
            F.split(F.col("p_name"), " "),
            lambda w: F.concat(w, F.lit("#"), F.col("p_brand")),
        )
    )
    tokens = (
        part.select(F.col("p_partkey").alias("id"), toks.alias("_toks"))
        .select(
            "id",
            F.explode_outer("_toks").alias("token"),
            F.size("_toks").alias("n_tokens"),
        )
        .filter(F.col("token").isNotNull())
    )
    scored = jaccard_scored_pairs(tokens)
    top = top_k_per_subject(scored, k=5, min_score_ratio=0.5)
    return top.select(
        "subject_id",
        "candidate_id",
        "shared",
        "score",
        F.col("rank").cast("long").alias("rank"),
    )


#: Epoch window width for the time-bucketed range join: 6 h in µs. Sized
#: ~1.5× the p99 interval duration (≈228 min in the events table) so the
#: per-interval window fan-out stays ≈1 while per-(user, window) bucket
#: population is bounded by the per-user event *rate*, not the corpus size.
J7_WINDOW_US = 21_600_000_000


@register(
    "j7_interval_overlap",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + CAST(floor(value * 60 * 1000000) AS BIGINT) AS end_us
  FROM events
)
SELECT a.user_id AS user_id, a.event_id AS left_id, b.event_id AS right_id
FROM iv a JOIN iv b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND a.start_us <= b.end_us
 AND b.start_us <= a.end_us
""",
)
def j7_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap range join (J7): the temporal-compatibility core of
    edge dedupe (``zavod/zavod/integration/edges.py:129-195`` — partial-ISO
    interval overlap: start1 ≤ end2 AND start2 ≤ end1). Events become
    [ts, ts + value minutes) intervals.

    Scale shape: a plain (user_id) equi-join makes per-key cost n² with n
    growing linearly in the data — the one query that got *relatively*
    worse with scale. Instead each interval is exploded to the fixed-width
    epoch windows it touches (sequence of start_us div W .. end_us div W,
    fan-out ≈ 1 for W ≫ typical duration) and the windowed table
    self-joins on (user_id, window) EQUALITY — candidate cost is
    per-bucket-quadratic with bucket population bounded by the per-user
    event rate per window, independent of corpus size. Each overlapping
    pair would surface in every shared window, so a pair is emitted only
    in its OWNERSHIP window — the one containing the later start (that
    window is on both intervals' lists iff they overlap) — which makes
    the output exactly-once with zero dedup shuffle. All bounds are µs
    integers (unix_micros/epoch_us), so both engines are exact; the
    window membership test is pure long arithmetic (w·W ≤ gs < (w+1)·W),
    never a float division.

    The round-5 A/B retired the earlier collect_list(struct) bucket
    aggregate: the equi-join shuffles plain rows instead of serializing
    arrays (1.20 s vs 1.81 s at sf1, same session), runs entirely inside
    whole-stage codegen (no interpreted HOF lambdas), and STREAMS the
    per-bucket expansion through the join instead of materializing each
    bucket as one array row — a hot bucket degrades gracefully instead
    of becoming an OOM row, and AQE skew-splitting applies. The full
    construction lives in ``operators/intervals.py`` — this exhibit
    wires the events table into it."""
    from opensanctions_spark.operators.intervals import interval_overlap_pairs

    events = load(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("start_us"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * 60 * 1000000).cast("long")
        ).alias("end_us"),
    )
    pairs = interval_overlap_pairs(
        iv, "user_id", "event_id", "start_us", "end_us", J7_WINDOW_US
    )
    return pairs.select(
        F.col("key").alias("user_id"), "left_id", "right_id"
    )


@register(
    "search_inverted_index",
    oracle="""
WITH tokens AS (
  SELECT DISTINCT p_partkey AS id, unnest(string_split(lower(p_name), ' ')) AS tok
  FROM part
),
q AS (SELECT unnest(['red', 'gear', 'anvil']) AS tok),
hits AS (
  SELECT t.id, COUNT(*) AS score
  FROM tokens t JOIN q ON t.tok = q.tok
  GROUP BY t.id
),
ranked AS (
  SELECT id, score,
         row_number() OVER (ORDER BY score DESC, id) AS rank
  FROM hits
)
SELECT id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 20
""",
)
def search_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index term search: the standalone form of the blocking
    index the reference's xref builds (posting lists per token, OR
    semantics, score = matched query terms, deterministic top-20). The
    query-term side is a literal broadcast; the posting build is one
    explode+distinct — at 100 TB the index is materialized once and the
    per-query cost is a broadcast-join over the token partitions."""
    part = load(spark, sf_dir, "part")
    tokens = (
        part.select(
            F.col("p_partkey").alias("id"),
            F.explode(F.split(F.lower(F.col("p_name")), " ")).alias("tok"),
        )
        .distinct()
    )
    q = spark.createDataFrame([("red",), ("gear",), ("anvil",)], "tok STRING")
    hits = tokens.join(F.broadcast(q), "tok").groupBy("id").agg(
        F.count("*").alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
    )


@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
WITH names AS (
  SELECT s_suppkey AS id, lower(s_name) AS name,
         substr(lower(s_name), 1, 9) AS block
  FROM supplier
)
SELECT a.id AS left_id, b.id AS right_id,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b
  ON a.block = b.block AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= 3
""",
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name matching via edit distance (the scoring primitive under
    the reference's pair-scoring algorithms): candidate pairs blocked by
    name prefix — never all-pairs — then Levenshtein ≤ 3 keeps typo-level
    variants. Both engines ship the same built-in, so the oracle is
    exact.

    Pair generation is the chunked-bucket expansion
    (``operators/blocking.py _chunked_subjects``), NOT a self-equi-join
    on the block key: the supplier fixture's names share one 9-char
    prefix, so the join form put EVERY row in one hash partition — a
    single task serially computing the full n(n-1)/2 distance matrix
    (profiled: 1 task, 3.2 s of the query's 3.4 s), the single-giant-key
    shape AQE's skew splitting cannot touch (guide §2.5). The bucket
    form spreads each block's quadratic work over ceil(B/chunk) tasks;
    the pair set is identical (ordered i < j positions in the id-sorted
    member array ≡ a.id < b.id within the block)."""
    from opensanctions_spark.operators.blocking import _chunked_subjects

    sup = load(spark, sf_dir, "supplier")
    names = sup.select(
        F.col("s_suppkey").alias("id"),
        F.lower(F.col("s_name")).alias("name"),
        F.substring(F.lower(F.col("s_name")), 1, 9).alias("block"),
    )
    buckets = (
        names.groupBy("block")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("id"), F.col("name")))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    subj = _chunked_subjects(buckets, "members", directional=False)
    x = F.element_at(F.col("members"), F.col("_i") + 1)
    return (
        subj.select(
            x.alias("x"),
            F.explode(
                F.slice(
                    F.col("members"), F.col("_i") + 2, F.size(F.col("members"))
                )
            ).alias("y"),
        )
        .select(
            F.col("x.id").alias("left_id"),
            F.col("y.id").alias("right_id"),
            F.levenshtein(F.col("x.name"), F.col("y.name"))
            .cast("long")
            .alias("dist"),
        )
        .filter(F.col("dist") <= 3)
    )


@register(
    "j5_custom_scorer_udf",
    oracle="""
WITH raw_tokens AS (
  SELECT p_partkey AS id,
         unnest(string_split(p_name, ' ')) AS tok,
         p_brand AS brand
  FROM part
),
tokens AS (
  SELECT DISTINCT id, tok || '#' || brand AS token FROM raw_tokens
),
sizes AS (SELECT id, COUNT(*) AS n_tokens FROM tokens GROUP BY id),
pairs AS (
  SELECT a.id AS subject_id, b.id AS candidate_id, COUNT(*) AS shared
  FROM tokens a JOIN tokens b ON a.token = b.token AND a.id <> b.id
  GROUP BY a.id, b.id
),
scored AS (
  SELECT p.subject_id, p.candidate_id,
         CAST(p.shared AS DOUBLE)
             / CAST(sa.n_tokens + sb.n_tokens - p.shared AS DOUBLE) AS score
  FROM pairs p
  JOIN sizes sa ON p.subject_id = sa.id
  JOIN sizes sb ON p.candidate_id = sb.id
),
best AS (
  SELECT subject_id, candidate_id,
         row_number() OVER (PARTITION BY subject_id
                            ORDER BY score DESC, candidate_id) AS rank
  FROM scored
),
named AS (
  SELECT b.subject_id, b.candidate_id,
         pa.p_name AS a_name, pb.p_name AS b_name
  FROM best b
  JOIN part pa ON b.subject_id = pa.p_partkey
  JOIN part pb ON b.candidate_id = pb.p_partkey
  WHERE b.rank = 1
),
grams AS (
  SELECT subject_id, candidate_id,
         list_distinct(list_transform(range(1, len(a_name)),
                                      i -> substr(a_name, i, 2))) AS ga,
         list_distinct(list_transform(range(1, len(b_name)),
                                      i -> substr(b_name, i, 2))) AS gb
  FROM named
)
SELECT subject_id, candidate_id,
       CAST(len(list_filter(ga, x -> list_contains(gb, x))) AS DOUBLE)
       / CAST(len(ga) + len(gb)
              - len(list_filter(ga, x -> list_contains(gb, x))) AS DOUBLE)
       AS rescore
FROM grams
""",
)
def j5_custom_scorer_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pluggable pair-scoring UDF stage (the xref ``algorithm=`` surface,
    ``zavod/zavod/integration/dedupe.py:50,67-69``): blocking proposes
    candidates cheaply JVM-side, then an Arrow-batched pandas_udf
    re-scores the SURVIVING pairs with arbitrary Python — here character-
    bigram Jaccard, standing in for any scoring model the reference
    plugs by name.

    The scale discipline this demonstrates: Python never touches the
    candidate-generation stage (quadratic, JVM-only); the UDF runs on the
    pruned top-1-per-subject set — candidate count × O(1) rows, Arrow in
    and out, vectorized per batch. Swapping algorithms = swapping the UDF;
    the plan shape is unchanged."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def bigram_jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        def score(x: str, y: str) -> float:
            ga = {x[i : i + 2] for i in range(len(x) - 1)}
            gb = {y[i : i + 2] for i in range(len(y) - 1)}
            inter = len(ga & gb)
            return inter / (len(ga) + len(gb) - inter)

        return pd.Series([score(x, y) for x, y in zip(a, b)])

    part = load(spark, sf_dir, "part")
    tokens = (
        part.select(
            F.col("p_partkey").alias("id"),
            F.explode(F.split(F.col("p_name"), " ")).alias("tok"),
            F.col("p_brand"),
        )
        .select(
            "id", F.concat(F.col("tok"), F.lit("#"), F.col("p_brand")).alias("token")
        )
        .distinct()
    )
    best = top_k_per_subject(jaccard_scored_pairs(tokens), k=1).select(
        "subject_id", "candidate_id"
    )
    names = part.select("p_partkey", "p_name")
    named = (
        best.join(
            F.broadcast(names.withColumnRenamed("p_name", "a_name")),
            best.subject_id == F.col("p_partkey"),
        )
        .drop("p_partkey")
        .join(
            F.broadcast(names.withColumnRenamed("p_name", "b_name")),
            best.candidate_id == F.col("p_partkey"),
        )
        .drop("p_partkey")
    )
    return named.select(
        "subject_id",
        "candidate_id",
        bigram_jaccard(F.col("a_name"), F.col("b_name")).alias("rescore"),
    )


@register(
    "pipeline_xref_resolve",
    oracle="""
WITH RECURSIVE subj AS (
  SELECT CAST(p_partkey AS BIGINT) AS id, p_name, p_brand, p_type, p_size
  FROM part
),
toks AS (
  SELECT DISTINCT id,
         unnest(string_split(lower(p_name), ' '))
             || replace(lower(p_brand), '#', '') AS token
  FROM subj
),
sizes AS (SELECT id, COUNT(*) AS n FROM toks GROUP BY id),
pairs AS (
  SELECT a.id AS l, b.id AS r, COUNT(*) AS shared
  FROM toks a JOIN toks b ON a.token = b.token AND a.id < b.id
  GROUP BY a.id, b.id
),
scored AS (
  SELECT p.l, p.r,
         CAST(p.shared AS DOUBLE)
             / CAST(sa.n + sb.n - p.shared AS DOUBLE) AS score
  FROM pairs p
  JOIN sizes sa ON p.l = sa.id
  JOIN sizes sb ON p.r = sb.id
),
topk AS (
  SELECT l, r, score FROM (
    SELECT l, r, score,
           row_number() OVER (PARTITION BY l ORDER BY score DESC, r) AS rk
    FROM scored
  ) WHERE rk <= 5
),
capped AS (SELECT l, r, score FROM topk ORDER BY score DESC, l, r LIMIT 1000),
judged AS (
  SELECT c.l, c.r, c.score,
         CASE
           WHEN len(ls.strong_ids) > 0 AND len(rs.strong_ids) > 0
                AND list_has_any(ls.strong_ids, rs.strong_ids) THEN 'POSITIVE'
           WHEN len(ls.id_numbers) > 0 AND len(rs.id_numbers) > 0
                AND NOT list_has_any(ls.id_numbers, rs.id_numbers) THEN 'NEGATIVE'
           WHEN c.score >= 0.5 THEN 'POSITIVE'
           ELSE 'UNSURE'
         END AS judgement
  FROM capped c
  JOIN (SELECT id,
               CASE WHEN p_size <= 3
                    THEN [p_type || '#' || CAST(p_size AS VARCHAR)]
                    ELSE [] END AS strong_ids,
               [p_type] AS id_numbers FROM subj) ls ON c.l = ls.id
  JOIN (SELECT id,
               CASE WHEN p_size <= 3
                    THEN [p_type || '#' || CAST(p_size AS VARCHAR)]
                    ELSE [] END AS strong_ids,
               [p_type] AS id_numbers FROM subj) rs ON c.r = rs.id
),
edges AS (SELECT l, r FROM judged WHERE judgement = 'POSITIVE'),
sym AS (
  SELECT l AS a, r AS b FROM edges
  UNION SELECT r, l FROM edges
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT x.a, s.b FROM reach x JOIN sym s ON x.b = s.a
),
comp AS (SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a)
SELECT s.id AS entity_id,
       COALESCE(c.component, s.id) AS canonical_id,
       COALESCE(c.component, s.id) <> s.id AS merged
FROM subj s LEFT JOIN comp c ON s.id = c.node
""",
)
def pipeline_xref_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full §3.3 xref lifecycle as ONE composed plan (J5 → T1/T3 →
    J9 → J6 → J2-ready mapping), driven by ``plans/xref.py``.

    Parts stand in for entities: the blocking key is the (word, brand)
    compound token (same bounded-bucket trick as ``j5_t1_blocking_topk``);
    exact (name, brand) duplicates score 1.0 and auto-merge at the 0.5
    threshold; single-word overlaps (score 1/3) queue as UNSURE; a
    ``p_type`` mismatch vetoes regardless of score (the disjoint-id rule,
    ``zavod/zavod/integration/logic.py:108-129``); identical type+size on
    small parts forces a merge (the strong-registration-id rule, ibid.
    11-107). POSITIVE decisions resolve through the same size-adaptive
    connected components the entity resolver uses; the oracle replays the
    closure with a recursive CTE."""
    from opensanctions_spark.plans.xref import XrefConfig, xref_and_resolve

    part = load(spark, sf_dir, "part")
    brand_norm = F.regexp_replace(F.lower(F.col("p_brand")), "[^a-z0-9]", "")
    subjects = part.select(
        F.col("p_partkey").cast("long").alias("id"),
        F.array_join(
            F.transform(
                F.split(F.col("p_name"), " "), lambda w: F.concat(w, brand_norm)
            ),
            " ",
        ).alias("name"),
        F.when(
            F.col("p_size") <= 3,
            F.array(F.concat_ws("#", F.col("p_type"), F.col("p_size"))),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("strong_ids"),
        F.array(F.col("p_type")).alias("id_numbers"),
    )
    config = XrefConfig(threshold=0.5, top_k=5, limit=1000, max_token_freq=None)
    _decisions, mapping = xref_and_resolve(subjects, config)
    return (
        subjects.select("id")
        .join(mapping.withColumnRenamed("entity_id", "id"), "id", "left")
        .select(
            F.col("id").alias("entity_id"),
            F.coalesce(F.col("canonical_id"), F.col("id")).alias("canonical_id"),
            (F.coalesce(F.col("canonical_id"), F.col("id")) != F.col("id")).alias(
                "merged"
            ),
        )
    )


@register(
    "pipeline_enrich_expand",
    oracle="""
WITH subj AS (
  SELECT 'p' || CAST(p_partkey AS VARCHAR) AS id, p_name, p_brand
  FROM part WHERE p_partkey % 2 = 1
),
tgt AS (
  SELECT 'p' || CAST(p_partkey AS VARCHAR) AS id, p_name, p_brand
  FROM part WHERE p_partkey % 2 = 0
),
stoks AS (
  SELECT DISTINCT id,
         unnest(string_split(lower(p_name), ' '))
             || replace(lower(p_brand), '#', '') AS token
  FROM subj
),
ttoks AS (
  SELECT DISTINCT id,
         unnest(string_split(lower(p_name), ' '))
             || replace(lower(p_brand), '#', '') AS token
  FROM tgt
),
ssz AS (SELECT id, COUNT(*) AS n FROM stoks GROUP BY id),
tsz AS (SELECT id, COUNT(*) AS n FROM ttoks GROUP BY id),
pairs AS (
  SELECT s.id AS subject_id, t.id AS candidate_id, COUNT(*) AS shared
  FROM stoks s JOIN ttoks t ON s.token = t.token
  GROUP BY s.id, t.id
),
scored AS (
  SELECT p.subject_id, p.candidate_id,
         CAST(p.shared AS DOUBLE)
             / CAST(a.n + b.n - p.shared AS DOUBLE) AS score
  FROM pairs p
  JOIN ssz a ON p.subject_id = a.id
  JOIN tsz b ON p.candidate_id = b.id
  WHERE CAST(p.shared AS DOUBLE) / CAST(a.n + b.n - p.shared AS DOUBLE) >= 0.5
),
topk AS (
  SELECT subject_id, candidate_id FROM (
    SELECT subject_id, candidate_id,
           row_number() OVER (PARTITION BY subject_id
                              ORDER BY score DESC, candidate_id) AS rk
    FROM scored
  ) WHERE rk <= 5
),
judgements AS (
  SELECT 'p' || CAST(a.p_partkey AS VARCHAR) AS ja,
         'p' || CAST(b.p_partkey AS VARCHAR) AS jb,
         CASE (a.p_partkey + b.p_partkey) % 3
           WHEN 0 THEN 'POSITIVE' WHEN 1 THEN 'NEGATIVE' ELSE 'UNSURE'
         END AS judgement
  FROM part a JOIN part b
    ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey
),
seeds AS (
  SELECT DISTINCT m.candidate_id AS node
  FROM topk m
  JOIN judgements j
    ON LEAST(m.subject_id, m.candidate_id) = LEAST(j.ja, j.jb)
   AND GREATEST(m.subject_id, m.candidate_id) = GREATEST(j.ja, j.jb)
  WHERE j.judgement = 'POSITIVE'
    AND m.candidate_id IN (
      SELECT 'p' || CAST(p_partkey AS VARCHAR) FROM part
      WHERE p_partkey % 2 = 0 AND p_size >= 10)
),
edges AS (
  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM lineitem
  UNION
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR),
                  'p' || CAST(l_partkey AS VARCHAR)
  FROM lineitem
),
d1 AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN seeds s ON e.src = s.node
  WHERE e.dst NOT IN (SELECT node FROM seeds)
),
d2 AS (
  SELECT DISTINCT e.dst AS node FROM edges e JOIN d1 ON e.src = d1.node
  WHERE e.dst NOT IN (SELECT node FROM seeds)
    AND e.dst NOT IN (SELECT node FROM d1)
)
SELECT node, CAST(0 AS BIGINT) AS depth FROM seeds
UNION ALL SELECT node, 1 FROM d1
UNION ALL SELECT node, 2 FROM d2
""",
)
def pipeline_enrich_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full §3.2 enrichment lifecycle as ONE composed plan
    (J8 ∪ bipartite-J5 → T1 → judgement lookup → J12 gate → J4 BFS),
    driven by ``plans/enrich.py``.

    Odd parts are the subject scope, even parts the enrichment target
    (the two stores of ``zavod/zavod/runner/local_enricher.py:62-71``);
    (word, brand) compound tokens block candidates, exact (name, brand)
    matches clear the 0.5 cutoff; a deterministic judgement table over
    same-name pairs supplies POSITIVE/NEGATIVE/UNSURE; publishable =
    p_size ≥ 10 (the topic gate); POSITIVE publishable matches expand
    two hops through the part↔supplier lineitem graph. Output is the
    internal-emission subgraph (node, minimal depth)."""
    from opensanctions_spark.plans.enrich import EnrichConfig, enrich

    part = load(spark, sf_dir, "part")
    brand_norm = F.regexp_replace(F.lower(F.col("p_brand")), "[^a-z0-9]", "")
    matchable = part.select(
        F.concat(F.lit("p"), F.col("p_partkey").cast("string")).alias("id"),
        F.array_join(
            F.transform(
                F.split(F.col("p_name"), " "), lambda w: F.concat(w, brand_norm)
            ),
            " ",
        ).alias("name"),
        F.col("p_partkey").alias("key"),
        F.col("p_size"),
    )
    subjects = matchable.filter(F.col("key") % 2 == 1).select("id", "name")
    targets = matchable.filter(F.col("key") % 2 == 0)
    a = part.select(F.col("p_partkey").alias("ka"), F.col("p_name").alias("na"))
    b = part.select(F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb"))
    judgements = (
        a.join(b, (F.col("na") == F.col("nb")) & (F.col("ka") < F.col("kb")))
        .select(
            F.concat(F.lit("p"), F.col("ka").cast("string")).alias("left_id"),
            F.concat(F.lit("p"), F.col("kb").cast("string")).alias("right_id"),
            F.when((F.col("ka") + F.col("kb")) % 3 == 0, "POSITIVE")
            .when((F.col("ka") + F.col("kb")) % 3 == 1, "NEGATIVE")
            .otherwise("UNSURE")
            .alias("judgement"),
        )
    )
    publishable = targets.filter(F.col("p_size") >= 10).select("id")
    li = load(spark, sf_dir, "lineitem")
    p_node = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    s_node = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    edges = (
        li.select(p_node.alias("src"), s_node.alias("dst"))
        .unionByName(li.select(s_node.alias("src"), p_node.alias("dst")))
        .distinct()
    )
    cfg = EnrichConfig(cutoff=0.5, top_k=5, max_token_freq=None, expand_depth=2)
    _candidates, internal = enrich(
        subjects, targets.select("id", "name"), edges, judgements, publishable, cfg
    )
    return internal.select("node", F.col("depth").cast("long").alias("depth"))


_EDGE_DEDUPE_ORACLE = """
WITH RECURSIVE e AS (
  SELECT 'o-' || o_orderkey AS id,
         'c-' || o_custkey AS bucket,
         CASE o_orderkey % 3
           WHEN 0 THEN substr(CAST(o_orderdate AS VARCHAR), 1, 4)
           WHEN 1 THEN substr(CAST(o_orderdate AS VARCHAR), 1, 7)
           ELSE substr(CAST(o_orderdate AS VARCHAR), 1, 10) END AS s,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              WHEN o_orderkey % 2 = 0
                THEN substr(CAST(o_orderdate AS VARCHAR), 1, 4)
              ELSE substr(CAST(o_orderdate AS VARCHAR), 1, 10) END AS en
  FROM orders
),
r AS (
  SELECT *,
    CASE length(s) WHEN 4 THEN CAST(s || '-01-01' AS DATE)
                   WHEN 7 THEN CAST(s || '-01' AS DATE)
                   ELSE CAST(s AS DATE) END AS slo,
    CASE length(s) WHEN 4 THEN CAST(s || '-12-31' AS DATE)
                   WHEN 7 THEN last_day(CAST(s || '-01' AS DATE))
                   ELSE CAST(s AS DATE) END AS shi,
    CASE length(en) WHEN 4 THEN CAST(en || '-01-01' AS DATE)
                    WHEN 7 THEN CAST(en || '-01' AS DATE)
                    ELSE CAST(en AS DATE) END AS elo,
    CASE length(en) WHEN 4 THEN CAST(en || '-12-31' AS DATE)
                    WHEN 7 THEN last_day(CAST(en || '-01' AS DATE))
                    ELSE CAST(en AS DATE) END AS ehi
  FROM e
),
pairs AS (
  SELECT a.id AS l, b.id AS r2,
    ((a.slo <= b.shi AND b.slo <= a.shi)
     AND (a.en IS NULL OR b.en IS NULL
          OR (a.elo <= b.ehi AND b.elo <= a.ehi))) AS compat
  FROM r a JOIN r b ON a.bucket = b.bucket AND a.id < b.id
),
sym AS (
  SELECT l AS a, r2 AS b FROM pairs WHERE compat
  UNION SELECT r2, l FROM pairs WHERE compat
),
amb AS (
  SELECT DISTINCT s1.a AS x
  FROM sym s1
  JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
  JOIN pairs p ON p.l = s1.b AND p.r2 = s2.b AND NOT p.compat
),
cp AS (
  SELECT a, b FROM sym
  WHERE a NOT IN (SELECT x FROM amb) AND b NOT IN (SELECT x FROM amb)
),
reach AS (
  SELECT a, b FROM cp
  UNION
  SELECT re.a, sy.b FROM reach re JOIN cp sy ON re.b = sy.a
),
g AS (SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a),
sizes AS (SELECT component, COUNT(*) AS n FROM g GROUP BY component),
gp AS (
  SELECT ga.component, SUM(CASE WHEN p.compat THEN 1 ELSE 0 END) AS n_compat
  FROM pairs p
  JOIN g ga ON p.l = ga.node
  JOIN g gb ON p.r2 = gb.node AND ga.component = gb.component
  GROUP BY ga.component
),
ok AS (
  SELECT s.component FROM sizes s JOIN gp ON s.component = gp.component
  WHERE gp.n_compat * 2 = s.n * (s.n - 1)
),
merged AS (
  SELECT g.component, MIN(g.node) AS canon
  FROM g JOIN ok USING (component) GROUP BY g.component
),
m AS (
  SELECT g.node AS id, merged.canon
  FROM g JOIN ok USING (component)
  JOIN merged ON g.component = merged.component
)
SELECT e.id AS id,
       COALESCE(m.canon, e.id) AS canonical_id,
       COALESCE(m.canon, e.id) <> e.id AS merged
FROM e LEFT JOIN m ON e.id = m.id
"""


@register("j7_edge_dedupe_merge", oracle=_EDGE_DEDUPE_ORACLE)
def j7_edge_dedupe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED edge-dedupe lifecycle (J7 in full,
    ``zavod/zavod/integration/edges.py:78-422``): orders become
    directorship-style edges bucketed per customer, with start/end dates
    truncated to year/month/day precision — partial-ISO values compare
    as the RANGE they can represent, ambiguous temporal bridges (vague
    edges compatible with two mutually-incompatible precise edges) are
    removed before grouping, groups merge only when PAIRWISE compatible
    (range overlap is not transitive), canonical = min id. The oracle
    replays bucketing, range expansion, the compat pair table, the
    ambiguous-node filter, a recursive-CTE closure, and the
    group-consistency count."""
    from opensanctions_spark.operators.edges import dedupe_edges

    orders = load(spark, sf_dir, "orders")
    ds = F.date_format("o_orderdate", "yyyy-MM-dd")
    k = F.col("o_orderkey")
    start = (
        F.when(k % 3 == 0, F.substring(ds, 1, 4))
        .when(k % 3 == 1, F.substring(ds, 1, 7))
        .otherwise(ds)
    )
    end = F.when(
        k % 5 != 0,
        F.array(
            F.when(k % 2 == 0, F.substring(ds, 1, 4)).otherwise(ds)
        ),
    ).otherwise(F.array().cast("array<string>"))
    edges = orders.select(
        F.concat(F.lit("o-"), k).alias("id"),
        F.lit("Directorship").alias("schema"),
        F.concat(F.lit("c-"), F.col("o_custkey")).alias("src"),
        F.lit("board").alias("tgt"),
        F.array(start).alias("starts"),
        end.alias("ends"),
    )
    return dedupe_edges(edges)


@register(
    "j5_reference_scorer",
    oracle="""
WITH subj AS (
  SELECT p_partkey AS id, p_name AS name,
    CASE WHEN p_partkey % 11 = 0 THEN NULL
         WHEN p_partkey % 5 = 0 THEN substr(CAST(DATE '1992-01-01'
              + (p_partkey % 2000) * INTERVAL 1 DAY AS VARCHAR), 1, 4)
         ELSE CAST(DATE '1992-01-01'
              + (p_partkey % 2000) * INTERVAL 1 DAY AS VARCHAR) END AS dob,
    p_brand || ':' || CAST(p_partkey % 200 AS VARCHAR) AS idv
  FROM part
),
tokens AS (
  SELECT DISTINCT id, tok FROM (
    SELECT id,
           unnest(string_split_regex(lower(name), '[^a-z0-9]+')) AS tok
    FROM subj
  ) WHERE tok <> ''
),
sizes AS (SELECT id, COUNT(*) AS n FROM tokens GROUP BY id),
pairs AS (
  SELECT a.id AS subject_id, b.id AS candidate_id, COUNT(*) AS shared
  FROM tokens a JOIN tokens b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
),
scored AS (
  SELECT subject_id, candidate_id,
         CAST(shared AS DOUBLE)
             / CAST(sa.n + sb.n - shared AS DOUBLE) AS jscore
  FROM pairs
  JOIN sizes sa ON subject_id = sa.id
  JOIN sizes sb ON candidate_id = sb.id
),
pruned AS (
  SELECT subject_id, candidate_id FROM (
    SELECT subject_id, candidate_id,
           row_number() OVER (PARTITION BY subject_id
                              ORDER BY jscore DESC, candidate_id) AS rnk
    FROM scored
  ) WHERE rnk <= 2
),
nj AS (
  SELECT p.subject_id, p.candidate_id, COUNT(*) AS ninter
  FROM pruned p
  JOIN tokens a ON a.id = p.subject_id
  JOIN tokens b ON b.id = p.candidate_id AND b.tok = a.tok
  GROUP BY 1, 2
),
ptokens AS (
  SELECT DISTINCT id,
         substr(tok, 1, 1)
           || regexp_replace(substr(tok, 2), '[aeiou]', '', 'g') AS ptok
  FROM tokens
),
psizes AS (SELECT id, COUNT(*) AS n FROM ptokens GROUP BY id),
pj AS (
  SELECT p.subject_id, p.candidate_id, COUNT(*) AS pinter
  FROM pruned p
  JOIN ptokens a ON a.id = p.subject_id
  JOIN ptokens b ON b.id = p.candidate_id AND b.ptok = a.ptok
  GROUP BY 1, 2
),
feat AS (
  SELECT p.subject_id, p.candidate_id,
    (1000000 * nj.ninter) // (sa.n + sb.n - nj.ninter) AS nameppm,
    (1000000 * pj.pinter) // (pa.n + pb.n - pj.pinter) AS phonppm,
    CASE WHEN x.dob IS NULL OR y.dob IS NULL THEN 300000
         WHEN x.dob = y.dob THEN 1000000
         WHEN starts_with(x.dob, y.dob) OR starts_with(y.dob, x.dob)
           THEN 600000
         ELSE 0 END AS dobppm,
    CASE WHEN x.dob IS NOT NULL AND y.dob IS NOT NULL AND x.dob <> y.dob
           AND NOT (starts_with(x.dob, y.dob) OR starts_with(y.dob, x.dob))
           AND len(x.dob) >= 10 AND len(y.dob) >= 10
         THEN 1 ELSE 0 END AS clash,
    CASE WHEN x.idv = y.idv THEN 1000000 ELSE 0 END AS idsppm
  FROM pruned p
  JOIN nj ON nj.subject_id = p.subject_id AND nj.candidate_id = p.candidate_id
  JOIN pj ON pj.subject_id = p.subject_id AND pj.candidate_id = p.candidate_id
  JOIN sizes sa ON sa.id = p.subject_id
  JOIN sizes sb ON sb.id = p.candidate_id
  JOIN psizes pa ON pa.id = p.subject_id
  JOIN psizes pb ON pb.id = p.candidate_id
  JOIN subj x ON x.id = p.subject_id
  JOIN subj y ON y.id = p.candidate_id
)
SELECT subject_id, candidate_id,
  CAST(CASE WHEN clash = 1
    THEN ((35 * nameppm + 15 * phonppm + 20 * dobppm + 30 * idsppm) // 100) // 2
    ELSE (35 * nameppm + 15 * phonppm + 20 * dobppm + 30 * idsppm) // 100
  END AS BIGINT) AS score_ppm
FROM feat
""",
)
def j5_reference_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-shaped DEFAULT pair scorer behind the pluggable
    ``algorithm=`` hook (``zavod/zavod/integration/dedupe.py:50,67-69``;
    nomenklatura's DefaultAlgorithm features): blocking + Jaccard top-2
    proposes candidates JVM-side, then the Arrow-batched feature scorer
    (``operators/scoring.py``) combines name-token Jaccard, phonetic-
    skeleton Jaccard, prefix-date DOB compatibility and identifier
    overlap with integer weights — all in exact ppm integers, replayed
    bit-for-bit by the DuckDB oracle.

    The part table stands in for the entity file: a synthesized prefix-
    date ``dob`` (every 5th key year-only, every 11th missing) exercises
    the reference's partial-date model, and a brand-scoped identifier
    gives the strong-id feature real collisions."""
    from opensanctions_spark.operators.blocking import tokenize
    from opensanctions_spark.operators.scoring import reference_score_pairs

    part = load(spark, sf_dir, "part")
    key = F.col("p_partkey")
    dob_full = F.date_add(
        F.to_date(F.lit("1992-01-01")), (key % 2000).cast("int")
    ).cast("string")
    dob = (
        F.when(key % 11 == 0, F.lit(None).cast("string"))
        .when(key % 5 == 0, F.substring(dob_full, 1, 4))
        .otherwise(dob_full)
    )
    subjects = part.select(
        key.alias("id"),
        F.col("p_name").alias("name"),
        dob.alias("dob"),
        F.array(
            F.concat(F.col("p_brand"), F.lit(":"), (key % 200).cast("string"))
        ).alias("id_numbers"),
    )
    tokens = tokenize(subjects, "id", "name")
    pairs = jaccard_scored_pairs(tokens).filter(
        F.col("subject_id") < F.col("candidate_id")
    )
    pruned = top_k_per_subject(pairs, k=2).select("subject_id", "candidate_id")
    out = reference_score_pairs(pruned, subjects)
    return out.select("subject_id", "candidate_id", "score_ppm")
