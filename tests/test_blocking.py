"""Unit tests: blocking candidate join + top-k (SURVEY J5/T1/T3)."""

from __future__ import annotations

from opensanctions_spark.operators.blocking import (
    candidate_pairs,
    jaccard_scored_pairs,
    tokenize,
    top_k_per_subject,
)


def test_tokenize_lowercase_distinct(spark):
    df = spark.createDataFrame([(1, "Acme ACME Corp!")], ["id", "name"])
    toks = {r["token"] for r in tokenize(df, "id", "name").collect()}
    assert toks == {"acme", "corp"}


def test_candidate_pairs_shared_counts(spark):
    df = spark.createDataFrame(
        [(1, "john smith"), (2, "john q smith"), (3, "alice jones")],
        ["id", "name"],
    )
    toks = tokenize(df, "id", "name")
    pairs = {
        (r["subject_id"], r["candidate_id"]): r["shared"]
        for r in candidate_pairs(toks).collect()
    }
    assert pairs[(1, 2)] == 2 and pairs[(2, 1)] == 2
    assert (1, 3) not in pairs


def test_token_frequency_cap_drops_stopwords(spark):
    # "inc" appears in every name → with cap 2 it generates no pairs
    df = spark.createDataFrame(
        [(1, "acme inc"), (2, "zeta inc"), (3, "gamma inc")], ["id", "name"]
    )
    toks = tokenize(df, "id", "name")
    assert candidate_pairs(toks, max_token_freq=2).count() == 0
    assert candidate_pairs(toks).count() == 6


def test_top_k_deterministic_ties(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a b")], ["id", "name"]
    )
    scored = jaccard_scored_pairs(tokenize(df, "id", "name"))
    top = top_k_per_subject(scored, k=2)
    got = {
        (r["subject_id"], r["rank"]): r["candidate_id"] for r in top.collect()
    }
    # all scores tie at 1.0 → candidates must come in id order
    assert got[(1, 1)] == 2 and got[(1, 2)] == 3
    assert got[(4, 1)] == 1 and got[(4, 2)] == 2
