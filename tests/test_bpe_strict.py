"""Boundary-strict BPE apply (round 12, VERDICT r11 task 4).

The pre-round-12 ``bpe_apply_merges`` replayed merges as plain string
replaces over a SPACE-joined symbol sequence — a pair whose left symbol
matches the tail of a preceding merged symbol could fuse across the
symbol boundary (oracle-consistent, but divergent from real BPE
tokenizer equivalence). The strict encoder guards every symbol with a
delimiter; these tests pin the two hard cases: the boundary collision
and the shared-boundary occurrence chain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opensanctions_spark.catalog.text import bpe_apply_merges


def _encode(spark, words, merges):
    wc = spark.createDataFrame([(w,) for w in words], "w string")
    return {
        r["w"]: r["nt"] for r in bpe_apply_merges(wc, merges).collect()
    }


def test_boundary_collision_not_merged(spark):
    """Word 'abc' with merges [(a b), (b c)]: rank 1 produces symbols
    [ab, c]; rank 2's pair (b, c) must NOT match the 'b' inside the
    merged symbol 'ab' — real BPE leaves [ab, c] (2 tokens). The loose
    space-joined replay collapsed it to 1."""
    merges = [("a b", "ab"), ("b c", "bc")]
    out = _encode(spark, ["abc", "bca", "xbc"], merges)
    assert out["abc"] == 2          # [ab, c] — the collision case
    assert out["bca"] == 2          # [bc, a] — rank 2 applies cleanly
    assert out["xbc"] == 2          # [x, bc]


def test_shared_boundary_chain_merges_fully(spark):
    """Consecutive occurrences share their boundary delimiter: 'abab'
    and 'ababab' must merge EVERY (a, b) pair — the double-replace
    pass structure, equivalent to subword-nmt's lookahead regex."""
    merges = [("a b", "ab")]
    out = _encode(spark, ["abab", "ababab", "aaaa", "aaa"], merges)
    assert out["abab"] == 2         # [ab, ab]
    assert out["ababab"] == 3       # [ab, ab, ab]
    out2 = _encode(spark, ["aaaa", "aaa"], [("a a", "aa")])
    assert out2["aaaa"] == 2        # [aa, aa]
    assert out2["aaa"] == 2         # [aa, a] — leftmost-greedy


def test_rank_order_respected(spark):
    """Merges apply in rank order: for 'abc' with ranks [(b c), (a b)],
    rank 1 fires first and consumes the b — [a, bc], and rank 2's
    (a, b) finds no adjacent pair."""
    merges = [("b c", "bc"), ("a b", "ab")]
    out = _encode(spark, ["abc", "abx"], merges)
    assert out["abc"] == 2          # [a, bc]
    assert out["abx"] == 2          # [ab, x] — rank 2 still applies


def test_oracle_parity_on_documents(spark, sf_dir):
    """The full catalog row stays value-exact against its updated
    DuckDB oracle (the strict guarded double-replace on both sides)."""
    import duckdb

    from opensanctions_spark.catalog import ORACLES, QUERIES

    got = QUERIES["text_bpe_apply"](spark, sf_dir)
    rows = {
        (r["doc_id"], r["n_words"], r["n_tokens"]) for r in got.collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = set(map(tuple, con.execute(ORACLES["text_bpe_apply"]).fetchall()))
    assert rows == want


def test_declarative_rounds_are_boundary_strict(spark):
    """The trainer/encoder's in-plan merge rounds carry the same
    strictness: after (a, b) merges, a later (b, c) merge must not fuse
    across the 'ab' symbol's boundary in 'abc' — the loose space-joined
    replace collapsed 'ab c' to 'abc' (1 token); strict leaves
    [ab, c]."""
    from pyspark.sql import functions as F

    from opensanctions_spark.catalog.text import (
        _bpe_guarded_seq,
        _bpe_merge_round,
    )

    vocab = spark.createDataFrame(
        [("ab", 10), ("bc", 8), ("abc", 1)], "w string, c long"
    )
    s = vocab.select("w", "c", _bpe_guarded_seq(F.col("w")).alias("seq"))
    s, top1 = _bpe_merge_round(s)
    assert top1.collect()[0]["pair"] == "a b"
    s, top2 = _bpe_merge_round(s)
    assert top2.collect()[0]["pair"] == "b c"
    sep = "\x1f"
    seqs = {r["w"]: r["seq"].split(sep)[1:-1] for r in s.collect()}
    assert seqs["abc"] == ["ab", "c"]       # the collision case
    assert seqs["bc"] == ["bc"]
    assert seqs["ab"] == ["ab"]
