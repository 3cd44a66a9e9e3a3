"""Boundary-strict BPE apply (round 12, VERDICT r11 task 4; round 13
ADVICE: exact greedy semantics for self-overlapping pairs).

The pre-round-12 ``bpe_apply_merges`` replayed merges as plain string
replaces over a SPACE-joined symbol sequence — a pair whose left symbol
matches the tail of a preceding merged symbol could fuse across the
symbol boundary (oracle-consistent, but divergent from real BPE
tokenizer equivalence). Round 12 guarded every symbol with a single
delimiter and ran each rank's replace twice; that was exact for
distinct pairs but mis-paired SELF-OVERLAPPING merges (``a a`` over a
run of five or more a's skips every third occurrence — 9 a's gave 6
tokens where subword-nmt gives 5). Round 13 moved to a DOUBLE-delimiter
guard with ONE replace per rank: a match consumes only one of a shared
boundary's two delimiters, so adjacent occurrences stay matchable and
the replay is exact greedy left-to-right BPE for every pair shape.
These tests pin the hard cases: the boundary collision, the
shared-boundary occurrence chain, and identical-symbol runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opensanctions_spark.catalog.text import bpe_apply_merges
import pytest

# heavyweight suite: deselected from the default driver gate (pytest.ini),
# run builder-side per round close via `pytest tests/ -m slow`
pytestmark = pytest.mark.slow


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
    """Consecutive occurrences share their boundary: 'abab' and
    'ababab' must merge EVERY (a, b) pair in the single pass —
    equivalent to subword-nmt's lookaround regex."""
    merges = [("a b", "ab")]
    out = _encode(spark, ["abab", "ababab", "aaaa", "aaa"], merges)
    assert out["abab"] == 2         # [ab, ab]
    assert out["ababab"] == 3       # [ab, ab, ab]
    out2 = _encode(spark, ["aaaa", "aaa"], [("a a", "aa")])
    assert out2["aaaa"] == 2        # [aa, aa]
    assert out2["aaa"] == 2         # [aa, a] — leftmost-greedy


def test_self_overlapping_pair_runs_pair_leftmost_greedy(spark):
    """The round-13 ADVICE case: merge (w, w) over runs of identical
    symbols must pair leftmost-greedy exactly like subword-nmt —
    floor(k/2) merged pairs + (k mod 2) leftover per run. The round-12
    single-delimiter double-replace gave 6 tokens for 9 w's (pass one
    skipped every third occurrence and pass two could not recover
    them); true BPE gives 5."""
    merges = [("w w", "ww")]
    words = {k: "w" * k for k in (2, 3, 4, 5, 6, 7, 8, 9, 12)}
    out = _encode(spark, list(words.values()), merges)
    for k, w in words.items():
        assert out[w] == (k // 2) + (k % 2), f"run of {k}"
    # chained self-overlap: rank 2 merges the rank-1 outputs the same way
    out2 = _encode(
        spark, ["w" * 9], [("w w", "ww"), ("ww ww", "wwww")]
    )
    # 9 w's -> [ww ww ww ww w] -> [wwww wwww w]
    assert out2["w" * 9] == 3


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
    DuckDB oracle (the strict double-guard single replace on both
    sides)."""
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
    seqs = {
        r["w"]: [t for t in r["seq"].split(sep) if t] for r in s.collect()
    }
    assert seqs["abc"] == ["ab", "c"]       # the collision case
    assert seqs["bc"] == ["bc"]
    assert seqs["ab"] == ["ab"]


def test_declarative_round_self_overlap_pairs_greedy(spark):
    """The in-plan merge round pairs identical-symbol runs leftmost-
    greedy too: vocab 'wwwwwwwww' (9 w's), argmax pair (w, w) → the
    merged sequence must be [ww ww ww ww w] (5 symbols), not the
    every-third-skipped 6 of the round-12 double-replace."""
    from pyspark.sql import functions as F

    from opensanctions_spark.catalog.text import (
        _bpe_guarded_seq,
        _bpe_merge_round,
    )

    vocab = spark.createDataFrame([("w" * 9, 1)], "w string, c long")
    s = vocab.select("w", "c", _bpe_guarded_seq(F.col("w")).alias("seq"))
    s, top = _bpe_merge_round(s)
    assert top.collect()[0]["pair"] == "w w"
    seq = s.collect()[0]["seq"]
    assert [t for t in seq.split("\x1f") if t] == ["ww"] * 4 + ["w"]


# ---------------------------------------------------------------------------
# differential equivalence vs a pure-Python true-BPE reference (round 13):
# the engine's merge replay (double-guard single replace, both the
# pandas-UDF apply and the declarative in-plan round) must match greedy
# left-to-right BPE — the subword-nmt semantics — on arbitrary words and
# arbitrary trained merge tables, self-overlapping pairs included.


def _true_bpe_merge(syms, a, b):
    """Reference greedy left-to-right merge of one rank (what
    subword-nmt's lookaround re.sub computes)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _true_bpe_train(words, rounds):
    """Reference count-level BPE trainer: weighted adjacent-pair counts,
    argmax (count desc, pair asc), applied greedily each round."""
    from collections import Counter

    wc = Counter(words)
    seqs = {w: list(w) for w in wc}
    merges = []
    for _ in range(rounds):
        pairs = Counter()
        for w, c in wc.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((f"{best[0]} {best[1]}", best[0] + best[1]))
        seqs = {
            w: _true_bpe_merge(s, best[0], best[1]) for w, s in seqs.items()
        }
    return merges, seqs


def test_apply_matches_true_bpe_differential(spark):
    """Train 4 rounds of reference BPE on an adversarial mini-corpus
    (runs of identical chars, shared-boundary chains, substring-nested
    words), then check the pandas-UDF apply pass AND the declarative
    in-plan rounds both produce the reference token counts for every
    word."""
    from pyspark.sql import functions as F

    from opensanctions_spark.catalog.text import (
        _bpe_guarded_seq,
        _bpe_merge_round,
    )

    words = (
        ["aaaa"] * 5 + ["aaaaaaaaa"] * 2 + ["abab"] * 4 + ["aab"] * 6
        + ["ab"] * 3 + ["ba"] * 2 + ["bbb"] * 3 + ["abc"] * 2 + ["ca"]
    )
    merges, seqs = _true_bpe_train(words, 4)
    want = {w: len(s) for w, s in seqs.items()}

    vocab = sorted(set(words))
    wc = spark.createDataFrame([(w,) for w in vocab], "w string")
    got_udf = {
        r["w"]: r["nt"] for r in bpe_apply_merges(wc, merges).collect()
    }
    assert got_udf == want

    # the declarative path trains its own argmax each round — the same
    # tie-break (count desc, pair asc) must pick the same merges and
    # the in-plan replace must land the same final sequences
    wcc = spark.createDataFrame(
        [(w, words.count(w)) for w in vocab], "w string, c long"
    )
    s = wcc.select("w", "c", _bpe_guarded_seq(F.col("w")).alias("seq"))
    picked = []
    for _ in range(4):
        s, top = _bpe_merge_round(s)
        rows = top.collect()
        if rows:
            picked.append(rows[0]["pair"])
    assert picked == [p for p, _ in merges]
    got_plan = {
        r["w"]: len([t for t in r["seq"].split("\x1f") if t])
        for r in s.collect()
    }
    assert got_plan == want
