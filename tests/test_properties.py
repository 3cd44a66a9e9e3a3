"""Property-based tests (hypothesis) for the cleaning column library.

Each property materializes ONE DataFrame per generated example batch and
checks the invariant against a plain-Python reference — the engine's
column functions must satisfy the invariants on arbitrary inputs, not just
the fixture corpus. Alphabet restricted to printable ASCII: these tests
pin logic invariants; Java-vs-Python unicode regex deltas are out of scope
(the oracle gate covers cross-engine semantics on real data).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opensanctions_spark.functions.dates import (
    extract_years,
    truncate_day_precision,
)
from opensanctions_spark.functions.text import multi_split, squash_spaces, token_count
import pytest

# heavyweight suite: deselected from the default driver gate (pytest.ini),
# run builder-side per round close via `pytest tests/ -m slow`
pytestmark = pytest.mark.slow

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)
SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _col_out(spark, values, expr, out="out"):
    df = spark.createDataFrame([(v,) for v in values], "v STRING")
    return [r[out] for r in df.select(expr.alias(out)).collect()]


@settings(**SETTINGS)
@given(st.lists(ASCII, min_size=1, max_size=16))
def test_truncate_day_precision_is_prefix_and_idempotent(spark, values):
    outs = _col_out(spark, values, truncate_day_precision(F.col("v")))
    for v, out in zip(values, outs):
        assert out == v[:10]
        assert out[:10] == out  # idempotent


@settings(**SETTINGS)
@given(st.lists(ASCII, min_size=1, max_size=16))
def test_squash_spaces_trimmed_and_idempotent(spark, values):
    outs = _col_out(spark, values, squash_spaces(F.col("v")))
    for out in outs:
        assert out == out.strip()
        assert "  " not in out
        assert re.sub(r"\s+", " ", out).strip() == out  # fixed point


@settings(**SETTINGS)
@given(st.lists(ASCII, min_size=1, max_size=16))
def test_multi_split_segments_contain_no_separators(spark, values):
    seps = [",", ";", "/"]
    outs = _col_out(spark, values, multi_split(F.col("v"), seps))
    for v, parts in zip(values, outs):
        for p in parts:
            assert p == p.strip() and p != ""
            assert not any(s in p for s in seps)
        # lossless modulo separators+whitespace: squashed concatenation of
        # parts equals the input with separators replaced by spaces
        ref = [x.strip() for x in re.split("|".join(map(re.escape, seps)), v)]
        assert parts == [x for x in ref if x]


@settings(**SETTINGS)
@given(st.lists(ASCII, min_size=1, max_size=16))
def test_token_count_matches_python_reference(spark, values):
    outs = _col_out(spark, values, token_count(F.col("v")))
    for v, n in zip(values, outs):
        assert n == len(re.findall(r"[A-Za-z0-9]+", v))


@settings(**SETTINGS)
@given(st.lists(ASCII, min_size=1, max_size=16))
def test_extract_years_are_4digit_substrings(spark, values):
    outs = _col_out(spark, values, extract_years(F.col("v")))
    for v, years in zip(values, outs):
        for y in years:
            assert re.fullmatch(r"(1[89]\d{2}|20\d{2})", y)
            assert y in v


@settings(**SETTINGS)
@given(st.lists(st.text(alphabet="abc", max_size=6), min_size=1, max_size=14))
def test_drop_prefix_values_matches_python_reference(spark, values):
    from opensanctions_spark.operators.consolidate import drop_prefix_values

    df = spark.createDataFrame([("e1", v) for v in values], "k STRING, value STRING")
    got = sorted(
        r["value"] for r in drop_prefix_values(df, keys=["k"]).collect()
    )
    uniq = set(values)
    want = sorted(
        v for v in uniq if not any(u != v and u.startswith(v) for u in uniq)
    )
    assert got == want
    # idempotent: a second pass changes nothing
    out_df = spark.createDataFrame([("e1", v) for v in got], "k STRING, value STRING")
    again = sorted(
        r["value"] for r in drop_prefix_values(out_df, keys=["k"]).collect()
    )
    assert again == got


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("pqrs"), st.sampled_from("pqrs")),
        min_size=1,
        max_size=12,
    )
)
def test_collapse_undirected_edges_canonicalizes_endpoints(spark, edges):
    from opensanctions_spark.operators.consolidate import collapse_undirected_edges

    df = spark.createDataFrame(edges, "s STRING, t STRING")
    rows = collapse_undirected_edges(df, "s", "t").collect()
    # endpoints ordered, and the multiset of undirected pairs is preserved
    assert all(r["s"] <= r["t"] for r in rows)
    got = sorted((r["s"], r["t"]) for r in rows)
    want = sorted(tuple(sorted(e)) for e in edges)
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=8), st.sampled_from("tuvw")),
        min_size=1,
        max_size=16,
    )
)
def test_candidate_pairs_match_python_reference(spark, rows):
    """The in-bucket pair expansion must emit exactly the directional
    pairs (with shared-token counts) that a naive per-token join would."""
    from collections import Counter

    from opensanctions_spark.operators.blocking import candidate_pairs

    uniq = sorted(set(rows))
    df = spark.createDataFrame(uniq, "id LONG, token STRING")
    got = {
        (r["subject_id"], r["candidate_id"]): r["shared"]
        for r in candidate_pairs(df).collect()
    }
    want: Counter = Counter()
    by_token: dict = {}
    for i, t in uniq:
        by_token.setdefault(t, []).append(i)
    for ids in by_token.values():
        for a in ids:
            for b in ids:
                if a != b:
                    want[(a, b)] += 1
    assert got == dict(want)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=6), st.sampled_from("tuv")),
        min_size=2,
        max_size=14,
    )
)
def test_jaccard_denominators_survive_df_cap(spark, rows):
    """Under a document-frequency cap the Jaccard denominators must still
    come from the UNCAPPED token sets (the cap prunes candidate
    generation only)."""
    from opensanctions_spark.operators.blocking import jaccard_scored_pairs

    uniq = sorted(set(rows))
    df = spark.createDataFrame(uniq, "id LONG, token STRING")
    n_tokens = {}
    for i, _ in uniq:
        n_tokens[i] = sum(1 for j, _ in uniq if j == i)
    for r in jaccard_scored_pairs(df, max_token_freq=2).collect():
        assert r["subject_n"] == n_tokens[r["subject_id"]]
        assert r["candidate_n"] == n_tokens[r["candidate_id"]]
        assert (
            abs(
                r["score"]
                - r["shared"] / (r["subject_n"] + r["candidate_n"] - r["shared"])
            )
            < 1e-12
        )


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.booleans(),  # side: subject or target
            st.integers(min_value=1, max_value=8),
            st.sampled_from("tuv"),
        ),
        min_size=2,
        max_size=16,
    )
)
def test_bipartite_pairs_match_python_reference(spark, rows):
    """The cross-side bucket expansion must emit exactly the
    subject×target pairs (shared counts + Jaccard over the union of the
    two token sets) that a naive bipartite join computes."""
    from opensanctions_spark.operators.blocking import bipartite_jaccard_pairs

    subj = sorted({(i, t) for is_subj, i, t in rows if is_subj})
    tgt = sorted({(i, t) for is_subj, i, t in rows if not is_subj})
    if not subj or not tgt:
        return
    sdf = spark.createDataFrame(subj, "id LONG, token STRING")
    tdf = spark.createDataFrame(tgt, "id LONG, token STRING")
    got = {
        (r["subject_id"], r["candidate_id"]): (r["shared"], r["score"])
        for r in bipartite_jaccard_pairs(sdf, tdf).collect()
    }
    s_tokens: dict = {}
    t_tokens: dict = {}
    for i, t in subj:
        s_tokens.setdefault(i, set()).add(t)
    for i, t in tgt:
        t_tokens.setdefault(i, set()).add(t)
    want = {}
    for a, at in s_tokens.items():
        for b, bt in t_tokens.items():
            shared = len(at & bt)
            if shared:
                want[(a, b)] = (shared, shared / (len(at) + len(bt) - shared))
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet="ab c.X-", min_size=0, max_size=24
        ),
        min_size=1,
        max_size=8,
    )
)
def test_tokenize_matches_python_reference(spark, texts):
    """Row-wise tokenize (array_distinct + size before explode) must
    equal the naive per-row Python tokenization, including n_tokens."""
    import re

    from opensanctions_spark.operators.blocking import tokenize

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id LONG, name STRING")
    got: dict = {}
    for r in tokenize(df, "id", "name").collect():
        got.setdefault(r["id"], set()).add(r["token"])
        assert r["n_tokens"] == len(
            {w for w in re.split(r"[^a-z0-9]+", rows[r["id"]][1].lower()) if w}
        )
    for i, t in rows:
        want = {w for w in re.split(r"[^a-z0-9]+", t.lower()) if w}
        assert got.get(i, set()) == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    )
)
def test_shingles_match_python_reference(spark, texts):
    """Row-wise shingle sets (array_distinct, explode_outer rendering)
    must equal naive Python word-3-gram shingling per document."""
    import re

    from opensanctions_spark.catalog.text import shingles_of

    rows = [(i, texts[i], "s") for i in range(len(texts))]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    got: dict = {}
    for r in shingles_of(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for i, t, _ in rows:
        w = [x for x in re.findall(r"[a-z0-9]+", t.lower())]
        want = {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}
        assert got.get(i, set()) == want


# ---------------------------------------------------------------------------
# round-2 parsers: serialize → parse → recover must be the identity for
# arbitrary printable payloads (escaping, SST dedup, cell gaps)

_cell = st.text(
    alphabet=st.characters(
        codec="latin-1", categories=("L", "N", "P", "S", "Zs")
    ),
    min_size=1,
    max_size=24,
).map(lambda s: s.strip()).filter(lambda s: s)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_cell, min_size=2, max_size=4), min_size=1, max_size=8))
def test_pdf_roundtrip_property(tmp_path_factory, rows):
    import os

    from opensanctions_spark.sources.pdf import parse_pdf_table, write_pdf_table

    width = len(rows[0])
    rows = [(r + ["x"] * width)[:width] for r in rows]
    headers = [f"c{i}" for i in range(width)]
    path = os.path.join(str(tmp_path_factory.mktemp("pdfprop")), "t.pdf")
    write_pdf_table(path, headers, rows)
    with open(path, "rb") as fh:
        got = list(parse_pdf_table(fh.read()))
    # single text chunks per cell: whitespace inside a cell collapses to
    # the space-joined recovery, so compare whitespace-normalized
    def norm(v):
        return " ".join(str(v).split())

    assert len(got) == len(rows)
    for want, have in zip(rows, got):
        assert [norm(w) for w in want] == [
            norm(have[h]) if have[h] is not None else "" for h in headers
        ]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_cell, min_size=2, max_size=4), min_size=1, max_size=8))
def test_xls_roundtrip_property(tmp_path_factory, rows):
    import os

    from opensanctions_spark.sources.xls import write_xls, xls_rows

    width = len(rows[0])
    rows = [(r + ["x"] * width)[:width] for r in rows]
    headers = [f"c{i}" for i in range(width)]
    path = os.path.join(str(tmp_path_factory.mktemp("xlsprop")), "t.xls")
    write_xls(path, headers, rows)
    with open(path, "rb") as fh:
        got = xls_rows(fh.read())
    assert got[0] == headers
    assert [[str(c) for c in r] for r in rows] == got[1:]


@settings(
    max_examples=30, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.builds(
        lambda scheme, host, path, params, frag: (
            f"{scheme}://{host}{path}"
            + ("?" + "&".join(params) if params else "")
            + (f"#{frag}" if frag else "")
        ),
        scheme=st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
        host=st.sampled_from(
            ["example.com", "WWW.Example.com", "a.b.test:8080",
             "example.com:443", "x.test:80"]
        ),
        path=st.sampled_from(["", "/", "/a", "/a/b/", "/A/B"]),
        params=st.lists(
            st.sampled_from(["a=1", "b=2", "utm_source=x", "fbclid=1", "z="]),
            max_size=3,
        ),
        frag=st.sampled_from(["", "top"]),
    )
)
def test_url_canonicalization_is_idempotent(spark, url):
    """canonicalize(canonicalize(u)) == canonicalize(u): the canonical
    form must be a fixed point, or dedup keys drift between passes."""
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.urls import canonicalize_url

    df = spark.createDataFrame([(url,)], "u string")
    once, twice = df.select(
        canonicalize_url(F.col("u")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("u"))).alias("c2"),
    ).collect()[0]
    assert once == twice


INTERVAL = st.tuples(
    st.sampled_from(["k1", "k2"]),              # key
    st.integers(min_value=0, max_value=999),    # start
    st.integers(min_value=0, max_value=400),    # duration
)


@given(rows=st.lists(INTERVAL, min_size=0, max_size=14))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_interval_overlap_pairs_match_naive(spark, rows):
    """The time-bucketed range join must produce EXACTLY the naive
    all-pairs overlap set (each pair once) for arbitrary intervals —
    including spans across many epoch windows and touching endpoints."""
    from opensanctions_spark.operators.intervals import interval_overlap_pairs

    data = [
        (k, i, s, s + d) for i, (k, s, d) in enumerate(rows)
    ]
    expected = {
        (k1, i1, i2)
        for k1, i1, s1, e1 in data
        for k2, i2, s2, e2 in data
        if k1 == k2 and i1 < i2 and s1 <= e2 and s2 <= e1
    }
    if not data:
        return
    df = spark.createDataFrame(
        data, "key STRING, id LONG, start_us LONG, end_us LONG"
    )
    got = {
        (r["key"], r["left_id"], r["right_id"])
        for r in interval_overlap_pairs(
            df, "key", "id", "start_us", "end_us", 100
        ).collect()
    }
    assert got == expected


@given(
    n_tokens=st.integers(min_value=0, max_value=200),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_chunking_covers_every_token_without_contained_windows(spark, n_tokens):
    """Every token of a document appears in at least one chunk, chunks
    overlap by exactly 16 tokens at interior boundaries, and no chunk is
    fully contained in another (the round-3 trailing-window fix)."""
    from opensanctions_spark.catalog import QUERIES  # noqa: F401 (import check)
    from opensanctions_spark.catalog.text import chunk_documents  # type: ignore

    import tempfile

    text = " ".join(f"t{i}" for i in range(n_tokens))
    tmp = tempfile.mkdtemp()
    spark.createDataFrame([(1, text)], "doc_id LONG, text STRING").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/documents.parquet")
    rows = chunk_documents(spark, tmp).collect()
    if n_tokens == 0:
        assert rows == []
        return
    covered = set()
    spans = []
    for r in rows:
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["n_tokens"] <= 64
        start = int(toks[0][1:])
        spans.append((start, start + len(toks)))
        covered.update(range(start, start + len(toks)))
    assert covered == set(range(n_tokens))
    for a in spans:
        for b in spans:
            if a != b:
                assert not (b[0] <= a[0] and a[1] <= b[1]), (a, b, "contained")


# -- round 7: judgement-write and linker invariants --------------------------

_IDS = st.text(alphabet="abcdxyz0123456789", min_size=1, max_size=6)
_VERDICTS = st.sampled_from(["POSITIVE", "NEGATIVE", "UNSURE"])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(_IDS, _IDS, _VERDICTS), min_size=0, max_size=8),
    st.lists(st.tuples(_IDS, _IDS, _VERDICTS), min_size=0, max_size=8),
)
def test_apply_judgements_matches_python_reference(spark, base, session):
    """Bulk write == the plain-Python fold: pairs normalize (lo, hi),
    last session judgement per pair wins, unknown pairs append at score
    1.0, untouched rows keep their judgement and score."""
    from opensanctions_spark.plans.xref import apply_judgements

    base_norm = {}
    for left, right, j in base:
        if left == right:
            continue
        lo, hi = sorted([left, right])
        base_norm[(lo, hi)] = (0.5, j)  # later duplicates overwrite, fine
    decisions = spark.createDataFrame(
        [(lo, hi, s, j) for (lo, hi), (s, j) in base_norm.items()],
        "left_id STRING, right_id STRING, score DOUBLE, judgement STRING",
    )
    session = [(l, r, j) for l, r, j in session if l != r]
    expected = dict(base_norm)
    for left, right, j in session:
        lo, hi = sorted([left, right])
        prior = expected.get((lo, hi))
        expected[(lo, hi)] = (prior[0] if prior else 1.0, j)
    out = apply_judgements(decisions, session)
    got = {
        (r["left_id"], r["right_id"]): (r["score"], r["judgement"])
        for r in out.collect()
    }
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(_IDS, _IDS), max_size=12))
def test_linker_canonical_is_idempotent_on_output(pairs):
    """get_canonical falls back to the id; referents invert the map."""
    from opensanctions_spark.integration import Linker

    mapping = {e: c for e, c in pairs if e != c}
    linker = Linker(mapping)
    for e in list(mapping) + ["unmapped-zz"]:
        canon = linker.get_canonical(e)
        assert canon == mapping.get(e, e)
        assert e in linker.get_referents(canon) or canon == e
    for c in set(mapping.values()):
        assert linker.get_referents(c) == {
            e for e, cc in mapping.items() if cc == c
        }


@settings(max_examples=20, deadline=None)
@given(st.sampled_from([4, 7, 10]).flatmap(
    lambda n: st.dates().map(lambda d: d.isoformat()[:n])
))
def test_qs_date_precision_matches_length(iso):
    from opensanctions_spark.plans.wikidata_reconcile import qs_date

    out = qs_date(iso)
    assert out.startswith("+") and out.endswith(
        {"4": "/9", "7": "/10", "10": "/11"}[str(len(iso))]
    )
    # the date payload is always a full day timestamp
    assert out[1:].split("/")[0].endswith("T00:00:00Z")
    assert out[1:11].count("-") == 2


# -- round 10: BPE merge + hashed-gram-key invariants -------------------------

WORDS = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=8
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(WORDS)
def test_bpe_merge_rounds_preserve_words_and_shrink(spark, words):
    """Invariants of _bpe_merge_round on arbitrary tiny vocabularies:
    (1) removing spaces from every seq always reconstructs the word,
    (2) the vocabulary row set never changes size (the empty-round
    crossJoin bug would drop it to zero), (3) per-word token count is
    non-increasing round over round."""
    from opensanctions_spark.catalog.text import _bpe_merge_round

    wc = spark.createDataFrame(
        [(w, i + 1) for i, w in enumerate(dict.fromkeys(words))],
        "w string, c long",
    )
    s = wc.select(
        "w", "c", F.concat_ws(" ", F.split(F.col("w"), "")).alias("seq")
    )
    prev = {r["w"]: len(r["seq"].split(" ")) for r in s.collect()}
    n_vocab = len(prev)
    for _ in range(3):
        s, _top = _bpe_merge_round(s)
        rows = s.collect()
        assert len(rows) == n_vocab  # no rows dropped, ever
        for r in rows:
            assert r["seq"].replace(" ", "") == r["w"]
            n = len(r["seq"].split(" "))
            assert n <= prev[r["w"]]
            prev[r["w"]] = n


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.lists(st.sampled_from("xy"), min_size=0, max_size=20).map(" ".join),
    min_size=1, max_size=6,
))
def test_duplicate_spans_hashed_key_matches_raw_string_key(spark, texts):
    """The 128-bit hashed gram key must produce byte-identical spans to
    the raw-string-key reference plan on arbitrary corpora (tiny
    two-symbol alphabet maximizes gram collisions-by-equality, the case
    that exercises the dup-count)."""
    from pyspark.sql import Window
    from opensanctions_spark.catalog.text import duplicate_spans

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    w, mc = 3, 2
    got = sorted(
        tuple(r) for r in duplicate_spans(docs, w=w, min_count=mc).collect()
    )
    # reference: identical plan keyed on the raw gram string
    toks = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
    idx = F.when(F.size("t") >= w, F.sequence(F.lit(1), F.size("t") - w + 1)
                 ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode(F.transform(idx, lambda i: F.struct(
            i.alias("pos"), F.concat_ws(" ", F.slice("t", i, w)).alias("g")
        ))).alias("x"),
    ).select("doc_id", "x.pos", "x.g")
    dup = grams.groupBy("g").count().filter(F.col("count") >= mc).select("g")
    marked = grams.join(dup, "g", "left_semi").select("doc_id", "pos")
    bd = Window.partitionBy("doc_id").orderBy("pos")
    isl = (marked.withColumn("prev", F.lag("pos").over(bd))
        .withColumn("brk", F.when(
            F.col("pos") - F.coalesce(F.col("prev"), F.col("pos")) > w,
            F.lit(1)).otherwise(F.lit(0)))
        .withColumn("island", F.sum("brk").over(bd)))
    want = sorted(tuple(r) for r in isl.groupBy("doc_id", "island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + w).cast("long").alias("span_end"),
    ).drop("island").collect())
    assert got == want


# ---------------------------------------------------------------------------
# round-13 (VERDICT r12 task 3): adversarial binary-boundary payloads.
# The round-12 PDF bug class — a delimiter regex slicing a binary
# payload that happens to contain the delimiter bytes (or end on \r) —
# is a FAMILY property: any parser that bounds binary content by
# searching for a keyword can lose or corrupt data when the payload
# embeds that keyword. These properties feed boundary-keyword-dense and
# \r-terminated content through every binary round-trip (PDF object
# scanner, OLE2 xls sectors, BMP/PPM/WAV codecs).

_BOUNDARY_WORDS = [
    "endstream", "endobj", "stream", "obj", "xref", "trailer",
    "EOF", "Workbook",
]
_adv_cell = st.lists(
    st.one_of(
        st.sampled_from(_BOUNDARY_WORDS),
        st.sampled_from(["\r", "\n", "\r\n", " "]),
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=5,
).map(lambda parts: ("".join(parts) + "q"))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.lists(_adv_cell, min_size=2, max_size=4),
             min_size=1, max_size=6),
    st.booleans(),
)
def test_pdf_adversarial_payload_roundtrip(tmp_path_factory, rows, compress):
    """Cells stuffed with PDF structural keywords and raw \\r / \\r\\n
    must round-trip losslessly (whitespace-normalized) through both the
    compressed and uncompressed stream paths — no silently dropped
    pages, no early-terminated objects."""
    import os

    from opensanctions_spark.sources.pdf import parse_pdf_table, write_pdf_table

    width = len(rows[0])
    rows = [(r + ["x"] * width)[:width] for r in rows]
    headers = [f"c{i}" for i in range(width)]
    path = os.path.join(str(tmp_path_factory.mktemp("pdfadv")), "t.pdf")
    write_pdf_table(path, headers, rows, compress=compress)
    with open(path, "rb") as fh:
        got = list(parse_pdf_table(fh.read()))

    def norm(v):
        return " ".join(str(v).split())

    assert len(got) == len(rows)
    for want, have in zip(rows, got):
        assert [norm(w) for w in want] == [
            norm(have[h]) if have[h] is not None else "" for h in headers
        ]


_adv_bytes = st.lists(
    st.one_of(
        st.sampled_from([
            b"endstream", b"endobj", b"\r", b"\r\n", b"\x00\xff\x00",
            b"\rendstream\r", b"RIFF", b"data", b"P6\n",
        ]),
        st.binary(max_size=8),
    ),
    max_size=8,
).map(b"".join)


@settings(max_examples=40, deadline=None)
@given(_adv_bytes)
def test_wav_codec_adversarial_payload_roundtrip(payload):
    """Arbitrary PCM bytes — including RIFF/data chunk markers and \\r
    runs — survive encode→decode exactly (the wave container is
    length-framed; this pins that no path regresses to delimiter
    scanning)."""
    from opensanctions_spark.codecs import decode_wav, encode_wav, wav_info

    content = encode_wav(payload, sample_rate=8000, sampwidth=1, channels=1)
    assert decode_wav(content) == payload
    assert wav_info(content) == (1, 1, 8000, len(payload))


@settings(max_examples=40, deadline=None)
@given(_adv_bytes, st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=5))
def test_ppm_bmp_codec_adversarial_pixels_roundtrip(payload, width, height):
    """Pixel buffers containing PPM header tokens, BMP-sized runs, nulls
    and \\r bytes round-trip bit-exactly through both raster codecs
    (length-derived slicing, never content scanning)."""
    from opensanctions_spark.codecs import (
        bmp_info,
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        ppm_info,
    )

    n = width * height * 3
    pixels = (payload * (n // max(len(payload), 1) + 1))[:n].ljust(n, b"\x01")
    ppm = encode_ppm(pixels, width, height)
    assert decode_ppm(ppm) == pixels
    assert ppm_info(ppm) == (width, height)
    bmp = encode_bmp(pixels, width, height)
    assert decode_bmp(bmp) == pixels
    assert bmp_info(bmp) == (width, height)


_long_cell = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=180,
    max_size=700,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(_adv_cell, st.one_of(_adv_cell, _long_cell)),
    min_size=1, max_size=6,
))
def test_xls_sector_boundary_adversarial_roundtrip(tmp_path_factory, rows):
    """Cells long enough that the OLE2 workbook stream spans multiple
    512-byte sectors, mixed with structural-keyword content ('Workbook',
    'stream', \\r runs): the sector-chain reassembly and BIFF record
    walk must recover every cell exactly."""
    import os

    from opensanctions_spark.sources.xls import write_xls, xls_rows

    rows = [[a, b] for a, b in rows]
    headers = ["c0", "c1"]
    path = os.path.join(str(tmp_path_factory.mktemp("xlsadv")), "t.xls")
    write_xls(path, headers, rows)
    with open(path, "rb") as fh:
        got = xls_rows(fh.read())
    assert got[0] == headers
    assert [[str(c) for c in r] for r in rows] == got[1:]


@settings(max_examples=25, deadline=None)
@given(st.lists(_adv_bytes.filter(bool), min_size=1, max_size=4))
def test_scanned_pdf_adversarial_images_roundtrip(tmp_path_factory, images):
    """Scanned-page image bytes containing PDF structural keywords,
    trailing \\r, or nulls extract bit-exactly, one per page in order —
    the image-XObject path shares the /Length stream slicing."""
    import os

    from opensanctions_spark.sources.pdf import (
        pdf_page_images,
        write_scanned_pdf,
    )

    path = os.path.join(str(tmp_path_factory.mktemp("scanadv")), "s.pdf")
    write_scanned_pdf(path, images)
    with open(path, "rb") as fh:
        got = pdf_page_images(fh.read())
    assert got == [
        (i + 1, img, "jpeg") for i, img in enumerate(images)
    ]


_xml_cell = st.lists(
    st.one_of(
        st.sampled_from([
            "<", ">", "&", '"', "'", "&amp;", "&#13;", "]]>", "\r", "\r\n",
            "<t>", "</t>", "<is>",
        ]),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=8,
        ),
    ),
    min_size=1,
    max_size=5,
).map("".join)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_xml_cell, min_size=1, max_size=3),
                min_size=1, max_size=6))
def test_xlsx_adversarial_cells_roundtrip(tmp_path_factory, rows):
    """Cells stuffed with XML markup, entity-lookalikes, CDATA
    terminators and raw \\r / \\r\\n round-trip bit-exactly through the
    inline-string xlsx writer/reader (escaping + the &#13; CR guard —
    XML parsing normalizes an unescaped CR to LF)."""
    import os

    from opensanctions_spark.sources import _xlsx_rows, write_xlsx

    width = max(len(r) for r in rows)
    rows = [(r + ["x"] * width)[:width] for r in rows]
    headers = [f"c{i}" for i in range(width)]
    path = os.path.join(str(tmp_path_factory.mktemp("xlsxadv")), "t.xlsx")
    write_xlsx(path, headers, rows)
    got = _xlsx_rows(path, 0)
    assert got[0] == headers
    assert got[1:] == rows
