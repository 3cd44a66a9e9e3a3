"""The composed xref plan (SURVEY §3.3): blocking → scoring → rules →
decisions → canonical map, plus the review queue and the CLI surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.plans.xref import (
    XrefConfig,
    review_queue,
    xref_and_resolve,
    xref_pairs,
)

SUBJECT_SCHEMA = (
    "id STRING, name STRING, strong_ids ARRAY<STRING>, id_numbers ARRAY<STRING>"
)


@pytest.fixture()
def subjects(spark):
    rows = [
        # exact-name trio -> two pairs, transitively one cluster
        ("a1", "acme holding group", [], []),
        ("a2", "acme holding group", [], []),
        ("a3", "acme holding group", [], []),
        # one shared token with the acmes -> UNSURE (score below threshold)
        ("a4", "acme trading", [], []),
        # same strong id forces a merge despite zero name overlap
        ("b1", "bolt industries", ["LEI:123"], []),
        ("b2", "bolt fastener works", ["LEI:123"], []),
        # high name score but disjoint id numbers -> vetoed
        ("c1", "cobalt mining corp", [], ["P100"]),
        ("c2", "cobalt mining corp", [], ["P200"]),
        # no candidates at all
        ("d1", "delta unrelated", [], []),
    ]
    return spark.createDataFrame(rows, SUBJECT_SCHEMA)


def test_xref_pairs_judgements(spark, subjects):
    decisions = xref_pairs(subjects, XrefConfig(threshold=0.7)).collect()
    by_pair = {(r["left_id"], r["right_id"]): r["judgement"] for r in decisions}
    # exact-name pairs auto-merge
    assert by_pair[("a1", "a2")] == "POSITIVE"
    assert by_pair[("a1", "a3")] == "POSITIVE"
    assert by_pair[("a2", "a3")] == "POSITIVE"
    # strong-id overlap forces POSITIVE despite one shared token ("bolt")
    assert by_pair[("b1", "b2")] == "POSITIVE"
    # disjoint id numbers veto an otherwise perfect name match
    assert by_pair[("c1", "c2")] == "NEGATIVE"
    # partial overlap queues for review
    assert by_pair[("a1", "a4")] == "UNSURE"
    # undirected: no (x, y) with x >= y
    assert all(left < right for left, right in by_pair)


def test_resolve_and_review(spark, subjects):
    decisions, mapping = xref_and_resolve(subjects, XrefConfig(threshold=0.7))
    canon = {r["entity_id"]: r["canonical_id"] for r in mapping.collect()}
    assert canon["a1"] == canon["a2"] == canon["a3"] == "a1"
    assert canon["b1"] == canon["b2"] == "b1"
    # vetoed and unmatched entities never enter the mapping
    assert "c1" not in canon and "c2" not in canon and "d1" not in canon

    queue = review_queue(decisions).collect()
    assert [(r["left_id"], r["right_id"]) for r in queue] == [
        ("a1", "a4"), ("a2", "a4"), ("a3", "a4")
    ]


def test_top_k_and_limit_prune(spark, subjects):
    cfg = XrefConfig(threshold=0.7, top_k=1, limit=2)
    decisions = xref_pairs(subjects, cfg)
    # top-1 per subject, then a global cap of 2 candidates total
    assert decisions.count() == 2


def test_cli_xref(spark, tmp_path, subjects, capsys):
    from opensanctions_spark.__main__ import main

    subj_path = str(tmp_path / "subjects.parquet")
    out = str(tmp_path / "xref")
    subjects.write.parquet(subj_path)
    rc = main(["xref", "--subjects", subj_path, "--out", out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["decisions"]["POSITIVE"] == 4
    assert report["decisions"]["NEGATIVE"] == 1
    assert report["merged_entities"] == 3  # a2, a3, b2
    assert report["review_queue"] == report["decisions"]["UNSURE"]

    mapping = spark.read.parquet(f"{out}/canonical_map.parquet")
    assert {
        r["entity_id"]: r["canonical_id"] for r in mapping.collect()
    }["b2"] == "b1"


def test_apply_judgement_updates_and_appends(spark):
    from opensanctions_spark.plans.xref import apply_judgement

    decisions = spark.createDataFrame(
        [("a", "b", 0.9, "UNSURE"), ("a", "c", 0.7, "NEGATIVE")],
        "left_id STRING, right_id STRING, score DOUBLE, judgement STRING",
    )
    # existing pair: overwrite (ids arrive reversed — normalized)
    out = apply_judgement(decisions, "b", "a", "positive")
    rows = {(r["left_id"], r["right_id"]): r["judgement"] for r in out.collect()}
    assert rows == {("a", "b"): "POSITIVE", ("a", "c"): "NEGATIVE"}
    # unknown pair: append as a human assertion with score 1.0
    out2 = apply_judgement(decisions, "z", "d", "negative")
    added = out2.filter(F.col("left_id") == "d").collect()
    assert len(added) == 1
    assert added[0]["right_id"] == "z"
    assert added[0]["score"] == 1.0 and added[0]["judgement"] == "NEGATIVE"
    with pytest.raises(ValueError):
        apply_judgement(decisions, "a", "b", "maybe")


def test_cli_dedupe_review_loop(spark, tmp_path, subjects, capsys):
    """Headless review loop: xref → dedupe-next pops the best UNSURE pair
    → dedupe-judge records the decision and shrinks the queue."""
    from opensanctions_spark.__main__ import main

    subj_path = str(tmp_path / "subjects.parquet")
    out = str(tmp_path / "xref")
    subjects.write.parquet(subj_path)
    rc = main(["xref", "--subjects", subj_path, "--out", out])
    assert rc == 0
    capsys.readouterr()
    decisions_path = f"{out}/decisions.parquet"

    assert main([
        "dedupe-next", "--decisions", decisions_path, "--limit", "1",
    ]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    top = json.loads(lines[0])

    assert main([
        "dedupe-judge", "--decisions", decisions_path,
        "--left", top["left_id"], "--right", top["right_id"],
        "--judgement", "positive",
        "--out", str(tmp_path / "decisions2.parquet"),
    ]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["judged"]["judgement"] == "POSITIVE"
    updated = spark.read.parquet(str(tmp_path / "decisions2.parquet"))
    pair = updated.filter(
        (F.col("left_id") == top["left_id"])
        & (F.col("right_id") == top["right_id"])
    ).collect()
    assert [r["judgement"] for r in pair] == ["POSITIVE"]


def test_apply_judgements_bulk(spark):
    """Bulk session write (plans/xref.apply_judgements): overwrite known
    pairs, append unknown ones, last re-judgement wins — one broadcast
    join regardless of session length."""
    from opensanctions_spark.plans.xref import apply_judgements

    decisions = spark.createDataFrame(
        [("a", "b", 0.9, "UNSURE"), ("a", "c", 0.7, "UNSURE"),
         ("b", "d", 0.6, "NEGATIVE")],
        "left_id STRING, right_id STRING, score DOUBLE, judgement STRING",
    )
    out = apply_judgements(decisions, [
        ("b", "a", "positive"),        # reversed ids normalize
        ("a", "c", "negative"),
        ("a", "c", "positive"),        # re-judged: last wins
        ("x", "y", "negative"),        # unknown: appended at score 1.0
    ])
    rows = {(r["left_id"], r["right_id"]): (r["judgement"], r["score"])
            for r in out.collect()}
    assert rows[("a", "b")] == ("POSITIVE", 0.9)
    assert rows[("a", "c")] == ("POSITIVE", 0.7)
    assert rows[("b", "d")] == ("NEGATIVE", 0.6)
    assert rows[("x", "y")] == ("NEGATIVE", 1.0)
    # empty session is the identity
    assert apply_judgements(decisions, []) is decisions
    with pytest.raises(ValueError):
        apply_judgements(decisions, [("a", "b", "maybe")])


def test_interactive_dedupe_review_loop(spark):
    """The zavod-dedupe TUI analogue (plans/dedupe_ui.dedupe_review_loop,
    reference zavod/zavod/cli/dedupe.py:72-84): pops UNSURE pairs
    best-first, renders entity cards, applies p/n, skips on u, stops on
    q."""
    import io

    from opensanctions_spark.plans.dedupe_ui import dedupe_review_loop

    decisions = spark.createDataFrame(
        [("a1", "a2", 0.95, "UNSURE"), ("a1", "a4", 0.60, "UNSURE"),
         ("b1", "b2", 0.55, "UNSURE"), ("c1", "c2", 0.40, "UNSURE"),
         ("a2", "a3", 0.90, "POSITIVE")],  # already judged: not queued
        "left_id STRING, right_id STRING, score DOUBLE, judgement STRING",
    )
    entities = spark.createDataFrame(
        [("a1", "Company", {"name": ["Acme Holding"], "country": ["de"]}),
         ("a2", "Company", {"name": ["ACME Holding Group"]})],
        "canonical_id STRING, schema STRING, "
        "properties MAP<STRING, ARRAY<STRING>>",
    )
    # p → a1/a2 POSITIVE; u → skip a1/a4; n → b1/b2 NEGATIVE; q → stop
    in_stream = io.StringIO("p\nu\nn\nq\n")
    out_stream = io.StringIO()
    updated, judgements = dedupe_review_loop(
        decisions, entities, in_stream, out_stream, limit=10
    )
    assert judgements == [
        ("a1", "a2", "POSITIVE"), ("b1", "b2", "NEGATIVE"),
    ]
    rows = {(r["left_id"], r["right_id"]): r["judgement"]
            for r in updated.collect()}
    assert rows[("a1", "a2")] == "POSITIVE"
    assert rows[("b1", "b2")] == "NEGATIVE"
    assert rows[("a1", "a4")] == "UNSURE"   # skipped
    assert rows[("c1", "c2")] == "UNSURE"   # never reached (quit)
    screen = out_stream.getvalue()
    # best-first pop order and the entity cards rendered
    assert screen.index("0.950") < screen.index("0.600")
    assert "Acme Holding" in screen and "[Company]" in screen
    assert "(no entity card)" in screen  # a4 has no card
    assert "2 judgement(s) recorded" in screen


def test_cli_dedupe_interactive(spark, tmp_path, subjects, capsys,
                                monkeypatch):
    """CLI verb: python -m opensanctions_spark dedupe — stdin-driven."""
    import io

    from opensanctions_spark.__main__ import main

    subj_path = str(tmp_path / "subjects.parquet")
    out = str(tmp_path / "xref")
    subjects.write.parquet(subj_path)
    assert main(["xref", "--subjects", subj_path, "--out", out]) == 0
    capsys.readouterr()
    decisions_path = f"{out}/decisions.parquet"
    n_unsure = (
        spark.read.parquet(decisions_path)
        .filter(F.col("judgement") == "UNSURE").count()
    )
    monkeypatch.setattr("sys.stdin", io.StringIO("p\nq\n"))
    assert main([
        "dedupe", "--decisions", decisions_path,
        "--out", str(tmp_path / "decisions3.parquet"), "--limit", "5",
    ]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["judged"] == 1
    updated = spark.read.parquet(str(tmp_path / "decisions3.parquet"))
    assert (
        updated.filter(F.col("judgement") == "UNSURE").count()
        == n_unsure - 1
    )


def test_strong_id_edges_linear_path(spark, subjects):
    """The round-11 linear exact-duplicate path: strong-id groups emit
    (d-1) spanning edges to the min-id anchor, and xref_and_resolve
    (exact_strong_ids=True) reaches the same canonical map as the
    pairwise J9 force rule — even when the blocking cap is so tight
    that the fuzzy path proposes NO candidates for the group."""
    from opensanctions_spark.plans.xref import strong_id_edges

    edges = strong_id_edges(subjects).collect()
    assert [(e["left_id"], e["right_id"], e["judgement"]) for e in edges] == [
        ("b1", "b2", "POSITIVE")
    ]

    # a 4-way group resolves with 3 spanning edges, never 6 pairs
    four = spark.createDataFrame(
        [(f"x{i}", f"name {i}", ["REG:9"], []) for i in range(4)],
        "id string, name string, strong_ids array<string>, id_numbers array<string>",
    )
    es = strong_id_edges(four).collect()
    assert len(es) == 3
    assert {e["left_id"] for e in es} == {"x0"}

    # with a blocking cap of 0 candidates the strong-id path still merges
    cfg = XrefConfig(threshold=0.7, top_k=3, limit=0, max_token_freq=None)
    _dec, mapping = xref_and_resolve(four, cfg, exact_strong_ids=True)
    got = {
        (r["entity_id"], r["canonical_id"]) for r in mapping.collect()
    }
    # the anchor carries its identity row; every member maps to it
    assert got == {("x0", "x0"), ("x1", "x0"), ("x2", "x0"), ("x3", "x0")}


def test_strong_id_union_deterministic_scores(spark, subjects):
    """When a pair arrives from BOTH the blocking path and the
    strong-id spanning path, the persisted decision must be
    deterministic — max score wins (not whichever partition landed
    first). Two runs over differently-partitioned input produce
    byte-identical decision rows."""
    cfg = XrefConfig(threshold=0.5, top_k=5, max_token_freq=None)

    def run(df):
        dec, _ = xref_and_resolve(df, cfg, exact_strong_ids=True)
        return sorted(
            (r["left_id"], r["right_id"], r["score"], r["judgement"])
            for r in dec.collect()
        )

    a = run(subjects.repartition(1))
    b = run(subjects.repartition(7, "id"))
    assert a == b
    # the b1/b2 pair shares a strong id AND blocks on its name tokens:
    # the surviving score is the max (the spanning edge's 1.0)
    pair = [r for r in a if (r[0], r[1]) == ("b1", "b2")]
    assert pair and pair[0][2] == 1.0 and pair[0][3] == "POSITIVE"
