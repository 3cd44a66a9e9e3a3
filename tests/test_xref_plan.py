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
