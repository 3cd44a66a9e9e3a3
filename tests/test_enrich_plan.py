"""The composed enrichment plan (SURVEY §3.2): same-ID + bipartite
blocking matcher, judgement dispositions, topic gate, bounded expansion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.plans.enrich import EnrichConfig, enrich, enrich_matches


@pytest.fixture()
def scopes(spark):
    subjects = spark.createDataFrame(
        [
            ("s1", "acme holding group"),
            ("s2", "bolt fastener works"),
            ("s3", "cobalt mining corp"),
            ("q1", "quartz fund"),        # same id on both sides (QID case)
            ("s5", "zenith isolated"),
        ],
        "id STRING, name STRING",
    )
    targets = spark.createDataFrame(
        [
            ("t1", "acme holding group"),     # exact -> match, POSITIVE
            ("t2", "bolt fastener works"),    # exact -> match, NEGATIVE
            ("t3", "cobalt mining corp"),     # exact -> match, no judgement
            ("q1", "totally different name"), # J8 same-id match
            ("t9", "unrelated widgets"),
        ],
        "id STRING, name STRING",
    )
    return subjects, targets


def test_enrich_matches_via(spark, scopes):
    subjects, targets = scopes
    got = {
        (r["subject_id"], r["candidate_id"]): (r["via"], r["score"])
        for r in enrich_matches(subjects, targets, EnrichConfig()).collect()
    }
    assert got[("s1", "t1")] == ("blocking", 1.0)
    assert got[("q1", "q1")] == ("same_id", 1.0)
    assert ("s5", "t9") not in got


def test_enrich_dispositions_and_expansion(spark, scopes):
    subjects, targets = scopes
    judgements = spark.createDataFrame(
        [("s1", "t1", "POSITIVE"), ("s2", "t2", "NEGATIVE"), ("q1", "q1", "POSITIVE")],
        "left_id STRING, right_id STRING, judgement STRING",
    )
    # t1 is publishable; q1 is NOT -> its POSITIVE match must not expand
    publishable = spark.createDataFrame([("t1",), ("t3",)], "id STRING")
    edges = spark.createDataFrame(
        [
            ("t1", "x1"), ("x1", "x2"), ("x2", "x3"),  # 3-chain from t1
            ("q1", "y1"),                               # reachable only via q1
        ],
        "src STRING, dst STRING",
    )
    candidates, internal = enrich(
        subjects, targets, edges, judgements, publishable,
        EnrichConfig(expand_depth=2),
    )

    cand = {(r["subject_id"], r["candidate_id"]) for r in candidates.collect()}
    # no judgement -> external candidate; judged pairs never re-emitted
    assert cand == {("s3", "t3")}

    depths = {r["node"]: r["depth"] for r in internal.collect()}
    # t1 expands 2 hops; x3 is beyond depth, y1 gated out with q1
    assert depths == {"t1": 0, "x1": 1, "x2": 2}


def test_cli_enrich_verb(spark, tmp_path, capsys):
    import json

    from opensanctions_spark.__main__ import main

    subjects = spark.createDataFrame(
        [("s1", "acme holding group"), ("s2", "zeta unknown")], "id STRING, name STRING"
    )
    targets = spark.createDataFrame(
        [("t1", "acme holding group"), ("t2", "other corp")], "id STRING, name STRING"
    )
    subjects.write.parquet(str(tmp_path / "subjects.parquet"))
    targets.write.parquet(str(tmp_path / "targets.parquet"))
    rc = main([
        "enrich",
        "--subjects", str(tmp_path / "subjects.parquet"),
        "--targets", str(tmp_path / "targets.parquet"),
        "--out", str(tmp_path / "enrich"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["candidates"] >= 1
    cands = spark.read.parquet(str(tmp_path / "enrich" / "candidates.parquet"))
    row = cands.filter(cands.subject_id == "s1").collect()
    assert row and row[0]["candidate_id"] == "t1"
