"""Headless wikidata-reconcile (reference
``zavod/zavod/cli/dedupe.py:86-168``): persons reviewed against
candidate QIDs, confirmed matches become POSITIVE judgements + a
citation command, no-matches become NEGATIVE, ``create`` emits a
QuickStatements CREATE block in the public v1 format."""

from __future__ import annotations

import io
import json
from types import SimpleNamespace

from pyspark.sql import functions as F

from opensanctions_spark.crawler import Entity, Schema
from opensanctions_spark.plans.wikidata_reconcile import (
    qs_date,
    quickstatements_create,
    reconcile_loop,
    serialize,
)


class _SearchClient:
    def __init__(self, results):
        self.results = results
        self.queries: list[str] = []

    def search_entities(self, text, limit=5):
        self.queries.append(text)
        return self.results.get(text, [])[:limit]


def _person(eid, name, birth=None, alias=None):
    e = Entity(Schema("Person"))
    e.id = eid
    e.add("name", name)
    if birth:
        e.add("birthDate", birth)
    if alias:
        e.add("alias", alias)
    return e


def test_qs_date_precision():
    assert qs_date("1970") == "+1970-01-01T00:00:00Z/9"
    assert qs_date("1970-05") == "+1970-05-01T00:00:00Z/10"
    assert qs_date("1970-05-01") == "+1970-05-01T00:00:00Z/11"


def test_quickstatements_create_block():
    cmds = quickstatements_create(
        _person("x", "Jane Doe", birth="1970-05"), source_url="https://s"
    )
    assert cmds[0] == ["CREATE"]
    assert ["LAST", "Len", '"Jane Doe"'] in cmds
    assert ["LAST", "P31", "Q5"] in cmds
    assert ["LAST", "P569", "+1970-05-01T00:00:00Z/10"] in cmds
    assert ["LAST", "P973", '"https://s"'] in cmds
    text = serialize(cmds)
    assert text.splitlines()[0] == "CREATE"
    assert "LAST\tP31\tQ5" in text


def test_reconcile_loop_verbs():
    client = _SearchClient({
        "Jane Match": [
            ("Q900", "Jon Similar", "politician"),
            ("Q901", "Jane Match", "diplomat"),      # exact label → ranks 1st
        ],
        "Nobody Known": [("Q902", "Somebody Else", "athlete")],
        "New Person": [],
        "Skipped Person": [("Q903", "Skipped Person", "x")],
        "Quit Here": [("Q904", "Quit Here", "x")],
    })
    persons = [
        _person("p1", "Jane Match", birth="1970-05-01"),
        _person("p2", "Nobody Known"),
        _person("p3", "New Person"),
        _person("p4", "Skipped Person"),
        _person("p5", "Quit Here"),
    ]
    # 1 → confirm the top-ranked (exact-label) candidate for p1;
    # n → NEGATIVE all p2 candidates; c → create p3; u → skip p4; q → quit
    in_s = io.StringIO("1\nn\nc\nu\nq\n")
    out_s = io.StringIO()
    judgements, commands = reconcile_loop(
        persons, client, in_s, out_s,
        source_url="https://data.example/ds", retrieved="2026-08-15",
    )
    assert judgements == [
        ("p1", "Q901", "POSITIVE"),
        ("p2", "Q902", "NEGATIVE"),
    ]
    text = serialize(commands)
    # match citation with retrieved-on qualifier
    assert "Q901\tP973\t\"https://data.example/ds\"\tP813\t" in text
    # create block for p3
    assert "CREATE" in text and 'LAST\tLen\t"New Person"' in text
    screen = out_s.getvalue()
    # exact-label candidate displayed first despite API order
    assert screen.index("Q901") < screen.index("Q900")
    assert "(born 1970-05-01)" in screen
    # p5 never reviewed (quit)
    assert client.queries == [
        "Jane Match", "Nobody Known", "New Person", "Skipped Person",
        "Quit Here",
    ][:len(client.queries)]
    assert "2 judgement(s)" in screen


def test_cli_wikidata_reconcile(spark, tmp_path, capsys, monkeypatch):
    from opensanctions_spark.__main__ import main
    from opensanctions_spark.shed.wikidata import client as wd_client

    ents = spark.createDataFrame(
        [
            ("p1", "Person", {"name": ["Jane Match"]}),
            ("org1", "Company", {"name": ["Not A Person"]}),
        ],
        "canonical_id STRING, schema STRING, "
        "properties MAP<STRING, ARRAY<STRING>>",
    )
    epath = str(tmp_path / "entities.parquet")
    ents.write.parquet(epath)

    wd_client.register_wikidata_client_factory(
        lambda ctx: _SearchClient(
            {"Jane Match": [("Q901", "Jane Match", "diplomat")]}
        )
    )
    monkeypatch.setattr("sys.stdin", io.StringIO("1\n"))
    try:
        rc = main([
            "wikidata-reconcile", "--entities", epath,
            "--out", str(tmp_path / "decisions.parquet"),
            "--qs", str(tmp_path / "wikidata.qs"),
            "--source-url", "https://data.example/ds",
        ])
    finally:
        wd_client.register_wikidata_client_factory(None)
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["judged"] == 1
    back = spark.read.parquet(str(tmp_path / "decisions.parquet"))
    rows = back.collect()
    assert len(rows) == 1
    r = rows[0]
    # pair normalized (smaller id first), human assertion score 1.0
    assert {r["left_id"], r["right_id"]} == {"p1", "Q901"}
    assert r["judgement"] == "POSITIVE" and r["score"] == 1.0
    qs = open(tmp_path / "wikidata.qs").read()
    assert qs.startswith("Q901\tP973\t")
