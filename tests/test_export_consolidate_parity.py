"""Ported reference suite: the export-consolidation cases of
``zavod/zavod/tests/exporters/test_exporters.py`` (round-11 closure
campaign — test_statements_preserves_consolidated_removals,
test_consolidate_names_never_remove_ofac_names, test_ftm_referents).

These ports exposed a real behavior gap, fixed this round: the engine's
``export_all`` fed every sink the RAW entity view — the reference
consolidates each entity (prefix dates, case-duplicate names, weakAlias
demotion with protected-dataset exemptions, doubled undirected
endpoints) for every exporter EXCEPT the raw statements sink, and its
FtM documents carry ``referents``/``datasets`` lists. The engine now
does the same via ``operators/consolidate.consolidate_entities`` (a
map-only properties pass + one bounded protected-names join) and
``exporters.entity_referents``."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from opensanctions_spark.model.melt import finish_statements
from opensanctions_spark.operators.resolve import canonical_map
from opensanctions_spark.plans.run import DatasetConfig, run_dataset
from opensanctions_spark.sources.archive import StatementArchive


def _stmts(spark, rows, dataset):
    return finish_statements(
        spark.createDataFrame(
            rows, "entity_id string, schema string, prop string, value string"
        ),
        dataset=dataset,
    )


def _read_json_sink(out_dir, fname):
    path = os.path.join(out_dir, fname)
    part = [f for f in os.listdir(path) if f.startswith("part-")][0]
    with open(os.path.join(path, part)) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _read_csv_sink(out_dir, fname):
    import csv

    path = os.path.join(out_dir, fname)
    part = [f for f in os.listdir(path) if f.startswith("part-")][0]
    with open(os.path.join(path, part)) as fh:
        return list(csv.DictReader(fh))


def test_statements_preserve_consolidated_removals(spark, tmp_path):
    """Case-duplicate name variants across two datasets: the FtM export
    shows only the consolidated (better-cased) name, while
    statements.csv keeps BOTH originals."""
    stmts = _stmts(
        spark, [("person-stmts-1", "Person", "name", "John Doe")], "ds_a"
    ).unionByName(
        _stmts(spark, [("person-stmts-1", "Person", "name", "JOHN DOE")], "ds_b")
    )
    out = str(tmp_path / "out")
    run_dataset(
        spark, stmts, DatasetConfig(name="coll"),
        StatementArchive(spark, str(tmp_path / "arch")), out,
        run_time="2026-08-01T00:00:00",
    )
    rows = _read_csv_sink(out, "statements.csv")
    name_values = {
        r["value"]
        for r in rows
        if r["prop"] == "name" and r["canonical_id"] == "person-stmts-1"
    }
    assert name_values == {"John Doe", "JOHN DOE"}

    entities = _read_json_sink(out, "entities.ftm.json")
    person = next(
        json.loads(e["entity"]) for e in entities
        if json.loads(e["entity"])["id"] == "person-stmts-1"
    )
    assert person["properties"]["name"] == ["John Doe"]


def test_consolidate_names_never_remove_ofac_names(spark, tmp_path):
    """The protected-datasets rule: "The Tiger" is not demoted because a
    protected dataset states it as a full name; "Tigger" is demoted
    because the low-quality dataset itself marks it weak."""
    stmts = _stmts(
        spark, [("john-doe", "Person", "name", "The Tiger")], "us_ofac_sdn"
    ).unionByName(
        _stmts(
            spark,
            [
                ("john-doe", "Person", "name", "John Doe"),
                ("john-doe", "Person", "name", "Tigger"),
                ("john-doe", "Person", "weakAlias", "Tigger"),
                ("john-doe", "Person", "weakAlias", "The Tiger"),
            ],
            "xx_garbage",
        )
    )
    out = str(tmp_path / "out")
    run_dataset(
        spark, stmts, DatasetConfig(name="sanctions"),
        StatementArchive(spark, str(tmp_path / "arch")), out,
        run_time="2026-08-01T00:00:00",
    )
    entities = _read_json_sink(out, "entities.ftm.json")
    assert len(entities) == 1
    doc = json.loads(entities[0]["entity"])
    assert set(doc["properties"]["name"]) == {"John Doe", "The Tiger"}
    assert set(doc["properties"]["weakAlias"]) == {"Tigger", "The Tiger"}


def test_ftm_referents_and_datasets(spark, tmp_path):
    """The FtM document carries the resolver's referent ids and the
    contributing datasets (Entity.to_dict parity): merged source ids
    appear in ``referents``, the canonical id does not, and the merged
    entity is exported once."""
    stmts = _stmts(
        spark,
        [
            ("osv-john-doe", "Person", "name", "John Doe"),
            ("osv-johnny-does", "Person", "name", "Johnny Does"),
            ("osv-jane", "Person", "name", "Jane"),
        ],
        "testdataset1",
    )
    decisions = spark.createDataFrame(
        [("osv-john-doe", "osv-johnny-does", "POSITIVE")],
        "left_id string, right_id string, judgement string",
    )
    out = str(tmp_path / "out")
    run_dataset(
        spark, stmts, DatasetConfig(name="testdataset1"),
        StatementArchive(spark, str(tmp_path / "arch")), out,
        run_time="2026-08-01T00:00:00",
        canonical_map=canonical_map(decisions),
    )
    entities = {
        json.loads(e["entity"])["id"]: json.loads(e["entity"])
        for e in _read_json_sink(out, "entities.ftm.json")
    }
    assert "osv-johnny-does" not in entities
    john = entities["osv-john-doe"]
    assert john["referents"] == ["osv-johnny-does"]
    assert john["datasets"] == ["testdataset1"]
    assert set(john["properties"]["name"]) == {"John Doe", "Johnny Does"}
    jane = entities["osv-jane"]
    assert jane["referents"] == []
    assert jane["datasets"] == ["testdataset1"]


def test_nested_and_ftm_carry_datasets_and_last_change(spark, tmp_path):
    """The reference's nested/ftm documents carry per-entity datasets,
    the seen range, and last_change (= the newest statement
    first_seen: a value's first appearance moves it, a re-sighting
    moves only last_seen)."""
    stmts = _stmts(
        spark,
        [("t1", "Person", "name", "Target One"),
         ("t1", "Person", "topics", "sanction")],
        "testdataset1",
    )
    out = str(tmp_path / "out")
    arch = StatementArchive(spark, str(tmp_path / "arch"))
    config = DatasetConfig(name="testdataset1")
    run_dataset(spark, stmts, config, arch, out,
                run_time="2026-08-01T00:00:00")
    # run 2: a NEW value appears -> last_change moves to run 2's time
    stmts2 = _stmts(
        spark,
        [("t1", "Person", "name", "Target One"),
         ("t1", "Person", "name", "T. One"),
         ("t1", "Person", "topics", "sanction")],
        "testdataset1",
    )
    out2 = str(tmp_path / "out2")
    run_dataset(spark, stmts2, config, arch, out2,
                run_time="2026-08-13T00:00:00")

    nested = {r["id"]: r for r in _read_json_sink(out2, "targets.nested.json")}
    t1 = nested["t1"]
    assert t1["datasets"] == ["testdataset1"]
    assert t1["first_seen"] == "2026-08-01T00:00:00"
    assert t1["last_seen"] == "2026-08-13T00:00:00"
    assert t1["last_change"] == "2026-08-13T00:00:00"

    ftm = {json.loads(e["entity"])["id"]: json.loads(e["entity"])
           for e in _read_json_sink(out2, "entities.ftm.json")}
    assert ftm["t1"]["datasets"] == ["testdataset1"]
    assert ftm["t1"]["last_change"] == "2026-08-13T00:00:00"
