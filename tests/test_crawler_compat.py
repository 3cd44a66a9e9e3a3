"""Crawler-API compatibility layer: a crawler written against the
reference's Context/Entity surface (``zavod/zavod/tests/fixtures/
testdataset1/testentrypoint1.py`` shape) runs unchanged on
``opensanctions_spark.crawler`` and its emits flow through the full
pipeline (J1 → A1 → exporters)."""

from __future__ import annotations

import csv
import io

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.crawler import CrawlerContext, crawl
from opensanctions_spark.plans.run import DatasetConfig

SOURCE_CSV = """id,type,name,alias,dob,country,id_number,rel_type,rel_other,rel_start,topics,city,street
ada,Person,Ada Example,A. Example,1970-01-02,de,P100,Membership,acme,2001,role.pep,Berlin,Hauptstr. 1
bob,Person,Bob Sample,,1980,us,,Family,ada,,poi,,
acme,Organization,ACME Handels GmbH,,,de,HRB-1,,,,pol.party,,
shell,Company,Shell Co,,1999,fr,,Ownership,acme,2005,reg.warn,Paris,Rue X
"""


def _crawl_row(context: CrawlerContext, row: dict) -> None:
    # mirrors the reference fixture crawler line-for-line
    schema = row.pop("type")
    entity = context.make(schema)
    entity.id = context.make_slug(row.pop("id"))
    entity.add("name", row.pop("name"))
    entity.add("alias", row.pop("alias"))
    entity.add("topics", row.pop("topics"))

    city = row.pop("city")
    street = row.pop("street")
    if city or street:
        entity.add("address", ", ".join(p for p in (street, city) if p))

    if entity.schema.is_a("Person"):
        entity.add("nationality", row.pop("country"))
        entity.add("idNumber", row.pop("id_number"))
        entity.add("birthDate", row.pop("dob"))
    else:
        entity.add("jurisdiction", row.pop("country"))
        entity.add("registrationNumber", row.pop("id_number"))
        entity.add("incorporationDate", row.pop("dob"))

    rel_schema = row.pop("rel_type")
    if rel_schema:
        rel = context.make(rel_schema)
        other_id = context.make_slug(row.pop("rel_other"))
        rel.id = context.make_id("rel", entity.id, other_id)
        rel.add("startDate", row.pop("rel_start"))
        rel.add(rel.schema.source_prop, entity.id)
        rel.add(rel.schema.target_prop, other_id)
        context.emit(rel)

    context.emit(entity)
    context.audit_data(row)


def _entry_point(context: CrawlerContext) -> None:
    for row in csv.DictReader(io.StringIO(SOURCE_CSV)):
        _crawl_row(context, row)
    context.log.warn("This is a test warning")


def test_fixture_crawler_end_to_end(spark, tmp_path):
    config = DatasetConfig.from_dict({"name": "testds"})
    stmts, context = crawl(spark, config, _entry_point,
                           work_dir=str(tmp_path), run_time="2024-01-01")
    rows = stmts.collect()

    # 4 entities + 3 relationship entities
    assert {r["entity_id"] for r in rows} == {
        "testds-ada", "testds-bob", "testds-acme", "testds-shell",
        context.make_id("rel", "testds-ada", "testds-acme"),
        context.make_id("rel", "testds-bob", "testds-ada"),
        context.make_id("rel", "testds-shell", "testds-acme"),
    }
    by_key = {(r["entity_id"], r["prop"], r["value"]): r for r in rows}
    # canonical IR stamping: ids, dataset, P5 guard (empty alias dropped)
    assert all(r["dataset"] == "testds" for r in rows)
    assert ("testds-bob", "alias", "") not in {
        (r["entity_id"], r["prop"], r["value"]) for r in rows
    }
    # edge roles use the schema registry's source/target props
    mem = context.make_id("rel", "testds-ada", "testds-acme")
    assert by_key[(mem, "member", "testds-ada")]["schema"] == "Membership"
    assert by_key[(mem, "organization", "testds-acme")]["schema"] == "Membership"
    # Person/LegalEntity branch taken via schema.is_a
    assert ("testds-ada", "nationality", "de") in by_key
    assert ("testds-acme", "jurisdiction", "de") in by_key
    # the crawler-level warning landed in the issues channel
    assert any(i["message"] == "This is a test warning"
               for i in context.issues)
    assert context.n_emitted == 7

    # downstream: the frame assembles like any melted statements frame
    from opensanctions_spark.operators.assembly import assemble_entities

    entities = assemble_entities(stmts)
    ada = entities.filter(F.col("canonical_id") == "testds-ada").collect()[0]
    assert sorted(ada["properties"]["topics"]) == ["role.pep"]
    assert ada["schema"] == "Person"


def test_audit_data_flags_unconsumed_fields(spark):
    config = DatasetConfig.from_dict({"name": "auditds"})
    context = CrawlerContext(spark, config)
    context.audit_data({"used": None, "spare": "x", "blank": "  "},
                       ignore=["known"])
    assert len(context.issues) == 1
    assert context.issues[0]["data"]["fields"] == ["spare"]


def test_make_id_slug_and_emit_guards(spark):
    config = DatasetConfig.from_dict({"name": "ids"})
    context = CrawlerContext(spark, config)
    assert context.make_slug("Ada  Lovelace!") == "ids-ada-lovelace"
    assert context.make_slug(None) is None
    a = context.make_id("x", None, "y")
    assert a == context.make_id("x", "y")  # None parts skipped
    assert context.make_id() is None
    e = context.make("Person")
    e.add("name", ["Ada", None, "  "])
    assert e.get("name") == ["Ada"]
    with pytest.raises(ValueError, match="has no id"):
        context.emit(e)
    # set replaces, add appends
    e.set("name", "Only")
    assert e.get("name") == ["Only"]


def test_lookup_and_external_flag(spark):
    config = DatasetConfig.from_dict({
        "name": "lkds",
        "lookups": {"plants": {"options": [
            {"match": ["banana", "apple"], "value": "Fruit"},
        ]}},
    })
    context = CrawlerContext(spark, config)
    assert context.lookup_value("plants", "banana") == "Fruit"
    assert context.lookup_value("plants", "oak", default="?") == "?"
    assert context.lookup("plants", "apple").result["value"] == "Fruit"
    assert context.lookup("nope", "x") is None

    e = context.make("Person")
    e.id = "lk-1"
    e.add("name", "Ext", lang="eng", origin="enrich",
          original_value="EXT")
    context.emit(e, external=True)
    row = context.statements_df().collect()[0]
    assert row["external"] is True
    assert (row["lang"], row["origin"], row["original_value"]) == (
        "eng", "enrich", "EXT")


def test_batched_flush_bounds_driver_memory(spark):
    config = DatasetConfig.from_dict({"name": "bulk"})
    context = CrawlerContext(spark, config, flush_rows=10)
    for i in range(17):
        e = context.make("Person")
        e.id = f"p{i}"
        e.add("name", f"N{i}")
        context.emit(e)
    assert len(context._batches) >= 1      # flushed mid-crawl
    assert context.statements_df().count() == 17
