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


# --------------------------------------------------------------------------
# a realistic HTML crawler through the FULL helper surface
# (``opensanctions_spark.helpers``): parse_html_table → apply_name /
# apply_date / make_address+apply_address / make_sanction /
# make_identification → assembly. The shape mirrors a typical reference
# sanctions-list crawler (fetch page, iterate table rows, build entities
# with helpers, emit).

SANCTIONS_HTML = """
<html><body>
<table>
  <tr><th>Name</th><th>Born</th><th>Passport</th><th>Street</th>
      <th>City</th><th>Country</th><th>Listed</th><th>Program</th></tr>
  <tr><td>EXAMPLE, Ada</td><td>02.01.1970</td><td>P100</td>
      <td>Hauptstr. 1</td><td>Berlin</td><td>Germany</td>
      <td>2021-05-01</td><td>SRC-A</td></tr>
  <tr><td>Bob Sample</td><td>1980</td><td></td>
      <td></td><td></td><td>fr</td><td>2019</td><td>SRC-B</td></tr>
</table>
</body></html>
"""


def _helper_entry_point(context: CrawlerContext) -> None:
    from opensanctions_spark import helpers as h

    doc = h.parse_html(SANCTIONS_HTML)
    table = h.xpath_element(doc, ".//table")
    for cells in h.parse_html_table(table):
        row = h.cells_to_str(cells)
        entity = context.make("Person")
        entity.id = context.make_slug(row["name"])
        names = h.split_comma_names(context, row["name"])
        if len(names) == 1 and "," in names[0]:
            last, first = [p.strip() for p in names[0].split(",", 1)]
            h.apply_name(entity, first_name=first, last_name=last)
        else:
            h.apply_name(entity, full=names[0])
        h.apply_date(entity, "birthDate", row["born"],
                     dataset=context.dataset)

        addr = h.make_address(
            context, street=row["street"], city=row["city"],
            country=row["country"],
        )
        h.apply_address(context, entity, addr)

        if row["passport"]:
            ident = h.make_identification(
                context, entity, row["passport"], passport=True,
            )
            context.emit(ident)

        pkey = h.lookup_sanction_program_key(context, row["program"])
        sanction = h.make_sanction(
            context, entity, program_key=pkey,
            start_date=row["listed"],
            programs={"OS-A1": None},
        )
        context.emit(sanction)
        context.emit(entity)
        h.within_max_age(context, row["listed"]) or context.log.info(
            "stale listing", name=row["name"]
        )


def test_helper_crawler_end_to_end(spark, tmp_path):
    # remaining top-level keys land in DatasetConfig.metadata verbatim
    config = DatasetConfig.from_dict({
        "name": "helperds",
        "publisher": {"name": "Helper Authority", "country": "de"},
        "url": "https://list.example",
        "dates": {"formats": ["%d.%m.%Y"]},
        "lookups": {"sanction.program": {"options": [
            {"match": ["SRC-A"], "value": "OS-A1"},
        ]}},
    })
    stmts, context = crawl(spark, config, _helper_entry_point,
                           work_dir=str(tmp_path))
    rows = stmts.collect()
    by_key = {(r["entity_id"], r["prop"]): r for r in rows}

    # names: the comma-form split into parts, full name composed+inferred
    ada = "helperds-example-ada"
    assert by_key[(ada, "firstName")]["value"] == "Ada"
    assert by_key[(ada, "lastName")]["value"] == "EXAMPLE"
    assert by_key[(ada, "name")]["value"] == "Ada EXAMPLE"
    assert by_key[(ada, "name")]["origin"] == "inferred"
    # dates: dataset format parsed, original kept
    assert by_key[(ada, "birthDate")]["value"] == "1970-01-02"
    assert by_key[(ada, "birthDate")]["original_value"] == "02.01.1970"
    # address: composed line, holder back-refs, shared id derivation
    assert by_key[(ada, "address")]["value"] == "Hauptstr. 1, Berlin, Germany"
    addr_id = by_key[(ada, "addressEntity")]["value"]
    assert addr_id.startswith("addr-")
    assert by_key[(addr_id, "full")]["origin"] == "inferred"
    # passport + back-ref
    assert by_key[(ada, "passportNumber")]["value"] == "P100"
    # sanction: program resolved through the lookup, metadata stamped
    sid = by_key[(ada, "programId")]["entity_id"]
    sanction_rows = [r for r in rows if r["schema"] == "Sanction"]
    assert any(r["prop"] == "authority" and r["value"] == "Helper Authority"
               for r in sanction_rows)
    assert any(r["prop"] == "programId" and r["value"] == "OS-A1"
               for r in sanction_rows)
    assert sid == ada  # subject back-ref carries the subject id
    # unresolved program key (SRC-B) warned, not emitted
    assert any("SRC-B" in str(i) for i in context.issues)

    # downstream assembly still works on the helper-built frame
    from opensanctions_spark.operators.assembly import assemble_entities

    entities = assemble_entities(stmts)
    assert entities.filter(F.col("schema") == "Passport").count() == 1


def test_statement_surface_pickle_and_attrs():
    """The FtM Statement read surface (round 8) under serialization:
    unpacks as the 5-tuple, carries provenance attributes, and survives
    pickle/copy round-trips (tuple.__getnewargs__ would otherwise pass
    the whole 5-tuple as one constructor argument)."""
    import copy
    import pickle

    from opensanctions_spark.crawler import Statement

    s = Statement("holder", "p1", "en", "inferred", "P-1",
                  dataset="src", external=True)
    prop, value, lang, origin, original = s
    assert (prop, value, lang, origin, original) == (
        "holder", "p1", "en", "inferred", "P-1"
    )
    assert (s.prop, s.value, s.dataset, s.external) == (
        "holder", "p1", "src", True
    )
    for clone in (pickle.loads(pickle.dumps(s)), copy.copy(s),
                  copy.deepcopy(s)):
        assert clone == s
        assert clone.dataset == "src" and clone.external is True


def test_get_type_values_and_matchable():
    """EntityProxy.get_type_values parity (reference call sites pass
    registry singletons and matchable=True — simplecsv.py:69-104,
    names.py:19, integration/logic.py:25-78): TYPE_PROPS maps the type
    to its props, matchable=True drops non-matchable ones (weakAlias),
    values dedupe in first-seen order."""
    from opensanctions_spark.crawler import Entity, Schema
    from opensanctions_spark.model import registry

    e = Entity(Schema("Person"))
    e.add("name", ["Jane Doe", "Jane Doe"])
    e.add("alias", "J. Doe")
    e.add("weakAlias", "JD")
    e.add("country", "dk")
    e.add("nationality", "se")
    e.add("topics", ["role.pep", "sanction"])
    assert e.get_type_values(registry.name) == ["Jane Doe", "J. Doe", "JD"]
    assert e.get_type_values(registry.name, matchable=True) == [
        "Jane Doe", "J. Doe"
    ]
    assert e.get_type_values(registry.country) == ["dk", "se"]
    assert e.get_type_values(registry.topic) == ["role.pep", "sanction"]
    assert e.get_type_values(registry.email) == []


def test_caption_per_schema_order_and_label_fallback():
    """EntityProxy.caption parity: per-schema caption-prop order (Address
    captions by `full`), generic (name, alias, title) otherwise, and the
    schema display LABEL as the fallback (not the id)."""
    from opensanctions_spark.crawler import Entity, Schema

    addr = Entity(Schema("Address"))
    addr.add("name", "HQ")
    addr.add("full", "1 Main St, Springfield")
    assert addr.caption == "1 Main St, Springfield"

    person = Entity(Schema("Person"))
    person.id = "p-1"
    person.add("alias", "J. Doe")
    assert person.caption == "J. Doe"

    empty = Entity(Schema("PublicBody"))
    empty.id = "pb-1"
    assert empty.caption == "Public body"
