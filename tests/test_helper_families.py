"""The round-4 helper families: securities (make_security) and the
sanctions-program registry — the last items of VERDICT r3 "What's
missing" #5 (vessels were already covered by the identifier family)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.functions.programs import (
    MEASURES,
    Program,
    load_programs,
    programs_df,
)
from opensanctions_spark.functions.securities import (
    make_security_statements,
    security_country,
    security_id,
)


def test_security_columns(spark):
    df = spark.createDataFrame(
        [("us0378331005",), ("XS1234567890",), (None,)], ["isin"]
    )
    got = df.select(
        security_id(F.col("isin")).alias("id"),
        security_country(F.col("isin")).alias("cc"),
    ).collect()
    assert (got[0]["id"], got[0]["cc"]) == ("isin-US0378331005", "US")
    # XS is an international pseudo-prefix → no country inferred
    assert (got[1]["id"], got[1]["cc"]) == ("isin-XS1234567890", None)
    assert (got[2]["id"], got[2]["cc"]) == (None, None)


def test_make_security_statements(spark):
    """securities.py:8-17 emit set: isin always, country only for real
    prefixes and marked origin=inferred."""
    df = spark.createDataFrame([("de000basf111",), ("QS0000000001",)], ["isin"])
    stmts = make_security_statements(df, "isin", dataset="sec").collect()
    by_key = {(r["entity_id"], r["prop"]): r for r in stmts}
    assert set(by_key) == {
        ("isin-DE000BASF111", "isin"),
        ("isin-DE000BASF111", "country"),
        ("isin-QS0000000001", "isin"),  # QS → no country row at all
    }
    de_cc = by_key[("isin-DE000BASF111", "country")]
    assert de_cc["value"] == "DE" and de_cc["origin"] == "inferred"
    assert by_key[("isin-DE000BASF111", "isin")]["origin"] is None
    assert all(r["schema"] == "Security" for r in stmts)


PROGRAMS = {
    "EU-RUS": {
        "key": "EU-RUS",
        "title": "EU restrictive measures over Ukraine",
        "issuer": "eu_council",
        "measures": ["Asset freeze", "Travel ban"],
        "target_territories": ["ru"],
    },
    "US-CUBA": {
        "key": "US-CUBA",
        "title": "Cuban Assets Control Regulations",
        "status": "legacy",
        "measures": ["Financial restrictions"],
    },
}
ISSUERS = {
    "eu_council": {"name": "Council of the European Union", "acronym": "EU"},
}


def test_load_programs_and_df(spark):
    programs = load_programs(PROGRAMS, issuers=ISSUERS)
    assert programs["EU-RUS"].issuer.acronym == "EU"
    assert programs["US-CUBA"].status == "legacy"
    df = programs_df(spark, programs)
    rows = {r["program_key"]: r for r in df.collect()}
    assert rows["EU-RUS"]["issuer_name"] == "Council of the European Union"
    assert rows["EU-RUS"]["measures"] == ["Asset freeze", "Travel ban"]
    assert rows["US-CUBA"]["issuer_name"] is None


def test_program_validation_mirrors_reference_asserts():
    """programs.py:194-248 load-time guards: key↔filename agreement,
    measure vocabulary, status vocabulary."""
    with pytest.raises(ValueError, match="does not match"):
        load_programs({"EU-RUS": {"key": "EU-OTHER", "title": "x"}})
    with pytest.raises(ValueError, match="unknown measure"):
        load_programs(
            {"K": {"key": "K", "title": "x", "measures": ["Brain ray"]}}
        )
    with pytest.raises(ValueError, match="unknown status"):
        load_programs({"K": {"key": "K", "title": "x", "status": "zombie"}})
    assert "Asset freeze" in MEASURES


def test_load_programs_from_yaml_dir(tmp_path):
    pdir = tmp_path / "programs"
    idir = tmp_path / "issuers"
    pdir.mkdir(); idir.mkdir()
    (idir / "zz_unsc.yml").write_text(
        "name: UN Security Council\nacronym: UNSC\n"
    )
    (pdir / "UN-LYB.yml").write_text(
        "key: UN-LYB\ntitle: Libya sanctions\nissuer: zz_unsc\n"
        "measures:\n  - Arms embargo\n"
    )
    programs = load_programs(str(pdir))
    assert programs["UN-LYB"].issuer.acronym == "UNSC"
    # filename mismatch fails loudly like the reference's assert
    (pdir / "UN-XXX.yml").write_text("key: UN-YYY\ntitle: t\n")
    with pytest.raises(ValueError, match="does not match"):
        load_programs(str(pdir))


def test_make_identification_statements(spark):
    """identification.py:57-75 emit set: NULL number emits nothing;
    passport rows take the Passport schema + passportNumber back-ref,
    others Identification + idNumber; NULL type/country rows dropped by
    the P5 guard."""
    from opensanctions_spark.functions.identifications import (
        make_identification_statements,
    )

    df = spark.createDataFrame(
        [
            ("c-1", "P100", "passport", "de"),
            ("c-2", "N200", "national id", None),
            ("c-3", None, "passport", "fr"),  # NULL number → dropped
        ],
        ["holder_id", "number", "doc_type", "country"],
    )
    stmts = make_identification_statements(
        df,
        dataset="ids",
        holder_col="holder_id",
        number_col="number",
        doc_type_col="doc_type",
        country_col="country",
        passport=F.col("doc_type") == "passport",
    ).collect()
    assert all(r["entity_id"] is not None for r in stmts)
    assert not any(r["value"] == "P300" for r in stmts)

    pass_rows = [r for r in stmts if r["schema"] == "Passport"]
    ident_rows = [r for r in stmts if r["schema"] == "Identification"]
    assert {r["prop"] for r in pass_rows} == {"holder", "number", "type", "country"}
    assert {r["prop"] for r in ident_rows} == {"holder", "number", "type"}

    # the same id derivation on both entity rows of one document
    assert len({r["entity_id"] for r in pass_rows}) == 1
    # holder back-references carry the document number on the holder id
    backs = {(r["entity_id"], r["prop"]): r["value"] for r in stmts
             if r["schema"] == "Person"}
    assert backs == {("c-1", "passportNumber"): "P100",
                     ("c-2", "idNumber"): "N200"}


def test_make_identification_holder_schema(spark):
    """The holder back-ref must carry the holder's OWN schema — a
    LegalEntity holder would otherwise be lattice-widened to Person by
    a1_entity_assembly (zavod adds idNumber to the existing holder)."""
    from opensanctions_spark.functions.identifications import (
        make_identification_statements,
    )

    df = spark.createDataFrame(
        [
            ("p-1", "Person", "N1"),
            ("o-1", "LegalEntity", "N2"),
        ],
        ["holder_id", "holder_schema", "number"],
    )
    stmts = make_identification_statements(
        df,
        dataset="ids",
        holder_col="holder_id",
        number_col="number",
        holder_schema=F.col("holder_schema"),
    ).collect()
    backs = {r["entity_id"]: r["schema"] for r in stmts
             if r["prop"] == "idNumber"}
    assert backs == {"p-1": "Person", "o-1": "LegalEntity"}


def test_make_sanction_statements(spark):
    """make_sanction emit set (zavod/zavod/helpers/sanctions.py:21-113 +
    zavod/zavod/tests/helpers/test_sanctions.py): stable id per
    (entity, key), publisher metadata with origin=metadata, program
    registry gate, construction-time status."""
    from opensanctions_spark.functions.sanctions import (
        make_sanction_statements,
        sanction_is_active,
        invalid_prefix_dates,
    )

    df = spark.createDataFrame(
        [
            # known program, started past / ends future -> active
            ("jeff", "Person", None, "Test Program", "US-BIS-DPL", "src-1",
             "2020-01-01", "2099"),
            # same entity, different key -> different sanction id
            ("jeff", "Person", "other", None, None, None, None, None),
            # unknown program key -> no programId/programUrl/back-ref
            ("acme", "LegalEntity", None, "Other", "OS-TEST", "src-2",
             None, "2020-01-01"),
            # future start -> inactive even with future end
            ("kim", "Person", None, None, None, None, "2027", "2099-12-31"),
            # unparseable end date -> no endDate, no status
            ("lee", "Person", None, None, None, None, "2020", "see annex"),
        ],
        "entity_id STRING, schema STRING, key STRING, program_name STRING, "
        "program_key STRING, source_program_key STRING, start STRING, "
        "end STRING",
    )
    stmts = make_sanction_statements(
        df,
        dataset="sanc",
        entity_col="entity_id",
        publisher_name="OpenSanctions",
        publisher_country="us",
        source_url="https://example.com/src",
        key_col="key",
        program_name_col="program_name",
        program_key_col="program_key",
        source_program_key_col="source_program_key",
        start_col="start",
        end_col="end",
        entity_schema=F.col("schema"),
        program_urls={"US-BIS-DPL": "https://bis.example/dpl"},
        run_time="2026-08-13T00:00:00",
    ).collect()

    by_subject = {}
    for r in stmts:
        if r["prop"] == "entity":
            by_subject.setdefault(r["value"], set()).add(r["entity_id"])
    # one sanction per (entity, key): jeff carries two distinct ids
    assert len(by_subject["jeff"]) == 2
    assert len(by_subject["acme"]) == 1

    # metadata-origin statements
    auth = [r for r in stmts if r["prop"] == "authority"]
    assert all(r["value"] == "OpenSanctions" and r["origin"] == "metadata"
               for r in auth)
    assert len(auth) == 5

    # program registry gate
    pids = [r for r in stmts if r["prop"] == "programId"]
    assert [r["value"] for r in pids if r["schema"] == "Sanction"] == ["US-BIS-DPL"]
    sanction_pid = [r for r in pids if r["schema"] == "Sanction"][0]
    assert sanction_pid["original_value"] == "src-1"
    # subject back-ref carries the subject's OWN schema
    back = [r for r in pids if r["schema"] == "Person"]
    assert len(back) == 1 and back[0]["entity_id"] == "jeff"
    urls = [r["value"] for r in stmts if r["prop"] == "programUrl"]
    assert urls == ["https://bis.example/dpl"]

    # construction-time status
    status = {r["entity_id"]: r["value"] for r in stmts if r["prop"] == "status"}
    jeff_active_id = [r["entity_id"] for r in stmts
                      if r["prop"] == "entity" and r["value"] == "jeff"
                      and r["entity_id"] in status]
    assert status[jeff_active_id[0]] == "active"
    kim_id = [r["entity_id"] for r in stmts
              if r["prop"] == "entity" and r["value"] == "kim"][0]
    acme_id = [r["entity_id"] for r in stmts
               if r["prop"] == "entity" and r["value"] == "acme"][0]
    assert status[kim_id] == "inactive"     # starts after run time
    assert status[acme_id] == "inactive"    # ended before run time
    # unparseable end: no endDate statement, no status (ValueError parity
    # lives in invalid_prefix_dates below)
    lee_id = [r["entity_id"] for r in stmts
              if r["prop"] == "entity" and r["value"] == "lee"][0]
    assert lee_id not in status
    assert not [r for r in stmts
                if r["entity_id"] == lee_id and r["prop"] == "endDate"]
    bad = invalid_prefix_dates(df, "end").collect()
    assert [r["entity_id"] for r in bad] == ["lee"]

    # is_active prefix expansion: end-year prefix covers through Dec 31
    row = spark.range(1).select(
        sanction_is_active(F.lit("2020"), F.lit("2026"),
                           "2026-08-13T00:00:00").alias("a"),
        sanction_is_active(F.lit(None).cast("string"), F.lit("2026-08-14"),
                           "2026-08-13T00:00:00").alias("b"),
        sanction_is_active(F.lit("2026-08-13"), F.lit(None).cast("string"),
                           "2026-08-13T00:00:00").alias("c"),
    ).collect()[0]
    assert row["a"] and row["b"] and row["c"]


def test_make_position_statements(spark):
    """make_position (zavod/zavod/helpers/positions.py:21-131 +
    tests/helpers/test_positions.py): id varies with country and
    inception but not name-equal positions; wikidata QID wins as id;
    full emit set."""
    from opensanctions_spark.functions.positions import make_position_statements

    df = spark.createDataFrame(
        [
            ("Minister of finance", "de", None, None, None),
            ("Minister of finance", "de", "2021-01-01", None, None),
            ("Minister of finance", "uk", None, None, None),
            ("boss", "de", "2021-01-01", "5", "Q123"),
        ],
        "name STRING, country STRING, inception STRING, seats STRING, "
        "qid STRING",
    )
    stmts = make_position_statements(
        df,
        dataset="peps",
        name_col="name",
        country_col="country",
        inception_col="inception",
        seats_col="seats",
        wikidata_col="qid",
    ).collect()
    ids_by_country = {}
    for r in stmts:
        if r["prop"] == "name" and r["value"] == "Minister of finance":
            ids_by_country.setdefault(r["entity_id"], 0)
    # three distinct ids for the three (country, inception) variants
    assert len(ids_by_country) == 3
    # QID verbatim as id
    boss = [r for r in stmts if r["prop"] == "name" and r["value"] == "boss"]
    assert boss[0]["entity_id"] == "Q123"
    assert {r["prop"] for r in stmts if r["entity_id"] == "Q123"} == {
        "name", "country", "inceptionDate", "numberOfSeats", "wikidataId",
    }


def test_make_occupancy_statements_gate_and_status(spark):
    """make_occupancy (positions.py:132-273): non-PEP rows emit nothing;
    expired end dates (beyond after-office) emit nothing; status omitted
    when unknown; holder picks up inferred role.pep."""
    from opensanctions_spark.functions.positions import make_occupancy_statements

    df = spark.createDataFrame(
        [
            # ended within national grace -> 'ended'
            ("p1", "pos1", "2010", "2023-01-01", "gov.national", True, True),
            # ended beyond muni grace -> dropped
            ("p2", "pos1", "2010", "2023-01-01", "gov.muni", True, True),
            # non-PEP categorisation -> dropped
            ("p3", "pos1", "2020", None, "gov.national", False, True),
            # no end, well-maintained -> current
            ("p4", "pos2", "2020", None, "gov.national", True, True),
            # no end, not well-maintained, has start -> unknown (no status row)
            ("p5", "pos2", "2020", None, "gov.national", True, False),
            # no dates at all, not well-maintained -> dropped
            ("p6", "pos2", None, None, "gov.national", True, False),
        ],
        "person STRING, position STRING, start STRING, end STRING, "
        "topic STRING, is_pep BOOLEAN, nei BOOLEAN",
    )
    stmts = make_occupancy_statements(
        df,
        dataset="peps",
        person_col="person",
        position_col="position",
        start_col="start",
        end_col="end",
        topic_col="topic",
        is_pep_col="is_pep",
        no_end_implies_current=F.col("nei"),
        current_time="2026-08-13T00:00:00",
    ).collect()
    holders = {r["value"] for r in stmts if r["prop"] == "holder"}
    assert holders == {"p1", "p4", "p5"}
    status = {}
    for r in stmts:
        if r["prop"] == "status":
            occ = r["entity_id"]
            holder = [s["value"] for s in stmts
                      if s["entity_id"] == occ and s["prop"] == "holder"][0]
            status[holder] = r["value"]
    assert status == {"p1": "ended", "p4": "current"}  # p5 unknown -> omitted
    peps = {r["entity_id"]: r["origin"] for r in stmts
            if r["prop"] == "topics" and r["value"] == "role.pep"}
    assert set(peps) == {"p1", "p4", "p5"} and set(peps.values()) == {"inferred"}

    # id stability: same inputs -> same occupancy id; start-missing vs
    # end-missing stay distinct (the started/ended markers)
    from opensanctions_spark.functions.positions import make_occupancy_id
    row = spark.range(1).select(
        make_occupancy_id(F.lit("p"), F.lit("pos"), F.lit("2020"),
                          F.lit(None).cast("string")).alias("a"),
        make_occupancy_id(F.lit("p"), F.lit("pos"),
                          F.lit(None).cast("string"), F.lit("2020")).alias("b"),
        make_occupancy_id(F.lit("p"), F.lit("pos"), F.lit("2020"),
                          F.lit(None).cast("string")).alias("c"),
    ).collect()[0]
    assert row["a"] == row["c"] and row["a"] != row["b"]


def test_make_address_statements(spark):
    """make_address/apply_address (zavod/zavod/helpers/addresses.py:
    107-262 + tests/helpers/test_addresses.py): id keyed on
    (code, slug(full), key) with case-stable codes; composed full gets
    origin=inferred; full==country suppressed; all-NULL rows dropped;
    holder back-refs gated on full."""
    from opensanctions_spark.functions.addresses import make_address_statements

    df = spark.createDataFrame(
        [
            # given full, uppercase code normalized into the hash
            ("e1", "Person", "12 Main St, Springfield", None, None, None,
             None, "US", None),
            # same full, lowercase code -> SAME address id
            ("e2", "Person", "12 Main St, Springfield", None, None, None,
             None, "us", None),
            # composed from parts -> inferred origin
            ("e3", "Company", None, "Hauptstr. 1", "Berlin", None,
             "Germany", None, None),
            # code-only: composed full == bare code -> suppressed, id from code
            ("e4", "Person", None, None, None, None, None, "de", None),
            # two-letter country treated as code
            ("e5", "Person", None, "Rue X", None, None, "fr", None, None),
            # everything null -> dropped
            ("e6", "Person", None, None, None, None, None, None, None),
            # keyed id differs from unkeyed
            ("e7", "Person", "12 Main St, Springfield", None, None, None,
             None, "us", "k1"),
        ],
        "holder STRING, hschema STRING, full STRING, street STRING, "
        "city STRING, postal STRING, country STRING, code STRING, key STRING",
    )
    stmts = make_address_statements(
        df,
        dataset="addrs",
        full_col="full",
        street_col="street",
        city_col="city",
        postal_code_col="postal",
        country_col="country",
        country_code_col="code",
        key_col="key",
        holder_col="holder",
        holder_schema=F.col("hschema"),
    ).collect()

    addr_of = {r["entity_id"]: r["value"] for r in stmts
               if r["prop"] == "addressEntity"}
    assert addr_of["e1"] == addr_of["e2"]          # case-stable id
    assert addr_of["e7"] != addr_of["e1"]          # key changes id
    assert "e6" not in {r["entity_id"] for r in stmts}   # all-null dropped

    # composed full carries origin=inferred and joins parts in order
    e3_full = [r for r in stmts
               if r["entity_id"] == addr_of["e3"] and r["prop"] == "full"]
    assert e3_full[0]["value"] == "Hauptstr. 1, Berlin, Germany"
    assert e3_full[0]["origin"] == "inferred"

    # country-only: no full/addressEntity/address, but holder country set
    e4_props = {r["prop"] for r in stmts if r["entity_id"] == "e4"}
    assert e4_props == {"country"}
    assert "e4" not in addr_of
    # the Address side still emits its country row (hash on code only).
    # FOUR 'de' rows since round 10: e4's Address row + holder back-ref,
    # plus e3's pair — its country NAME 'Germany' now resolves to the
    # code through the registry.country.clean compat table
    e4_country = [r for r in stmts if r["prop"] == "country"
                  and r["value"] == "de"]
    assert len(e4_country) == 4

    # 'fr' country treated as code: address country value is the code
    e5_aid = addr_of["e5"]
    e5 = {r["prop"]: r["value"] for r in stmts if r["entity_id"] == e5_aid}
    assert e5["country"] == "fr"
    assert e5["full"] == "Rue X, fr"


def test_lookup_sanction_program_key(spark):
    """sanctions.py:13-19: source program key -> OS program key through
    the dataset 'sanction.program' lookup; misses are NULL."""
    from opensanctions_spark.functions.lookups import parse_lookup
    from opensanctions_spark.functions.sanctions import lookup_sanction_program_key

    lk = parse_lookup(
        "sanction.program",
        {"options": [
            {"match": ["SDGT", "sdgt-x"], "value": "US-OFAC-SDGT"},
            {"match": ["CAATSA"], "value": "US-CAATSA"},
        ]},
    )
    df = spark.createDataFrame([("SDGT",), ("CAATSA",), ("???",), (None,)], ["k"])
    got = [r["pk"] for r in df.select(
        lookup_sanction_program_key(lk, F.col("k")).alias("pk")).collect()]
    assert got == ["US-OFAC-SDGT", "US-CAATSA", None, None]
