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
