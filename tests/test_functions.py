"""Unit tests for the column-function library (SURVEY F1-F15), checked
against known-good values (reference helper-test semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from opensanctions_spark.functions import dates, identifiers, numbers, text


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], ["v"]).select(col.alias("out")).collect()[0]["out"]


# ---- text (F3/F4/F14/F15) ----

def test_multi_split(spark):
    out = _one(spark, text.multi_split(F.col("v"), [";", ",", " and "]),
               "a; b,c and  d;;")
    assert out == ["a", "b", "c", "d"]

def test_clean_note(spark):
    out = _one(spark, text.clean_note(F.col("v")), "Alpha  (born 1960) [alias]  Beta ")
    assert out == "Alpha Beta"

def test_clean_note_empty_to_null(spark):
    assert _one(spark, text.clean_note(F.col("v")), " (x) ") is None

def test_looks_unsafe(spark):
    assert _one(spark, text.looks_unsafe(F.col("v")), "<script>alert(1)</script>")
    assert not _one(spark, text.looks_unsafe(F.col("v")), "ordinary note")

def test_token_count(spark):
    assert _one(spark, text.token_count(F.col("v")), "one two  three-3!") == 4


# ---- dates (F1/F2/P6) ----

def test_parse_date_multi_format(spark):
    col = dates.parse_date(F.col("v"), ["dd.MM.yyyy", "MM/dd/yyyy"])
    assert _one(spark, col, "04.05.1990") == "1990-05-04"
    assert _one(spark, col, "05/04/1990") == "1990-05-04"
    assert _one(spark, col, "1990-05") == "1990-05"   # ISO prefix passthrough
    assert _one(spark, col, "1990") == "1990"
    assert _one(spark, col, "circa 1990") is None

def test_month_name_normalization(spark):
    col = dates.parse_date(
        dates.normalize_month_names(F.col("v")), ["d. MM yyyy"]
    )
    assert _one(spark, col, "15. März 2021") == "2021-03-15"

def test_truncate_day_precision(spark):
    assert _one(spark, dates.truncate_day_precision(F.col("v")),
                "1990-05-04T12:30:00") == "1990-05-04"

def test_within_max_age(spark):
    col = dates.within_max_age(F.col("v"), "2026-08-13", 5)
    assert _one(spark, col, "2022")
    assert not _one(spark, col, "2020-12-31")


# ---- numbers (F6) ----

def test_extract_amount_and_unit(spark):
    amt = _one(spark, numbers.extract_amount(F.col("v")), "about 1,234.56 kg net")
    assert float(amt) == 1234.56
    assert _one(spark, numbers.extract_unit(F.col("v")), "1,234.56 kg net") == "kg"

def test_normalize_unit(spark):
    a, u = numbers.normalize_unit(
        numbers.extract_amount(F.col("v")), numbers.extract_unit(F.col("v"))
    )
    row = (
        spark.createDataFrame([("2.5 kg",)], ["v"])
        .select(a.alias("amount"), u.alias("unit"))
        .collect()[0]
    )
    assert row["amount"] == 2500.0 and row["unit"] == "g"


# ---- identifiers (F7) ----

@pytest.mark.parametrize("value,ok", [
    ("9074729", True),    # valid IMO (Queen Mary 2)
    ("IMO 9074729", True),
    ("9074728", False),
    ("1234568", False),
    ("907472", False),  # too short
])
def test_valid_imo(spark, value, ok):
    assert _one(spark, identifiers.valid_imo(F.col("v")), value) == ok

@pytest.mark.parametrize("value,ok", [
    ("US0378331005", True),   # Apple
    ("US0378331006", False),
    ("GB0002634946", True),   # BAE
    ("XX12", False),
])
def test_valid_isin(spark, value, ok):
    assert _one(spark, identifiers.valid_isin(F.col("v")), value) == ok

@pytest.mark.parametrize("value,ok", [
    ("7707083893", True),     # Sberbank INN
    ("7707083894", False),
])
def test_valid_inn(spark, value, ok):
    assert _one(spark, identifiers.valid_inn(F.col("v")), value) == ok

@pytest.mark.parametrize("value,ok", [
    ("1027700132195", True),  # Sberbank OGRN
    ("1027700132196", False),
])
def test_valid_ogrn(spark, value, ok):
    assert _one(spark, identifiers.valid_ogrn(F.col("v")), value) == ok

@pytest.mark.parametrize("value,ok", [
    ("529900T8BM49AURSDO55", True),   # valid LEI
    ("529900T8BM49AURSDO56", False),
])
def test_valid_lei(spark, value, ok):
    assert _one(spark, identifiers.valid_lei(F.col("v")), value) == ok

@pytest.mark.parametrize("value,ok", [
    ("DE89 3704 0044 0532 0130 00", True),
    ("DE89370400440532013001", False),
    ("GB82WEST12345698765432", True),
])
def test_valid_iban(spark, value, ok):
    assert _one(spark, identifiers.valid_iban(F.col("v")), value) == ok
