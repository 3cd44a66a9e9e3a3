"""The datapatch lookup module, against the reference's own fixture cases
(``zavod/zavod/tests/fixtures/testdataset1/testdataset1.yml:46-82`` and
``zavod/zavod/tests/test_context.py:53-59``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.functions.lookups import (
    Lookup,
    LookupOption,
    apply_prop_lookup,
    apply_value_lookup,
    load_lookups,
    parse_lookup,
)

FIXTURE_YAML = """
lookups:
  plants:
    options:
      - match:
          - null
          - banana
          - apple
        value: Fruit
      - match:
          - potato
          - carrot
        value: Vegetable
      - match:
          - oak
          - pine
        value: Tree

  comma_names:
    lowercase: true
    options:
      - match: A B and C, D E F, John Lookups Smith
        names:
          - A B and C
          - D E F
          - John Lookups Smith

  type.address:
    normalize: true
    lowercase: true
    options:
      - match:
          - congo
        values:
          - DR Congo
          - Congo Brazzaville
      - match: Moscou
        value: Moscow
"""


@pytest.fixture(scope="module")
def lookups():
    return load_lookups(FIXTURE_YAML)


def test_reference_context_lookup_cases(lookups):
    """test_context.py:53-59 verbatim: match→value, miss→None."""
    plants = lookups["plants"]
    res = plants.match("banana")
    assert res is not None and res.result["value"] == "Fruit"
    assert plants.get_value("potato") == "Vegetable"
    assert plants.get_value("stone") is None
    assert plants.get_value("rock") is None
    assert plants.get_value("rock", default="?") == "?"
    # the null-match option catches missing values
    assert plants.get_value(None) == "Fruit"


def test_lowercase_and_multivalue(lookups):
    addr = lookups["type.address"]
    # normalize collapses whitespace; lowercase folds case
    assert addr.get_values("  CONGO  ") == ["DR Congo", "Congo Brazzaville"]
    assert addr.get_values("moscou") == ["Moscow"]
    # unmatched values pass through untouched (type_lookup default)
    assert addr.get_values("Paris") == ["Paris"]
    comma = lookups["comma_names"]
    res = comma.match("a b and c, d e f, john lookups smith")
    assert res is not None
    assert res.result["names"][0] == "A B and C"


def test_value_column_exact_map_probe(spark, lookups):
    """Exact-only lookups compile to a literal create_map probe — assert
    the plan has no join and the values match the driver-side path."""
    plants = lookups["plants"]
    df = spark.createDataFrame(
        [("banana",), ("potato",), ("stone",), (None,)], ["raw"]
    )
    out = apply_value_lookup(df, plants, "raw", out="cleaned")
    rows = {r["raw"]: r["cleaned"] for r in out.collect()}
    assert rows == {
        "banana": "Fruit",
        "potato": "Vegetable",
        "stone": "stone",  # unmatched → passthrough default
        None: "Fruit",  # null-match option
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_value_column_case_chain_weight_precedence(spark):
    """contains/regex options + weights render as a CASE chain in
    datapatch precedence: highest weight wins, then declaration order."""
    lk = Lookup(
        name="status",
        lowercase=True,
        options=[
            LookupOption(contains=["sanction"], result={"value": "sanctioned"}),
            LookupOption(
                regex=[r"^EU\b.*embargo"], weight=5, result={"value": "embargo"}
            ),
            LookupOption(match=["eu arms embargo"], result={"value": "exact"}),
        ],
    )
    # driver-side: regex (weight 5) outranks the later exact match
    assert lk.get_value("EU arms embargo") == "embargo"
    assert lk.get_value("Under SANCTION list") == "sanctioned"
    assert lk.get_value("nothing") is None or lk.get_value("nothing") == "nothing"
    df = spark.createDataFrame(
        [("EU arms embargo",), ("Under SANCTION list",), ("other",)], ["raw"]
    )
    got = {
        r["raw"]: r["v"]
        for r in df.select(
            F.col("raw"), lk.value_column(F.col("raw")).alias("v")
        ).collect()
    }
    assert got == {
        "EU arms embargo": "embargo",
        "Under SANCTION list": "sanctioned",
        "other": "other",
    }


def test_apply_prop_lookup_rewrites_and_rehomes(spark):
    """prop_lookup semantics (zavod/zavod/runtime/lookups.py:52-83): the
    matched option can expand one value into several AND move them to a
    different property; unmatched rows pass through untouched."""
    lk = parse_lookup(
        "type.address",
        {
            "normalize": True,
            "lowercase": True,
            "options": [
                {
                    "match": ["congo"],
                    "values": ["DR Congo", "Congo Brazzaville"],
                    "prop": "country",
                },
                {"match": ["unknown"], "values": []},
            ],
        },
    )
    df = spark.createDataFrame(
        [
            ("e1", "address", " Congo"),
            ("e2", "address", "Berlin"),
            ("e3", "address", "Unknown"),
        ],
        ["entity_id", "prop", "value"],
    )
    out = apply_prop_lookup(df, lk).orderBy("entity_id", "value").collect()
    assert [(r["entity_id"], r["prop"], r["value"]) for r in out] == [
        ("e1", "country", "Congo Brazzaville"),
        ("e1", "country", "DR Congo"),
        ("e2", "address", "Berlin"),
        # e3 matched an empty-values option → the statement is dropped
    ]


def test_map_shorthand_and_file_load(tmp_path):
    p = tmp_path / "ds.yml"
    p.write_text("lookups:\n  country:\n    map:\n      Frankreich: FR\n")
    lks = load_lookups(str(p))
    assert lks["country"].get_value("Frankreich") == "FR"
    assert lks["country"].get_value("elsewhere") is None


def test_run_dataset_applies_prop_lookups(spark, tmp_path):
    """DatasetConfig.lookups → run_dataset cleaning pass: values rewritten
    before archive write, original_value preserved, statement ids
    re-derived from the cleaned value."""
    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.plans.run import DatasetConfig, run_dataset
    from opensanctions_spark.sources.archive import StatementArchive

    raw = spark.createDataFrame(
        [
            ("e1", "Person", "country", "Frankreich"),
            ("e1", "Person", "name", "Jane"),
            ("e2", "Person", "country", "Germany"),
        ],
        ["entity_id", "schema", "prop", "value"],
    )
    statements = finish_statements(raw, dataset="lkds")
    config = DatasetConfig.from_dict(
        {
            "name": "lkds",
            # e2 is deliberately nameless; relax the baseline fill-rate
            # default (merged into every dict-form config since r11) at
            # the leaf, the same way a reference dataset YAML would
            "assertions": {"min": {"property_fill_rate": {"Person": {"name": 0.0}}}},
            "lookups": {
                "prop.country": {
                    "lowercase": True,
                    "options": [
                        {"match": "frankreich", "value": "fr"},
                        {"match": "germany", "value": "de"},
                    ],
                }
            },
        }
    )
    archive = StatementArchive(spark, str(tmp_path / "archive"))
    run_dataset(
        spark, statements, config, archive, str(tmp_path / "out"),
        run_time="2024-01-01",
    )
    got = archive.read("lkds")
    rows = {
        (r["entity_id"], r["prop"]): (r["value"], r["original_value"])
        for r in got.collect()
    }
    assert rows[("e1", "country")] == ("fr", "Frankreich")
    assert rows[("e2", "country")] == ("de", "Germany")
    assert rows[("e1", "name")] == ("Jane", None)  # untouched prop
    # ids hash the CLEANED value — two runs with differently-spelled
    # raw values that clean to the same form must collide (dedupe)
    ids = {r["id"] for r in got.collect()}
    assert len(ids) == 3


def test_prop_override_without_values_keeps_original(spark):
    """A re-home-only option (prop set, no value/values) keeps the ORIGINAL
    value under the new property (zavod/zavod/runtime/lookups.py:79-81) —
    it must not silently drop the statement."""
    lk = parse_lookup(
        "type.address",
        {
            "lowercase": True,
            "options": [
                {"match": ["paris", "lyon"], "prop": "city"},
                {"match": ["unknown"], "values": []},
            ],
        },
    )
    df = spark.createDataFrame(
        [
            ("e1", "address", "Paris"),
            ("e2", "address", "Unknown"),
            ("e3", "address", "Berlin"),
        ],
        ["entity_id", "prop", "value"],
    )
    out = apply_prop_lookup(df, lk).orderBy("entity_id").collect()
    assert [(r["entity_id"], r["prop"], r["value"]) for r in out] == [
        ("e1", "city", "Paris"),   # re-homed, value preserved
        ("e3", "address", "Berlin"),
    ]
