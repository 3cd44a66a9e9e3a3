"""Ported reference suites: ``zavod/zavod/tests/test_assertions.py`` +
``zavod/zavod/tests/test_validate.py`` (round-11 closure campaign).

These ports exposed a real surface gap, fixed this round: the engine's
assertion model only knew ``entity_count`` / ``schema:X`` metrics —
the reference's ``country_entities`` / ``countries`` /
``entities_with_prop`` / ``property_fill_rate`` families, the baseline
DEFAULT_ASSERTIONS merged into every source dataset, the
"Dataset has no assertions." nudge, and the min-aborts/max-warns level
rule were all unimplemented. Dangling/self-reference validator cases
are covered by the engine's e2e suite (``test_pipeline_e2e.py``,
``tests/test_graph_ops.py`` J10/J11)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.plans.run import (
    Assertion,
    DatasetConfig,
    _extended_stats,
    check_assertions,
    merge_assertions_config,
    parse_assertions,
)

CONFIG = {
    "min": {
        "schema_entities": {"Person": 1},
        "entities_with_prop": {"Person": {"name": 1}},
    },
    "max": {"countries": 1},
}


def test_parse_assertions_reference_cases():
    """The reference's test_parse_assertions, over the flat-metric
    translation: min → GTE/error, max → LTE/warning, unknown metric
    raises."""
    assertions = parse_assertions(CONFIG)
    assert assertions[0] == Assertion("schema:Person", "min", 1, "error")
    assert assertions[1] == Assertion("prop:Person.name", "min", 1, "error")
    assert assertions[2] == Assertion("countries", "max", 1, "warning")

    bad = {"min": {"foo": {"Person": 1}}}
    with pytest.raises(ValueError):
        parse_assertions(bad)
    with pytest.raises(ValueError):
        parse_assertions({"typo": {"countries": 1}})


def test_merge_assertions_config_leaf_override():
    base = {"min": {"property_fill_rate": {"Person": {"name": 0.95}}}}
    override = {"min": {"property_fill_rate": {"Person": {"name": 0.5}},
                        "countries": 2}}
    merged = merge_assertions_config(base, override)
    assert merged["min"]["property_fill_rate"]["Person"]["name"] == 0.5
    assert merged["min"]["countries"] == 2
    # base is untouched
    assert base["min"]["property_fill_rate"]["Person"]["name"] == 0.95


def test_from_dict_defaults_and_nudge():
    """A dict-form config with no assertions gets the baseline defaults
    merged in (the reference's DEFAULT_ASSERTIONS) and the nudge flag;
    explicit assertions clear the flag and override at the leaf."""
    bare = DatasetConfig.from_dict({"name": "t"})
    assert not bare.has_user_assertions
    assert Assertion("fill:Person.name", "min", 0.95, "error") in bare.assertions

    configured = DatasetConfig.from_dict(
        {
            "name": "t2",
            "assertions": {
                "min": {"property_fill_rate": {"Person": {"name": 0.5}},
                        "countries": 7},
            },
        }
    )
    assert configured.has_user_assertions
    assert Assertion("fill:Person.name", "min", 0.5, "error") in configured.assertions
    assert Assertion("countries", "min", 7, "error") in configured.assertions
    # defaults still merged for un-overridden leaves
    assert Assertion("fill:Company.name", "min", 0.95, "error") in configured.assertions


def _entities(spark, rows):
    """(canonical_id, schema, {prop: [values]}) → entity view frame."""
    return spark.createDataFrame(
        [(i, s, p) for i, s, p in rows],
        "canonical_id string, schema string, properties map<string,array<string>>",
    )


def test_extended_stats_and_check(spark):
    """The reference's test_assertions scenario shape: country counts,
    distinct-country count, entities_with_prop and fill rates — min
    failures are errors, max failures are warnings."""
    entities = _entities(
        spark,
        [
            ("e1", "Company", {"name": ["A"], "country": ["de"]}),
            ("e2", "Company", {"name": ["B"], "country": ["de", "fr"]}),
            ("e3", "Company", {"country": ["us"]}),
            ("e4", "Person", {"name": ["C"]}),
        ],
    )
    assertions = parse_assertions(
        {
            "min": {
                "schema_entities": {"Company": 10},
                "country_entities": {"de": 3},
                "countries": 7,
                "entities_with_prop": {"Company": {"name": 3}},
            },
            "max": {"country_entities": {"de": 1}},
        }
    )
    stats = {
        "schema:Company": 3,
        "schema:Person": 1,
        **_extended_stats(entities, assertions),
    }
    assert stats["country:de"] == 2
    assert stats["countries"] == 3
    assert stats["prop:Company.name"] == 2

    violations = check_assertions(stats, assertions)
    assert "error: schema:Company=3 < min 10" in violations
    assert "error: country:de=2 < min 3" in violations
    assert "error: countries=3 < min 7" in violations
    assert "error: prop:Company.name=2 < min 3" in violations
    assert "warning: country:de=2 > max 1" in violations


def test_fill_rate_skips_absent_schema(spark):
    """The reference's skip-absent-schema guard: a default fill-rate
    rule on a schema the dataset doesn't emit must not fail as 0.0 —
    but a present schema missing the property must."""
    assertions = parse_assertions(
        {"min": {"property_fill_rate": {
            "Person": {"name": 0.95},
            "Company": {"name": 0.95}}}}
    )
    only_person = _entities(spark, [("e1", "Person", {"name": ["V P"]})])
    stats = {"schema:Person": 1, **_extended_stats(only_person, assertions)}
    assert check_assertions(stats, assertions) == []

    nameless = _entities(spark, [("e1", "Person", {"country": ["ru"]})])
    stats = {"schema:Person": 1, **_extended_stats(nameless, assertions)}
    violations = check_assertions(stats, assertions)
    assert violations == ["error: fill:Person.name=0.0 < min 0.95"]


def test_run_dataset_no_assertions_nudge(spark, tmp_path):
    """A dataset without its own assertions runs to completion (the
    defaults pass on a named corpus) but carries the error-level
    "Dataset has no assertions." issue — abort-free, like the
    reference's validator."""
    import json

    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.plans.run import run_dataset
    from opensanctions_spark.sources.archive import StatementArchive

    stmts = finish_statements(
        spark.createDataFrame(
            [("p1", "Person", "name", "Alice")],
            "entity_id string, schema string, prop string, value string",
        ),
        dataset="nudge",
    )
    config = DatasetConfig.from_dict({"name": "nudge"})
    out_dir = str(tmp_path / "out")
    r = run_dataset(
        spark, stmts, config, StatementArchive(spark, str(tmp_path / "arch")),
        out_dir, run_time="2026-08-01T00:00:00",
    )
    assert r.entity_count == 1
    with open(os.path.join(out_dir, "issues.json")) as fh:
        issues = json.load(fh)["issues"]
    assert {"level": "error", "message": "Dataset has no assertions.",
            "dataset": "nudge"} in [
        {k: i[k] for k in ("level", "message", "dataset")} for i in issues
    ]


def test_extended_stats_all_country_props_things_only(spark):
    """entity.countries spans every country-typed prop (country,
    jurisdiction, mainCountry, nationality, citizenship), DISTINCT per
    entity, and only Thing-subtree entities count
    (``zavod/zavod/exporters/statistics.py:106-110``) — a dataset whose
    country signal lives in nationality must not undercount."""
    entities = _entities(
        spark,
        [
            ("e1", "Person", {"nationality": ["ru"], "citizenship": ["ru", "kz"]}),
            ("e2", "Company", {"jurisdiction": ["vg"]}),
            ("e3", "Sanction", {"country": ["us"]}),
        ],
    )
    assertions = parse_assertions(
        {"min": {"country_entities": {"ru": 1}, "countries": 3}}
    )
    stats = _extended_stats(entities, assertions)
    assert stats["countries"] == 3          # ru, kz, vg; Sanction's us excluded
    assert stats["country:ru"] == 1          # distinct per entity
    assert stats["country:kz"] == 1
    assert "country:us" not in stats
    assert check_assertions(
        {"schema:Person": 1, **stats}, assertions
    ) == []
