"""Unit tests for the K12 metadata helpers (no Spark needed):
delta-version index, issues artifact, catalog rollup edge cases."""

from __future__ import annotations

import json
import os

from opensanctions_spark.exporters.metadata import (
    write_catalog,
    write_delta_index,
    write_issues,
)


def test_delta_index_newest_first_and_capped(tmp_path):
    data = write_delta_index(
        str(tmp_path), "ds", ["v1", "v2", "v3"], max_versions=2
    )
    assert list(data["versions"]) == ["v3", "v2"]  # newest first, capped
    assert data["unstable"]["version_list"][0]["version"] == "v3"
    assert "delta.json" in data["versions"]["v3"]
    on_disk = json.load(open(tmp_path / "delta_index.json"))
    assert on_disk == data
    # dict == is order-insensitive; pin the on-disk KEY order too — the
    # reference ships the keyed map newest-first
    assert list(on_disk["versions"]) == ["v3", "v2"]


def test_delta_index_empty_writes_nothing(tmp_path):
    assert write_delta_index(str(tmp_path), "ds", []) is None
    assert not os.path.exists(tmp_path / "delta_index.json")


def test_write_issues_levels(tmp_path):
    levels = write_issues(
        str(tmp_path),
        [
            {"level": "error", "message": "a"},
            {"level": "warning", "message": "b"},
            {"level": "warning", "message": "c"},
            {"message": "no level"},
        ],
    )
    assert levels == {"error": 1, "warning": 2}
    data = json.load(open(tmp_path / "issues.json"))
    assert len(data["issues"]) == 4


def test_write_catalog_handles_missing_dirs(tmp_path):
    d = tmp_path / "never-exported"
    os.makedirs(d)
    catalog = write_catalog(str(tmp_path), [str(d)])
    assert catalog["datasets"] == [{"name": "never-exported"}]
    assert catalog["entity_count"] == 0


def test_dataset_config_from_dict_forms():
    from opensanctions_spark.plans.run import Assertion, DatasetConfig

    cfg = DatasetConfig.from_dict(
        {
            "name": "ds",
            "assertions": [
                "entity_count:min:10",
                {"metric": "schema:Person", "op": "max",
                 "threshold": 5, "level": "warning"},
            ],
            "title": "T",
            "publisher": {"name": "P"},
        }
    )
    assert cfg.name == "ds"
    assert cfg.assertions[0] == Assertion("entity_count", "min", 10)
    assert cfg.assertions[1].level == "warning"
    assert cfg.metadata == {"title": "T", "publisher": {"name": "P"}}


def test_dataset_config_from_json_file(tmp_path):
    from opensanctions_spark.plans.run import DatasetConfig

    p = tmp_path / "c.json"
    p.write_text('{"name": "x", "assertions": ["entity_count:min:1"]}')
    cfg = DatasetConfig.from_file(str(p))
    assert cfg.name == "x" and len(cfg.assertions) == 1


def test_facet_display_labels_resolve_through_registry():
    """K12 facet parity: schema facets carry label+plural, country facets
    carry captions, unknown codes fall back to the raw value (the
    reference's FtM registry contract)."""
    from opensanctions_spark.exporters.metadata import _facet_list

    schemata = _facet_list([("Person", 5), ("LegalEntity", 9), ("Mystery", 1)])
    by_name = {f["name"]: f for f in schemata}
    assert by_name["Person"]["label"] == "Person"
    assert by_name["Person"]["plural"] == "People"
    assert by_name["LegalEntity"]["label"] == "Legal entity"
    assert by_name["Mystery"]["label"] == "Mystery"  # fallback
    # descending count order
    assert [f["name"] for f in schemata] == ["LegalEntity", "Person", "Mystery"]

    countries = _facet_list([("de", 3), ("us", 7), ("zz", 1)], key="code")
    by_code = {f["code"]: f for f in countries}
    assert by_code["de"]["label"] == "Germany"
    assert by_code["us"]["label"] == "United States"
    assert by_code["zz"]["label"] == "zz"  # fallback
    assert "plural" not in by_code["de"]


def test_validate_index_catalog_contract():
    """Ported from the reference's exporters/test_metadata.py: a
    successful run whose metadata is missing a required field only
    WARNS — the index is still written (warn-but-write); a failed run
    legitimately lacks statistics, so the contract tolerates the
    missing counts without a warning."""
    from opensanctions_spark.exporters.metadata import validate_index

    good = {
        "name": "t", "version": "1", "updated_at": "2026-08-01T00:00:00",
        "last_export": "2026-08-01T00:00:00",
        "resources": [{"name": "names.txt", "path": "names.txt",
                       "url": "artifacts:/t/1/names.txt",
                       "mime_type": "text/plain"}],
        "entity_count": 5, "target_count": 2,
        "last_change": "2026-08-01T00:00:00", "result": "success",
    }
    assert validate_index(good) == []

    # drop a required statistics-derived field: flagged on success...
    broken = {k: v for k, v in good.items() if k != "entity_count"}
    assert any("entity_count" in p for p in validate_index(broken))
    # ...but tolerated on a failed run (statistics legitimately absent)
    failed = dict(broken, result="failure")
    failed.pop("target_count"); failed.pop("last_change")
    assert validate_index(failed) == []

    # resource name/path mismatch is the ResourceModel invariant
    bad_res = dict(good)
    bad_res["resources"] = [dict(good["resources"][0], path="other.txt")]
    assert any("!= path" in p for p in validate_index(bad_res))


def test_write_metadata_warns_but_writes(tmp_path, spark, caplog):
    """The warn-but-write semantics end-to-end: a dataset_meta overlay
    that breaks the contract still produces index.json."""
    import json as _json
    import os

    from opensanctions_spark.exporters.metadata import write_metadata

    entities = spark.createDataFrame(
        [("e1", "Person", {"name": ["A"]}, "2026-01-01T00:00:00",
          "2026-01-01T00:00:00")],
        "canonical_id string, schema string, "
        "properties map<string,array<string>>, first_seen string, "
        "last_seen string",
    )
    out = str(tmp_path)
    # 'resources' overlay of the wrong shape breaks the contract
    write_metadata(
        out, "t", entities, {"names.txt": 1},
        dataset_meta={"resources": [{"title": "no name"}]},
    )
    assert os.path.isfile(os.path.join(out, "index.json"))
    with open(os.path.join(out, "index.json")) as fh:
        idx = _json.load(fh)
    assert idx["name"] == "t"


def test_index_resolve_only_serialized_when_false(tmp_path, spark):
    """CatalogDatasetModel: ``resolve`` has implicit default True and is
    only serialized when False (the maritime case)."""
    from opensanctions_spark.exporters.metadata import dataset_index

    stats = {"entity_count": 1, "target_count": 0,
             "things": {"total": 1}, "last_change": None}
    base = dict(dataset="t", stats=stats, resources=[], row_counts={},
                version="1", run_time="2026-08-01T00:00:00")
    with_true = dataset_index(**base, dataset_meta={"resolve": True})
    assert "resolve" not in with_true
    with_false = dataset_index(**base, dataset_meta={"resolve": False})
    assert with_false["resolve"] is False
