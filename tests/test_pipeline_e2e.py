"""End-to-end dataset run (SURVEY §7.1): fixture CSV → statements →
versioned archive → assembly → validation → exports → delta, across two
run versions — the Spark rendering of the reference's
``zavod/zavod/tests/exporters/test_exporters.py`` + ``test_delta.py``
multi-version scenarios."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.model.melt import finish_statements
from opensanctions_spark.plans import Assertion, DatasetConfig, run_dataset
from opensanctions_spark.sources import read_csv_source
from opensanctions_spark.sources.archive import StatementArchive

# heavyweight suite: deselected from the default driver gate (pytest.ini),
# run builder-side per round close via `pytest tests/ -m slow`
pytestmark = pytest.mark.slow

# 12 entities: 8 persons, 4 orgs; 6 carry risk topics (targets)
FIXTURE_V1 = """id,type,name,topics,country,associate
p1,person,Alice Adams,sanction,de,o1
p2,person,Bob Brown,crime,fr,
p3,person,Carol Cruz,sanction,us,p1
p4,person,Dan Drake,,de,
p5,person,Eve Evans,,es,
p6,person,Frank Fox,crime,it,
p7,person,Grace Gray,,pl,x9
p8,person,Hank Hill,,us,
o1,org,Acme Corp,sanction,de,
o2,org,Bolt Ltd,crime,fr,
o3,org,Cog GmbH,,de,
o4,org,Dyn SA,,es,
"""

# v2: p8 removed (DEL), o1 renamed (MOD), p9 added (ADD)
FIXTURE_V2 = FIXTURE_V1.replace("p8,person,Hank Hill,,us,\n", "").replace(
    "o1,org,Acme Corp", "o1,org,Acme Corporation"
) + "p9,person,Ivy Irwin,,de,\n"


def crawl(spark, csv_path: str):
    """The fixture 'crawler': landed CSV → statements (the declarative
    analogue of testentrypoint1.py's entity.add loop)."""
    raw = read_csv_source(
        spark, csv_path,
        schema="id STRING, type STRING, name STRING, topics STRING, country STRING, associate STRING",
    )
    stacked = raw.select(
        F.col("id").alias("entity_id"),
        F.when(F.col("type") == "person", "Person").otherwise("Company").alias("schema"),
        F.expr(
            "stack(4, 'name', name, 'topics', topics, "
            "'country', country, 'associate', associate) as (prop, value)"
        ),
    )
    return finish_statements(stacked, dataset="fixture")


@pytest.fixture()
def paths(tmp_path):
    v1 = tmp_path / "v1.csv"
    v2 = tmp_path / "v2.csv"
    v1.write_text(FIXTURE_V1)
    v2.write_text(FIXTURE_V2)
    return str(v1), str(v2), str(tmp_path / "archive"), str(tmp_path / "out")


def test_two_version_run(spark, paths):
    v1_csv, v2_csv, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    config = DatasetConfig(
        name="fixture",
        assertions=[
            Assertion("entity_count", "min", 10),
            Assertion("schema:Person", "min", 5),
            Assertion("entity_count", "max", 11, level="warning"),
        ],
    )

    r1 = run_dataset(
        spark, crawl(spark, v1_csv), config, archive,
        out_dir=os.path.join(out_dir, "r1"),
        run_time="2026-08-01T00:00:00", version="20260801-000000",
    )
    assert r1.entity_count == 12
    assert r1.target_count == 6
    assert r1.schema_counts == {"Person": 8, "Company": 4}
    assert r1.dangling_count == 1            # p7 → x9 is unresolved
    assert r1.delta_ops == {}                # no previous version
    assert r1.violations == ["warning: entity_count=12 > max 11"]
    assert r1.export_counts["entities.ftm.json"] == 12
    assert r1.export_counts["names.txt"] == 12

    r2 = run_dataset(
        spark, crawl(spark, v2_csv), config, archive,
        out_dir=os.path.join(out_dir, "r2"),
        run_time="2026-08-13T00:00:00", version="20260813-000000",
    )
    assert r2.entity_count == 12
    assert r2.delta_ops == {"ADD": 1, "DEL": 1, "MOD": 1}

    # J1: statements carried from v1 keep their original first_seen
    curr = archive.read("fixture", version="20260813-000000")
    carried = curr.filter(F.col("entity_id") == "p1")
    assert {r["first_seen"] for r in carried.collect()} == {"2026-08-01T00:00:00"}
    fresh = curr.filter(F.col("entity_id") == "p9")
    assert {r["first_seen"] for r in fresh.collect()} == {"2026-08-13T00:00:00"}

    # run manifest on disk
    with open(os.path.join(out_dir, "r2", "run.json")) as fh:
        manifest = json.load(fh)
    assert manifest["version"] == "20260813-000000"
    assert manifest["delta_ops"] == {"ADD": 1, "DEL": 1, "MOD": 1}


def test_run_with_resolver_map(spark, paths):
    """J2 inside the run plan: a POSITIVE judgement between p1 and p3
    collapses them into one canonical entity before assembly, exactly as
    the reference's linker is applied at store-read time
    (``zavod/zavod/store.py:36-47``)."""
    from opensanctions_spark.operators.resolve import canonical_map

    v1_csv, _, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    decisions = spark.createDataFrame(
        [("p1", "p3", "POSITIVE"), ("p2", "p4", "NEGATIVE")],
        "left_id STRING, right_id STRING, judgement STRING",
    )
    mapping = canonical_map(decisions)

    r = run_dataset(
        spark, crawl(spark, v1_csv), DatasetConfig(name="fixture"), archive,
        out_dir=os.path.join(out_dir, "rr"),
        run_time="2026-08-01T00:00:00", version="20260801-000000",
        canonical_map=mapping,
    )
    # 12 raw entities, p1+p3 merged -> 11; both were targets -> 5 targets
    assert r.entity_count == 11
    assert r.target_count == 5
    assert r.schema_counts == {"Person": 7, "Company": 4}

    # the merged canonical entity carries both names and both countries
    with open(
        os.path.join(
            out_dir, "rr", "entities.ftm.json",
            [f for f in os.listdir(os.path.join(out_dir, "rr", "entities.ftm.json"))
             if f.startswith("part-")][0],
        )
    ) as fh:
        ents = {
            rec["id"]: json.loads(rec["entity"])
            for rec in (json.loads(line) for line in fh)
        }
    assert "p3" not in ents
    merged = ents["p1"]
    assert sorted(merged["properties"]["name"]) == ["Alice Adams", "Carol Cruz"]
    assert sorted(merged["properties"]["country"]) == ["de", "us"]
    # NEGATIVE judgement must NOT merge
    assert "p2" in ents and "p4" in ents


def test_resolver_map_delta_has_no_spurious_dels(spark, paths):
    """The delta must see the canonical map on BOTH sides: the linker
    applies to every store read in the reference
    (``zavod/zavod/store.py:36-47``), so a merged id (p3 → p1) that is
    unchanged between versions produces NO delta op. Before the
    round-11 fix the previous-version side was diffed raw, emitting a
    spurious DEL p3 + MOD p1 on every incremental run under a resolver
    (found by ``tools/rehearse_e2e.py``)."""
    from opensanctions_spark.operators.resolve import canonical_map

    v1_csv, v2_csv, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    decisions = spark.createDataFrame(
        [("p1", "p3", "POSITIVE")], "left_id STRING, right_id STRING, judgement STRING"
    )
    mapping = canonical_map(decisions)
    config = DatasetConfig(name="fixture")

    run_dataset(
        spark, crawl(spark, v1_csv), config, archive,
        out_dir=os.path.join(out_dir, "rm1"),
        run_time="2026-08-01T00:00:00", version="20260801-000000",
        canonical_map=mapping,
    )
    r2 = run_dataset(
        spark, crawl(spark, v2_csv), config, archive,
        out_dir=os.path.join(out_dir, "rm2"),
        run_time="2026-08-13T00:00:00", version="20260813-000000",
        canonical_map=mapping,
    )
    # v2 drift: p8 DEL, o1 MOD, p9 ADD — and nothing for p1/p3, whose
    # merged canonical entity is identical in both versions
    assert r2.delta_ops == {"ADD": 1, "DEL": 1, "MOD": 1}


def test_fatal_assertion_aborts(spark, paths):
    v1_csv, _, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    config = DatasetConfig(
        name="fixture", assertions=[Assertion("entity_count", "min", 100)]
    )
    with pytest.raises(AssertionError, match="entity_count=12 < min 100"):
        run_dataset(
            spark, crawl(spark, v1_csv), config, archive,
            out_dir=os.path.join(out_dir, "rX"),
            run_time="2026-08-01T00:00:00", version="20260801-000000",
        )


def test_cli_run_and_query(spark, tmp_path):
    """The __main__ CLI drives the full pipeline and the catalog."""
    from opensanctions_spark.__main__ import main
    from opensanctions_spark.model.melt import melt_customers

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    stmts = str(tmp_path / "stmts.parquet")
    melt_customers(cust).write.parquet(stmts)
    rc = main([
        "run", "--statements", stmts, "--dataset", "clifix",
        "--archive", str(tmp_path / "archive"), "--out", str(tmp_path / "out"),
        "--assert", "entity_count:min:10",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "run.json").exists()
    # fatal assertion -> nonzero exit
    rc = main([
        "run", "--statements", stmts, "--dataset", "clifix2",
        "--archive", str(tmp_path / "archive"), "--out", str(tmp_path / "out2"),
        "--assert", "entity_count:min:100000",
    ])
    assert rc == 1
    assert main(["list"]) == 0


def test_cli_resolver_and_edge_verbs(spark, tmp_path):
    """merge-cluster / explode-cluster / dedupe-edges round-trip through
    the CLI on parquet state (the zavod dedupe command surface)."""
    from opensanctions_spark.__main__ import main

    mapping = str(tmp_path / "mapping.parquet")
    spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c")],
        "entity_id string, canonical_id string",
    ).write.parquet(mapping)

    merged = str(tmp_path / "merged.parquet")
    assert main(["merge-cluster", "--mapping", mapping, "--out", merged, "a", "b"]) == 0
    got = {
        r["entity_id"]: r["canonical_id"]
        for r in spark.read.parquet(merged).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c"}

    decisions = str(tmp_path / "decisions.parquet")
    spark.createDataFrame(
        [("a", "b", "POSITIVE")], "left_id string, right_id string, judgement string"
    ).write.parquet(decisions)
    exploded = str(tmp_path / "exploded.parquet")
    retained = str(tmp_path / "retained.parquet")
    assert main([
        "explode-cluster", "--mapping", merged, "--decisions", decisions,
        "--out", exploded, "--out-decisions", retained, "b",
    ]) == 0
    got = {
        r["entity_id"]: r["canonical_id"]
        for r in spark.read.parquet(exploded).collect()
    }
    assert got == {"a": "a", "b": "b", "c": "c"}
    assert spark.read.parquet(retained).count() == 0

    edges = str(tmp_path / "edges.parquet")
    spark.createDataFrame(
        [
            ("e1", "Family", "x", "y", ["2020"], []),
            ("e2", "Family", "y", "x", ["2020-06"], []),
        ],
        "id string, schema string, src string, tgt string,"
        " starts array<string>, ends array<string>",
    ).write.parquet(edges)
    deduped = str(tmp_path / "deduped.parquet")
    assert main([
        "dedupe-edges", "--edges", edges, "--out", deduped, "--undirected",
    ]) == 0
    got = {r["id"]: r["canonical_id"] for r in spark.read.parquet(deduped).collect()}
    assert got == {"e1": "e1", "e2": "e1"}


def test_staged_lifecycle_matches_fused_run(spark, paths):
    """crawl → validate → export (the reference's separate CLI stages,
    zavod/zavod/cli/etl.py:24-93) must agree with the fused run_dataset
    manifest on every shared number, across two versions."""
    from opensanctions_spark.plans.run import (
        crawl_dataset,
        export_dataset,
        validate_dataset,
    )

    v1_csv, v2_csv, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)

    ver1 = crawl_dataset(
        spark, crawl(spark, v1_csv), "fixture", archive, run_time="2024-01-01"
    )
    val1 = validate_dataset(
        spark, archive, "fixture",
        assertions=[Assertion("entity_count", "min", 10)],
    )
    assert val1["entity_count"] == 12
    assert val1["target_count"] == 6
    assert val1["violations"] == []
    # p7 references x9 which is never emitted → one dangling ref
    assert val1["dangling_count"] == 1
    exp1 = export_dataset(
        spark, archive, "fixture", out_dir, run_time="2024-01-01"
    )
    assert exp1["version"] == ver1
    assert exp1["delta_ops"] == {}  # no prior version
    assert exp1["export_counts"]["entities.ftm.json"] == 12

    ver2 = crawl_dataset(
        spark, crawl(spark, v2_csv), "fixture", archive, run_time="2024-02-01"
    )
    exp2 = export_dataset(
        spark, archive, "fixture", out_dir, run_time="2024-02-01"
    )
    assert exp2["version"] == ver2
    assert exp2["delta_ops"] == {"ADD": 1, "MOD": 1, "DEL": 1}
    with open(os.path.join(out_dir, "index.json")) as fh:
        index = json.load(fh)
    assert index["version"] == str(ver2)
    assert index["entity_count"] == 12  # 12 again: -p8 +p9
    # the delta-versions index lists the second version, newest first
    with open(os.path.join(out_dir, "delta_index.json")) as fh:
        didx = json.load(fh)
    assert list(didx["versions"]) == [str(ver2)]
    assert didx["unstable"]["version_list"][0]["version"] == str(ver2)


def test_validate_flags_assertion_violations(spark, paths):
    from opensanctions_spark.plans.run import crawl_dataset, validate_dataset

    v1_csv, _, archive_dir, _ = paths
    archive = StatementArchive(spark, archive_dir)
    crawl_dataset(spark, crawl(spark, v1_csv), "fixture", archive,
                  run_time="2024-01-01")
    val = validate_dataset(
        spark, archive, "fixture",
        assertions=[Assertion("entity_count", "min", 500),
                    Assertion("schema:Person", "max", 3, level="warning")],
    )
    assert len(val["violations"]) == 2
    assert any(v.startswith("error") for v in val["violations"])


def test_cli_lifecycle_and_prune_verbs(spark, tmp_path, paths):
    """crawl / validate / export / xref-prune round-trip through the CLI
    (the zavod etl.py + dedupe.py command surface)."""
    from opensanctions_spark.__main__ import main

    v1_csv, _, archive_dir, out_dir = paths
    stmts = str(tmp_path / "stmts.parquet")
    crawl(spark, v1_csv).write.parquet(stmts)

    assert main([
        "crawl", "--statements", stmts, "--dataset", "fx",
        "--archive", archive_dir,
    ]) == 0
    assert main([
        "validate", "--dataset", "fx", "--archive", archive_dir,
        "--assert", "entity_count:min:10",
    ]) == 0
    # failing min assertion → nonzero exit
    assert main([
        "validate", "--dataset", "fx", "--archive", archive_dir,
        "--assert", "entity_count:min:500",
    ]) == 1
    assert main([
        "export", "--dataset", "fx", "--archive", archive_dir,
        "--out", out_dir,
    ]) == 0
    assert os.path.exists(os.path.join(out_dir, "index.json"))
    assert os.path.exists(os.path.join(out_dir, "statistics.json"))

    decisions = str(tmp_path / "dec.parquet")
    spark.createDataFrame(
        [("a", "b", 0.9, "POSITIVE"), ("c", "d", 0.6, "UNSURE"),
         ("e", "f", 0.2, "NEGATIVE")],
        "left_id string, right_id string, score double, judgement string",
    ).write.parquet(decisions)
    pruned = str(tmp_path / "pruned.parquet")
    assert main(["xref-prune", "--decisions", decisions, "--out", pruned]) == 0
    kept = {r["judgement"] for r in spark.read.parquet(pruned).collect()}
    assert kept == {"POSITIVE", "NEGATIVE"}


def test_issues_artifact_written_with_levels(spark, paths):
    """issues.json carries validation findings; index.json embeds the
    by-level counts (the DatasetIssues artifact pair)."""
    v1_csv, _, archive_dir, out_dir = paths
    result = run_dataset(
        spark,
        crawl(spark, v1_csv),
        DatasetConfig(
            name="fixture",
            assertions=[Assertion("schema:Person", "max", 3, level="warning")],
        ),
        StatementArchive(spark, archive_dir),
        out_dir=out_dir,
        run_time="2024-01-01",
    )
    assert result.violations  # the warning fired
    with open(os.path.join(out_dir, "issues.json")) as fh:
        issues = json.load(fh)["issues"]
    levels = {i["level"] for i in issues}
    assert "warning" in levels
    # dangling x9 reference surfaces as an issue too
    assert any("dangling" in i["message"] for i in issues)
    with open(os.path.join(out_dir, "index.json")) as fh:
        index = json.load(fh)
    assert index["issue_count"] == len(issues)
    assert index["issue_levels"].get("warning", 0) >= 1


def test_dataset_config_metadata_flows_into_index(spark, tmp_path, paths):
    """The dataset config's published metadata (title/publisher/url/...)
    lands in index.json, like the reference's to_opensanctions_dict
    merge; redundant hierarchy keys are dropped."""
    from opensanctions_spark.__main__ import main

    v1_csv, _, archive_dir, out_dir = paths
    stmts = str(tmp_path / "s.parquet")
    crawl(spark, v1_csv).write.parquet(stmts)
    cfg = tmp_path / "ds.json"
    cfg.write_text(json.dumps({
        "name": "fixture",
        "assertions": ["entity_count:min:10"],
        "title": "Fixture Sanctions List",
        "summary": "A fixture dataset exercising the lifecycle.",
        "publisher": {"name": "Fixture Authority", "country": "de"},
        "url": "https://fixture.test/source",
        "tags": ["sanctions", "fixture"],
        "type": "source",
        "collections": ["should-be-dropped"],
    }))
    rc = main([
        "run", "--statements", stmts, "--config", str(cfg),
        "--archive", archive_dir, "--out", out_dir,
    ])
    assert rc == 0
    with open(os.path.join(out_dir, "index.json")) as fh:
        index = json.load(fh)
    assert index["title"] == "Fixture Sanctions List"
    assert index["publisher"]["name"] == "Fixture Authority"
    assert index["url"] == "https://fixture.test/source"
    assert index["tags"] == ["sanctions", "fixture"]
    assert index["type"] == "source"
    assert "collections" not in index
    assert index["entity_count"] == 12  # computed fields keep working


def test_delta_file_uses_reference_line_format(spark, paths):
    """delta.json lines are {"op", "entity"} documents: full entity for
    ADD/MOD, id-only for DEL (zavod/zavod/exporters/delta.py:29-38)."""
    v1_csv, v2_csv, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    cfg = DatasetConfig(name="fixture")
    run_dataset(spark, crawl(spark, v1_csv), cfg, archive,
                out_dir=os.path.join(out_dir, "r1"), run_time="2024-01-01")
    run_dataset(spark, crawl(spark, v2_csv), cfg, archive,
                out_dir=os.path.join(out_dir, "r2"), run_time="2024-02-01")
    ddir = os.path.join(out_dir, "r2", "delta.json")
    part = [f for f in os.listdir(ddir) if f.startswith("part-")][0]
    with open(os.path.join(ddir, part)) as fh:
        ops = [json.loads(line) for line in fh if line.strip()]
    by_op = {o["op"]: o for o in ops}
    assert set(by_op) == {"ADD", "MOD", "DEL"}
    assert by_op["DEL"]["entity"] == {"id": "p8"}
    assert by_op["ADD"]["entity"]["id"] == "p9"
    assert by_op["ADD"]["entity"]["properties"]["name"] == ["Ivy Irwin"]
    assert by_op["MOD"]["entity"]["properties"]["name"] == ["Acme Corporation"]


def test_failed_run_does_not_poison_backfill(spark, paths):
    """A run aborted by a fatal assertion records its version (debuggable)
    but never advances the backfill pointer — reads with no version still
    resolve the last successful run (the reference's archive_failure /
    publish split, zavod/zavod/publish.py)."""
    v1_csv, v2_csv, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    good = DatasetConfig(name="fixture", assertions=[Assertion("entity_count", "min", 10)])
    run_dataset(
        spark, crawl(spark, v1_csv), good, archive,
        out_dir=os.path.join(out_dir, "r1"),
        run_time="2026-08-01T00:00:00", version="20260801-000000",
    )
    assert archive.last_successful("fixture") == "20260801-000000"
    v1_rows = archive.read("fixture").count()

    bad = DatasetConfig(name="fixture", assertions=[Assertion("entity_count", "min", 100)])
    with pytest.raises(AssertionError):
        run_dataset(
            spark, crawl(spark, v2_csv), bad, archive,
            out_dir=os.path.join(out_dir, "r2"),
            run_time="2026-08-13T00:00:00", version="20260813-000000",
        )
    # the failed version is recorded, but backfill still reads v1
    assert archive.versions("fixture") == ["20260801-000000", "20260813-000000"]
    assert archive.last_successful("fixture") == "20260801-000000"
    assert archive.read("fixture").count() == v1_rows


def test_publish_release_copy_and_promotion(spark, paths):
    """run → publish: artifacts land in the immutable version dir, listed
    resources land in datasets/{release}/ + datasets/latest/, the version
    is promoted, and stale latest files are reported (never deleted)."""
    from opensanctions_spark.plans.publish import publish_dataset

    v1_csv, _, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    config = DatasetConfig(name="fixture", assertions=[])
    r1_out = os.path.join(out_dir, "r1")
    run_dataset(
        spark, crawl(spark, v1_csv), config, archive,
        out_dir=r1_out,
        run_time="2026-08-01T00:00:00", version="20260801-000000",
    )
    res = publish_dataset(
        archive, "fixture", artifacts_dir=r1_out,
        version="20260801-000000", release="20260801",
    )
    assert "index.json" in res.published
    # unlisted resources are archived but never release-copied
    assert "statistics.json" not in res.published
    vdir = os.path.dirname(archive.version_path("fixture", "20260801-000000"))
    assert os.path.exists(os.path.join(vdir, "index.json"))
    assert os.path.exists(os.path.join(vdir, "statistics.json"))
    for rel in ("20260801", "latest"):
        rdir = os.path.join(archive_dir, "datasets", rel, "fixture")
        assert os.path.exists(os.path.join(rdir, "index.json"))
        assert not os.path.exists(os.path.join(rdir, "statistics.json"))
    # promotion: backfill resolves the published version
    assert archive.last_successful("fixture") == "20260801-000000"
    assert archive.read("fixture").count() > 0
    # stale-latest detection: plant a file a previous publish left behind
    stale_path = os.path.join(archive_dir, "datasets", "latest", "fixture", "old.csv")
    with open(stale_path, "w") as fh:
        fh.write("x")
    res2 = publish_dataset(
        archive, "fixture", artifacts_dir=r1_out, version="20260801-000000",
    )
    assert res2.stale_latest == ["old.csv"]
    assert os.path.exists(stale_path)  # warned about, not deleted


def test_cli_publish_verb(spark, tmp_path):
    from opensanctions_spark.__main__ import main
    from opensanctions_spark.model.melt import melt_customers

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    stmts = str(tmp_path / "stmts.parquet")
    melt_customers(cust).write.parquet(stmts)
    assert main([
        "run", "--statements", stmts, "--dataset", "clipub",
        "--archive", str(tmp_path / "archive"), "--out", str(tmp_path / "out"),
    ]) == 0
    assert main([
        "publish", "--archive", str(tmp_path / "archive"), "--dataset", "clipub",
        "--artifacts", str(tmp_path / "out"),
    ]) == 0
    assert (tmp_path / "archive" / "datasets" / "latest" / "clipub" / "index.json").exists()


def test_bucketed_archive_run_assembles_without_shuffle(spark, paths):
    """SCALE.md §1 end-to-end: with bucket_statements=True the run's
    versioned write is a canonical_id-bucketed table, the re-read feeds
    assembly with a pre-clustered scan, and the A1 aggregation plan has
    ZERO hash exchanges."""
    v1_csv, _, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir, bucket_statements=True)
    config = DatasetConfig(name="fixture", assertions=[])
    r = run_dataset(
        spark, crawl(spark, v1_csv), config, archive,
        out_dir=os.path.join(out_dir, "rb"),
        run_time="2026-08-01T00:00:00", version="20260801-000000",
    )
    assert r.entity_count == 12
    assert archive.is_bucketed("fixture", "20260801-000000")

    # the re-run/export shape: read back + assemble, no exchange at all
    from opensanctions_spark.operators.assembly import assemble_entities

    stmts = archive.read("fixture", version="20260801-000000", external=True)
    ents = assemble_entities(stmts, pre_clustered=True)
    assert ents.count() == 12
    plan = ents._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" not in plan, plan
    # same values as the plain-parquet path
    plain = assemble_entities(stmts)
    assert {r["canonical_id"] for r in ents.collect()} == {
        r["canonical_id"] for r in plain.collect()
    }
    spark.sql("DROP TABLE IF EXISTS osp_stmts_fixture_20260801_000000")


def test_collection_lifecycle_runs_publish_catalog_read(spark, paths, tmp_path):
    """Two datasets → run → publish → collection catalog rollup →
    D2 collection read resolves the PUBLISHED versions: the full
    multi-dataset lifecycle in one archive."""
    from opensanctions_spark.exporters.metadata import write_catalog
    from opensanctions_spark.plans.publish import publish_dataset

    v1_csv, v2_csv, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    results = {}
    for name, csv_path in (("alpha", v1_csv), ("beta", v2_csv)):
        cfg = DatasetConfig(name=name, assertions=[])
        run_out = os.path.join(out_dir, name)
        results[name] = run_dataset(
            spark, crawl(spark, csv_path), cfg, archive,
            out_dir=run_out,
            run_time="2026-08-01T00:00:00", version="20260801-000000",
        )
        publish_dataset(archive, name, artifacts_dir=run_out,
                        version="20260801-000000", release="20260801")

    # catalog.json rolls up both published dataset indexes
    catalog = write_catalog(str(tmp_path), [
        os.path.join(out_dir, "alpha"), os.path.join(out_dir, "beta"),
    ])
    assert catalog["dataset_count"] == 2
    assert catalog["entity_count"] == (
        results["alpha"].entity_count + results["beta"].entity_count
    )

    # D2: the collection union resolves each dataset's published version
    both = archive.read_collection(["alpha", "beta"])
    a = archive.read("alpha", version="20260801-000000")
    b = archive.read("beta", version="20260801-000000")
    assert both.count() == a.count() + b.count()
    for name in ("alpha", "beta"):
        assert archive.last_successful(name) == "20260801-000000"
        assert os.path.exists(os.path.join(
            archive_dir, "datasets", "20260801", name, "index.json"))


def test_cli_export_as_of(spark, paths, capsys):
    """Time-travel export: two successful runs, --as-of between them
    exports the first version's entities."""
    from opensanctions_spark.__main__ import main

    v1_csv, v2_csv, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    cfg = DatasetConfig(name="fixture", assertions=[])
    run_dataset(
        spark, crawl(spark, v1_csv), cfg, archive,
        out_dir=os.path.join(out_dir, "r1"),
        run_time="2026-08-01T00:00:00", version="20260801-000000",
    )
    run_dataset(
        spark, crawl(spark, v2_csv), cfg, archive,
        out_dir=os.path.join(out_dir, "r2"),
        run_time="2026-08-13T00:00:00", version="20260813-000000",
    )
    rc = main([
        "export", "--dataset", "fixture", "--archive", archive_dir,
        "--out", os.path.join(out_dir, "asof"), "--as-of", "20260805",
    ])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out)
    assert manifest["version"] == "20260801-000000"
    # pre-history timestamp fails cleanly
    assert main([
        "export", "--dataset", "fixture", "--archive", archive_dir,
        "--out", os.path.join(out_dir, "asof2"), "--as-of", "20260701",
    ]) == 2


def test_bucketed_export_and_validate_reuse_clustering(spark, paths, monkeypatch):
    """validate and export on a bucketed archive must also skip the
    assembly exchange (run_dataset already does) — a spy on the assembly
    call gates the pre_clustered wiring itself, not just the row counts."""
    import opensanctions_spark.plans.run as run_mod
    from opensanctions_spark.plans.run import export_dataset, validate_dataset

    v1_csv, _, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir, bucket_statements=True)
    config = DatasetConfig(name="fixture", assertions=[])
    run_dataset(
        spark, crawl(spark, v1_csv), config, archive,
        out_dir=os.path.join(out_dir, "rb"),
        run_time="2026-08-01T00:00:00", version="20260801-000000",
    )
    real = run_mod.assemble_entities
    seen: list[bool] = []

    def spy(stmts, pre_clustered=False):
        seen.append(pre_clustered)
        return real(stmts, pre_clustered=pre_clustered)

    monkeypatch.setattr(run_mod, "assemble_entities", spy)
    v = validate_dataset(spark, archive, "fixture")
    assert v["entity_count"] == 12
    manifest = export_dataset(
        spark, archive, "fixture",
        out_dir=os.path.join(out_dir, "xb"),
        run_time="2026-08-01T00:00:00",
    )
    assert manifest["export_counts"]["entities.ftm.json"] == 12
    assert seen == [True, True], seen
    spark.sql("DROP TABLE IF EXISTS osp_stmts_fixture_20260801_000000")


def test_cli_dump_verb(spark, tmp_path, capsys):
    """dump: collection scope → resolver rekey → id-dedupe → csv."""
    from opensanctions_spark.__main__ import main
    from opensanctions_spark.model.melt import melt_customers, melt_suppliers

    cust = melt_customers(
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    )
    supp = melt_suppliers(
        spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    )
    archive = StatementArchive(spark, str(tmp_path / "archive"))
    archive.write(cust, "customers", "20260801-000000")
    archive.write(supp, "suppliers", "20260801-000000")
    rc = main([
        "dump", "--archive", str(tmp_path / "archive"),
        "--datasets", "customers,suppliers",
        "--format", "csv", "--out", str(tmp_path / "dump.csv"),
        "--single-file",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["statements"] == cust.count() + supp.count()
    back = (
        spark.read.option("header", True).csv(str(tmp_path / "dump.csv"))
    )
    assert back.select("id").distinct().count() == report["statements"]


def test_publish_is_idempotent(spark, paths):
    """Publishing the same version twice yields identical release state:
    same listed set, same promotion, no spurious stale warnings."""
    from opensanctions_spark.plans.publish import publish_dataset

    v1_csv, _, archive_dir, out_dir = paths
    archive = StatementArchive(spark, archive_dir)
    config = DatasetConfig(name="fixture", assertions=[])
    r1_out = os.path.join(out_dir, "r1")
    run_dataset(
        spark, crawl(spark, v1_csv), config, archive,
        out_dir=r1_out,
        run_time="2026-08-01T00:00:00", version="20260801-000000",
    )
    a = publish_dataset(archive, "fixture", artifacts_dir=r1_out,
                        version="20260801-000000")
    b = publish_dataset(archive, "fixture", artifacts_dir=r1_out,
                        version="20260801-000000")
    assert a.published == b.published
    assert b.stale_latest == []
    assert archive.last_successful("fixture") == "20260801-000000"
    assert archive.successful_versions("fixture") == ["20260801-000000"]
    latest = os.path.join(archive_dir, "datasets", "latest", "fixture")
    assert sorted(os.listdir(latest)) == sorted(a.published)


def test_delta_index_lists_pending_version_and_only_real_artifacts(
    spark, paths, tmp_path
):
    """ADVICE r3: the delta index must (a) include the just-exported,
    not-yet-promoted version — the reference's include_latest=True
    (zavod/zavod/exporters/metadata/__init__.py:210-216) — and (b) list a
    PRIOR version only when its version dir actually holds a non-empty
    delta.json (the reference checks object presence + size before
    listing), so consumers never fetch a 404."""
    from opensanctions_spark.plans.run import crawl_dataset, export_dataset
    from opensanctions_spark.plans.publish import publish_dataset

    v1_csv, v2_csv, archive_dir, _ = paths
    archive = StatementArchive(spark, archive_dir)

    ver1 = crawl_dataset(
        spark, crawl(spark, v1_csv), "fixture", archive, run_time="2024-01-01"
    )
    out1 = str(tmp_path / "out1")
    export_dataset(spark, archive, "fixture", out1, run_time="2024-01-01")
    publish_dataset(archive, "fixture", artifacts_dir=out1, version=ver1)
    # first export has no prior → no delta.json, no index at all
    assert not os.path.exists(os.path.join(out1, "delta_index.json"))

    ver2 = crawl_dataset(
        spark, crawl(spark, v2_csv), "fixture", archive, run_time="2024-02-01"
    )
    out2 = str(tmp_path / "out2")
    export_dataset(spark, archive, "fixture", out2, run_time="2024-02-01")
    with open(os.path.join(out2, "delta_index.json")) as fh:
        didx = json.load(fh)
    # ver2 is still pending (not promoted), yet it leads the index;
    # ver1 is successful but has no delta artifact → excluded
    assert list(didx["versions"]) == [str(ver2)]
    publish_dataset(archive, "fixture", artifacts_dir=out2, version=ver2)

    # third run: now ver2's version dir carries a real delta.json, so a
    # fresh export lists [ver3 (pending, newest first), ver2] and still
    # skips artifact-less ver1
    ver3 = crawl_dataset(
        spark, crawl(spark, v1_csv), "fixture", archive, run_time="2024-03-01"
    )
    out3 = str(tmp_path / "out3")
    export_dataset(spark, archive, "fixture", out3, run_time="2024-03-01")
    with open(os.path.join(out3, "delta_index.json")) as fh:
        didx3 = json.load(fh)
    assert list(didx3["versions"]) == [str(ver3), str(ver2)]
    assert [e["version"] for e in didx3["unstable"]["version_list"]] == [
        str(ver3), str(ver2)
    ]


def test_cli_load_db_verb(spark, tmp_path, capsys):
    """load-db (zavod/zavod/cli/util.py:16-36): archive scope → resolver
    rekey → id-dedupe → prepared statements. No JDBC driver ships in the
    container, so the --out path exercises the identical prepared plan;
    a --url-less, --out-less call is a loud usage error."""
    import pytest as _pytest

    from opensanctions_spark.__main__ import main
    from opensanctions_spark.model.melt import melt_customers

    cust = melt_customers(
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    )
    archive = StatementArchive(spark, str(tmp_path / "archive"))
    archive.write(cust, "customers", "20260801-000000")
    rc = main([
        "load-db", "--archive", str(tmp_path / "archive"),
        "--datasets", "customers",
        "--out", str(tmp_path / "prepared.parquet"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["statements"] == cust.count()
    back = spark.read.parquet(str(tmp_path / "prepared.parquet"))
    # prepared form: id-deduplicated, reference CSV column order subset
    assert back.select("id").distinct().count() == back.count()
    assert "entity_id" in back.columns and "prop" in back.columns
    with _pytest.raises(SystemExit):
        main([
            "load-db", "--archive", str(tmp_path / "archive"),
            "--datasets", "customers",
        ])


def test_cli_clear_verb(tmp_path, monkeypatch, capsys):
    """clear (zavod/zavod/cli/util.py:62-70): removes the dataset's
    working-data dir under settings.DATA_PATH."""
    from opensanctions_spark import settings
    from opensanctions_spark.__main__ import main

    monkeypatch.setattr(settings, "DATA_PATH", tmp_path)
    from opensanctions_spark.archive import dataset_data_path

    p = dataset_data_path("wipe_me")
    (p / "source.csv").write_text("x")
    assert p.exists()
    assert main(["clear", "--dataset", "wipe_me"]) == 0
    assert not p.exists()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["cleared"] == "wipe_me"


def test_crawl_preserves_first_seen_on_external_statements(spark, tmp_path):
    """Re-crawling must keep first_seen for EXTERNAL statements too: the
    previous-version first_seen index reads the external view, so an
    analyzer/enricher re-run can't reset timestamps on the rows it
    routinely emits external."""
    from pyspark.sql import functions as F

    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.plans.run import crawl_dataset
    from opensanctions_spark.sources.archive import StatementArchive

    rows = [("e1", "Person", "name", "Jane", False),
            ("e2", "Person", "topics", "sanction.linked", True)]
    stmts = finish_statements(
        spark.createDataFrame(
            rows,
            "entity_id string, schema string, prop string, value string,"
            " external boolean",
        ),
        dataset="ts_ext",
    )
    archive = StatementArchive(spark, str(tmp_path))
    crawl_dataset(spark, stmts, "ts_ext", archive, run_time="2026-01-01T00:00:00")
    crawl_dataset(spark, stmts, "ts_ext", archive, run_time="2026-02-01T00:00:00")
    out = {
        r["entity_id"]: (r["first_seen"], r["last_seen"])
        for r in archive.read("ts_ext", external=True).collect()
    }
    assert out["e1"] == ("2026-01-01T00:00:00", "2026-02-01T00:00:00")
    # the external row keeps its original first_seen across re-runs
    assert out["e2"] == ("2026-01-01T00:00:00", "2026-02-01T00:00:00")


def test_run_dataset_preserves_first_seen_on_external_statements(spark, tmp_path):
    """The fused-run path keeps external statements' first_seen across
    re-runs, same as crawl_dataset (the first_seen index reads the
    external view)."""
    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.plans.run import DatasetConfig, run_dataset
    from opensanctions_spark.sources.archive import StatementArchive

    rows = [("e1", "Person", "name", "Jane", False),
            ("e2", "Person", "topics", "sanction.linked", True)]
    stmts = finish_statements(
        spark.createDataFrame(
            rows,
            "entity_id string, schema string, prop string, value string,"
            " external boolean",
        ),
        dataset="run_ext",
    )
    archive = StatementArchive(spark, str(tmp_path / "arch"))
    cfg = DatasetConfig(name="run_ext")
    run_dataset(spark, stmts, cfg, archive, out_dir=str(tmp_path / "o1"),
                run_time="2026-01-01T00:00:00", version="20260101-000000")
    run_dataset(spark, stmts, cfg, archive, out_dir=str(tmp_path / "o2"),
                run_time="2026-02-01T00:00:00", version="20260201-000000")
    out = {
        r["entity_id"]: r["first_seen"]
        for r in archive.read("run_ext", external=True).collect()
    }
    assert out["e2"] == "2026-01-01T00:00:00"
    assert out["e1"] == "2026-01-01T00:00:00"
