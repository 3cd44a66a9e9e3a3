"""Analyzer import-home shims (VERDICT r6 task 3): the three imports the
``_analysis`` reference datasets use resolve AND work end-to-end —
``zavod.archive.dataset_data_path`` → ``opensanctions_spark.archive``,
``zavod.store.get_store`` → ``opensanctions_spark.store``,
``zavod.integration.get_dataset_linker`` →
``opensanctions_spark.integration``.

Reference consumers pinned here:
``datasets/_analysis/ann_pep_positions/analyzer.py:113-146`` (linker →
store → sync → view → entities/get_adjacent/get_entity) and
``datasets/cl/info_probidad/crawler.py:165`` (dataset_data_path).
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

# heavyweight suite: deselected from the default driver gate (pytest.ini),
# run builder-side per round close via `pytest tests/ -m slow`
pytestmark = pytest.mark.slow


# --------------------------------------------------------------------------
# archive paths


def test_dataset_data_path_layout(tmp_path, monkeypatch):
    from opensanctions_spark import settings

    monkeypatch.setattr(settings, "DATA_PATH", tmp_path)
    from opensanctions_spark.archive import (
        clear_data_path,
        dataset_data_path,
        dataset_resource_path,
        dataset_state_path,
        datasets_path,
    )

    assert datasets_path() == tmp_path / "datasets"
    p = dataset_data_path("my_ds")
    assert p.is_dir() and p == (tmp_path / "datasets" / "my_ds").resolve()
    r = dataset_resource_path("my_ds", "source.json")
    assert r == p / "source.json"
    s = dataset_state_path("my_ds")
    assert s.is_dir() and s == p / "_state"
    clear_data_path("my_ds")
    assert not p.exists()


def test_archive_reexports_statement_archive():
    from opensanctions_spark.archive import StatementArchive, new_version_id

    assert StatementArchive is not None and callable(new_version_id)


# --------------------------------------------------------------------------
# linker


def test_linker_identity_and_mapping():
    from opensanctions_spark.integration import Linker, get_dataset_linker

    ds = SimpleNamespace(name="x", model=SimpleNamespace(resolve=False))
    linker = get_dataset_linker(ds)
    assert isinstance(linker, Linker) and len(linker) == 0
    assert linker.get_canonical("a") == "a"

    linker = Linker({"a": "canon", "b": "canon"})
    assert linker.get_canonical("a") == "canon"
    assert linker.get_canonical("canon") == "canon"
    assert linker.get_referents("canon") == {"a", "b"}


def test_linker_from_dataframe_drops_identity(spark):
    from opensanctions_spark.integration import Linker

    df = spark.createDataFrame(
        [("a", "canon"), ("canon", "canon")],
        "entity_id string, canonical_id string",
    )
    linker = Linker.from_dataframe(df)
    assert len(linker) == 1
    assert linker.get_canonical("a") == "canon"


# --------------------------------------------------------------------------
# store: the ann_pep_positions analyzer flow


def _statements(spark):
    """Statements IR for: two Person referents merged by the linker, one
    Position, one Occupancy pointing at both (the adjacency shape
    ann_pep_positions walks)."""
    from opensanctions_spark.model.melt import finish_statements

    rows = [
        ("p1", "Person", "name", "Alice A"),
        ("p1", "Person", "topics", "role.pep"),
        ("p1-dupe", "Person", "name", "Alice Alias"),
        ("pos1", "Position", "name", "Minister of Tests"),
        ("occ1", "Occupancy", "holder", "p1"),
        ("occ1", "Occupancy", "post", "pos1"),
        ("occ1", "Occupancy", "status", "current"),
    ]
    df = spark.createDataFrame(
        rows, "entity_id string, schema string, prop string, value string"
    )
    return finish_statements(df, dataset="test_ds")


def test_store_sync_view_entities_adjacency(spark):
    from opensanctions_spark.integration import Linker
    from opensanctions_spark.store import get_store

    stmts = _statements(spark)
    linker = Linker({"p1-dupe": "p1"})
    ds = SimpleNamespace(name="test_ds", inputs=[])
    store = get_store(ds, linker, statements=stmts)
    store.sync()
    view = store.view(ds)

    ents = {e.id: e for e in view.entities()}
    # p1-dupe canonicalized into p1
    assert set(ents) == {"p1", "pos1", "occ1"}
    alice = view.get_entity("p1")
    assert alice is not None
    assert sorted(alice.get("name")) == ["Alice A", "Alice Alias"]
    assert alice.schema.is_a("Person")
    assert alice.datasets == {"test_ds"}
    assert "role.pep" in alice.get("topics")

    occ = view.get_entity("occ1")
    adj = dict(view.get_adjacent(occ))
    assert adj["holder"].id == "p1"
    assert adj["post"].id == "pos1"
    assert view.get_entity("nope") is None


def test_store_from_archive(spark, tmp_path):
    """get_store with no statements frame syncs from the archive's latest
    successful version — the analyzer's zero-argument data flow."""
    from opensanctions_spark.sources.archive import StatementArchive
    from opensanctions_spark.store import get_store

    arch = StatementArchive(spark, str(tmp_path))
    arch.write(_statements(spark), "test_ds", success=True)
    ds = SimpleNamespace(name="test_ds", inputs=["test_ds"])
    store = get_store(ds, archive=arch)
    view = store.view(ds)  # lazy sync
    assert {e.id for e in view.entities()} == {"p1", "p1-dupe", "pos1", "occ1"}


def test_store_defaults_to_global_archive(spark, tmp_path, monkeypatch):
    """get_store(scope, linker) with no statements/archive reads the
    settings-default archive root — the reference's global-archive
    behavior. An empty root fails loudly (no successful versions)."""
    from opensanctions_spark import settings
    from opensanctions_spark.store import get_store

    monkeypatch.setattr(settings, "ARCHIVE_PATH", tmp_path / "arch")
    store = get_store(SimpleNamespace(name="x", inputs=[]))
    with pytest.raises(FileNotFoundError, match="no successful versions"):
        store.sync()


def test_store_external_filter(spark):
    """external=False (default) drops enrichment candidates, mirroring the
    reference's external flag handling."""
    from opensanctions_spark.store import get_store

    stmts = _statements(spark).withColumn(
        "external", F.col("entity_id") == "pos1"
    )
    ds = SimpleNamespace(name="test_ds", inputs=[])
    store = get_store(ds, statements=stmts)
    assert {e.id for e in store.view(ds).entities()} == {
        "p1", "p1-dupe", "occ1",
    }
    # the view's own external flag decides visibility (reference View
    # semantics): a default sync followed by view(external=True) re-syncs
    # to include externals, and a default view after an external sync
    # narrows back — the memoization keys on the flag, not just presence
    store_ext = get_store(ds, statements=stmts)
    store_ext.sync(external=True)
    assert "pos1" in {e.id for e in store_ext.view(ds, external=True).entities()}
    assert "pos1" not in {e.id for e in store_ext.view(ds).entities()}
    assert "pos1" in {e.id for e in store_ext.view(ds, external=True).entities()}


def test_store_value_canonicalization_under_linker(spark):
    """VERDICT r8 'What's wrong #1' repro, pinned: an edge pointing at a
    merged-away REFERENT id (``holder='p1-dupe'`` with linker
    ``p1-dupe→p1``) must keep its adjacency in both directions, and
    ``get_entity`` must resolve referent ids — the reference store
    rewrites entity-typed values via ``linker.get_canonical``
    (``zavod/zavod/store.py:36-74``)."""
    from opensanctions_spark.integration import Linker
    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.store import get_store

    rows = [
        ("p1", "Person", "name", "Alice A"),
        ("p1", "Person", "topics", "role.pep"),
        ("p1-dupe", "Person", "name", "Alice Alias"),
        ("pos1", "Position", "name", "Minister of Tests"),
        # the edge points at the REFERENT, not the canonical id
        ("occ1", "Occupancy", "holder", "p1-dupe"),
        ("occ1", "Occupancy", "post", "pos1"),
    ]
    stmts = finish_statements(
        spark.createDataFrame(
            rows, "entity_id string, schema string, prop string, value string"
        ),
        dataset="test_ds",
    )
    ds = SimpleNamespace(name="test_ds", inputs=[])
    store = get_store(ds, Linker({"p1-dupe": "p1"}), statements=stmts)
    view = store.view(ds)

    # referent lookup resolves to the surviving entity
    alice = view.get_entity("p1-dupe")
    assert alice is not None and alice.id == "p1"
    # the edge's holder value was rewritten through the linker
    occ = view.get_entity("occ1")
    assert occ.get("holder") == ["p1"]
    # forward adjacency: occupancy → person
    fwd = dict(view.get_adjacent(occ))
    assert fwd["holder"].id == "p1"
    # reverse adjacency: person ← occupancy under the FtM reverse name
    rev = {(p.name, e.id) for p, e in view.get_adjacent(alice)}
    assert ("positionOccupancies", "occ1") in rev


def test_store_statement_provenance_and_walk_gate(spark):
    """Rebuilt entities carry per-statement dataset/external provenance
    (the ``non_graph_topics`` read surface), and the adjacency walk only
    traverses entity-TYPED props — a plain string value colliding with an
    entity id is data, not an edge."""
    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.store import get_store

    def _src(name, rows):
        return finish_statements(
            spark.createDataFrame(
                rows,
                "entity_id string, schema string, prop string, value string",
            ),
            dataset=name,
        )

    stmts = _src(
        "src_a",
        [
            ("e1", "Person", "topics", "poi"),
            # a notes value that happens to equal another entity's id:
            # must NOT create adjacency
            ("e1", "Person", "notes", "e2"),
            ("e2", "Person", "name", "Other"),
        ],
    ).unionByName(_src("ann_x", [("e1", "Person", "topics", "debarred")]))
    ds = SimpleNamespace(name="multi", inputs=[])
    view = get_store(ds, statements=stmts).view(ds)

    e1 = view.get_entity("e1")
    by_ds = {s.dataset: s.value for s in e1.get_statements("topics")}
    assert by_ds == {"src_a": "poi", "ann_x": "debarred"}
    assert all(s.external is False for s in e1.statements)
    assert e1.datasets == {"src_a", "ann_x"}
    # the notes value is not an entity-typed prop: no adjacency either way
    assert dict(view.get_adjacent(e1)) == {}
    assert dict(view.get_adjacent(view.get_entity("e2"))) == {}


def test_propname_reverse_surface():
    """PropName carries the FtM Property read surface the graph analyzer
    dispatches on: ``.name``, ``.reverse`` and string-compatibility
    (``prop.reverse == edge_schema.target_prop`` string compares)."""
    from opensanctions_spark.store import PropName

    p = PropName("ownershipOwner", reverse="owner")
    assert p == "ownershipOwner" and p.name == "ownershipOwner"
    assert p.reverse == "owner" and p.reverse.name == "owner"
    assert p.reverse.reverse == "ownershipOwner"
    assert PropName("plain").reverse is None


def test_adjacency_dedupes_multi_dataset_assertions(spark):
    """One logical edge asserted by TWO datasets (or langs) must walk
    once per direction — FtM property values are sets, and the
    reference's inverted index is per unique (entity, prop, value)."""
    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.store import get_store

    def _src(name, rows):
        return finish_statements(
            spark.createDataFrame(
                rows,
                "entity_id string, schema string, prop string, value string",
            ),
            dataset=name,
        )

    rows = [
        ("p1", "Person", "name", "Alice"),
        ("occ1", "Occupancy", "holder", "p1"),
    ]
    stmts = _src("ds_a", rows).unionByName(_src("ds_b", rows))
    ds = SimpleNamespace(name="multi", inputs=[])
    view = get_store(ds, statements=stmts).view(ds)

    occ = view.get_entity("occ1")
    fwd = [(p.name, e.id) for p, e in view.get_adjacent(occ)]
    assert fwd == [("holder", "p1")]
    alice = view.get_entity("p1")
    rev = [(p.name, e.id) for p, e in view.get_adjacent(alice)]
    assert rev == [("positionOccupancies", "occ1")]
