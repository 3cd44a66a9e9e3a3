"""VERBATIM reference ANALYZER run (the consumer the round-7 import-home
shims exist for): the full body of
``datasets/_analysis/ann_pep_positions/analyzer.py`` — helper functions
and ``crawl`` — with only the import homes swapped (``zavod`` →
``opensanctions_spark``), driven end-to-end: statements archive →
get_catalog/get_multi_dataset scope → get_dataset_linker → get_store →
view traversal (reverse ``positionOccupancies`` adjacency) →
categorise_many → influence labels emitted through the context.
"""

from __future__ import annotations

from collections import defaultdict
from types import SimpleNamespace

# -- the reference analyzer, import-swapped ---------------------------------
from opensanctions_spark import Context, Entity
from opensanctions_spark.constants import ORIGIN_INFERRED
from opensanctions_spark.integration import get_dataset_linker
from opensanctions_spark.meta import get_catalog, get_multi_dataset
from opensanctions_spark.stateful.positions import (
    OccupancyStatus,
    categorise_many,
    load_categorisations,
)
from opensanctions_spark.store import get_store

INFLUENCE_TOPIC_LABELS = {
    "gov.national": "National government",
    "gov.state": "State government",
    "gov.igo": "International organization",
    "gov.muni": "Local government",
}
OCCUPANCY_STATUS_LABELS = {
    OccupancyStatus.CURRENT: "current",
    OccupancyStatus.ENDED: "past",
    OccupancyStatus.UNKNOWN: "unknown status",
}


def get_best_occupancy_status(occupancy: Entity) -> OccupancyStatus:
    statuses = occupancy.get("status")
    if OccupancyStatus.ENDED.value in statuses:
        return OccupancyStatus.ENDED
    if OccupancyStatus.CURRENT.value in statuses:
        return OccupancyStatus.CURRENT

    return OccupancyStatus.UNKNOWN


def get_best_influence_status(statuses: set[OccupancyStatus]) -> OccupancyStatus:
    if OccupancyStatus.CURRENT in statuses:
        return OccupancyStatus.CURRENT
    if OccupancyStatus.UNKNOWN in statuses:
        return OccupancyStatus.UNKNOWN
    if OccupancyStatus.ENDED in statuses:
        return OccupancyStatus.ENDED
    return OccupancyStatus.UNKNOWN


def format_influence_label(topic: str, status: OccupancyStatus) -> str | None:
    level_label = INFLUENCE_TOPIC_LABELS.get(topic, None)
    status_label = OCCUPANCY_STATUS_LABELS.get(status, None)
    if status_label is None or level_label is None:
        return None

    return f"{level_label} ({status_label})"


def build_consolidated_influence_labels(
    topic_to_seen_statuses: dict[str, set[OccupancyStatus]],
) -> list[str]:
    formatted = [
        format_influence_label(topic, get_best_influence_status(seen_statuses))
        for topic, seen_statuses in topic_to_seen_statuses.items()
    ]
    return [f for f in formatted if f is not None]


def analyze_position(context: Context, entity: Entity) -> set[str]:
    topics: set[str] = set()

    if entity.datasets == {context.dataset.name}:
        return topics

    assert entity.id is not None
    entity_ids = set(entity.referents)
    entity_ids.add(entity.id)

    for categorisation in categorise_many(context, list(entity_ids)):
        if not categorisation.topics:
            continue

        proxy = context.make("Position")
        proxy.id = entity.id
        proxy.add("topics", categorisation.topics, origin=ORIGIN_INFERRED)
        if proxy.get("topics"):
            context.emit(proxy)

        topics.update(categorisation.topics)
    return topics


def crawl(context: Context) -> None:
    scope = get_multi_dataset(get_catalog(), context.dataset.inputs)
    linker = get_dataset_linker(scope)
    store = get_store(scope, linker)
    store.sync()
    view = store.view(scope)
    pep_count = 0

    for entity_idx, entity in enumerate(view.entities()):
        if entity_idx > 0 and entity_idx % 10000 == 0:
            context.log.info(f"Processed {entity_idx} entities")

        if not entity.schema.is_a("Person") or "role.pep" not in entity.get("topics"):
            continue

        if entity.datasets == {context.dataset.name}:
            continue

        pep_count += 1
        if pep_count > 0 and pep_count % 10000 == 0:
            context.log.info(f"Processed {pep_count} PEPs")

        topic_to_seen_statuses: dict[str, set[OccupancyStatus]] = defaultdict(set)

        for prop, adjacent in view.get_adjacent(entity):
            if prop.name != "positionOccupancies":
                continue

            occupancy = adjacent

            for position_id in occupancy.get("post"):
                position = view.get_entity(position_id)
                if position is None:
                    continue
                topics = analyze_position(context, position)

                for topic in topics:
                    if topic not in INFLUENCE_TOPIC_LABELS:
                        continue
                    topic_to_seen_statuses[topic].add(
                        get_best_occupancy_status(occupancy)
                    )

        influence_labels = build_consolidated_influence_labels(topic_to_seen_statuses)
        if not influence_labels:
            continue
        person_proxy = context.make("Person")
        person_proxy.id = entity.id
        person_proxy.add("classification", influence_labels, origin=ORIGIN_INFERRED)
        context.emit(person_proxy)


# -- the e2e fixture + assertions -------------------------------------------


def test_ann_pep_positions_analyzer_verbatim(spark, tmp_path, monkeypatch):
    from opensanctions_spark import settings
    from opensanctions_spark.crawler import CrawlerContext
    from opensanctions_spark.meta import Dataset
    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.sources.archive import StatementArchive

    rows = [
        # a PEP with a current national occupancy and an ended IGO one
        ("p1", "Person", "name", "Paula Pep"),
        ("p1", "Person", "topics", "role.pep"),
        ("occ1", "Occupancy", "holder", "p1"),
        ("occ1", "Occupancy", "post", "pos1"),
        ("occ1", "Occupancy", "status", "current"),
        ("occ2", "Occupancy", "holder", "p1"),
        ("occ2", "Occupancy", "post", "pos2"),
        ("occ2", "Occupancy", "status", "ended"),
        ("pos1", "Position", "name", "Minister of Things"),
        ("pos2", "Position", "name", "IGO Delegate"),
        # a person without the pep topic: never analyzed
        ("p2", "Person", "name", "Norm Normal"),
    ]
    stmts = finish_statements(
        spark.createDataFrame(
            rows, "entity_id string, schema string, prop string, value string"
        ),
        dataset="peps_src_vb",
    )
    monkeypatch.setattr(settings, "ARCHIVE_PATH", tmp_path / "arch")
    archive = StatementArchive(spark, str(tmp_path / "arch"))
    archive.write(stmts, "peps_src_vb", success=True)
    get_catalog().add(Dataset({"name": "peps_src_vb"}))

    ctx = CrawlerContext(
        spark,
        SimpleNamespace(
            name="ann_pep_positions", metadata={}, lookups={},
            inputs=["peps_src_vb"],
        ),
        work_dir=str(tmp_path / "work"),
    )
    load_categorisations(ctx, [
        ("pos1", ["gov.national"], True),
        ("pos2", ["gov.igo"], True),
    ])

    crawl(ctx)

    out: dict[tuple[str, str], list[str]] = {}
    for s in ctx._buffer:  # (entity_id, schema, prop, value, ...)
        out.setdefault((s[0], s[2]), []).append(s[3])

    # both categorised positions re-emitted with inferred topics
    assert out[("pos1", "topics")] == ["gov.national"]
    assert out[("pos2", "topics")] == ["gov.igo"]
    # the PEP gets consolidated influence labels: national is CURRENT
    # (occ1), igo only ENDED (occ2) → "past"
    labels = out[("p1", "classification")]
    assert sorted(labels) == [
        "International organization (past)",
        "National government (current)",
    ]
    # the non-pep person emitted nothing
    assert not any(e == "p2" for (e, _p) in out)
