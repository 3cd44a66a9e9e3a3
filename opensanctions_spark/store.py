"""Compat ``zavod.store`` import home (reference ``zavod/zavod/store.py``):
the assembled-entity store + view that analyzer datasets iterate.

The reference's store is a driver-local LevelDB aggregation of the
dataset's statements (``LevelDBStore``); the engine's native shape is the
distributed A1 assembly (:mod:`opensanctions_spark.operators.assembly`) —
a DataFrame of entities, never driver-bounded. This module is the compat
bridge for analyzer-style random access: ``sync`` runs the distributed
assembly (canonicalized through the linker, exactly
``apply_canonical`` → ``assemble_entities``) and streams the result to a
driver-side map via ``toLocalIterator`` — the same driver-local
materialization the reference's LevelDB store performs, with the heavy
grouping left on the cluster. Scale note: an analyzer that must stay
distributed should consume ``assemble_entities`` directly; this view is
bounded by what the reference itself could hold on one node.
"""

from __future__ import annotations

from typing import Any, Iterator

from opensanctions_spark.crawler import Entity, Schema
from opensanctions_spark.integration import Linker


class PropName(str):
    """A property name that is BOTH the string (so existing callers can
    compare/key with ``"holder"``) and an object with ``.name`` — the
    attribute analyzer crawlers read off the reference's FtM Property
    (``prop.name != "positionOccupancies"``)."""

    __slots__ = ()

    @property
    def name(self) -> str:
        return str(self)


#: reverse property names for the intermediate-node traversals the
#: reference's analyzers walk — public followthemoney schema facts
#: ((schema, forward prop) → the reverse property's name on the target).
#: Extend as analyzer ports need more of the FtM graph.
REVERSE_PROPS: dict[tuple[str, str], str] = {
    ("Occupancy", "holder"): "positionOccupancies",
    ("Occupancy", "post"): "occupancies",
    ("Sanction", "entity"): "sanctions",
    ("Identification", "holder"): "identification",
}


class View:
    """Random-access view over assembled entities
    (``zavod/zavod/store.py:33-34`` View contract: ``entities``,
    ``get_entity``, ``get_adjacent``)."""

    def __init__(self, entities: dict[str, Entity]) -> None:
        self._entities = entities
        # reverse index: target id → [(reverse prop name, source id)].
        # Built once per sync; size is edge-count-bounded like the
        # reference's inverted LevelDB index.
        self._reverse: dict[str, list[tuple[str, str]]] = {}
        for ent in entities.values():
            for prop, value, _l, _o, _ov in ent.statements:
                if value in entities and value != ent.id:
                    rev = REVERSE_PROPS.get((ent.schema.name, prop))
                    if rev is not None:
                        self._reverse.setdefault(value, []).append(
                            (rev, ent.id)  # type: ignore[arg-type]
                        )

    def entities(self) -> Iterator[Entity]:
        yield from self._entities.values()

    def get_entity(self, entity_id: str) -> Entity | None:
        return self._entities.get(entity_id)

    def get_adjacent(self, entity: Entity) -> Iterator[tuple[PropName, Entity]]:
        """(prop, adjacent-entity): forward for every property value that
        resolves to another entity in the view, PLUS the registered
        reverse traversals (a Person sees its Occupancies under
        ``positionOccupancies``) — the id-reference walk the reference's
        View.get_adjacent does over its inverted index. Props are
        :class:`PropName` (string-compatible, with ``.name``)."""
        for prop, value, _lang, _origin, _orig in entity.statements:
            adjacent = self._entities.get(value)
            if adjacent is not None and adjacent is not entity:
                yield PropName(prop), adjacent
        if entity.id is not None:
            for rev_prop, source_id in self._reverse.get(entity.id, []):
                source = self._entities.get(source_id)
                if source is not None and source is not entity:
                    yield PropName(rev_prop), source


class Store:
    """Entity store over a statements DataFrame (ref ``store.py:18-28``
    ``Store(dataset, linker)``).

    ``statements`` is the canonical statements IR frame; when omitted,
    ``sync`` reads the dataset's latest successful archive version(s)
    through the given :class:`StatementArchive`.
    """

    def __init__(
        self,
        dataset: Any,
        linker: Linker | None = None,
        statements: Any = None,
        archive: Any = None,
    ) -> None:
        self.dataset = dataset
        self.linker = linker or Linker({})
        self._statements = statements
        self._archive = archive
        self._entities: dict[str, Entity] | None = None

    def _scope_names(self) -> list[str]:
        """Dataset scope → archive dataset names. Accepts a single
        dataset (name/inputs attrs), a list of datasets (the engine's
        ``get_multi_dataset`` shape), or plain strings."""
        ds = self.dataset
        if isinstance(ds, (list, tuple)):
            return [str(getattr(d, "name", d)) for d in ds]
        inputs = getattr(ds, "inputs", None) or []
        if inputs:
            return [str(getattr(d, "name", d)) for d in inputs]
        return [str(getattr(ds, "name", ds))]

    def _resolve_statements(self, external: bool = False):
        if self._statements is not None:
            return self._statements
        archive = self._archive
        if archive is None:
            # the reference's store reads the GLOBAL archive when none is
            # named (zavod/zavod/store.py via zavod.archive paths); the
            # engine's equivalent default root is settings.ARCHIVE_PATH
            from pyspark.sql import SparkSession

            from opensanctions_spark import settings
            from opensanctions_spark.sources.archive import StatementArchive

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise ValueError(
                    "Store needs a statements DataFrame, a StatementArchive,"
                    " or an active SparkSession to read the default archive"
                )
            archive = StatementArchive(spark, str(settings.ARCHIVE_PATH))
        return archive.read_collection(self._scope_names(), external=external)

    def sync(self, clear: bool = False, external: bool = False) -> None:
        """Assemble entities distributed, then materialize the driver-side
        map (ref ``store.py:49-75`` sync; the LevelDB build loop becomes
        one Spark aggregation + a streamed collect)."""
        from pyspark.sql import functions as F

        from opensanctions_spark.operators.assembly import assemble_entities
        from opensanctions_spark.operators.resolve import apply_canonical

        if self._entities is not None and not clear:
            return
        stmts = self._resolve_statements(external=external)
        if not external and "external" in stmts.columns:
            stmts = stmts.filter(~F.col("external"))
        if len(self.linker):
            mapping_rows = [
                (e, c) for e, c in self.linker._map.items()
            ]
            spark = stmts.sparkSession
            mapping = spark.createDataFrame(
                mapping_rows, "entity_id string, canonical_id string"
            )
            stmts = apply_canonical(stmts, mapping)
        assembled = assemble_entities(stmts)
        per_entity_ds = stmts.groupBy("canonical_id").agg(
            F.collect_set("dataset").alias("datasets")
        )
        assembled = assembled.join(per_entity_ds, "canonical_id", "left")
        entities: dict[str, Entity] = {}
        # toLocalIterator: driver sees one partition at a time — the
        # materialized dict is the (reference-parity) driver-local store
        for row in assembled.toLocalIterator():
            ent = Entity(Schema(row["schema"]))
            ent.id = row["canonical_id"]
            ent.datasets = set(row["datasets"] or [])
            ent.referents = self.linker.get_referents(ent.id)
            for prop, values in (row["properties"] or {}).items():
                ent.add(prop, values)
            entities[ent.id] = ent
        self._entities = entities

    def view(self, scope: Any = None, external: bool = False) -> View:
        """Open the assembled view (syncs lazily; ``scope`` is accepted for
        reference-signature parity — the statements were already scoped at
        construction)."""
        if self._entities is None:
            self.sync(external=external)
        assert self._entities is not None
        return View(self._entities)


def get_store(
    dataset: Any,
    linker: Linker | None = None,
    statements: Any = None,
    archive: Any = None,
) -> Store:
    """``zavod/zavod/store.py:18-20`` entry point."""
    return Store(dataset, linker, statements=statements, archive=archive)
