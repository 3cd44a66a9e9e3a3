"""Compat ``zavod.store`` import home (reference ``zavod/zavod/store.py``):
the assembled-entity store + view that analyzer datasets iterate.

The reference's store is a driver-local LevelDB aggregation of the
dataset's statements (``LevelDBStore``); the engine's native shape is the
distributed A1 assembly (:mod:`opensanctions_spark.operators.assembly`) —
a DataFrame of entities, never driver-bounded. This module is the compat
bridge for analyzer-style random access: ``sync`` canonicalizes the
statements through the linker — BOTH the statement ids
(``apply_canonical``) and the entity-typed property VALUES
(``canonicalize_values``), exactly like the reference's store writer
rewriting references via ``linker.get_canonical`` — then groups them
per entity on the cluster and collects the result into a driver-side
map: the same driver-local materialization the reference's LevelDB
store performs, with the heavy grouping left distributed. Entities are rebuilt statement-by-statement so per-statement
provenance (``dataset``, ``external``) survives — the surface
``non_graph_topics``-style analyzer logic reads
(``datasets/_analysis/ann_graph_topics/analyzer.py:123-138``).

Scale note: an analyzer that must stay distributed should consume
``assemble_entities`` directly; this view is bounded by what the
reference itself could hold on one node.
"""

from __future__ import annotations

from typing import Any, Iterator

from opensanctions_spark.crawler import Entity, Schema, Statement
from opensanctions_spark.integration import Linker
from opensanctions_spark.model.registry import ENTITY_PROPS


class PropName(str):
    """A property name that is BOTH the string (so existing callers can
    compare/key with ``"holder"``) and an object with ``.name`` and
    ``.reverse`` — the attributes analyzer crawlers read off the
    reference's FtM Property (``prop.name != "positionOccupancies"``,
    ``prop.reverse.name != "owner"``). ``reverse`` is the counterpart
    property's name (itself a :class:`PropName`), or None when the model
    registers none."""

    __slots__ = ("_reverse",)

    def __new__(cls, value: str, reverse: str | None = None) -> "PropName":
        self = super().__new__(cls, value)
        self._reverse = reverse
        return self

    @property
    def name(self) -> str:
        return str(self)

    @property
    def reverse(self) -> "PropName | None":
        if self._reverse is None:
            return None
        return PropName(self._reverse, reverse=str(self))


#: reverse property names for the traversals the reference's analyzers
#: walk — public followthemoney schema facts
#: ((schema, forward prop) → the reverse property's name on the target).
#: ``View.get_adjacent`` surfaces the reverse direction under this name,
#: with ``.reverse`` pointing back at the forward prop — the pair the
#: graph rules dispatch on (ann_graph_topics ``walk_edge`` /
#: ``rule_sanction_control_descent``).
REVERSE_PROPS: dict[tuple[str, str], str] = {
    ("Occupancy", "holder"): "positionOccupancies",
    ("Occupancy", "post"): "occupancies",
    ("Sanction", "entity"): "sanctions",
    ("Identification", "holder"): "identification",
    ("Security", "issuer"): "securities",
    ("Ownership", "owner"): "ownershipOwner",
    ("Ownership", "asset"): "ownershipAsset",
    ("Directorship", "director"): "directorshipDirector",
    ("Directorship", "organization"): "directorshipOrganization",
    ("Membership", "member"): "membershipMember",
    ("Membership", "organization"): "membershipOrganization",
    ("Employment", "employer"): "employmentEmployer",
    ("Employment", "employee"): "employmentEmployee",
    ("Family", "person"): "familyPerson",
    ("Family", "relative"): "familyRelative",
    ("Associate", "person"): "associates",
    ("Associate", "associate"): "associateOf",
    ("Succession", "predecessor"): "successionPredecessor",
    ("Succession", "successor"): "successionSuccessor",
    ("Representation", "agent"): "agencyClient",
    ("Representation", "client"): "agentRepresentation",
    ("UnknownLink", "subject"): "unknownLinkTo",
    ("UnknownLink", "object"): "unknownLinkFrom",
}


class View:
    """Random-access view over assembled entities
    (``zavod/zavod/store.py:33-34`` View contract: ``entities``,
    ``get_entity``, ``get_adjacent``). Lookups canonicalize through the
    linker, so a merged-away id resolves to its surviving entity — the
    reference view's ``linker.get_canonical`` lookup behavior."""

    def __init__(
        self, entities: dict[str, Entity], linker: Linker | None = None
    ) -> None:
        self._entities = entities
        self._linker = linker or Linker({})
        # reverse index: target id → [(forward prop name, source id)].
        # Built once per sync over entity-TYPED props only (a plain value
        # colliding with an entity id is data, not an edge); values
        # canonicalize through the linker (so a still-unrewritten
        # referent reference indexes like the forward walk resolves it),
        # and one logical edge indexes ONCE even when several
        # datasets/langs asserted the same (prop, value) — FtM property
        # values are sets. Size is edge-count-bounded like the
        # reference's inverted LevelDB index.
        self._reverse: dict[str, list[tuple[str, str]]] = {}
        seen: set[tuple[str, str, str]] = set()
        for ent in entities.values():
            for prop, value, _l, _o, _ov in ent.statements:
                if prop not in ENTITY_PROPS:
                    continue
                value = self._linker.get_canonical(value)
                if value in entities and value != ent.id:
                    if (ent.schema.name, prop) in REVERSE_PROPS:
                        key = (value, prop, ent.id)  # type: ignore[assignment]
                        if key in seen:
                            continue
                        seen.add(key)
                        self._reverse.setdefault(value, []).append(
                            (prop, ent.id)  # type: ignore[arg-type]
                        )

    # the reference types its view generically (nomenklatura
    # ``View[Dataset, Entity]``); accept the subscript for import parity
    def __class_getitem__(cls, item: Any) -> type:
        return cls

    def entities(self) -> Iterator[Entity]:
        yield from self._entities.values()

    def get_entity(self, entity_id: str) -> Entity | None:
        ent = self._entities.get(entity_id)
        if ent is None:
            ent = self._entities.get(self._linker.get_canonical(entity_id))
        return ent

    def get_adjacent(self, entity: Entity) -> Iterator[tuple[PropName, Entity]]:
        """(prop, adjacent-entity): forward for every ENTITY-TYPED
        property value that resolves to another entity in the view, PLUS
        the registered reverse traversals (a Person sees its Occupancies
        under ``positionOccupancies``) — the walk the reference's
        View.get_adjacent does over its inverted index. Props are
        :class:`PropName` (string-compatible, with ``.name`` and
        ``.reverse``). One logical edge yields once per direction even
        when several datasets asserted the same (prop, value) — FtM
        property values are sets."""
        seen: set[tuple[str, str | None]] = set()
        for prop, value, _lang, _origin, _orig in entity.statements:
            if prop not in ENTITY_PROPS:
                continue
            adjacent = self.get_entity(value)
            if adjacent is not None and adjacent is not entity:
                key = (prop, adjacent.id)
                if key in seen:
                    continue
                seen.add(key)
                rev = REVERSE_PROPS.get((entity.schema.name, prop))
                yield PropName(prop, reverse=rev), adjacent
        if entity.id is not None:
            for fwd_prop, source_id in self._reverse.get(entity.id, []):
                source = self._entities.get(source_id)
                if source is not None and source is not entity:
                    rev_name = REVERSE_PROPS[(source.schema.name, fwd_prop)]
                    yield PropName(rev_name, reverse=fwd_prop), source


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
        self._synced_external: bool | None = None

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
        """Canonicalize + group statements distributed, then materialize
        the driver-side map (ref ``store.py:49-75`` sync; the LevelDB
        build loop becomes one Spark aggregation + a streamed collect).

        Memoized per ``external`` flag: asking for a different external
        scope than the last sync re-syncs (a default sync followed by
        ``view(external=True)`` must not silently return the
        internal-only map).
        """
        from pyspark.sql import functions as F

        from opensanctions_spark.model.registry import (
            common_schema_rank_column,
        )
        from opensanctions_spark.operators.resolve import (
            apply_canonical,
            canonicalize_values,
        )

        if (
            self._entities is not None
            and not clear
            and self._synced_external == external
        ):
            return
        stmts = self._resolve_statements(external=external)
        if not external and "external" in stmts.columns:
            stmts = stmts.filter(~F.col("external"))
        if len(self.linker):
            # Arrow-path createDataFrame (pandas in, arrow.pyspark.enabled
            # on): the mapping parallelizes as JVM-side Arrow batches — a
            # plain list-of-tuples createDataFrame ships pickled Python
            # partitions instead, costing a 32-task Python-worker stage
            # PER consumer (this mapping feeds both apply_canonical and
            # canonicalize_values; profiled at ~8 s of idle executor time
            # each on a sub-MB map)
            import pandas as pd

            mapping_rows = [
                (e, c) for e, c in self.linker._map.items()
            ]
            spark = stmts.sparkSession
            mapping = spark.createDataFrame(
                pd.DataFrame(
                    mapping_rows, columns=["entity_id", "canonical_id"]
                ).astype(str),
                "entity_id string, canonical_id string",
            )
            stmts = apply_canonical(stmts, mapping)
            # edges must follow the merge: entity-typed property VALUES
            # rewrite through the linker too (the reference store writer's
            # linker.get_canonical on references) — without this an
            # Occupancy pointing at a merged-away holder id dangles
            stmts = canonicalize_values(stmts, mapping)
        cols = set(stmts.columns)
        dataset_col = (
            F.col("dataset") if "dataset" in cols else F.lit(None).cast("string")
        )
        external_col = (
            F.col("external") if "external" in cols else F.lit(False)
        )
        opt = {
            p: (F.col(p) if p in cols else F.lit(None).cast("string"))
            for p in ("lang", "origin", "original_value")
        }
        # ONE shuffle: group per canonical id, keeping each statement's
        # provenance. collect_set dedupes at statement granularity (the
        # reference's content-hash statement ids do the same); array_sort
        # gives the driver loop a deterministic statement order.
        assembled = (
            stmts.repartition("canonical_id")
            .groupBy("canonical_id")
            .agg(
                F.max_by(
                    "schema", common_schema_rank_column(F.col("schema"))
                ).alias("schema"),
                F.array_sort(
                    F.collect_set(
                        F.struct(
                            F.col("prop").alias("prop"),
                            F.col("value").alias("value"),
                            opt["lang"].alias("lang"),
                            opt["origin"].alias("origin"),
                            opt["original_value"].alias("original_value"),
                            dataset_col.alias("dataset"),
                            external_col.alias("external"),
                        )
                    )
                ).alias("stmts"),
                F.collect_set(dataset_col).alias("datasets"),
            )
        )
        entities: dict[str, Entity] = {}
        # collect(), not toLocalIterator(): the sync retains EVERY row in
        # the driver-side dict anyway, so partition-at-a-time streaming
        # saves no memory while serializing the fetch into one sequential
        # job per partition (each task then idles on driver consumption —
        # profiled at 32× the CPU time). One parallel job fetches the
        # same bounded map.
        for row in assembled.collect():
            ent = Entity(Schema(row["schema"]))
            ent.id = row["canonical_id"]
            ent.datasets = {d for d in (row["datasets"] or []) if d}
            ent.referents = self.linker.get_referents(ent.id)
            for s in row["stmts"]:
                ent.add_statement(
                    Statement(
                        s["prop"],
                        s["value"],
                        s["lang"],
                        s["origin"],
                        s["original_value"],
                        dataset=s["dataset"],
                        external=bool(s["external"]),
                    )
                )
            entities[ent.id] = ent
        self._entities = entities
        self._synced_external = external

    def view(self, scope: Any = None, external: bool = False) -> View:
        """Open the assembled view (syncs lazily; ``scope`` is accepted for
        reference-signature parity — the statements were already scoped at
        construction)."""
        self.sync(external=external)
        assert self._entities is not None
        return View(self._entities, linker=self.linker)


def get_store(
    dataset: Any,
    linker: Linker | None = None,
    statements: Any = None,
    archive: Any = None,
) -> Store:
    """``zavod/zavod/store.py:18-20`` entry point."""
    return Store(dataset, linker, statements=statements, archive=archive)
