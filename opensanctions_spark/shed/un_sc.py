"""UN Security Council consolidated-list helpers
(``zavod/zavod/shed/un_sc.py``): several reference crawlers (the UN list
itself plus national lists that reproduce it) share this parse surface.

Behavioral re-expression on the compat DOM (stdlib ElementTree instead
of lxml); the name-list semantics and the regime prefixes are the
reference's, cited per function.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Iterator

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext, Entity


class Regime(Enum):
    """un_sc.py:13-26: sanction-regime reference-number prefixes."""

    SOMALIA = "SO"
    DAESH_AL_QAIDA = "QD"
    IRAQ = "IQ"
    DRC = "CD"
    SUDAN = "SD"
    NORTH_KOREA = "KP"
    LIBYA = "LY"
    TALIBAN = "TA"
    GUINEA_BISSAU = "GB"
    CAR = "CF"
    YEMEN = "YE"
    SOUTH_SUDAN = "SS"
    HAITI = "HT"


def get_persons(
    context: CrawlerContext,
    prefix: str,
    doc: Any,
    include_prefixes: list[Regime] | None = None,
) -> Iterator[tuple[Any, Entity]]:
    """un_sc.py:29-37."""
    yield from get_entities(
        context, prefix, doc, include_prefixes, "INDIVIDUAL", "Person"
    )


def get_legal_entities(
    context: CrawlerContext,
    prefix: str,
    doc: Any,
    include_prefixes: list[Regime] | None = None,
) -> Iterator[tuple[Any, Entity]]:
    """un_sc.py:40-48."""
    yield from get_entities(
        context, prefix, doc, include_prefixes, "ENTITY", "LegalEntity"
    )


def get_entities(
    context: CrawlerContext,
    prefix: str,
    doc: Any,
    include_prefixes: list[Regime] | None,
    tag: str,
    schema: str,
) -> Iterator[tuple[Any, Entity]]:
    """un_sc.py:51-69: nodes of one tag, filtered by regime prefix on
    the permanent reference number (no filter / no ref → included)."""
    for node in doc.findall(f".//{tag}"):
        perm_ref = node.findtext("./REFERENCE_NUMBER")
        if (
            include_prefixes is None
            or perm_ref is None
            or any(perm_ref.startswith(p.value) for p in include_prefixes)
        ):
            yield node, make_entity(context, prefix, schema, node)


def make_entity(
    context: CrawlerContext, prefix: str, schema: str, node: Any
) -> Entity:
    """un_sc.py:72-89: slug id from DATAID, the UN name list applied,
    and the sanction topic so the entity is emit-ready."""
    entity = context.make(schema)
    entity.id = context.make_slug(node.findtext("./DATAID"), prefix=prefix)
    names = [
        name
        for name in (
            node.findtext("./FIRST_NAME"),
            node.findtext("./SECOND_NAME"),
            node.findtext("./THIRD_NAME"),
            node.findtext("./FOURTH_NAME"),
        )
        if name
    ]
    apply_un_name_list(context, entity, names)
    entity.add("topics", "sanction")
    return entity


def apply_un_name_list(
    context: CrawlerContext,
    entity: Entity,
    names: list[str],
    lang: str | None = None,
) -> None:
    """un_sc.py:92-114: first element = first name, last = family name,
    the middle is murky by the UN's own admission — so only the ends get
    part props, and the full name is the plain join."""
    if len(names) == 0:
        context.log.warn("No names found for entity %s", entity.id)
    elif len(names) == 1:
        entity.add("name", names[0])
    else:
        entity.add("firstName", names[0])
        entity.add("lastName", names[-1])
        name_args = {f"name{i + 1}": name for i, name in enumerate(names)}
        entity.add("name", h.make_name(**name_args), lang=lang)


def load_un_sc(
    context: CrawlerContext, dataset_path: str | None = None
) -> tuple[Any, Any]:
    """un_sc.py:117-130: load the un_sc_sanctions dataset config and
    fetch+parse its source XML. The reference hardcodes its repo-relative
    YAML path; compat takes the path explicitly (or resolves
    ``un_sc_sanctions`` from the catalog)."""
    from opensanctions_spark.meta import get_catalog, load_dataset_from_path

    if dataset_path is not None:
        dataset = load_dataset_from_path(dataset_path)
    else:
        dataset = get_catalog().require("un_sc_sanctions")
    if not (dataset and dataset.data and dataset.data.url):
        raise Exception(
            "Could not look up un_sc_sanctions dataset or its data URL"
        )
    path = context.fetch_resource("source.xml", dataset.data.url)
    context.export_resource(
        path, "text/xml",
        title="Source data - UN Security Council Consolidated list",
    )
    doc = context.parse_resource_xml(path)
    return dataset, doc
