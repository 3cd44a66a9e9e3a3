"""FtM-lite schema lattice + property registry as broadcastable tables.

The reference resolves an entity's schema by repeatedly widening to the
common descendant in the FollowTheMoney schema lattice
(``zavod/zavod/entity.py:155-162`` via ``model.common_schema``). Doing that
per-row in Python would put a Python UDF in the hot aggregation path; the
Spark-first design instead precomputes a *specificity rank* per schema such
that for every chain in the lattice the more specific schema has the higher
rank — then the per-entity common-schema reduction becomes
``max(rank) → schema`` inside an ordinary JVM-side aggregation
(SURVEY.md §2.4 A1, §4 custom-work item 1).

This module ships a compact lattice covering the schemata exercised by the
reference's fixtures and exporters (Person/Company/Organization/
LegalEntity/Address/Sanction plus the edge schemata of
``zavod/zavod/integration/edges.py:78-110``). Adding the full FtM model is a
data change, not a code change: the lattice is just a table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# parent chains (child -> ordered ancestors, most specific first)
SCHEMA_PARENTS: dict[str, list[str]] = {
    "Thing": [],
    "LegalEntity": ["Thing"],
    "Person": ["LegalEntity", "Thing"],
    "Company": ["Organization", "LegalEntity", "Thing"],
    "Organization": ["LegalEntity", "Thing"],
    "PublicBody": ["Organization", "LegalEntity", "Thing"],
    "Address": ["Thing"],
    "Vessel": ["Vehicle", "Thing"],
    "Vehicle": ["Thing"],
    "Security": ["Thing"],
    "Position": ["Thing"],
    "Sanction": [],
    "Identification": [],
    "Passport": ["Identification"],
    "Occupancy": [],
    # edge schemata: source/target props + directedness
    "Ownership": [],
    "Directorship": [],
    "Family": [],
    "Associate": [],
    "UnknownLink": [],
    "Membership": [],
}

# Display labels for the schemata this engine ships: (label, plural).
# The reference resolves these through the FtM model registry
# (``zavod/zavod/exporters/statistics.py:11-35`` — ``schema.label`` /
# ``schema.plural``); the engine carries its own presentation table for
# the same lattice. Unknown schemata fall back to the raw name.
SCHEMA_LABELS: dict[str, tuple[str, str]] = {
    "Thing": ("Thing", "Things"),
    "LegalEntity": ("Legal entity", "Legal entities"),
    "Person": ("Person", "People"),
    "Company": ("Company", "Companies"),
    "Organization": ("Organization", "Organizations"),
    "PublicBody": ("Public body", "Public bodies"),
    "Address": ("Address", "Addresses"),
    "Vessel": ("Vessel", "Vessels"),
    "Vehicle": ("Vehicle", "Vehicles"),
    "Security": ("Security", "Securities"),
    "Position": ("Position", "Positions"),
    "Sanction": ("Sanction", "Sanctions"),
    "Occupancy": ("Occupancy", "Occupancies"),
    "Ownership": ("Ownership", "Ownerships"),
    "Directorship": ("Directorship", "Directorships"),
    "Family": ("Family", "Families"),
    "Associate": ("Associate", "Associates"),
    "UnknownLink": ("Other link", "Other links"),
    "Membership": ("Membership", "Memberships"),
}

# ISO-3166 alpha-2 captions for the codes the test corpus and exhibits
# use; the reference's ``registry.country.caption`` falls back to the
# raw code for anything unregistered, and so does ``country_caption``.
COUNTRY_CAPTIONS: dict[str, str] = {
    "ar": "Argentina", "au": "Australia", "br": "Brazil", "ca": "Canada",
    "ch": "Switzerland", "cn": "China", "cu": "Cuba", "de": "Germany",
    "dz": "Algeria", "eg": "Egypt", "es": "Spain", "et": "Ethiopia",
    "fr": "France", "gb": "United Kingdom", "id": "Indonesia",
    "in": "India", "ir": "Iran", "iq": "Iraq", "it": "Italy",
    "jo": "Jordan", "jp": "Japan", "ke": "Kenya", "kp": "North Korea",
    "ma": "Morocco", "mz": "Mozambique", "nl": "Netherlands",
    "pe": "Peru", "ro": "Romania", "ru": "Russia", "sa": "Saudi Arabia",
    "su": "Soviet Union", "sy": "Syria", "ua": "Ukraine",
    "us": "United States", "vn": "Vietnam",
}


def subtree_schemata(name: str) -> list[str]:
    """All schema names that are (or descend from) ``name`` in the
    lattice — the column-side form of the reference's
    ``schema.is_a(name)``. Sorted for deterministic ``isin`` lists."""
    return sorted(
        n
        for n, parents in SCHEMA_PARENTS.items()
        if n == name or name in parents
    )


def schema_label(name: str) -> tuple[str, str]:
    """(label, plural) for a schema name, falling back to the raw name."""
    return SCHEMA_LABELS.get(name, (name, name))


def country_caption(code: str) -> str:
    """Country display caption, falling back to the raw code (the
    reference's ``registry.country.caption`` contract)."""
    return COUNTRY_CAPTIONS.get(code, code)


#: country NAME → ISO alpha-2: the compat stand-in for the reference's
#: ``registry.country.clean`` (a full rigour-backed names database).
#: Reverse of COUNTRY_CAPTIONS plus common long-form/synonym spellings;
#: names outside the table resolve to None. Shared by the driver helper
#: (``helpers.make_address``) and the column factory
#: (``functions/addresses.py``) so both routes hash identical ids.
COUNTRY_NAME_TO_CODE: dict[str, str] = {
    **{name.lower(): code for code, name in COUNTRY_CAPTIONS.items()},
    "united states of america": "us", "usa": "us", "u.s.a.": "us",
    "u.s.": "us", "america": "us",
    "united kingdom of great britain and northern ireland": "gb",
    "great britain": "gb", "uk": "gb", "england": "gb",
    "russian federation": "ru", "soviet union": "su", "ussr": "su",
    "people's republic of china": "cn", "prc": "cn",
    "republic of korea": "kr", "south korea": "kr", "korea": "kr",
    "democratic people's republic of korea": "kp",
    "islamic republic of iran": "ir",
    "syrian arab republic": "sy",
    "republic of mozambique": "mz",
    "kingdom of saudi arabia": "sa",
    "federal republic of germany": "de",
    "republic of india": "in",
    "socialist republic of vietnam": "vn", "viet nam": "vn",
    "arab republic of egypt": "eg",
    "united arab emirates": "ae", "uae": "ae",
    "czech republic": "cz", "czechia": "cz",
    "netherlands (the)": "nl", "holland": "nl",
    "turkey": "tr", "türkiye": "tr",
}


def clean_country_code(text: "str | None") -> "str | None":
    """Country name or code → ISO alpha-2 (the reference's
    ``registry.country.clean`` contract over the compat name table);
    None when the value does not resolve."""
    if text is None:
        return None
    lowered = text.strip().lower()
    if not lowered:
        return None
    if len(lowered) == 2 and lowered.isalpha():
        return lowered
    return COUNTRY_NAME_TO_CODE.get(lowered)


# rank = depth in the lattice; any widening chain is monotone in rank, so
# the common schema of a statement bag is argmax(rank). Interval schemata
# and edges sit outside the LegalEntity chain and never widen.
SCHEMA_SPECIFICITY: dict[str, int] = {
    name: len(parents) + 1 for name, parents in SCHEMA_PARENTS.items()
}

# Edge schema registry: schema -> (source_prop, target_prop, directed),
# mirroring zavod/zavod/integration/edges.py:78-110.
EDGE_SCHEMATA: dict[str, tuple[str, str, bool]] = {
    "Ownership": ("owner", "asset", True),
    "Directorship": ("director", "organization", True),
    "Membership": ("member", "organization", True),
    "Family": ("person", "relative", False),
    "Associate": ("person", "associate", False),
    "UnknownLink": ("subject", "object", False),
    # round 7: the remaining followthemoney edge schemata the reference's
    # graph analyzers traverse (SANCTION_ADJACENCY_EDGES in
    # datasets/_analysis/ann_graph_topics/analyzer.py includes
    # Employment/Succession) — public FtM model facts
    "Employment": ("employer", "employee", True),
    "Succession": ("predecessor", "successor", True),
    "Representation": ("agent", "client", True),
    "Occupancy": ("holder", "post", True),
}

# Entity-typed properties (the graph edges of the data model): prop -> range
ENTITY_PROPS: dict[str, str] = {
    "owner": "LegalEntity",
    "asset": "Thing",
    "director": "LegalEntity",
    "organization": "Organization",
    "member": "LegalEntity",
    "person": "Person",
    "relative": "Person",
    "associate": "Person",
    "subject": "Thing",
    "object": "Thing",
    "addressEntity": "Address",
    "familyPerson": "Person",
    "familyRelative": "Person",
    "employer": "LegalEntity",
    "employee": "Person",
    "predecessor": "LegalEntity",
    "successor": "LegalEntity",
    "agent": "LegalEntity",
    "client": "Thing",
    "holder": "Person",
    "post": "Position",
    # non-edge entity references the graph analyzers traverse:
    # Sanction.entity and Security.issuer (public FtM model facts;
    # datasets/_analysis/ann_graph_topics/analyzer.py walks both)
    "entity": "Thing",
    "issuer": "LegalEntity",
}


class PropertyType:
    """One FtM property-type registry entry (``followthemoney.types`` —
    analyzers pass ``registry.topic`` etc. into
    ``EntityProxy.get_type_values``). The engine's registry is this
    module, so the singletons live here and ``from
    opensanctions_spark.model import registry`` is the import-swap home
    for ``from followthemoney import registry``."""

    __slots__ = ("name",)

    def __init__(self, name: str) -> None:
        self.name = name

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<PropertyType({self.name})>"


#: property-type → the props of that type in the engine's compact model
#: (public FtM model facts; consumed by ``Entity.get_type_values`` —
#: reference call sites: zavod/zavod/exporters/simplecsv.py:69-104,
#: names.py:19, integration/logic.py:25-78, and
#: datasets/_analysis/ann_graph_topics/analyzer.py:332).
TYPE_PROPS: dict[str, tuple[str, ...]] = {
    "topic": ("topics",),
    "country": ("country", "jurisdiction", "mainCountry", "nationality", "citizenship"),
    "name": ("name", "alias", "previousName", "weakAlias"),
    "identifier": (
        "idNumber", "passportNumber", "taxNumber", "registrationNumber",
        "vatCode", "innCode", "ogrnCode", "leiCode", "swiftBic",
        "imoNumber", "isin", "wikidataId",
    ),
    "phone": ("phone",),
    "email": ("email",),
    "date": (
        "date", "birthDate", "deathDate", "startDate", "endDate",
        "incorporationDate", "dissolutionDate", "listingDate", "modifiedAt",
    ),
    "entity": tuple(ENTITY_PROPS),
}

#: props excluded from ``get_type_values(..., matchable=True)`` — the FtM
#: model marks these matchable: false (weak aliases don't feed matching)
NON_MATCHABLE_PROPS: frozenset[str] = frozenset({"weakAlias"})

#: the registry singletons analyzer/exporter call sites pass around
topic = PropertyType("topic")
country = PropertyType("country")
name = PropertyType("name")
identifier = PropertyType("identifier")
phone = PropertyType("phone")
email = PropertyType("email")
date = PropertyType("date")
entity = PropertyType("entity")

#: per-schema caption property order (``followthemoney`` schema
#: ``caption:`` lists — EntityProxy.caption takes the first value of the
#: first caption prop with values, falling back to the schema label).
#: Schemata not listed use the generic (name, alias, title) order.
SCHEMA_CAPTIONS: dict[str, tuple[str, ...]] = {
    "Address": ("full", "name"),
    "Security": ("name", "isin"),
    "Position": ("name",),
}

# Topics that flip the derived `target` flag (zavod/zavod/entity.py:164-167:
# target iff topics ∩ registry.topic.RISKS ≠ ∅).
RISK_TOPICS: list[str] = [
    "sanction",
    "sanction.linked",
    "sanction.counter",
    "crime",
    "crime.fraud",
    "crime.terror",
    "debarment",
    "poi",
    "wanted",
    "export.control",
    "export.risk",
    "reg.action",
    "reg.warn",
]

# property -> max length (zavod/zavod/runtime/cleaning.py:137-146 analogue)
PROP_MAX_LENGTH: dict[str, int] = {
    "name": 384,
    "notes": 4000,
    "address": 500,
}


def common_schema_rank_column(schema_col: Column) -> Column:
    """Map a schema-name column to its lattice specificity rank.

    Used by the statement→entity assembly: ``max_by(schema, rank)`` gives
    the most-specific (common descendant) schema without a Python UDF.
    Unknown schemata rank 0 so they never win over registered ones.
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in SCHEMA_SPECIFICITY.items() for x in kv]
    )
    return F.coalesce(mapping[schema_col], F.lit(0))
