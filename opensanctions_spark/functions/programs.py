"""Sanctions-program registry (``zavod/zavod/stateful/programs.py``).

The reference keeps a curated registry of sanctions regimes — one YAML
per program with a controlled measure vocabulary, a lifecycle status,
an issuer reference and target territories — loaded once and joined to
designations by program key. Same model here, as plain dataclasses plus
a Spark dimension frame:

- ``load_programs`` mirrors the reference's load-time validation
  (key matches filename, unique keys, measures from the vocabulary,
  status from the lifecycle vocabulary, issuer resolved from the issuer
  registry — ``programs.py:194-248``);
- ``programs_df`` renders the registry as a small DataFrame for
  broadcast joins against A4 program facets — the registry is a few
  hundred rows at most (the reference reads them all eagerly for the
  same reason), so it is ALWAYS the broadcast side.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: the controlled measure vocabulary (``programs.py:12-84``)
MEASURES = (
    "Aid suspension",
    "Arms embargo",
    "Arms restrictions",
    "Asset freeze",
    "Debarment",
    "Export control",
    "Financial restrictions",
    "Import restrictions",
    "Investment ban",
    "Services ban",
    "Prohibition to satisfy claims",
    "Sectoral sanctions",
    "Transportation restrictions",
    "Travel ban",
)

#: regime lifecycle (``programs.py:87-103``): in force / wound down with
#: persisting designations / no remaining legal effect
STATUSES = ("active", "legacy", "ended")


@dataclass
class Issuer:
    """Issuing authority (``programs.py:100-118``)."""

    name: str
    acronym: str | None = None
    organisation: str | None = None
    territory: str | None = None


@dataclass
class Program:
    """One sanctions regime (``programs.py:120-188``)."""

    key: str
    title: str
    url: str | None = None
    summary: str | None = None
    dataset: str | None = None
    issuer: Issuer | None = None
    aliases: list[str] = field(default_factory=list)
    target_territories: list[str] = field(default_factory=list)
    measures: list[str] = field(default_factory=list)
    status: str = "active"


def _parse_program(key: str, data: dict, issuers: dict[str, Issuer]) -> Program:
    data = dict(data)
    if data.get("key") != key:
        raise ValueError(
            f"program key {data.get('key')!r} does not match expected {key!r}"
        )
    issuer_key = data.pop("issuer", None)
    issuer = issuers.get(issuer_key) if issuer_key else None
    program = Program(
        key=key,
        title=data["title"],
        url=data.get("url"),
        summary=data.get("summary"),
        dataset=data.get("dataset"),
        issuer=issuer,
        aliases=list(data.get("aliases", [])),
        target_territories=list(data.get("target_territories", [])),
        measures=list(data.get("measures", [])),
        status=data.get("status", "active"),
    )
    for m in program.measures:
        if m not in MEASURES:
            raise ValueError(f"unknown measure {m!r} in program {key!r}")
    if program.status not in STATUSES:
        raise ValueError(f"unknown status {program.status!r} in program {key!r}")
    return program


def load_programs(
    source: str | dict[str, dict], issuers: dict[str, dict] | None = None
) -> dict[str, Program]:
    """Load the registry — from a directory of ``{key}.yml`` files (the
    reference layout: ``programs/*.yml`` + ``issuers/*.yml``) or from
    already-parsed mappings keyed by program key."""
    issuer_objs: dict[str, Issuer] = {}
    if isinstance(source, str):
        import yaml

        issuer_dir = os.path.join(os.path.dirname(source.rstrip("/")), "issuers")
        if os.path.isdir(issuer_dir):
            for fn in sorted(os.listdir(issuer_dir)):
                if fn.endswith((".yml", ".yaml")):
                    with open(os.path.join(issuer_dir, fn)) as fh:
                        issuer_objs[fn.rsplit(".", 1)[0]] = Issuer(**yaml.safe_load(fh))
        programs: dict[str, Program] = {}
        for fn in sorted(os.listdir(source)):
            if not fn.endswith((".yml", ".yaml")):
                continue
            key = fn.rsplit(".", 1)[0]
            with open(os.path.join(source, fn)) as fh:
                data = yaml.safe_load(fh)
            if not data:
                raise ValueError(f"empty program file: {fn}")
            programs[key] = _parse_program(key, data, issuer_objs)
        return programs
    for k, v in (issuers or {}).items():
        issuer_objs[k] = Issuer(**v)
    return {k: _parse_program(k, v, issuer_objs) for k, v in source.items()}


def programs_df(spark: SparkSession, programs: dict[str, Program]) -> DataFrame:
    """The registry as a broadcast-sized dimension frame: one row per
    program with the issuer flattened — join it to A4 facets /
    designations on ``program_key``."""
    rows = [
        (
            p.key, p.title, p.status, p.dataset,
            p.measures, p.target_territories, p.aliases,
            p.issuer.name if p.issuer else None,
            p.issuer.acronym if p.issuer else None,
            p.issuer.territory if p.issuer else None,
        )
        for p in programs.values()
    ]
    return spark.createDataFrame(
        rows,
        "program_key STRING, title STRING, status STRING, dataset STRING, "
        "measures ARRAY<STRING>, target_territories ARRAY<STRING>, "
        "aliases ARRAY<STRING>, issuer_name STRING, issuer_acronym STRING, "
        "issuer_territory STRING",
    )
