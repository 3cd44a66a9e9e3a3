"""Headless ``zavod wikidata-reconcile`` analogue (reference
``zavod/zavod/cli/dedupe.py:86-168``): match a dataset's Person
entities against Wikidata search candidates for human review, record
confirmed matches as resolver judgements, and emit a QuickStatements
batch the operator runs in the QS web UI.

The reference's review surface is nomenklatura's curses app
(``nomenklatura.tui.reconcile_ui`` — an external dependency, like the
dedupe TUI); this module is the engine's stream-driven loop over the
same data flow: Store view → per-person candidate search through the
wikidata client seam → ranked review cards → p/n/u/c/q verbs →
(judgements, QuickStatements commands).

Client protocol (extends ``shed/wikidata/client.py``): in addition to
``fetch_item``, the reconciler calls
``client.search_entities(text, limit) -> [(qid, label, description)]``
— the public ``wbsearchentities`` API shape.

QuickStatements output is the PUBLIC v1 text format (tab-separated
tokens; ``CREATE`` + ``LAST`` rows for new items; dates as
``+YYYY-MM-DDT00:00:00Z/precision``): confirmed matches get a
described-at-URL (P973) citation of the dataset when a source URL is
given; no-match persons the reviewer marks ``create`` get a CREATE
block with label, instance-of-human (P31 Q5) and birth date when
known. The exact enrichment payload of nomenklatura's serializer is
not re-implemented — it lives outside the reference repo — but the
format is interoperable with the same QS web UI.
"""

from __future__ import annotations

from typing import IO, Any

from opensanctions_spark.crawler import Entity

#: review verbs: digits pick a candidate; these do the rest
_HELP = "[1-9] confirm candidate  [n]o-match  [c]reate  [u]/[s]kip  [q]uit"


def qs_date(iso: str) -> str:
    """ISO date (possibly a year/month prefix) → QS time literal with
    the matching precision (9 year, 10 month, 11 day)."""
    precision = {4: 9, 7: 10, 10: 11}.get(len(iso), 11)
    padded = iso + "-01-01"[len(iso) - 4:] if len(iso) < 10 else iso[:10]
    return f"+{padded}T00:00:00Z/{precision}"


def quickstatements_match(
    qid: str, source_url: str | None, retrieved: str | None
) -> list[list[str]]:
    """Commands for a CONFIRMED match: cite the dataset on the matched
    item (P973 described-at-URL, with retrieved-on qualifier P813 when
    known)."""
    if source_url is None:
        return []
    cmd = [qid, "P973", f'"{source_url}"']
    if retrieved:
        cmd += ["P813", qs_date(retrieved)]
    return [cmd]


def quickstatements_create(
    entity: Entity, source_url: str | None = None
) -> list[list[str]]:
    """CREATE block for an unmatched person: label, human, birth date,
    dataset citation."""
    commands: list[list[str]] = [["CREATE"]]
    name = entity.first("name")
    if name:
        commands.append(["LAST", "Len", f'"{name}"'])
    commands.append(["LAST", "P31", "Q5"])
    birth = entity.first("birthDate")
    if birth:
        commands.append(["LAST", "P569", qs_date(birth)])
    if source_url:
        commands.append(["LAST", "P973", f'"{source_url}"'])
    return commands


def serialize(commands: list[list[str]]) -> str:
    """QuickStatements v1: one tab-separated command per line."""
    return "\n".join("\t".join(cmd) for cmd in commands)


def _rank(entity: Entity, candidates: list[tuple[str, str, str]]):
    """Exact label match first, then case-insensitive, then API order —
    the display ranking (the reference ranks with a nomenklatura
    algorithm; callers wanting model scores re-order before display)."""
    names = set(entity.get("name")) | set(entity.get("alias"))
    lowered = {n.lower() for n in names}

    def key(c, idx):
        _qid, label, _desc = c
        return (
            0 if label in names else 1 if label.lower() in lowered else 2,
            idx,
        )

    return [c for _, c in sorted(
        ((key(c, i), c) for i, c in enumerate(candidates)),
        key=lambda t: t[0],
    )]


def reconcile_loop(
    persons: list[Entity],
    client: Any,
    in_stream: IO[str],
    out_stream: IO[str],
    source_url: str | None = None,
    retrieved: str | None = None,
    search_limit: int = 5,
) -> tuple[list[tuple[str, str, str]], list[list[str]]]:
    """One review pass over ``persons``; returns (judgements, commands).

    judgements are (entity_id, qid, POSITIVE|NEGATIVE) rows — feed them
    to ``plans.xref.apply_judgements`` / the decisions frame exactly
    like dedupe verdicts; commands serialize with :func:`serialize`.
    """
    judgements: list[tuple[str, str, str]] = []
    commands: list[list[str]] = []
    for entity in persons:
        if not entity.schema.is_a("Person") or entity.id is None:
            continue
        name = entity.first("name")
        if not name:
            continue
        raw = list(client.search_entities(name, limit=search_limit) or [])
        candidates = _rank(entity, raw)
        out_stream.write(f"\n{entity.id}: {name}")
        birth = entity.first("birthDate")
        if birth:
            out_stream.write(f" (born {birth})")
        out_stream.write("\n")
        for i, (qid, label, desc) in enumerate(candidates, 1):
            out_stream.write(f"  [{i}] {qid}  {label} — {desc}\n")
        if not candidates:
            out_stream.write("  (no candidates)\n")
        out_stream.write(f"  {_HELP} > ")
        out_stream.flush()
        line = in_stream.readline()
        if not line:
            break
        cmd = line.strip().lower()
        if cmd == "q":
            break
        if cmd in ("u", "s", ""):
            continue
        if cmd == "n":
            for qid, _l, _d in candidates:
                judgements.append((entity.id, qid, "NEGATIVE"))
            continue
        if cmd == "c":
            for qid, _l, _d in candidates:
                judgements.append((entity.id, qid, "NEGATIVE"))
            commands.extend(quickstatements_create(entity, source_url))
            continue
        if cmd.isdigit() and 1 <= int(cmd) <= len(candidates):
            qid = candidates[int(cmd) - 1][0]
            judgements.append((entity.id, qid, "POSITIVE"))
            commands.extend(
                quickstatements_match(qid, source_url, retrieved)
            )
            continue
        out_stream.write("  ? unrecognized — skipped\n")
    out_stream.write(
        f"\n{len(judgements)} judgement(s), {len(commands)} command(s)\n"
    )
    return judgements, commands
