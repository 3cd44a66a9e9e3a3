"""Interactive dedupe review loop — the ``zavod dedupe`` terminal UI
analogue (reference ``zavod/zavod/cli/dedupe.py:72-84``, which launches
nomenklatura's curses review app over the resolver + store).

The engine's decision store is a decisions DataFrame and the entity
context is the assembled-entities frame, so the loop is: pop the best
UNSURE candidates (``review_queue`` — the TUI's pop order), render both
entities' display card, read one keystroke-style command per pair from
the input stream, and bulk-apply the session's judgements on exit
(``apply_judgements`` — one broadcast join, not one plan layer per
decision). Streams are injected so the loop is scriptable and testable;
the CLI verb wires stdin/stdout.

Commands (the reference app's verbs):
  p / y   POSITIVE (same entity)
  n       NEGATIVE (different entities)
  u / s   keep UNSURE, skip to the next pair
  q       quit (judgements so far are still applied)
"""

from __future__ import annotations

from typing import IO, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.plans.xref import apply_judgements, review_queue

_COMMANDS = {
    "p": "POSITIVE",
    "y": "POSITIVE",
    "n": "NEGATIVE",
    "u": None,
    "s": None,
}

#: properties rendered on an entity's review card, in display order
_CARD_PROPS = ["name", "alias", "country", "birthDate", "registrationNumber"]


def _entity_cards(
    entities: DataFrame | None, ids: list[str]
) -> dict[str, dict[str, Any]]:
    """One driver-side display card per entity id — fetched in a single
    filtered collect for the whole review page (bounded by the page
    size, never by the corpus)."""
    if entities is None or not ids:
        return {}
    rows = (
        entities.filter(F.col("canonical_id").isin(ids))
        .select("canonical_id", "schema", "properties")
        .collect()
    )
    cards: dict[str, dict[str, Any]] = {}
    for r in rows:
        props = r["properties"] or {}
        cards[r["canonical_id"]] = {
            "schema": r["schema"],
            **{p: list(props.get(p, [])) for p in _CARD_PROPS if props.get(p)},
        }
    return cards


def _render_pair(
    out: IO[str],
    idx: int,
    total: int,
    row: Any,
    cards: dict[str, dict[str, Any]],
) -> None:
    out.write(
        f"\n[{idx}/{total}] score {row['score']:.3f}  "
        f"{row['left_id']}  <->  {row['right_id']}\n"
    )
    for side in ("left_id", "right_id"):
        card = cards.get(row[side])
        if card is None:
            out.write(f"  {row[side]}: (no entity card)\n")
            continue
        out.write(f"  {row[side]} [{card['schema']}]\n")
        for prop in _CARD_PROPS:
            if prop in card:
                out.write(f"    {prop}: {'; '.join(card[prop])}\n")
    out.write("  [p]ositive  [n]egative  [u]nsure/skip  [q]uit > ")
    out.flush()


def dedupe_review_loop(
    decisions: DataFrame,
    entities: DataFrame | None,
    in_stream: IO[str],
    out_stream: IO[str],
    limit: int = 25,
) -> tuple[DataFrame, list[tuple[str, str, str]]]:
    """Run one interactive review page; returns (updated decisions,
    session judgements). The updated frame is decisions ∪ judgements —
    the caller persists it (the CLI writes parquet)."""
    page = review_queue(decisions).limit(limit).collect()
    ids = sorted({r["left_id"] for r in page} | {r["right_id"] for r in page})
    cards = _entity_cards(entities, ids)
    judgements: list[tuple[str, str, str]] = []
    for idx, row in enumerate(page, 1):
        _render_pair(out_stream, idx, len(page), row, cards)
        line = in_stream.readline()
        if not line:  # EOF = quit
            break
        cmd = line.strip().lower()[:1]
        if cmd == "q":
            break
        verdict = _COMMANDS.get(cmd)
        if verdict is None:
            continue  # unsure / skip / unknown input
        judgements.append((row["left_id"], row["right_id"], verdict))
    out_stream.write(
        f"\n{len(judgements)} judgement(s) recorded this session\n"
    )
    return apply_judgements(decisions, judgements), judgements
