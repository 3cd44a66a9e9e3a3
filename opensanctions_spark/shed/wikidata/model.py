"""Minimal Wikidata value model for the compat shed logic: the subset
of the public ``nomenklatura.wikidata`` surface the traversals consume.
A registered real client supplies its own objects honouring the same
protocol; these are for fixture clients and compat-internal returns."""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class WdText:
    """LangText-shaped value: text + lang + the source item id as
    original_value provenance."""

    text: str | None
    lang: str | None = None
    original: str | None = None

    def apply(self, entity: Any, prop: str, clean: Any = None) -> None:
        value = self.text
        if value is not None and clean is not None:
            value = clean(value)
        entity.add(prop, value, lang=self.lang, original_value=self.original)


def clean_wikidata_name(name: str) -> str:
    """nomenklatura ``clean_wikidata_name`` behaviour: drop the trailing
    parenthetical disambiguator ("Jane Roe (politician)" → "Jane Roe")."""
    return re.sub(r"\s*\([^)]*\)\s*$", "", name).strip()


@dataclass
class WdRef:
    """One reference block: property id → snaks (WdClaim-shaped)."""

    snaks: dict

    def get(self, prop: str) -> list:
        return list(self.snaks.get(prop, []))


@dataclass
class WdClaim:
    """One statement: property id, target qid or text value, ended flag
    (the reference reads end-time qualifiers; fixture clients set it),
    plus qualifiers (property → claims) and references."""

    property: str
    qid: str | None = None
    value: str | None = None
    lang: str | None = None
    ended: bool = False
    qualifiers: dict = None  # type: ignore[assignment]
    references: list = None  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.qualifiers is None:
            self.qualifiers = {}
        if self.references is None:
            self.references = []

    @property
    def text(self) -> WdText:
        return WdText(self.value, self.lang)

    def is_ended(self) -> bool:
        return self.ended

    def get_qualifier(self, prop: str) -> list:
        return list(self.qualifiers.get(prop, []))


@dataclass
class WdItem:
    """One item: id, type closure (P31/P279*), claims, label."""

    id: str
    types: set
    claims: list
    label: WdText | None = None
