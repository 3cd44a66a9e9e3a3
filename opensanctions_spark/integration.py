"""Compat ``zavod.integration`` import home (reference
``zavod/zavod/integration/dedupe.py:32-40``): the dataset → linker entry
point analyzer datasets call before opening a store.

The engine's resolver itself is the distributed connected-components
canonicalization in :mod:`opensanctions_spark.operators.resolve`
(``canonical_map`` / ``incremental_canonical_map``); a :class:`Linker` is
the bounded driver-side view of its output mapping — decisions are
human/threshold curated, so the mapping is small by construction (the
same reason ``apply_canonical`` broadcasts it).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


class Linker:
    """id → canonical-id mapping (``nomenklatura.resolver.Linker`` shape:
    ``get_canonical`` falls back to the id itself, ``get_referents`` is
    the reverse image)."""

    def __init__(self, mapping: dict[str, str] | None = None) -> None:
        self._map: dict[str, str] = dict(mapping or {})

    @classmethod
    def from_dataframe(cls, mapping: "DataFrame") -> "Linker":
        """Build from a (entity_id, canonical_id) mapping DataFrame — the
        output shape of ``operators.resolve.canonical_map``. Identity rows
        are dropped so driver memory is decision-proportional."""
        rows = mapping.select("entity_id", "canonical_id").collect()
        return cls(
            {
                r["entity_id"]: r["canonical_id"]
                for r in rows
                if r["entity_id"] != r["canonical_id"]
            }
        )

    def get_canonical(self, entity_id: str) -> str:
        return self._map.get(entity_id, entity_id)

    def get_referents(self, canonical_id: str) -> set[str]:
        return {e for e, c in self._map.items() if c == canonical_id}

    def __len__(self) -> int:
        return len(self._map)


def get_dataset_linker(
    dataset: Any, mapping: "DataFrame | None" = None
) -> Linker:
    """Resolver linker for a dataset (ref dedupe.py:32-40): identity when
    the dataset opts out of resolution (``model.resolve`` false) or when no
    mapping has been produced; otherwise the driver-side view of the given
    canonical mapping (the engine keeps the mapping as a DataFrame —
    ``__main__.py xref`` writes ``canonical_map.parquet``; pass its read
    here)."""
    resolve = getattr(getattr(dataset, "model", None), "resolve", True)
    if not resolve or mapping is None:
        return Linker({})
    return Linker.from_dataframe(mapping)
