"""Compat ``zavod.shed.internal_data``: the non-published source-data
store. The reference reads a private cloud bucket; here the store is a
registered object-store seam — ``register_internal_data_store(store)``
with the engine's ObjectStore protocol (``sources/objectstore.py``:
get/put/list) — so the same crawler code runs against any backend a
deployment wires (a local directory store ships with the engine).
"""

from __future__ import annotations

import os
from typing import Any, Iterator

_STORE: Any = None


def register_internal_data_store(store: Any) -> None:
    global _STORE
    _STORE = store


def _require_store() -> Any:
    if _STORE is None:
        raise NotImplementedError(
            "no internal-data store registered: wire one with "
            "register_internal_data_store(store) — e.g. the engine's "
            "FileSystemObject store (sources/objectstore.py)"
        )
    return _STORE


def fetch_internal_data(key: str, path: Any) -> None:
    """internal_data.py:10-19: download ``key`` to ``path`` unless it
    already exists; missing keys raise FileNotFoundError."""
    if os.path.exists(str(path)):
        return
    store = _require_store()
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    obj = store.get_object(key)
    if not obj.exists():
        raise FileNotFoundError(key)
    obj.backfill(str(path))


def list_internal_data(prefix: str) -> Iterator[str]:
    """internal_data.py:22-26."""
    store = _require_store()
    yield from store.list_objects(prefix)
