"""Compat ``zavod.meta`` (``zavod/zavod/meta/__init__.py`` subset): the
dataset-config model crawlers and analyzers read. ``Dataset`` here is
the crawl-facing view over the engine's ``plans.run.DatasetConfig``
(which drives run/validate/export); both load from the same YAML."""

from __future__ import annotations

import os
from typing import Any


class Dataset:
    """Thin dataset-config holder: attribute access over the YAML
    mapping (``dataset.name``, ``.prefix``, ``.inputs``, ``.lookups``,
    plus ``.metadata`` carrying everything for index.json)."""

    def __init__(self, data: dict[str, Any]) -> None:
        self.metadata = dict(data)
        self.name: str = data.get("name", "")
        self.prefix: str | None = data.get("prefix")
        self.inputs: list[str] = list(data.get("inputs", []) or [])
        self.lookups: dict[str, Any] = dict(data.get("lookups", {}) or {})

    def __getattr__(self, key: str) -> Any:
        meta = self.__dict__.get("metadata", {})
        if key in meta:
            value = meta[key]
            # nested YAML mappings read as attributes too (ds.data.url)
            if isinstance(value, dict):
                return _AttrMap(value)
            return value
        raise AttributeError(key)

    def to_run_config(self):
        """The engine-side config for plans.run.run_dataset."""
        from opensanctions_spark.plans.run import DatasetConfig

        data = dict(self.metadata)
        data.setdefault("name", self.name)
        return DatasetConfig.from_dict(data)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Dataset {self.name!r}>"


class _AttrMap(dict):
    """Attribute access over a YAML mapping (``ds.data.url``); missing
    keys read as None like the reference's optional-model fields."""

    def __getattr__(self, key: str) -> Any:
        value = self.get(key)
        if isinstance(value, dict):
            return _AttrMap(value)
        return value


class Catalog:
    """In-memory dataset registry (``get_catalog`` analogue): datasets
    register by name; ``require`` fails loudly on unknown names."""

    def __init__(self) -> None:
        self.datasets: dict[str, Dataset] = {}

    def add(self, dataset: Dataset) -> Dataset:
        self.datasets[dataset.name] = dataset
        return dataset

    def get(self, name: str) -> Dataset | None:
        return self.datasets.get(name)

    def require(self, name: str) -> Dataset:
        ds = self.get(name)
        if ds is None:
            raise LookupError(f"unknown dataset: {name!r}")
        return ds


_CATALOG: Catalog | None = None


def get_catalog() -> Catalog:
    global _CATALOG
    if _CATALOG is None:
        _CATALOG = Catalog()
    return _CATALOG


def load_dataset_from_path(path: str) -> Dataset:
    """Load one dataset YAML into the catalog
    (``zavod/zavod/meta/__init__.py load_dataset_from_path``)."""
    import yaml

    with open(path) as fh:
        data = yaml.safe_load(fh) or {}
    if "name" not in data:
        base = os.path.basename(str(path))
        data["name"] = os.path.splitext(base)[0]
    return get_catalog().add(Dataset(data))


def get_multi_dataset(catalog: Catalog, inputs: list[str]) -> list[Dataset]:
    """Resolve a dataset's ``inputs`` list against the catalog — the
    scope an analyzer reads (collections flatten to members)."""
    out: list[Dataset] = []
    for name in inputs or []:
        ds = catalog.require(name)
        members = (ds.metadata.get("datasets") or []) if ds else []
        if members:
            out.extend(catalog.require(m) for m in members)
        else:
            out.append(ds)
    return out
