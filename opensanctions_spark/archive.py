"""Compat ``zavod.archive`` import home — the path-layout surface that
analyzer datasets import directly (``from zavod.archive import
dataset_data_path``; reference ``zavod/zavod/archive/__init__.py:125-160``).

The engine's *versioned statement archive* (write/read/backfill/time
travel/gc/compaction) lives in :mod:`opensanctions_spark.sources.archive`
(``StatementArchive``) and is re-exported here; this module adds the
driver-local working-directory conventions the reference keeps in the same
package.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from opensanctions_spark import settings
from opensanctions_spark.sources.archive import (  # noqa: F401
    StatementArchive,
    new_version_id,
)

DATASETS = "datasets"


def datasets_path() -> Path:
    """Root of all dataset working dirs (ref archive/__init__.py:125-126)."""
    return settings.DATA_PATH / DATASETS


def dataset_data_path(dataset_name: str) -> Path:
    """Working-data dir for one dataset, created on first use
    (ref archive/__init__.py:131-134)."""
    path = datasets_path() / dataset_name
    path.mkdir(parents=True, exist_ok=True)
    return path.resolve()


def dataset_resource_path(dataset_name: str, resource: str) -> Path:
    """A named resource inside the dataset dir (ref :150-152)."""
    return dataset_data_path(dataset_name).joinpath(resource)


def dataset_state_path(dataset_name: str) -> Path:
    """Temporary processing artifacts dir (ref :136-142)."""
    path = dataset_data_path(dataset_name) / "_state"
    path.mkdir(parents=True, exist_ok=True)
    return path.resolve()


def clear_data_path(dataset_name: str) -> None:
    """Delete all recorded working data for a dataset (ref :145-147)."""
    shutil.rmtree(datasets_path() / dataset_name, ignore_errors=True)
