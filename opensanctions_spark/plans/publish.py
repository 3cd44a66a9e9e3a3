"""Publish a dataset run: release-copy the run's artifacts and promote
the version (``zavod/zavod/publish.py:63-95`` semantics, filesystem
backend).

The reference uploads every run file to the immutable
``/artifacts/{dataset}/{version}/`` prefix, then server-side-copies the
LISTED resources (plus ``index.json``) to ``/datasets/{RELEASE}/{dataset}/``
and ``/datasets/latest/{dataset}/`` for stable-URL consumers, warning about
stale files left behind in ``latest``
(``zavod/zavod/publish.py:96-112``). This module renders the same
lifecycle onto the archive's directory layout:

- artifacts → ``{base}/{dataset}/{version}/`` (alongside
  ``statements.parquet`` — the canonical immutable copy),
- listed resources → ``{base}/datasets/{release}/{dataset}/`` and
  ``{base}/datasets/latest/{dataset}/``,
- the dataset's ``versions.json`` backfill pointer (``last_successful``)
  flips to the published version — ``StatementArchive.read`` with no
  version then resolves the release.

On a real deployment ``base`` is an object-store prefix and the copies
are server-side; the orchestration below is identical.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from opensanctions_spark.sources.archive import StatementArchive

#: Resources archived with the run but not listed in dataset metadata
#: (``zavod/zavod/archive/__init__.py:107-110`` UNLISTED_RESOURCES).
UNLISTED_RESOURCES = ["statistics.json", "delta.json"]

#: Non-resource run files that are archived but never release-copied
#: (``zavod/zavod/archive/__init__.py:112-121`` EXTRA_ARTIFACTS analogue).
EXTRA_ARTIFACTS = ["issues.json", "run.json", "resources.json",
                   "statistics.json", "delta.json", "delta_index.json"]


@dataclass
class PublishResult:
    dataset: str
    version: str
    release: str
    published: list[str] = field(default_factory=list)
    stale_latest: list[str] = field(default_factory=list)


def _copy(src: str, dst: str) -> None:
    """Copy a run artifact — Spark sinks are directories, metadata files
    are plain files; both copy whole."""
    if os.path.isdir(src):
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    else:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)


def _listed_resources(artifacts_dir: str) -> list[str]:
    """The release-copy set: resources listed in ``resources.json`` minus
    the unlisted ones, plus ``index.json`` (``zavod/zavod/publish.py:
    71-84``). Falls back to every artifact when no manifest exists."""
    manifest = os.path.join(artifacts_dir, "resources.json")
    try:
        with open(manifest) as fh:
            entries = json.load(fh).get("resources", [])
    except FileNotFoundError:
        entries = [
            {"name": n} for n in sorted(os.listdir(artifacts_dir))
            if n not in EXTRA_ARTIFACTS
        ]
    names = []
    for e in entries:
        name = e["name"] if isinstance(e, dict) else str(e)
        if name not in UNLISTED_RESOURCES:
            names.append(name)
    names.append("index.json")
    return sorted(set(names))


def publish_dataset(
    archive: StatementArchive,
    dataset: str,
    artifacts_dir: str,
    version: str | None = None,
    release: str = "latest",
    republish_to_latest: bool = True,
) -> PublishResult:
    """Archive the run's artifacts under the version directory, copy the
    listed resources to the release path(s), and promote the version to
    ``last_successful`` so backfill reads resolve it."""
    version = version or archive.latest(dataset)
    if version is None:
        raise FileNotFoundError(f"no versions for dataset {dataset}")
    if version not in archive.versions(dataset):
        raise ValueError(f"unknown version for {dataset}: {version}")

    # 1. every run file → the immutable version directory (the
    # /artifacts/{dataset}/{version}/ upload)
    version_dir = os.path.dirname(archive.version_path(dataset, version))
    for name in sorted(os.listdir(artifacts_dir)):
        _copy(os.path.join(artifacts_dir, name), os.path.join(version_dir, name))

    # 2. listed resources → /datasets/{release}/ (+ /datasets/latest/)
    listed = [
        n for n in _listed_resources(artifacts_dir)
        if os.path.exists(os.path.join(version_dir, n))
    ]
    release_dirs = [os.path.join(archive.base_dir, "datasets", release, dataset)]
    if republish_to_latest and release != "latest":
        release_dirs.append(
            os.path.join(archive.base_dir, "datasets", "latest", dataset)
        )
    for rdir in release_dirs:
        os.makedirs(rdir, exist_ok=True)
        for name in listed:
            _copy(os.path.join(version_dir, name), os.path.join(rdir, name))

    # 3. stale-latest scan: files a previous publish left behind that this
    # run no longer ships (warn, never delete — the reference's rationale:
    # deleting from the bucket is scary). Only meaningful when THIS publish
    # actually refreshed datasets/latest — a pinned-release publish that
    # skipped latest must not flag latest's intentionally-older contents.
    latest_dir = os.path.join(archive.base_dir, "datasets", "latest", dataset)
    stale = []
    if latest_dir in release_dirs and os.path.isdir(latest_dir):
        stale = sorted(set(os.listdir(latest_dir)) - set(listed))

    # 4. promote: backfill reads now resolve this version
    archive.mark_successful(dataset, version)
    return PublishResult(
        dataset=dataset,
        version=version,
        release=release,
        published=listed,
        stale_latest=stale,
    )
