"""Publish a dataset run: release-copy the run's artifacts and promote
the version (``zavod/zavod/publish.py:63-95`` semantics) through a
pluggable object-store backend (``sources/objectstore.py`` — filesystem
by default, ``memory://`` fake in tests, ``s3a://``/``gs://`` via
``register_backend`` on a deployment).

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
    store_base: str | None = None,
) -> PublishResult:
    """Archive the run's artifacts under the version prefix, server-side
    copy the listed resources to the release path(s), and promote the
    version to ``last_successful`` so backfill reads resolve it.

    ``store_base`` selects the object-store backend
    (``sources/objectstore.py``): by default the archive's own base dir
    (filesystem — byte-identical to the historical layout); an
    ``s3a://…`` / ``gs://…`` URI with a registered client, or
    ``memory://name`` in tests, routes the upload + the ``republish``
    server-side copies through that store — exactly the reference's
    backend seam (``zavod/zavod/publish.py:63-95``,
    ``zavod/zavod/archive/backend.py``)."""
    from opensanctions_spark.sources.objectstore import get_backend

    version = version or archive.latest(dataset)
    if version is None:
        raise FileNotFoundError(f"no versions for dataset {dataset}")
    if version not in archive.versions(dataset):
        raise ValueError(f"unknown version for {dataset}: {version}")
    backend = get_backend(store_base or archive.base_dir)

    # 1. every run file → the immutable version prefix (the
    # /artifacts/{dataset}/{version}/ upload)
    for name in sorted(os.listdir(artifacts_dir)):
        backend.get_object(f"{dataset}/{version}/{name}").publish(
            os.path.join(artifacts_dir, name)
        )

    # 2. listed resources → /datasets/{release}/ (+ /datasets/latest/) —
    # SERVER-SIDE copies from the version prefix: the bytes never
    # round-trip through the publisher
    listed = [
        n for n in _listed_resources(artifacts_dir)
        if backend.get_object(f"{dataset}/{version}/{n}").exists()
    ]
    releases = [release]
    if republish_to_latest and release != "latest":
        releases.append("latest")
    for rel in releases:
        for name in listed:
            backend.get_object(f"datasets/{rel}/{dataset}/{name}").republish(
                f"{dataset}/{version}/{name}"
            )

    # 3. stale-latest scan: files a previous publish left behind that this
    # run no longer ships (warn, never delete — the reference's rationale:
    # deleting from the bucket is scary). Only meaningful when THIS publish
    # actually refreshed datasets/latest — a pinned-release publish that
    # skipped latest must not flag latest's intentionally-older contents.
    stale = []
    if "latest" in releases:
        stale = sorted(
            set(backend.list_children(f"datasets/latest/{dataset}")) - set(listed)
        )

    # 4. promote: backfill reads now resolve this version
    archive.mark_successful(dataset, version)
    return PublishResult(
        dataset=dataset,
        version=version,
        release=release,
        published=listed,
        stale_latest=stale,
    )
