"""Archive object-store backends (the ``zavod/zavod/archive/backend.py``
abstraction, Spark-repo shape).

The reference publishes runs through an ``ArchiveBackend`` /
``ArchiveObject`` pair — filesystem for dev, Google Cloud Storage in
production, where ``republish`` is a SERVER-SIDE copy (the bytes never
round-trip through the publisher; ``backend.py:120-137`` uses
``bucket.copy_blob``). This module renders the same seam for the Spark
engine:

- ``FileSystemBackend`` — objects are files under a root directory; the
  default, byte-identical to the previous direct ``shutil`` publish
  layout (``{root}/{dataset}/{version}/…``, ``{root}/datasets/…``).
- ``MemoryBackend`` — an in-process fake object store for tests: a
  key→bytes dict per bucket URI, with a server-side-copy counter so
  tests can PROVE ``republish`` never re-uploaded bytes.
- ``get_backend(uri)`` — scheme registry. ``s3a://`` / ``s3://`` /
  ``gs://`` are recognized seams whose client libraries are not in this
  container: they raise with the injection point spelled out unless a
  deployment registers a real backend via ``register_backend``. (Spark
  itself reads/writes those URIs natively through Hadoop — only the
  small-file publish/manifest surface needs a client here.)

"Directory" artifacts (Spark sinks like ``delta.json`` are directories
of part files) map onto object stores as key PREFIXES: publish uploads
each file under ``name/relpath``, republish copies every key under the
prefix — exactly how distributed outputs land in real buckets.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Iterator


class ArchiveObject:
    """One named object (``zavod/zavod/archive/backend.py:22-51``)."""

    def __init__(self, backend: "ArchiveBackend", name: str) -> None:
        self.backend = backend
        self.name = name

    def exists(self) -> bool:
        raise NotImplementedError

    def size(self) -> int:
        raise NotImplementedError

    def publish(self, local_path: str) -> None:
        """Upload a local file (or Spark sink directory) to this name."""
        raise NotImplementedError

    def republish(self, source_name: str) -> None:
        """SERVER-SIDE copy from another object of the same backend."""
        raise NotImplementedError

    def backfill(self, dest: str) -> None:
        """Download to a local path."""
        raise NotImplementedError

    def read_bytes(self) -> bytes:
        raise NotImplementedError


class ArchiveBackend:
    def get_object(self, name: str) -> ArchiveObject:
        raise NotImplementedError

    def list_objects(self, prefix: str) -> Iterator[str]:
        """Names of all objects under the prefix."""
        raise NotImplementedError

    def list_children(self, prefix: str) -> list[str]:
        """Immediate child names under a prefix (files and 'directories'),
        the publish stale-scan view."""
        children = set()
        prefix = prefix.rstrip("/") + "/"
        for name in self.list_objects(prefix):
            rest = name[len(prefix):]
            children.add(rest.split("/", 1)[0])
        return sorted(children)


# -- filesystem ------------------------------------------------------------


class FileSystemObject(ArchiveObject):
    def __init__(self, backend: "FileSystemBackend", name: str) -> None:
        super().__init__(backend, name)
        self.path = os.path.join(backend.root, *name.split("/"))

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def size(self) -> int:
        if os.path.isdir(self.path):
            return sum(
                os.path.getsize(os.path.join(d, f))
                for d, _, fs in os.walk(self.path)
                for f in fs
            )
        return os.path.getsize(self.path) if os.path.isfile(self.path) else 0

    def publish(self, local_path: str) -> None:
        if os.path.isdir(local_path):
            if os.path.isdir(self.path):
                shutil.rmtree(self.path)
            shutil.copytree(local_path, self.path)
        else:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            shutil.copy2(local_path, self.path)

    def republish(self, source_name: str) -> None:
        src = FileSystemObject(self.backend, source_name)
        self.publish(src.path)

    def backfill(self, dest: str) -> None:
        # ``dest`` is a LITERAL local path (possibly absolute), not an
        # object name — download this object to it, mirroring
        # MemoryObject.backfill and the reference's backend.backfill.
        if os.path.isdir(self.path):
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            shutil.copytree(self.path, dest)
        else:
            parent = os.path.dirname(dest)
            if parent:
                os.makedirs(parent, exist_ok=True)
            shutil.copy2(self.path, dest)

    def read_bytes(self) -> bytes:
        with open(self.path, "rb") as fh:
            return fh.read()


class FileSystemBackend(ArchiveBackend):
    def __init__(self, root: str) -> None:
        self.root = root

    def get_object(self, name: str) -> FileSystemObject:
        return FileSystemObject(self, name)

    def list_objects(self, prefix: str) -> Iterator[str]:
        base = os.path.join(self.root, *prefix.rstrip("/").split("/"))
        for dirpath, _, files in os.walk(base):
            for f in files:
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, self.root)
                yield rel.replace(os.sep, "/")

    def list_children(self, prefix: str) -> list[str]:
        base = os.path.join(self.root, *prefix.rstrip("/").split("/"))
        try:
            return sorted(os.listdir(base))
        except FileNotFoundError:
            return []


# -- in-memory fake object store ------------------------------------------


class MemoryObject(ArchiveObject):
    def exists(self) -> bool:
        b: MemoryBackend = self.backend  # type: ignore[assignment]
        return self.name in b.blobs or any(
            k.startswith(self.name + "/") for k in b.blobs
        )

    def size(self) -> int:
        b: MemoryBackend = self.backend  # type: ignore[assignment]
        if self.name in b.blobs:
            return len(b.blobs[self.name])
        return sum(
            len(v) for k, v in b.blobs.items() if k.startswith(self.name + "/")
        )

    def publish(self, local_path: str) -> None:
        b: MemoryBackend = self.backend  # type: ignore[assignment]
        b.uploads += 1
        if os.path.isdir(local_path):
            for dirpath, _, files in os.walk(local_path):
                for f in files:
                    full = os.path.join(dirpath, f)
                    rel = os.path.relpath(full, local_path).replace(os.sep, "/")
                    with open(full, "rb") as fh:
                        b.blobs[f"{self.name}/{rel}"] = fh.read()
        else:
            with open(local_path, "rb") as fh:
                b.blobs[self.name] = fh.read()

    def republish(self, source_name: str) -> None:
        """Bucket-internal copy: bytes move inside the dict, the
        ``server_side_copies`` counter proves no upload happened."""
        b: MemoryBackend = self.backend  # type: ignore[assignment]
        copied = False
        if source_name in b.blobs:
            b.blobs[self.name] = b.blobs[source_name]
            copied = True
        prefix = source_name + "/"
        for k in list(b.blobs):
            if k.startswith(prefix):
                b.blobs[self.name + "/" + k[len(prefix):]] = b.blobs[k]
                copied = True
        if not copied:
            raise FileNotFoundError(source_name)
        b.server_side_copies += 1

    def backfill(self, dest: str) -> None:
        b: MemoryBackend = self.backend  # type: ignore[assignment]
        if self.name in b.blobs:
            os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
            with open(dest, "wb") as fh:
                fh.write(b.blobs[self.name])
            return
        prefix = self.name + "/"
        found = False
        for k, v in b.blobs.items():
            if k.startswith(prefix):
                out = os.path.join(dest, *k[len(prefix):].split("/"))
                os.makedirs(os.path.dirname(out), exist_ok=True)
                with open(out, "wb") as fh:
                    fh.write(v)
                found = True
        if not found:
            raise FileNotFoundError(self.name)

    def read_bytes(self) -> bytes:
        b: MemoryBackend = self.backend  # type: ignore[assignment]
        return b.blobs[self.name]


class MemoryBackend(ArchiveBackend):
    """One fake bucket. ``get_backend("memory://name")`` returns the same
    instance per name so a test's publisher and asserter share state."""

    _instances: dict[str, "MemoryBackend"] = {}

    def __init__(self) -> None:
        self.blobs: dict[str, bytes] = {}
        self.server_side_copies = 0
        self.uploads = 0

    @classmethod
    def named(cls, name: str) -> "MemoryBackend":
        return cls._instances.setdefault(name, cls())

    def get_object(self, name: str) -> MemoryObject:
        return MemoryObject(self, name)

    def list_objects(self, prefix: str) -> Iterator[str]:
        prefix = prefix.rstrip("/") + "/"
        for k in sorted(self.blobs):
            if k.startswith(prefix):
                yield k


# -- scheme registry -------------------------------------------------------

_REGISTRY: dict[str, Callable[[str], ArchiveBackend]] = {}


def register_backend(scheme: str, factory: Callable[[str], ArchiveBackend]) -> None:
    """Deployment hook: plug a real client for ``s3a``/``gs``/… — the
    factory receives the full base URI."""
    _REGISTRY[scheme] = factory


def get_backend(base: str) -> ArchiveBackend:
    """Backend for a base URI: plain paths → filesystem;
    ``memory://name`` → shared fake bucket; cloud schemes → whatever a
    deployment registered, else a documented injection-point error."""
    if "://" not in base:
        return FileSystemBackend(base)
    scheme = base.split("://", 1)[0]
    if scheme in _REGISTRY:
        return _REGISTRY[scheme](base)
    if scheme == "memory":
        return MemoryBackend.named(base.split("://", 1)[1])
    raise NotImplementedError(
        f"no object-store client registered for {scheme!r}: call "
        "register_backend('" + scheme + "', factory) with a client for your "
        "deployment (the reference uses google-cloud-storage here — "
        "zavod/zavod/archive/backend.py:138-158; Spark's own parquet IO on "
        "these URIs goes through Hadoop and needs no client)"
    )
