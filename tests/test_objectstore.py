"""Object-store publish backend (``sources/objectstore.py``) — the
reference's ``zavod/zavod/archive/backend.py`` seam, proven e2e against
the in-process fake bucket."""

from __future__ import annotations

import json
import os

import pytest

from opensanctions_spark.sources.objectstore import (
    FileSystemBackend,
    MemoryBackend,
    get_backend,
)


@pytest.fixture()
def bucket():
    b = MemoryBackend()
    MemoryBackend._instances["testbucket"] = b
    yield b
    MemoryBackend._instances.pop("testbucket", None)


def test_scheme_registry(tmp_path, bucket):
    assert isinstance(get_backend(str(tmp_path)), FileSystemBackend)
    assert get_backend("memory://testbucket") is bucket
    # unknown cloud schemes name the injection point instead of failing weird
    with pytest.raises(NotImplementedError, match="register_backend"):
        get_backend("s3a://bucket/prefix")
    with pytest.raises(NotImplementedError, match="register_backend"):
        get_backend("gs://bucket/prefix")


def test_memory_publish_republish_backfill(tmp_path, bucket):
    """Upload a file and a Spark-sink directory, server-side copy both,
    round-trip back to disk — and prove republish never re-uploaded."""
    f = tmp_path / "index.json"
    f.write_text('{"ok": true}')
    sink = tmp_path / "delta.json"
    sink.mkdir()
    (sink / "part-00000").write_text("line1\n")
    (sink / "_SUCCESS").write_text("")

    bucket.get_object("ds/v1/index.json").publish(str(f))
    bucket.get_object("ds/v1/delta.json").publish(str(sink))
    uploads_after_publish = bucket.uploads
    bucket.get_object("datasets/latest/ds/index.json").republish("ds/v1/index.json")
    bucket.get_object("datasets/latest/ds/delta.json").republish("ds/v1/delta.json")
    assert bucket.uploads == uploads_after_publish  # server-side only
    assert bucket.server_side_copies == 2
    assert bucket.get_object("datasets/latest/ds/index.json").exists()
    assert bucket.get_object("datasets/latest/ds/delta.json").size() == 6
    assert bucket.list_children("datasets/latest/ds") == ["delta.json", "index.json"]

    out = tmp_path / "restore"
    bucket.get_object("datasets/latest/ds/index.json").backfill(str(out / "index.json"))
    bucket.get_object("datasets/latest/ds/delta.json").backfill(str(out / "delta.json"))
    assert json.loads((out / "index.json").read_text()) == {"ok": True}
    assert (out / "delta.json" / "part-00000").read_text() == "line1\n"


def test_publish_dataset_to_fake_object_store(spark, tmp_path, bucket):
    """e2e (VERDICT r3 task 9): run → export → publish with
    ``store_base="memory://…"`` — artifacts upload once to the immutable
    version prefix, the listed resources reach the release paths by
    SERVER-SIDE copy only, the stale-latest scan reads the bucket, and
    the archive pointer still promotes locally."""
    from opensanctions_spark.model.melt import finish_statements
    from opensanctions_spark.plans.publish import publish_dataset
    from opensanctions_spark.plans.run import crawl_dataset, export_dataset
    from opensanctions_spark.sources.archive import StatementArchive

    raw = spark.createDataFrame(
        [("e1", "Person", "name", "Jane"), ("e2", "Company", "name", "Acme")],
        ["entity_id", "schema", "prop", "value"],
    )
    statements = finish_statements(raw, dataset="osds")
    archive = StatementArchive(spark, str(tmp_path / "archive"))
    ver = crawl_dataset(spark, statements, "osds", archive, run_time="2024-01-01")
    out = str(tmp_path / "out")
    export_dataset(spark, archive, "osds", out, run_time="2024-01-01")

    res = publish_dataset(
        archive, "osds", artifacts_dir=out, version=ver,
        store_base="memory://testbucket",
    )
    assert "index.json" in res.published
    # the immutable version prefix holds EVERY run file
    uploaded = set(bucket.list_children(f"osds/{ver}"))
    assert {"index.json", "resources.json", "statistics.json"} <= uploaded
    # the release prefix holds the listed set, via server-side copy only
    latest = set(bucket.list_children("datasets/latest/osds"))
    assert latest == set(res.published)
    assert bucket.server_side_copies == len(res.published)
    # unlisted artifacts never reach the release prefix
    assert "statistics.json" not in latest
    # local promotion still happened
    assert archive.last_successful("osds") == ver

    # a second publish that ships fewer files flags the leftovers stale
    slim = tmp_path / "slim"
    slim.mkdir()
    (slim / "index.json").write_text("{}")
    (slim / "resources.json").write_text('{"resources": []}')
    ver2 = crawl_dataset(spark, statements, "osds", archive, run_time="2024-02-01")
    res2 = publish_dataset(
        archive, "osds", artifacts_dir=str(slim), version=ver2,
        store_base="memory://testbucket",
    )
    assert res2.published == ["index.json"]
    assert set(res2.stale_latest) == latest - {"index.json"}


def test_filesystem_backfill_downloads_to_literal_dest(tmp_path):
    """FileSystemObject.backfill copies the object TO the given local path
    (absolute paths included) — not to a root-relative object name."""
    root = tmp_path / "bucket"
    backend = FileSystemBackend(str(root))
    src = tmp_path / "index.json"
    src.write_text('{"v": 1}')
    backend.get_object("ds/v1/index.json").publish(str(src))

    dest = tmp_path / "restore" / "index.json"
    backend.get_object("ds/v1/index.json").backfill(str(dest))
    assert json.loads(dest.read_text()) == {"v": 1}
    # nothing landed inside the bucket root at the dest path
    assert not (root / str(dest).lstrip("/")).exists()

    sinkdir = tmp_path / "delta.json"
    sinkdir.mkdir()
    (sinkdir / "part-00000").write_text("line1\n")
    backend.get_object("ds/v1/delta.json").publish(str(sinkdir))
    destdir = tmp_path / "restore2" / "delta.json"
    backend.get_object("ds/v1/delta.json").backfill(str(destdir))
    assert (destdir / "part-00000").read_text() == "line1\n"
