"""End-to-end tests for the corpus-curation plan (plans/curate.py).

The composition query's cross-engine values are pinned by the DuckDB
oracle (pipeline_curate_corpus); here we pin the PLAN-level invariants a
training-data consumer relies on, plus the CLI surface.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from opensanctions_spark.plans.curate import (
    CurationConfig,
    curate_corpus,
    curation_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_curated_corpus_invariants(spark):
    docs = _docs(spark)
    cfg = CurationConfig()
    curated = curate_corpus(docs, cfg).cache()
    rows = curated.collect()
    assert 0 < len(rows) <= docs.count()

    # quality gate: every survivor inside the token bounds
    assert all(cfg.min_tokens <= r["n_tokens"] <= cfg.max_tokens for r in rows)

    # exact dedup: no two survivors share a text fingerprint
    joined = curated.join(docs, "doc_id").select(F.md5("text").alias("fp"))
    assert joined.count() == joined.distinct().count()

    # split is total and deterministic (re-running moves nothing)
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    again = {r["doc_id"]: r["split"] for r in curate_corpus(docs, cfg).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)

    # packing: offsets within the window; doc stream per (split, lang) is
    # gapless — each doc starts where the previous one's tokens ended
    assert all(0 <= r["pack_offset"] < cfg.context_tokens for r in rows)
    by_stream: dict = {}
    for r in sorted(rows, key=lambda r: (r["split"], r["lang"], r["doc_id"])):
        key = (r["split"], r["lang"])
        start = r["pack_id"] * cfg.context_tokens + r["pack_offset"]
        assert start == by_stream.get(key, 0)
        by_stream[key] = start + r["n_tokens"]
    curated.unpersist()


def test_stats_funnel_is_monotonic(spark):
    docs = _docs(spark)
    curated = curate_corpus(docs)
    stats = curation_stats(docs, curated)
    assert stats["curated_docs"] <= stats["input_docs"]
    split_total = sum(stats.get(f"{s}_docs", 0) for s in ("train", "val", "test"))
    assert split_total == stats["curated_docs"]
    assert stats.get("train_docs", 0) >= stats.get("val_docs", 0)


def test_cli_curate(tmp_path, capsys):
    from opensanctions_spark.__main__ import main

    out = tmp_path / "curated"
    rc = main(
        [
            "curate",
            "--documents",
            f"{SF_DIR}/documents.parquet",
            "--out",
            str(out),
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["curated_docs"] > 0
    assert any(p.name.startswith("split=") for p in out.iterdir())
