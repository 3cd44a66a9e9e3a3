"""S11 LLM extraction source (cache + typed parse + stubbed model) and
S12 human-review workflow join; K11 JDBC sink preparation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.exporters.jdbc import prepare_statements_for_db
from opensanctions_spark.model.melt import melt_customers
from opensanctions_spark.sources.llm import extraction_requests, run_extraction
from opensanctions_spark.sources.review import apply_review

RESPONSE_SCHEMA = "name STRING, risk STRING"


def fake_model(prompt: str) -> str:
    # deterministic fake extractor: echoes the doc id found in the prompt
    key = prompt.split("#")[-1].strip()
    return f'{{"name": "entity-{key}", "risk": "low"}}'


def test_extraction_cache_hit_and_miss(spark):
    docs = spark.createDataFrame(
        [(1, "doc #one"), (2, "doc #two")], "doc_id INT, text STRING"
    )
    reqs = extraction_requests(docs, "Extract from: {doc}")
    assert reqs.filter(F.col("prompt").contains("Extract from: doc #one")).count() == 1

    # pre-cache doc one with a DIFFERENT answer than the model would give
    cache = reqs.filter(F.col("doc_id") == 1).select(
        "request_hash",
        F.lit('{"name": "cached-one", "risk": "high"}').alias("response_raw"),
    )
    out = run_extraction(reqs, cache, RESPONSE_SCHEMA, extract_fn=fake_model)
    rows = {r["doc_id"]: r["response"] for r in out.collect()}
    assert rows[1]["name"] == "cached-one"      # cache wins, model not called
    assert rows[2]["name"] == "entity-two"      # miss → fake model
    assert rows[2]["risk"] == "low"


def test_extraction_without_model_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id INT, text STRING")
    reqs = extraction_requests(docs, "{doc}")
    with pytest.raises(NotImplementedError, match="no LLM client"):
        run_extraction(reqs, None, RESPONSE_SCHEMA)


def test_apply_review(spark):
    extractions = spark.createDataFrame(
        [("e1", "Alice"), ("e2", "Bob"), ("e3", "Carol")],
        "extraction_id STRING, value STRING",
    )
    review = spark.createDataFrame(
        [
            ("e1", "accepted", None, "rev1"),        # accepted as-is
            ("e2", "accepted", "Robert", "rev1"),    # accepted with edit
            ("e3", "rejected", None, "rev2"),        # dropped
        ],
        "extraction_id STRING, status STRING, reviewed_value STRING, reviewer STRING",
    )
    out = {r["extraction_id"]: r["value"] for r in apply_review(extractions, review).collect()}
    assert out == {"e1": "Alice", "e2": "Robert"}


def test_prepare_statements_for_db_dedupes(spark, sf_dir):
    stmts = melt_customers(spark.read.parquet(f"{sf_dir}/customer.parquet"))
    doubled = stmts.unionByName(stmts)
    prepared = prepare_statements_for_db(doubled)
    assert prepared.count() == stmts.count()
    assert prepared.columns[0] == "id"
