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


def _start_fake_server(requests_log):
    """OpenAI-compatible /chat/completions fake: extracts the doc marker
    from the user message and answers deterministic JSON. Records every
    request so the test can assert auth headers + single-call-per-miss."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (stdlib API name)
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            requests_log.append(
                {
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                    "body": body,
                }
            )
            prompt = body["messages"][0]["content"]
            key = prompt.split("#")[-1].strip()
            content = json.dumps({"name": f"entity-{key}", "risk": "low"})
            payload = json.dumps(
                {"choices": [{"message": {"role": "assistant",
                                          "content": content}}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def test_http_extractor_end_to_end(spark):
    """S11 with a REAL HTTP client against a local fake endpoint: cache
    hits skip the network, misses make exactly one authorized
    chat-completions call each, responses parse through the same typed
    schema."""
    from opensanctions_spark.sources.llm import http_extractor

    log: list = []
    server = _start_fake_server(log)
    try:
        base = f"http://127.0.0.1:{server.server_port}/v1"
        extract = http_extractor(base, api_key="test-key", model="test-model")

        docs = spark.createDataFrame(
            [(1, "doc #one"), (2, "doc #two"), (3, "doc #two")],
            "doc_id INT, text STRING",
        )
        reqs = extraction_requests(docs, "Extract from: {doc}")
        cache = reqs.filter(F.col("doc_id") == 1).select(
            "request_hash",
            F.lit('{"name": "cached-one", "risk": "high"}').alias(
                "response_raw"
            ),
        )
        out = run_extraction(reqs, cache, RESPONSE_SCHEMA, extract_fn=extract)
        rows = {r["doc_id"]: r["response"] for r in out.collect()}
        assert rows[1]["name"] == "cached-one"  # cache hit: no HTTP call
        assert rows[2]["name"] == "entity-two"
        assert rows[3]["name"] == "entity-two"  # same text → same answer

        # docs 2 and 3 share one prompt hash → exactly ONE model call
        assert len(log) == 1
        assert log[0]["path"] == "/v1/chat/completions"
        assert log[0]["auth"] == "Bearer test-key"
        assert log[0]["body"]["model"] == "test-model"
        assert log[0]["body"]["response_format"] == {"type": "json_object"}
    finally:
        server.shutdown()


def test_http_extractor_retries_then_raises(spark):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from opensanctions_spark.sources.llm import http_extractor

    calls = []

    class Failing(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            calls.append(1)
            self.send_response(500)
            self.end_headers()

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Failing)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        extract = http_extractor(
            f"http://127.0.0.1:{server.server_port}/v1", retries=3
        )
        with pytest.raises(RuntimeError, match="after 3 tries"):
            extract("prompt")
        assert len(calls) == 3
    finally:
        server.shutdown()


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


def test_run_extraction_batches_misses_beyond_max_batch(spark):
    """Driver fan-out bound: with more distinct prompts than max_batch the
    extractor still answers everything exactly once per distinct prompt,
    and duplicates never trigger extra calls."""
    from opensanctions_spark.sources.llm import extraction_requests, run_extraction

    # 25 distinct docs + 5 duplicates of doc 0
    rows = [(i, f"doc-{i % 25}") for i in range(30)]
    docs = spark.createDataFrame(rows, "id LONG, text STRING")
    reqs = extraction_requests(docs, 'extract from: {doc}')
    calls: list[str] = []

    def fake(prompt: str) -> str:
        calls.append(prompt)
        return '{"label": "' + prompt[-6:] + '"}'

    out = run_extraction(
        reqs, cache=None, response_schema="label STRING",
        extract_fn=fake, max_batch=10,
    ).collect()
    assert len(out) == 30
    assert len(calls) == 25          # one call per distinct prompt
    assert len(set(calls)) == 25
    assert all(r["response"]["label"] is not None for r in out)


def test_names_extraction_pack(spark):
    """The LLM name-extraction pack (zavod/zavod/extract/names/clean.py):
    prompt carries raw UTF-8 (ensure_ascii=False parity), in-row
    cleaning trims/dedupes, typed SimpleNames parse, and
    names_to_statements explodes accepted responses into per-prop name
    statements."""
    import json

    from opensanctions_spark.sources.names_extract import (
        INPUT_MARKER,
        extract_names,
        name_extraction_requests,
        names_to_statements,
    )

    df = spark.createDataFrame(
        [
            ("e1", "Person",
             ["Иван Петров", "a.k.a. Vanya", "  ", "Иван Петров"]),
            ("e2", "Company", ["ACME Corp; ACME Holdings"]),
        ],
        "entity_id STRING, schema STRING, raw_names ARRAY<STRING>",
    )
    reqs = name_extraction_requests(df)
    prompts = {r["entity_id"]: r["prompt"] for r in reqs.collect()}
    # raw UTF-8 in the prompt, no \\u escapes; blanks and dups removed
    assert "Иван Петров" in prompts["e1"]
    assert "\\u" not in prompts["e1"]
    payload = json.loads(prompts["e1"].split(INPUT_MARKER, 1)[1])
    assert payload == {"entity_schema": "Person",
                       "strings": ["Иван Петров", "a.k.a. Vanya"]}

    def fake(prompt: str) -> str:
        data = json.loads(prompt.split(INPUT_MARKER, 1)[1])
        out = {"name": [], "alias": [], "weakAlias": [],
               "previousName": [], "abbreviation": []}
        for s in data["strings"]:
            if s.startswith("a.k.a. "):
                out["alias"].append(s[7:])
            elif "; " in s:
                first, rest = s.split("; ", 1)
                out["name"].append(first)
                out["alias"].append(rest)
            else:
                out["name"].append(s)
        return json.dumps(out, ensure_ascii=False)

    extracted = extract_names(reqs, None, extract_fn=fake)
    stmts = names_to_statements(
        extracted, dataset="names", entity_col="entity_id",
        entity_schema=F.col("schema"),
    ).collect()
    got = {(r["entity_id"], r["prop"], r["value"]) for r in stmts}
    assert got == {
        ("e1", "name", "Иван Петров"),
        ("e1", "alias", "Vanya"),
        ("e2", "name", "ACME Corp"),
        ("e2", "alias", "ACME Holdings"),
    }
    schemas = {r["entity_id"]: r["schema"] for r in stmts}
    assert schemas == {"e1": "Person", "e2": "Company"}


# -- extraction-quality metric (reference extract/test_names.py) -------------


def test_metric_with_feedback_partial():
    from opensanctions_spark.sources.names_extract import (
        metric_with_feedback_dict,
    )

    example = {
        "string": "Jonathan (Jonno) Doe",
        "name": ["Jonathan Doe"],
        "alias": ["Jono Doe"],
        "weakAlias": [],
        "previousName": [],
    }
    prediction = {
        "name": ["Jonathan Doe"],
        "alias": ["Jonno"],
        "weakAlias": [],
        "previousName": [],
    }
    evaluation = metric_with_feedback_dict(example, prediction)
    assert 0 < evaluation.score < 0.5
    assert "correctly extracted the name 'Jonathan Doe'" in evaluation.feedback
    assert "missed the alias 'Jono Doe'" in evaluation.feedback
    assert "incorrectly added 'Jonno'" in evaluation.feedback


def test_metric_with_feedback_perfect():
    from opensanctions_spark.sources.names_extract import (
        metric_with_feedback_dict,
    )

    example = {
        "string": "Jonathan (Jonno) Doe",
        "name": ["Jonathan Doe"],
        "alias": ["Jono Doe"],
        "weakAlias": [],
        "previousName": [],
    }
    prediction = {
        "name": ["Jonathan Doe"],
        "alias": ["Jono Doe"],
        "weakAlias": [],
        "previousName": [],
    }
    evaluation = metric_with_feedback_dict(example, prediction)
    assert evaluation.score == 1.0
    assert "correctly extracted the name 'Jonathan Doe'" in evaluation.feedback
    assert "correctly extracted the alias 'Jono Doe'" in evaluation.feedback


def test_metric_casing_and_slug_partial_credit():
    from opensanctions_spark.sources.names_extract import (
        metric_with_feedback_dict,
    )

    example = {
        "name": ["Jonathan Doe"], "alias": [], "weakAlias": [],
        "previousName": [],
    }
    ev = metric_with_feedback_dict(example, {"name": ["jonathan doe"]})
    assert ev.score == 0.7
    assert "incorrect casing" in ev.feedback
    # a slug-level near-hit earns 0.7 but is ALSO penalized as an extra
    # (the reference only exempts casing-level extras from the 0.8
    # multiplier: its guard is lower-case membership, not slug match)
    ev = metric_with_feedback_dict(example, {"name": ["Jonathan, Doe"]})
    assert abs(ev.score - 0.7 * 0.8) < 1e-9
    assert "minor differences" in ev.feedback
    assert "incorrectly added" in ev.feedback
