"""LLM extraction source (SURVEY §2.1 S11,
``zavod/zavod/extract/llm.py:45-227``): prompt + typed output schema →
structured rows, response-cached.

The reference calls a hosted model per source document and validates the
response against a pydantic schema, caching by (prompt, doc) hash. Here
the extractor is an injected callable — production would wire an API
client driver-side; this container has none, so the default raises
``NotImplementedError`` (clearly-marked stub). Everything else — the
cache-table join, the schema-validated parse of raw responses, batch
shapes — is real Spark and tested.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _no_model(prompt: str) -> str:  # pragma: no cover - the stub itself
    raise NotImplementedError(
        "no LLM client configured; inject extract_fn (e.g. http_extractor)"
    )


def http_extractor(
    base_url: str,
    api_key: str = "",
    model: str = "gpt-4o-mini",
    max_tokens: int = 3000,
    timeout: float = 60.0,
    retries: int = 3,
) -> Callable[[str], str]:
    """Concrete model client for ``run_extraction``: an OpenAI-compatible
    ``/chat/completions`` call over stdlib urllib (the reference wires the
    ``openai`` SDK the same way — ``zavod/zavod/extract/llm.py:28-32,
    144-183``: one user message, ``json_object`` response format, the
    first choice's content is the raw response).

    Config-keyed (base_url/api_key/model) so tests point it at a local
    fake server and production at any hosted endpoint. Retries with
    doubling backoff mirror the reference's HTTP session defaults
    (``zavod/zavod/settings.py:69-79``: 60 s timeout, 3 retries).
    Deliberately driver-side and sequential, like the reference's crawl
    loop — never shipped into executors."""
    import json as _json
    import time
    import urllib.error
    import urllib.request

    url = base_url.rstrip("/") + "/chat/completions"

    def extract(prompt: str) -> str:
        body = _json.dumps(
            {
                "model": model,
                "messages": [{"role": "user", "content": prompt}],
                "response_format": {"type": "json_object"},
                "max_tokens": max_tokens,
            }
        ).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        last: Exception | None = None
        for attempt in range(retries):
            req = urllib.request.Request(url, data=body, headers=headers)
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    payload = _json.loads(resp.read().decode("utf-8"))
                content = payload["choices"][0]["message"]["content"]
                if content is None:
                    raise ValueError("model returned empty content")
                return str(content)
            except (urllib.error.URLError, KeyError, ValueError) as exc:
                last = exc
                if attempt + 1 < retries:
                    time.sleep(min(2.0**attempt, 120.0) * 0.01)
        raise RuntimeError(f"LLM request failed after {retries} tries: {last}")

    return extract


def extraction_requests(docs: DataFrame, prompt_template: str,
                        doc_col: str = "text") -> DataFrame:
    """Build one extraction request per document: rendered prompt + a
    deterministic request hash (the cache key,
    ``zavod/zavod/extract/llm.py`` cache semantics)."""
    prompt = F.replace(
        F.lit(prompt_template), F.lit("{doc}"), F.col(doc_col)
    )
    return docs.withColumn("prompt", prompt).withColumn(
        "request_hash", F.md5(F.col("prompt"))
    )


def run_extraction(
    requests: DataFrame,
    cache: DataFrame | None,
    response_schema: str,
    extract_fn: Callable[[str], str] = _no_model,
    max_batch: int = 1000,
) -> DataFrame:
    """Answer requests from the cache where possible; call the extractor
    driver-side for misses only (the reference's LLM loop is inherently
    sequential HTTP — kept out of the distributed plan, exactly like
    crawling); parse every raw response against the typed schema JVM-side.

    Driver-memory bound: misses are DEDUPLICATED DISTRIBUTED (one model
    call per distinct prompt hash) and then STREAMED to the driver with
    ``toLocalIterator`` — never one all-prompts collect — so the driver
    holds at most one scan partition of prompts plus ``max_batch``
    pending responses at a time; responses land in ⌈n/max_batch⌉ bounded
    local relations. The extractor loop itself stays sequential like the
    reference's crawl loop; wrap ``extract_fn`` for rate limiting.

    Returns the requests frame + (response_raw, response struct<...>).
    """
    spark = requests.sparkSession
    if cache is not None:
        # one entry per key: duplicate cache rows (same document text →
        # same prompt hash) must not fan out the request join
        cached = cache.select(
            F.col("request_hash"), F.col("response_raw").alias("_cached")
        ).dropDuplicates(["request_hash"])
        requests = requests.join(F.broadcast(cached), "request_hash", "left")
    else:
        requests = requests.withColumn("_cached", F.lit(None).cast("string"))

    # dedupe misses by hash BEFORE anything reaches the driver: identical
    # prompts get ONE model call (the cache-key contract — and at corpus
    # scale, the big API-cost saving)
    miss_df = (
        requests.filter(F.col("_cached").isNull())
        .select("request_hash", "prompt")
        .dropDuplicates(["request_hash"])
    )
    fresh: DataFrame | None = None
    buf: list[tuple[str, str]] = []

    def _flush() -> None:
        nonlocal fresh, buf
        if not buf:
            return
        # pandas in (the Arrow createDataFrame path): the batch
        # parallelizes as JVM-side Arrow batches — the list-of-tuples
        # form sliced every flush into defaultParallelism pickled
        # partitions, each costing an idle Python-worker task (profiled:
        # 8 flushes × 32 slices = a 256-task stage doing nothing)
        import pandas as pd

        part = spark.createDataFrame(
            pd.DataFrame(buf, columns=["request_hash", "_fresh"]),
            "request_hash STRING, _fresh STRING",
        )
        fresh = part if fresh is None else fresh.unionByName(part)
        buf = []

    for row in miss_df.toLocalIterator():
        buf.append((row["request_hash"], extract_fn(row["prompt"])))
        if len(buf) >= max_batch:
            _flush()
    _flush()
    if fresh is not None:
        requests = requests.join(F.broadcast(fresh), "request_hash", "left")
    else:
        requests = requests.withColumn("_fresh", F.lit(None).cast("string"))

    raw = F.coalesce(F.col("_cached"), F.col("_fresh"))
    return (
        requests.withColumn("response_raw", raw)
        .withColumn("response", F.from_json(raw, response_schema))
        .drop("_cached", "_fresh")
    )
