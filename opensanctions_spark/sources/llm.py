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
        "no LLM client available in this environment; inject extract_fn"
    )


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
) -> DataFrame:
    """Answer requests from the cache where possible; call the extractor
    driver-side for misses only (the reference's LLM loop is inherently
    sequential HTTP — kept out of the distributed plan, exactly like
    crawling); parse every raw response against the typed schema JVM-side.

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

    # dedupe misses by hash: identical prompts get ONE model call (the
    # cache-key contract — and at corpus scale, the big API-cost saving)
    misses: dict[str, str] = {
        r["request_hash"]: r["prompt"]
        for r in requests.filter(F.col("_cached").isNull())
        .select("request_hash", "prompt").collect()
    }
    if misses:
        fresh = spark.createDataFrame(
            [(h, extract_fn(p)) for h, p in misses.items()],
            "request_hash STRING, _fresh STRING",
        )
        requests = requests.join(F.broadcast(fresh), "request_hash", "left")
    else:
        requests = requests.withColumn("_fresh", F.lit(None).cast("string"))

    raw = F.coalesce(F.col("_cached"), F.col("_fresh"))
    return (
        requests.withColumn("response_raw", raw)
        .withColumn("response", F.from_json(raw, response_schema))
        .drop("_cached", "_fresh")
    )
