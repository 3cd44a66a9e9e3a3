"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a PySpark DataFrame plan (``QUERIES[name](spark, sf_dir)``)
with an ANSI-SQL oracle (``ORACLES[name]``) that DuckDB runs over the same
parquet tables — the correctness contract of the build harness. Keys are
named after SURVEY.md §2 operator ids (a1_, j5_, d1_, f3_, ...) so coverage
is auditable line-by-line.

Cross-engine determinism rules used throughout (see tools/check_oracle.py):
- money sums go through DECIMAL so they are exact and order-independent,
  then cast back to DOUBLE,
- hashing is md5 (DuckDB 1.0 has no sha1),
- every output is given an explicit alias on both sides,
- ties in any top-k are broken by a unique id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query and (optionally) its DuckDB oracle SQL."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return wrap


def _relation_cache(spark: SparkSession) -> dict:
    """Per-session relation cache, stored on the session object so its
    lifetime is exactly the session's (a stopped/rebuilt session starts
    empty)."""
    cache = getattr(spark, "_osp_relation_cache", None)
    if cache is None:
        cache = {}
        spark._osp_relation_cache = cache
    return cache


def invalidate_relations(spark: SparkSession) -> None:
    """Drop the per-session relation cache (call after overwriting a table
    path that was previously loaded in this session)."""
    getattr(spark, "_osp_relation_cache", {}).clear()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table (TESTDATA.md).

    The resolved relation is cached per (session, dir, table): re-reading
    parquet footers + re-listing the directory costs ~80 ms per
    ``spark.read.parquet`` call on this harness, which dominates small-SF
    query wall time. Metastore-backed Spark does exactly this cache for
    catalog tables (``spark.sql.filesourceTableRelationCacheSize``,
    default 1000 relations); path-based reads bypass it, so this restores
    the production behavior. The cache holds plan metadata only (schema +
    file list), never data — its size is catalog-sized at any data scale.
    Writers that overwrite a previously-loaded path must call
    :func:`invalidate_relations` (the static test tables never change
    within a session).

    The test parquets are single-row-group files, so the scan itself is one
    task. For the compute-heavy-per-row tables (documents: regex/shingling;
    embeddings: vector math) that single task would serialize the whole
    query — repartition right after the scan so downstream work uses every
    core. (Row-count-proportional tables like lineitem recover parallelism
    at their first shuffle, so they are left to Catalyst.)
    """
    if name == "events":
        return load_events(spark, sf_dir)
    cache = _relation_cache(spark)
    key = (sf_dir, name)
    df = cache.get(key)
    if df is not None:
        return df
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    cache[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing its timestamp column.

    Older generations of the test parquet carried TIMESTAMP(NANOS), which
    Spark's reader rejects; those are read as raw longs (legacy nanosAsLong)
    and floor-divided to microseconds — exactly what DuckDB's
    TIMESTAMP_NS→TIMESTAMP view does. Newer generations carry
    microsecond timestamps natively (TIMESTAMP_NTZ); those are cast to
    TIMESTAMP — lossless under the UTC session timezone — so every
    downstream query sees one ts type and both engines see identical values.
    """
    from pyspark.sql import functions as F

    cache = _relation_cache(spark)
    key = (sf_dir, "events")
    cached = cache.get(key)
    if cached is not None:
        return cached

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the NTZ→TIMESTAMP cast below reads the session timezone; pin it so
    # a vanilla driver session in a non-UTC environment can't shift values
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    cache[key] = df
    return df


#: The build driver records correctness rows for the FIRST 50 entries of
#: ``queries()``. Lifetime coverage: 192/192 queries have at least one
#: green driver row across rounds 1-5. Round-6 rotation (VERDICT r5
#: task 5): the round-6 additions go FIRST, then every query whose LAST
#: driver row dates to round 1 (19 — computed from the CORRECTNESS_r0N
#: files, stalest first), then the round-2-last set fills the 50; its
#: remainder queues directly below the budget line for round 7.
DRIVER_PRIORITY: list[str] = [
    # -- round-6 additions (4) ---------------------------------------------
    "mm_decode_wav_real",
    "mm_decode_ppm_real",
    "s12_reviewed_names_emit",
    "s14_un_sc_parse",
    # -- last driver row in ROUND 1, stale for 4 rounds (19) ----------------
    "q18_large_orders",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "w1_running_total",
    "rollup_revenue",
    "approx_distinct_users",
    "approx_quantile_contract",
    "funnel_view_click_purchase",
    "w2_rolling_sum",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q16_supplier_variety",
    "events_json_extract",
    "events_variant_extract",
    "pivot_status_counts",
    "w3_rank_family",
    "sketch_merge_distinct",
    # -- last driver row in ROUND 2 (29 of 38 fit the budget) ---------------
    "f7_identifier_checksums",
    "f10_address_compose",
    "f11_crypto_wallets",
    "f13_occupancy_status",
    "p7_person_cutoff",
    "s1_csv_scan",
    "s2_xml_scan",
    "s3_json_scan",
    "s4_html_dom",
    "s5_html_table",
    "s6_excel_scan",
    "s7_pdf_tables",
    "s8_cache_ttl",
    "s10_archive_backfill",
    "s11_llm_extraction",
    "s12_review_workflow",
    "audit_source_columns",
    "a4_program_facets",
    "a9_name_reduction",
    "a10_edge_cleanup",
    "j4_recursive_expansion",
    "j9_match_rules",
    "j11_self_reference",
    "d4_change_detection",
    "j7_edge_dedupe_merge",
    "j5_t1_blocking_topk",
    "dedup_exact",
    # --- the driver's 50-row budget ends here; the round-2 remainder below
    # rotates into round 7 (and covers a budget increase) -------------------
    "text_token_count",
    "text_langid",
    "text_quality",
    "text_fingerprint",
    "sample_train_split",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_ivf_bucketed",
    "mm_byte_features",
]


def _reorder() -> None:
    """Rebuild the registration dict with DRIVER_PRIORITY names first
    (names not yet registered are skipped), everything else after in
    original registration order."""
    ordered: dict[str, QueryFn] = {}
    for n in DRIVER_PRIORITY:
        if n in QUERIES:
            ordered[n] = QUERIES[n]
    for n, f in QUERIES.items():
        if n not in ordered:
            ordered[n] = f
    QUERIES.clear()
    QUERIES.update(ordered)


def _import_all() -> None:
    # Importing registers the queries; keep at module bottom.
    from opensanctions_spark.catalog import (  # noqa: F401
        pipeline,
        relational,
        tpch_shapes,
        linkage,
        text,
        vectors,
        exporters,
        sources,
        functions,
        graph,
        streaming,
        multimodal,
    )


_import_all()
_reorder()
