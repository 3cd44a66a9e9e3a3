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
#: ``queries()``. Lifetime coverage: every catalog query has at least one
#: green driver row across rounds 1-6 (196/196). Round-7 rotation
#: (VERDICT r6 task 5): the round-7 additions go FIRST, then the 12
#: round-2-last queries that missed the round-6 budget, then the
#: round-3-last set (49, stalest cohort — 36 fit the 50 budget); the
#: remainder queues below the line for round 8, ahead of the
#: round-4-last cohort.
DRIVER_PRIORITY: list[str] = [
    # -- round-7 additions (2) ---------------------------------------------
    "s14_fsf_parse",
    "mm_decode_bmp_real",
    # -- last driver row in ROUND 2 (the 12 below the r6 budget line) -------
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
    # -- last driver row in ROUND 3 (37 of 49 fit the budget) ---------------
    "rollup_time_hierarchy",
    "sample_stratified",
    "dedup_fuzzy_levenshtein",
    "j7_interval_overlap",
    "mixture_cap_per_source",
    "stream_interval_join",
    "stream_session_windows",
    "stream_static_enrich",
    "stream_windowed_agg",
    "text_mojibake_scan",
    "text_pii_redact",
    "text_pii_scan",
    "pack_sequences",
    "text_gopher_rules",
    "dedup_source_priority",
    "docs_length_histogram",
    "docs_length_quantiles",
    "mm_frame_sample",
    "mm_resize",
    "ann_ivf_nprobe2",
    "asof_last_view_before_click",
    "dedup_embedding_fast",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    "s6_xls_scan",
    "s7_pdf_distributed",
    "wikidata_deref",
    "mixture_temperature",
    "pipeline_quality_filter",
    "q17_small_quantity_revenue",
    "ann_centroid_step",
    "contamination_overlap",
    "dedup_chunk_exact",
    "q11_important_parts",
    "text_top_bigrams",
    # --- the driver's 50-row budget ends here; the round-3 remainder below
    # rotates into round 8 (and covers a budget increase) -------------------
    "dedup_url_canonical",
    "graph_degree_centrality",
    "q9_product_profit",
    "text_repetition",
    "dedup_minhash_capped",
    "ann_recall_meta",
    "dedup_semantic_semdedup",
    "text_tfidf_topk",
    "ann_cosine_fast",
    "dedup_near_cluster",
    "q7_volume_shipping",
    "pipeline_xref_resolve",
    "a2_facets_grouping_sets",
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
