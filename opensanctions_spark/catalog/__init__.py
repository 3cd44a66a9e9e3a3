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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table (TESTDATA.md).

    The test parquets are single-row-group files, so the scan itself is one
    task. For the compute-heavy-per-row tables (documents: regex/shingling;
    embeddings: vector math) that single task would serialize the whole
    query — repartition right after the scan so downstream work uses every
    core. (Row-count-proportional tables like lineitem recover parallelism
    at their first shuffle, so they are left to Catalyst.)
    """
    if name == "events":
        return load_events(spark, sf_dir)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        df = df.repartition(spark.sparkContext.defaultParallelism)
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
    return df


#: The build driver records correctness rows for the FIRST 50 entries of
#: ``queries()`` (r1/r2 each recorded exactly registration order [0:50],
#: and the two sets are disjoint — the rotation works). Round 3 rotation:
#: the 62 queries that have never received a driver row (full catalog
#: minus r1's 50 minus r2's 50), ordered cheapest-first by measured
#: sf0.01 gate time so the expensive streaming/pipeline queries can't eat
#: a wall-clock budget; the 12 most expensive plus the round-3 additions
#: (everything after the budget marker below) roll to round 4 — put them
#: FIRST in round 4's rotation.
DRIVER_PRIORITY: list[str] = [
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
    "dedup_url_canonical",
    "graph_degree_centrality",
    "q9_product_profit",
    "text_repetition",
    "dedup_minhash_capped",
    "ann_recall_meta",
    "q8_market_share",
    "dedup_semantic_semdedup",
    "text_tfidf_topk",
    "ann_cosine_fast",
    "dedup_near_cluster",
    "q7_volume_shipping",
    "pipeline_xref_resolve",
    "a2_facets_grouping_sets",
    # --- the driver's 50-row budget ends here; round-4 head start below ---
    "ann_kmeans_loop",
    "dedup_lsh_recall",
    "text_bpe_train",
    "graph_pagerank",
    "stream_stateful_totals",
    "search_inverted_index",
    "ann_lsh_hyperplane",
    "j5_custom_scorer_udf",
    "pipeline_enrich_expand",
    "s6_excel_distributed",
    "q2_min_cost_supplier",
    "stream_curate_corpus",
    # round-3 additions (no driver row yet)
    "s7_pdf_scanned",
    "search_bm25",
    "text_quality_classifier",
    "sample_quality_weighted",
    "q12_shipmode_priority",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "dedup_near_cluster_star",
    "chunk_documents",
    "mm_audio_energy",
    "sample_token_budget",
    "text_vocab_coverage",
    "mm_phash_dedup",
    "text_oov_rate",
    "graph_component_histogram",
    "j5_min_score_ratio",
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
