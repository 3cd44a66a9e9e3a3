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
#: ``queries()`` (r1/r2/r3 each recorded exactly registration order
#: [0:50], mutually disjoint — the rotation works). Round 4 rotation
#: (VERDICT r3 task 1): the 28 catalog queries that have never received a
#: driver row go FIRST (cheapest-first within the group so the expensive
#: streaming/iterative ones can't starve a wall-clock budget), then any
#: round-4 additions, then the oldest-checked (r1) queries fill the
#: remaining slots → a green round makes lifetime driver coverage
#: 178/178.
DRIVER_PRIORITY: list[str] = [
    # -- never driver-checked (28), cheap → expensive ----------------------
    "q2_min_cost_supplier",
    "q12_shipmode_priority",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "j5_custom_scorer_udf",
    "j5_min_score_ratio",
    "s6_excel_distributed",
    "s7_pdf_scanned",
    "sample_quality_weighted",
    "sample_token_budget",
    "text_vocab_coverage",
    "text_oov_rate",
    "text_quality_classifier",
    "chunk_documents",
    "mm_audio_energy",
    "mm_phash_dedup",
    "search_inverted_index",
    "search_bm25",
    "dedup_lsh_recall",
    "dedup_near_cluster_star",
    "graph_component_histogram",
    "pipeline_enrich_expand",
    "ann_lsh_hyperplane",
    "ann_kmeans_loop",
    "text_bpe_train",
    "graph_pagerank",
    "stream_stateful_totals",
    "stream_curate_corpus",
    # -- round-4 additions (driver row wanted this round) ------------------
    # (inserted here as they land; see register() call sites)
    "j5_reference_scorer",
    "j13_lookup_module",
    "f16_make_security",
    "f17_make_identification",
    "dedup_paragraph_exact",
    "contamination_bloom",
    "k2_statements_csv",
    "text_bigram_lm_score",
    # -- oldest-checked fill (r1, original registration order) -------------
    "a1_entity_assembly",
    "s9_p2_statement_filters",
    "p1_target_filter",
    "j1_timestamp_join",
    "d0_d1_version_delta",
    "j6_canonical_map",
    "j6_incremental_resolver",
    "k11_sql_load_prep",
    "skew_salted_agg",
    "skew_salted_join",
    "j2_canonical_rekey",
    "d2_d3_union_dedupe",
    "a8_t4_prefix_date_dedup",
    "f8_deterministic_ids",
    "f12_t5_active_status",
    "scd2_entity_history",
    "pipeline_curate_corpus",
    "pipeline_curate_increment",
    "q1_pricing_summary",
    "q3_shipping_priority",
    # --- the driver's 50-row budget ends here (28 never-checked +
    # 4 round-4 additions + 18 oldest-checked fit in 50; the tail below
    # is ordering insurance in case the budget grows) -----------------------
    "j3_adjacency_region_revenue",
    "j10_dangling_anti_join",
    "j12_semi_join_gate",
    "j8_same_id_equijoin",
    "j13_lookup_join",
    "a2_entity_counts",
    "a3_fill_rate",
    "a5_last_change",
    "a7_issue_counts",
    "a12_assertions",
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
