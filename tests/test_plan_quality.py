"""Plan-quality gates: the physical plans the engine's scale story depends
on, asserted from the executed (post-AQE) plans at test scale so a
regression that silently de-optimizes a headline query fails CI.

Checks: predicate pushdown reaches the parquet scan, small dimensions
broadcast (no shuffle of the big side), single-shuffle aggregations stay
single-shuffle, pure row-local pipelines have no exchange at all, and the
hot aggregations run inside whole-stage codegen.
"""

from __future__ import annotations

from opensanctions_spark.catalog import QUERIES


def _executed_plan(df) -> str:
    df.collect()  # materialize so AQE finalizes the physical plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-execution plan under "== Initial
    # Plan =="; keep only the final physical plan for assertions.
    return plan.split("== Initial Plan ==")[0]


def test_q1_pushdown_and_codegen(spark, sf_dir):
    plan = _executed_plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    # the shipdate predicate must reach the parquet scan…
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # …and the aggregate must run inside whole-stage codegen (the final
    # AQE plan prints codegen stages as "*(n)" operator prefixes)
    assert "WholeStageCodegen" in plan or "*(1)" in plan


def test_q3_broadcasts_customer_dimension(spark, sf_dir):
    plan = _executed_plan(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_canonical_rekey_is_broadcast(spark, sf_dir):
    plan = _executed_plan(QUERIES["j2_canonical_rekey"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_exact_dedup_is_single_shuffle(spark, sf_dir):
    plan = _executed_plan(QUERIES["dedup_exact"](spark, sf_dir))
    # partial + final hash aggregate around exactly one hash exchange
    # (the RoundRobin repartition is the test-harness shim in catalog.load
    # that re-parallelizes the single-row-group documents file)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, saw {n_exchanges}"


def test_stratified_sample_needs_no_shuffle(spark, sf_dir):
    plan = _executed_plan(QUERIES["sample_stratified"](spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan, (
        "hash-bucket sampling must stay map-only"
    )


def test_bucketed_statements_aggregate_without_shuffle(spark, sf_dir, tmp_path):
    """SCALE.md §1: statements bucketed by canonical_id make entity
    assembly shuffle-free — prove it on a real bucketed table."""
    from pyspark.sql import functions as F

    from opensanctions_spark.catalog import load

    cust = load(spark, sf_dir, "customer").select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("canonical_id"),
        F.col("c_name").alias("value"),
    )
    (
        cust.write.bucketBy(8, "canonical_id")
        .sortBy("canonical_id")
        .option("path", str(tmp_path / "stmts_bucketed"))
        .mode("overwrite")
        .saveAsTable("stmts_bucketed")
    )
    try:
        agg = (
            spark.table("stmts_bucketed")
            .groupBy("canonical_id")
            .agg(F.count("*").alias("n"))
        )
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed grouping key must satisfy the distribution without a shuffle"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS stmts_bucketed")
