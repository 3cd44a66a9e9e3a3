"""Bench protocol guards (VERDICT r7 task 4 + advisor finding on plan
reuse): every rep rebuilds the DataFrame so lineages are fresh (no
cross-rep shuffle-stage reuse), and plan construction is excluded from the
clock ONLY when the build verifiably scheduled zero Spark jobs — a query
that does data work mid-build is timed build-inclusive and flagged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import bench


def test_lazy_query_probe_schedules_no_jobs(spark, tmp_path):
    df = spark.range(100).toDF("id")
    df.write.mode("overwrite").parquet(str(tmp_path / "nums.parquet"))

    # pre-resolved relation, like catalog.load's per-session relation
    # cache (a raw spark.read.parquet schedules a footer-read job, which
    # the probe would rightly classify as eager)
    rel = spark.read.parquet(str(tmp_path / "nums.parquet"))

    def lazy_query(s, sf_dir):
        return rel.groupBy((F.col("id") % 10).alias("b")).count()

    times, rows, eager, violations = bench.run_reps(
        spark, lazy_query, str(tmp_path), reps=2
    )
    assert rows == 10
    assert len(times) == 2
    assert eager is False
    assert violations == 0


def test_eager_query_classified_and_timed_build_inclusive(spark, tmp_path):
    df = spark.range(50).toDF("id")
    df.write.mode("overwrite").parquet(str(tmp_path / "nums.parquet"))

    rel = spark.read.parquet(str(tmp_path / "nums.parquet"))

    def eager_query(s, sf_dir):
        rel.count()  # deliberate data work during plan construction
        return rel.groupBy().count()

    times, rows, eager, violations = bench.run_reps(
        spark, eager_query, str(tmp_path), reps=2
    )
    assert rows == 1
    assert eager is True
    # eager plans are never probe violations — they are simply timed
    # build-inclusive from the start
    assert violations == 0


def test_mid_run_eagerness_is_flagged_as_violation(spark, tmp_path):
    """A plan that turns eager AFTER the classification probe (e.g. a
    future operator caching a DataFrame mid-build on the second call) must
    be caught per-rep and counted, not silently timed build-exclusive."""
    df = spark.range(50).toDF("id")
    df.write.mode("overwrite").parquet(str(tmp_path / "nums.parquet"))
    calls = {"n": 0}

    rel = spark.read.parquet(str(tmp_path / "nums.parquet"))

    def flaky_query(s, sf_dir):
        calls["n"] += 1
        if calls["n"] > 1:  # lazy during the probe, eager in timed reps
            rel.count()
        return rel.groupBy().count()

    times, rows, eager, violations = bench.run_reps(
        spark, flaky_query, str(tmp_path), reps=2
    )
    assert eager is False  # the probe saw a lazy build
    assert violations == 2  # ...but every timed rep was caught going eager


def test_control_interleaves_per_rep(spark, tmp_path):
    df = spark.range(10).toDF("id")
    df.write.mode("overwrite").parquet(str(tmp_path / "nums.parquet"))
    ticks = []

    rel = spark.read.parquet(str(tmp_path / "nums.parquet"))

    def q(s, sf_dir):
        return rel.groupBy().count()

    bench.run_reps(spark, q, str(tmp_path), reps=3, control=lambda: ticks.append(1))
    assert len(ticks) == 3
