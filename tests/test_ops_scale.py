"""Compaction planner/applier (``operators/compaction.py``) and key-skew
profiler (``operators/profiling.py``) — the archive-ops pair a 100 TB
deployment runs between crawls."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from opensanctions_spark.operators.compaction import (
    apply_compaction,
    compaction_plan,
    plan_for_dir,
)
from opensanctions_spark.operators.profiling import key_skew_profile


def test_compaction_plan_next_fit_buckets(spark):
    manifest = spark.createDataFrame(
        [("a", 40), ("b", 40), ("c", 40), ("d", 90), ("e", 10)],
        "path STRING, size_bytes LONG",
    )
    plan = {r["path"]: r["bucket"] for r in
            compaction_plan(manifest, 100).collect()}
    # cum-before: a=0 b=40 c=80 d=120 e=210
    assert plan == {"a": 0, "b": 0, "c": 0, "d": 1, "e": 2}


def test_compaction_plan_partitions_by_dataset(spark):
    manifest = spark.createDataFrame(
        [("ds1", "a", 80), ("ds1", "b", 80), ("ds2", "a", 80)],
        "dataset STRING, path STRING, size_bytes LONG",
    )
    plan = compaction_plan(manifest, 100, dataset_col="dataset")
    rows = {(r["dataset"], r["path"]): r["bucket"] for r in plan.collect()}
    # each dataset's running total starts at zero
    assert rows[("ds1", "a")] == 0 and rows[("ds1", "b")] == 0
    assert rows[("ds2", "a")] == 0


def test_compaction_global_plan_matches_serial_next_fit(spark):
    # 500 files spread over many input partitions: the two-pass prefix sum
    # must be byte-identical to a serial cumsum over path order
    import random

    rng = random.Random(13)
    rows = [(f"p{i:05d}", rng.randint(1, 120)) for i in range(500)]
    manifest = spark.createDataFrame(
        rows, "path STRING, size_bytes LONG"
    ).repartition(16)
    got = {r["path"]: r["bucket"] for r in
           compaction_plan(manifest, 1000).collect()}
    cum, want = 0, {}
    for path, size in sorted(rows):
        want[path] = cum // 1000
        cum += size
    assert got == want


def test_compaction_global_plan_has_no_single_partition_exchange(spark):
    manifest = spark.createDataFrame(
        [(f"p{i:04d}", 50) for i in range(200)],
        "path STRING, size_bytes LONG",
    ).repartition(8)
    plan_df = compaction_plan(manifest, 1000)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, (
        "global compaction plan must never funnel the manifest through one task"
    )


def test_apply_compaction_round_trip(spark, tmp_path):
    src = str(tmp_path / "packs")
    for i in range(6):
        spark.range(i * 100, i * 100 + 100).withColumn(
            "v", F.col("id") * 2
        ).coalesce(1).write.parquet(f"{src}/part{i}.parquet")
    plan = plan_for_dir(spark, src, target_bytes=4 * 1024)
    assert plan.count() == 6
    dest = str(tmp_path / "compacted")
    n_buckets = apply_compaction(spark, plan, dest)
    assert n_buckets >= 1
    out = spark.read.parquet(dest)
    # every row survives with its values intact
    assert out.count() == 600
    assert out.agg(F.sum("v")).collect()[0][0] == sum(i * 2 for i in range(600))
    # file count shrank to ~bucket count (one data file per bucket dir)
    data_files = [
        f for root, _d, fs in os.walk(dest) for f in fs
        if f.endswith(".parquet")
    ]
    assert len(data_files) <= n_buckets * 2


def test_key_skew_profile_exact_counts(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k STRING")
    prof = {r["key"]: r for r in key_skew_profile(df, "k", top_k=3).collect()}
    assert set(prof) == {"hot", "warm", "a"}  # top-3, key tie-break
    assert prof["hot"]["cnt"] == 60
    assert prof["hot"]["share_ppm"] == 600_000
    # mean key load = 100/4 = 25 → hot is 2400 permille of the mean
    assert prof["hot"]["skew_permille"] == 2400
    assert prof["hot"]["rk"] == 1 and prof["warm"]["rk"] == 2


def test_skew_profile_topk_is_distributed_take_ordered(spark, sf_dir):
    from opensanctions_spark.catalog import QUERIES

    df = QUERIES["t6_key_skew_profile"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, (
        "top-k must be a distributed partial top-k, not a global window sort"
    )


def test_archive_compact_version(spark, tmp_path):
    from opensanctions_spark.sources.archive import StatementArchive

    archive = StatementArchive(spark, str(tmp_path / "arch"),
                               bucket_statements=False)
    stmts = spark.range(500).select(
        F.concat(F.lit("e-"), F.col("id")).alias("entity_id"),
        F.lit("Person").alias("schema"),
        F.lit("name").alias("prop"),
        F.col("id").cast("string").alias("value"),
    ).repartition(24)  # 24 small files
    v1 = archive.write(stmts, "ds1")
    new_version = archive.compact("ds1", target_bytes=64 * 1024)
    assert new_version is not None and new_version != v1
    out = archive.read("ds1")  # serves the newest successful version
    assert out.count() == 500
    import os

    files = [
        f for f in os.listdir(archive.version_path("ds1", new_version))
        if f.endswith(".parquet")
    ]
    assert len(files) < 24
    # an already-compact version is a no-op, not a churn rewrite
    assert archive.compact("ds1", target_bytes=64 * 1024 * 1024) is None
