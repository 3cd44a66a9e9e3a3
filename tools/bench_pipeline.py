"""End-to-end pipeline throughput: the reference-shaped dataset run.

Times two consecutive full runs (crawl output → J1 timestamp join →
versioned archive write → entity assembly → validation → all export
sinks → D0/D1 delta) over the melted customer statements — the workload
the reference provisions 1.2 CPU / 4 GB / 6 h for at production scale
(BASELINE.md). Run 2 exercises the incremental path: first_seen carry-over
against version 1 plus the ADD/MOD/DEL delta export.

Usage: python tools/bench_pipeline.py [sf_dir] [replicate]
Prints one JSON line with wall times and statements/second.

`replicate` (default 1) multiplies the customer universe in-plan with
shifted keys — the data-dominated-regime measurement: at ×1 the run is
Spark's fixed job floor; at ×10/×100 the same plan shows its actual
statements/second, which is what a cluster run scales."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from opensanctions_spark.catalog import load
    from opensanctions_spark.model.melt import melt_customers, melt_suppliers
    from opensanctions_spark.plans.run import DatasetConfig, run_dataset
    from opensanctions_spark.session import get_session
    from opensanctions_spark.sources.archive import StatementArchive

    spark = get_session("bench-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").groupBy("n_regionkey").count().count()

    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    work = tempfile.mkdtemp(prefix="bench_pipeline_")
    archive = StatementArchive(spark, os.path.join(work, "archive"))
    config = DatasetConfig(name="customers")

    def replicated(cust):
        if rep <= 1:
            return cust
        max_key = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
        return (
            cust.crossJoin(spark.range(rep).select(F.col("id").alias("_r")))
            .withColumn("c_custkey", F.col("c_custkey") + F.col("_r") * max_key)
            .withColumn("c_name", F.concat(F.col("c_name"), F.lit("#"), F.col("_r")))
            .drop("_r")
            # the sf parquet is a single row-group (one scan task); spread
            # the replicated frame so the pipeline uses every core
            .repartition(spark.sparkContext.defaultParallelism)
        )

    stmts1 = melt_customers(replicated(load(spark, sf_dir, "customer")))
    n_stmts = stmts1.count()

    # replicated runs exercise the cluster sink path (range-ordered
    # multi-part files); ×1 keeps reference parity (one file per sink)
    single_file = rep <= 1

    t0 = time.time()
    r1 = run_dataset(
        spark, stmts1, config, archive,
        os.path.join(work, "out1"), run_time="2026-08-01T00:00:00",
        single_file=single_file,
    )
    t_run1 = time.time() - t0

    # run 2: same corpus with a value drift on every 5th entity → MOD ops
    cust = replicated(load(spark, sf_dir, "customer"))
    drifted = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 1).otherwise(
            F.col("c_acctbal")
        ),
    )
    t0 = time.time()
    r2 = run_dataset(
        spark, melt_customers(drifted), config, archive,
        os.path.join(work, "out2"), run_time="2026-08-13T00:00:00",
        single_file=single_file,
    )
    t_run2 = time.time() - t0

    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "pipeline_e2e",
                "sf_dir": sf_dir,
                "statements": n_stmts,
                "entities": r1.entity_count,
                "run1_sec": round(t_run1, 2),
                "run2_sec": round(t_run2, 2),
                "run2_delta_ops": r2.delta_ops,
                "statements_per_sec_run1": round(n_stmts / t_run1),
                "statements_per_sec_run2": round(n_stmts / t_run2),
                "sinks": sorted(r1.export_counts),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
