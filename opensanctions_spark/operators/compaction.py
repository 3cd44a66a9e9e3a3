"""Archive small-file compaction: plan + apply.

A long-running statement archive (S10, ``sources/archive.py``)
accumulates small parquet files — every incremental crawl writes a new
version, and at 100 TB the file count (not the byte count) becomes the
scan bottleneck: each file costs a task, a footer read, and a name-node
round trip. The reference never needs this because it rewrites whole
datasets per run (``zavod/zavod/archive/__init__.py`` publishes complete
artifacts); an incremental Spark archive does.

Two pieces:

- ``compaction_plan`` — assign files to target-size output buckets with
  a next-fit pass over the running byte total: bucket =
  floor(cumsum_before / target). One window over the file MANIFEST
  (one row per file — millions of rows at the extreme, never data-
  proportional), partitioned by dataset so each dataset plans
  independently and the window never concentrates more than one
  dataset's manifest on an executor. Without a dataset column the plan
  is a two-pass distributed prefix sum (range-partition on path →
  per-partition running totals + broadcast partition offsets) — never a
  single-partition global window, so a million-file flat manifest still
  plans in parallel. Files keep their path order, so
  compaction preserves the archive's write-time locality (versions stay
  adjacent) and the plan is byte-for-byte reproducible — the property
  the DuckDB oracle checks.
- ``apply_compaction`` — one job, one shuffle: read all planned files,
  tag each row with its bucket via a broadcast join on the plan
  (``input_file_name()`` as the key), hash-repartition on the bucket
  and write ``partitionBy(bucket)``. Every byte moves exactly once;
  output file count ≈ bucket count regardless of input file count.

Next-fit (not best-fit/FFD) is deliberate: it is the only bin-packing
variant expressible as a single window pass — no sort by size, no
driver loop — and its worst case (2× bins) only occurs with adversarial
size sequences; archive packs are near-uniform per version. A file
larger than the target gets its own bucket(s downstream splitting is
the parquet writer's row-group job, not the planner's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    path_col: str = "path",
    size_col: str = "size_bytes",
    dataset_col: str | None = None,
) -> DataFrame:
    """(path, size_bytes[, dataset], bucket) — next-fit bucket assignment
    over the path-ordered running total. Deterministic: same manifest →
    same plan."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    if dataset_col is not None:
        win = Window.partitionBy(dataset_col).orderBy(path_col)
        cum_before = F.coalesce(
            F.sum(F.col(size_col)).over(
                win.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        )
        bucket = F.floor(cum_before / F.lit(target_bytes)).cast("long")
        return files.select(
            F.col(dataset_col),
            F.col(path_col),
            F.col(size_col).cast("long").alias(size_col),
            bucket.alias("bucket"),
        )
    return _global_plan(files, target_bytes, path_col, size_col)


def _global_plan(
    files: DataFrame, target_bytes: int, path_col: str, size_col: str
) -> DataFrame:
    """Global (no dataset column) next-fit plan as a two-pass distributed
    prefix sum — never a single-partition window.

    Pass 1: range-partition the manifest on path (contiguous path ranges
    per partition, global order preserved across partitions) and collect
    one row per PARTITION (the partition byte totals — bounded by the
    shuffle-partition count, never by the manifest size). Pass 2: turn
    the totals into per-partition starting offsets driver-side, broadcast
    them back, and add each row's within-partition running total. The
    resulting ``cum_before`` is byte-identical to the single global
    window the old implementation used, but every stage is parallel.

    Determinism note: ``spark_partition_id()`` is stable here because
    range-partition boundaries are a pure function of the input sample
    (Spark seeds the sampler by partition index), so the two jobs that
    re-evaluate the ranged scan see identical ids.
    """
    ranged = files.repartitionByRange(
        files.sparkSession.sparkContext.defaultParallelism, F.col(path_col)
    ).withColumn("__pid", F.spark_partition_id())
    totals = (
        ranged.groupBy("__pid")
        .agg(F.sum(F.col(size_col)).cast("long").alias("__ptotal"))
        .collect()
    )  # one row per partition — bounded by parallelism, not manifest size
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], running))
        running += row["__ptotal"]
    spark = files.sparkSession
    if not offsets:
        offset_df = spark.createDataFrame([], "__pid INT, __offset LONG")
    else:
        offset_df = spark.createDataFrame(offsets, "__pid INT, __offset LONG")
    local_win = Window.partitionBy("__pid").orderBy(path_col)
    local_before = F.coalesce(
        F.sum(F.col(size_col)).over(
            local_win.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    cum_before = F.col("__offset") + local_before
    bucket = F.floor(cum_before / F.lit(target_bytes)).cast("long")
    return (
        ranged.join(F.broadcast(offset_df), "__pid")
        .select(
            F.col(path_col),
            F.col(size_col).cast("long").alias(size_col),
            bucket.alias("bucket"),
        )
    )


def plan_for_dir(
    spark: SparkSession, directory: str, target_bytes: int
) -> DataFrame:
    """Build the file manifest for a local/posix directory (driver-side
    bounded listing — the same class of manifest op as the archive's
    version index) and plan it."""
    import os

    rows = []
    for root, _dirs, names in os.walk(directory):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rows.append((full, os.path.getsize(full)))
    manifest = spark.createDataFrame(rows, "path STRING, size_bytes LONG")
    return compaction_plan(manifest, target_bytes)


def apply_compaction(
    spark: SparkSession, plan: DataFrame, dest_dir: str
) -> int:
    """Execute a plan: one read over all planned files, bucket tag via a
    broadcast join on ``input_file_name()``, one hash shuffle on the
    bucket, ``partitionBy('bucket')`` write. Returns the bucket count."""
    plan_rows = plan.select("path", "bucket").collect()  # manifest-bounded
    if not plan_rows:
        return 0
    paths = [r["path"] for r in plan_rows]
    n_buckets = len({r["bucket"] for r in plan_rows})
    mapping = spark.createDataFrame(
        [(r["path"], r["bucket"]) for r in plan_rows],
        "__file STRING, __bucket LONG",
    )
    # file:// prefix tolerance: input_file_name returns a URI
    data = spark.read.parquet(*paths).withColumn(
        "__file",
        F.regexp_replace(F.input_file_name(), r"^file:(//)?", ""),
    )
    tagged = data.join(F.broadcast(mapping), "__file").drop("__file")
    (
        tagged.repartition(n_buckets, "__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(dest_dir)
    )
    return n_buckets
