"""Key-distribution profiling: the diagnostic that decides salting.

Every skew mitigation in this engine (salted aggregation, AQE skew
join, the blocking skew cap in ``operators/blocking.py``, the stop-band
cap in MinHash LSH) is parameterized by a question the data has to
answer first: *which keys are hot, and how hot?* At 100 TB you cannot
eyeball that — this operator computes it as one aggregation pass.

``key_skew_profile`` returns the top-k heavy hitters of a key column
with exact counts, each key's share of the total (integer ppm — the
engine's cross-engine-stable fraction idiom), and its ratio to the mean
key load (integer permille). ``skew_ratio >> 1000`` on a join/group key
is the signal to salt; the blocking cap and the LSH stop-band take the
hitter list directly.

Cost shape: one shuffle (the count groupBy, map-side combined), then a
top-k over the per-key counts — the second stage's input is one row per
DISTINCT key, not per row, so the sort is on the already-reduced table.
Exact counts, not count-min: the per-key table is the reduced side, and
an approximate hitter list that misses a hot key defeats the purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Top-k heavy hitters of ``key_col``: (key, cnt, share_ppm,
    skew_permille, rk) ordered by count desc with the key as the
    deterministic tie-break. ``skew_permille`` = 1000 × cnt / (rows /
    distinct keys) — 1000 means a perfectly balanced key."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject — a
    # distributed partial top-k with per-partition heaps, NOT a global
    # sort; a row_number window here would instead funnel every distinct
    # key through one partition. rk is then a window over k rows only.
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    ranked = top.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("key"))),
    )
    return (
        ranked.select(
            "key",
            "cnt",
            # explicit floor: DuckDB ROUNDS on double→int casts while
            # Spark truncates — floor makes both engines agree
            F.floor(F.col("cnt") * 1_000_000 / F.col("total_rows"))
            .cast("long")
            .alias("share_ppm"),
            F.floor(
                F.col("cnt") * 1000 * F.col("distinct_keys") / F.col("total_rows")
            )
            .cast("long")
            .alias("skew_permille"),
            F.col("rk").cast("long").alias("rk"),
        )
    )
