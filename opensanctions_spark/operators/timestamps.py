"""first_seen propagation from the previous run (SURVEY J1).

The reference builds a LevelDB index (statement id → first_seen) from the
previous version and probes it at emit time
(``zavod/zavod/runtime/timestamps.py:26-56``, probe
``zavod/zavod/context.py:645-660``). The Spark rendering is a left join of
the current statements against the previous version's (id, first_seen)
projection, coalescing misses to the run timestamp.

Scale: the previous index projection is two narrow string columns — at
OFAC scale it broadcasts; at 100 TB it becomes a co-partitioned sort-merge
join on the content-hash id, which is uniformly distributed by
construction (no skew possible on a hash key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_first_seen(
    curr: DataFrame,
    prev: DataFrame,
    run_time: str,
    id_col: str = "id",
    cluster_col: str | None = None,
) -> DataFrame:
    """Stamp first_seen from prev where the statement already existed.

    ``cluster_col`` (usually ``canonical_id``) switches the probe from a
    join on the statement id alone to a join on (cluster key, id) rows,
    the prev side deduplicated per (cluster, id) first. Why this
    matters at scale: the id is a content hash,
    so an id-keyed join re-exchanges BOTH full sides every incremental
    run; the cluster key is the column the archive's bucketed layout
    already clusters on, so the prev side aggregates and joins with ZERO
    exchange and the current side pays exactly one exchange — the same
    one the bucketed write and the assembly need anyway (SCALE.md §21c).

    Only valid when equal ids imply equal cluster values on both sides —
    i.e. both frames carry canonical ids from the SAME resolver snapshot
    (the run plan guarantees this via the manifest fingerprint).

    The cluster path joins on (cluster_col, id_col) ROWS — deliberately
    not one id→first_seen map per cluster: a heavy-hitter entity (the
    skew rehearsal's 150k-statement key) would materialize a single
    multi-MB aggregate row that blows task memory in whatever stage
    carries it, while plain rows just sort within the entity's
    partition. The subset-key clustering reuse needs
    ``spark.sql.requireAllClusterKeysForCoPartition=false`` (an engine
    session default)."""
    if cluster_col is None:
        index = prev.select(
            F.col(id_col).alias("_ts_id"),
            F.col("first_seen").alias("_prev_first_seen"),
        )
        return (
            curr.join(index, curr[id_col] == index["_ts_id"], "left")
            .withColumn(
                "first_seen", F.coalesce(F.col("_prev_first_seen"), F.lit(run_time))
            )
            .drop("_ts_id", "_prev_first_seen")
        )
    # the (cluster, id) agg rides the bucketed scan exchange-free
    # (subset clustering satisfies aggregation distribution) and
    # guarantees key uniqueness so the left join cannot fan out
    index = (
        prev.groupBy(
            F.col(cluster_col), F.col(id_col).alias("_ts_id")
        )
        .agg(F.min("first_seen").alias("_prev_first_seen"))
    )
    return (
        curr.join(
            index,
            (curr[cluster_col] == index[cluster_col])
            & (curr[id_col] == index["_ts_id"]),
            "left",
        )
        .drop(index[cluster_col])
        .withColumn(
            "first_seen", F.coalesce(F.col("_prev_first_seen"), F.lit(run_time))
        )
        .drop("_ts_id", "_prev_first_seen")
    )
