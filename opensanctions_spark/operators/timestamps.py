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
    curr: DataFrame, prev: DataFrame, run_time: str, id_col: str = "id"
) -> DataFrame:
    """Stamp first_seen from prev where the statement already existed."""
    index = prev.select(
        F.col(id_col).alias("_ts_id"), F.col("first_seen").alias("_prev_first_seen")
    )
    out = (
        curr.join(index, curr[id_col] == index["_ts_id"], "left")
        .withColumn(
            "first_seen", F.coalesce(F.col("_prev_first_seen"), F.lit(run_time))
        )
        .drop("_ts_id", "_prev_first_seen")
    )
    return out
