"""As-of (point-in-time) join — a custom operator Spark's API lacks.

Semantics: for every left row, attach the single right row with the same
key and the greatest right-timestamp ≤ the left row's timestamp (the
"latest known state as of then" lookup of feature stores, tick data, and
slowly-changing dimensions).

Implementation is the scale-correct union trick, NOT a theta-join: tag
both sides, union them, and run ONE window (partitioned by key, ordered
by timestamp with right rows sorting before simultaneous left rows) where
``last_value(right_payload) ignore nulls`` carries the most recent right
row forward onto each left row. Cost: one shuffle on the key + a sort —
the same price as a sort-merge join, with no per-row range probing and no
candidate blow-up; a naive ``left.ts >= right.ts`` theta-join materializes
O(n·m) pairs per key before aggregation, which dies at 100 TB.

DuckDB has this operator built in (ASOF JOIN), which the catalog query
uses as its oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Left as-of join: left columns + the payload columns of the latest
    right row with right[right_ts] <= left[left_ts] on the same key
    (NULL payload when no right row precedes).

    Ties (right_ts == left_ts) match, per the usual as-of convention —
    the union sorts right rows first at equal timestamps (_side 0 < 1).
    """
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(
            right.select(F.struct(*payload).alias("p")).schema["p"].dataType
        ).alias("_payload"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("l")).schema["l"].dataType
        ).alias("_left"),
        F.struct(*payload).alias("_payload"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: Column = F.last("_payload", ignorenulls=True).over(w)
    out = (
        unioned.withColumn("_asof", carried)
        .filter(F.col("_side") == 1)
        .select("_left.*", "_asof")
    )
    for c in payload:
        out = out.withColumn(c, F.col(f"_asof.{c}"))
    return out.drop("_asof")
