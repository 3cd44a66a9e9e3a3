"""Scale-safe interval-overlap range join (SURVEY J7's range primitive).

The reference's edge dedupe needs "do two validity intervals overlap"
(``zavod/zavod/integration/edges.py:129-195`` — partial-ISO interval
overlap: start1 ≤ end2 AND start2 ≤ end1), bucketed by an equi-key. A
plain equi-join on the key makes per-key cost n² with n growing linearly
in the data. The Spark-native scale shape implemented here:

1. explode each interval to the fixed-width epoch windows it touches
   (``sequence(start div W, end div W)`` — fan-out ≈ 1 when W ≫ the
   typical interval length),
2. bucket by (key, window) in ONE shuffle and expand candidate pairs
   inside each bucket with JVM array functions — per-bucket population is
   bounded by the per-key event rate per window, independent of corpus
   size,
3. emit each overlapping pair only in its OWNERSHIP window — the window
   containing the later start, which both intervals' window lists contain
   iff they overlap — so output is exactly-once with zero dedup shuffle.

Expression placement is deliberate: higher-order-function lambdas run
INTERPRETED (outside whole-stage codegen), so only the selective overlap
test lives in the in-bucket filter lambda (pruning the quadratic
expansion before the explode); the ownership-window arithmetic runs as a
plain post-explode predicate inside codegen — moving it into the lambda
measured 1.7× slower at sf1. All window membership tests are pure long
arithmetic (w·W ≤ gs < (w+1)·W), never a float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_windows(
    df: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    window_us: int,
) -> DataFrame:
    """(key, id, start_us, end_us, w) rows: each interval replicated to
    every fixed-width epoch window it touches. Bounds must be non-negative
    longs (µs since epoch) so integer ``div`` is floor division."""
    return df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(start_col).alias("start_us"),
        F.col(end_col).alias("end_us"),
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {window_us}"),
                F.expr(f"{end_col} div {window_us}"),
            )
        ).alias("w"),
    )


def interval_buckets(windows: DataFrame) -> DataFrame:
    """(key, w, members) buckets with ≥2 members; members sorted by id
    (struct's first field) so i<j slice enumeration yields left < right."""
    return (
        windows.groupBy("key", "w")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("id", "start_us", "end_us"))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )


def interval_overlap_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    window_us: int,
) -> DataFrame:
    """All overlapping interval pairs within each key: (key, left_id,
    right_id) with left_id < right_id, each pair exactly once."""
    buckets = interval_buckets(
        interval_windows(df, key_col, id_col, start_col, end_col, window_us)
    )
    pair = F.explode_outer(
        F.flatten(
            F.transform(
                F.col("members"),
                lambda x, i: F.transform(
                    F.filter(
                        F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                        # strict id inequality: duplicate ids within a key
                        # (caller-supplied id column) sort adjacent and
                        # would otherwise emit a left_id == right_id
                        # self-pair, breaking the left < right contract
                        lambda y: (x["id"] < y["id"])
                        & (x["start_us"] <= y["end_us"])
                        & (y["start_us"] <= x["end_us"]),
                    ),
                    lambda y: F.struct(
                        x["id"].alias("left_id"),
                        y["id"].alias("right_id"),
                        F.greatest(x["start_us"], y["start_us"]).alias("gs"),
                    ),
                ),
            )
        )
    )
    # explode_outer + null filter: plain explode of a computed array
    # triggers InferFiltersFromGenerate expression duplication (see
    # operators/blocking.tokenize)
    return (
        buckets.select("key", "w", pair.alias("p"))
        .filter(F.col("p").isNotNull())
        .filter(
            (F.col("p.gs") >= F.col("w") * F.lit(window_us))
            & (F.col("p.gs") < (F.col("w") + F.lit(1)) * F.lit(window_us))
        )
        .select("key", "p.left_id", "p.right_id")
    )


def expansion_cost(
    df: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    window_us: int,
) -> int:
    """Σ per-bucket n(n-1)/2 — the number of candidate comparisons the
    pair stage performs. The scaling gate asserts this grows ~linearly
    when the data doubles (a naive per-key join would quadruple)."""
    buckets = interval_buckets(
        interval_windows(df, key_col, id_col, start_col, end_col, window_us)
    )
    row = buckets.select(
        F.sum(
            (F.size("members") * (F.size("members") - 1) / 2).cast("long")
        ).alias("cost")
    ).collect()[0]
    return int(row["cost"] or 0)
