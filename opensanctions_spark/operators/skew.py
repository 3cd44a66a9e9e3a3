"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles most runtime skew; salting is the
explicit-plan fallback for the pathological cases a 100 TB corpus throws
up (one mega-entity with millions of statements, one stopword-ish blocking
token): spread each hot key over N salt buckets, aggregate partially per
(key, salt), then reduce the N partials — identical results to the direct
groupBy, but no single reducer ever sees a whole hot key.

The reference never needs this (single-node LevelDB sort), but its
candidate caps (``zavod/zavod/integration/dedupe.py:47-56``) are the same
idea: bound the worst key's cost explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """groupBy(key).agg(sum, count) computed in two salted phases.

    Phase 1 shuffles on (key, salt) — at most 1/n_salts of any hot key per
    reducer; phase 2 reduces the ≤ n_salts partials per key (tiny). The
    salt must be deterministic for the oracle/testing contract, so it
    hashes a uniformly-distributed existing column (`salt_source`,
    default: the value column) instead of rand().
    """
    src = salt_source or value_col
    salt = F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(F.col(value_col)).alias("_psum"),
            F.count("*").alias("_pcnt"),
        )
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.sum("_psum").alias("total"),
            F.sum("_pcnt").alias("n_rows"),
        )
    )


def replicate_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side
    across every salt bucket, join on (key, salt). Equivalent to the plain
    equi-join; use when the small side is broadcastable but the big side's
    key histogram is too skewed for even AQE splitting."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt_r")
    replicated = small.select("*", salts)
    return (
        salted_big.join(
            F.broadcast(replicated),
            (F.col(big_key) == F.col(small_key))
            & (F.col("_salt") == F.col("_salt_r")),
        )
        .drop("_salt")
        .drop("_salt_r")
    )
