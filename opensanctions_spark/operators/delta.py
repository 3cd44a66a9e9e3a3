"""Version deltas: entity content hash + ADD/MOD/DEL diff (SURVEY D0/D1).

The reference walks two sorted hash files to classify entity changes
between run versions (``zavod/zavod/runtime/delta.py:46-102``); the exporter
serializes them as delta ops (``zavod/zavod/exporters/delta.py:26-55``).
On Spark the same semantics are one full-outer sort-merge join on entity_id
— exactly the physical plan the reference hand-codes, but spill-safe and
distributed. At 100 TB both sides are hash-partitioned by entity_id and the
join co-locates; no broadcast (both sides are full snapshots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def entity_hash(*parts: Column) -> Column:
    """Content hash over an entity's ordered (schema, prop, value) material.

    Mirrors ``zavod/zavod/runtime/delta.py:49-56`` (sha1 over sorted
    statement material); md5 here for oracle parity.
    """
    return F.md5(F.concat_ws("|", *parts))


def hashed_entities(statements: DataFrame) -> DataFrame:
    """(canonical_id, entity_hash) from a statements frame.

    Hash = md5 over the sorted distinct "prop=value" pairs, so it is
    invariant to statement order and duplication — matching the
    reference's sorted-dict hashing.
    """
    return (
        statements.groupBy("canonical_id")
        .agg(
            F.array_sort(
                F.collect_set(F.concat_ws("=", F.col("prop"), F.col("value")))
            ).alias("material")
        )
        .select(
            "canonical_id",
            F.md5(F.array_join(F.col("material"), "|")).alias("entity_hash"),
        )
    )


def version_diff(prev: DataFrame, curr: DataFrame, key: str = "canonical_id",
                 hash_col: str = "entity_hash") -> DataFrame:
    """Classify entities as ADD / MOD / DEL between two versions.

    Returns (key, op) for changed entities only — unchanged rows are
    dropped, like the reference's delta stream.
    """
    p = prev.select(F.col(key).alias("k"), F.col(hash_col).alias("prev_hash"))
    c = curr.select(F.col(key).alias("k"), F.col(hash_col).alias("curr_hash"))
    joined = p.join(c, "k", "full_outer")
    return (
        joined.select(
            F.col("k").alias(key),
            F.when(F.col("prev_hash").isNull(), F.lit("ADD"))
            .when(F.col("curr_hash").isNull(), F.lit("DEL"))
            .when(F.col("prev_hash") != F.col("curr_hash"), F.lit("MOD"))
            .alias("op"),
        )
        .filter(F.col("op").isNotNull())
    )
