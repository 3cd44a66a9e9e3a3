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


def delta_export_rows(diff: DataFrame, entities: DataFrame,
                      key: str = "canonical_id") -> DataFrame:
    """The reference's delta line format
    (``zavod/zavod/exporters/delta.py:29-38``): one JSON document per
    changed entity — ``{"op": "ADD"|"MOD", "entity": {...full entity}}``
    for upserts (the consolidated entity joined from the current view),
    ``{"op": "DEL", "entity": {"id": ...}}`` for deletions. Columns
    (canonical_id, line) so writers can order deterministically.

    One left join of the (small) diff frame against the entity view —
    at scale AQE broadcasts the diff side, so the view is never
    re-shuffled for the delta."""
    from opensanctions_spark.exporters import target_flag

    ent = entities.select(
        F.col("canonical_id").alias("_k"),
        F.to_json(
            F.struct(
                F.col("canonical_id").alias("id"),
                F.col("schema"),
                F.col("properties"),
                target_flag(F.col("properties")).alias("target"),
                *(
                    [F.col("first_seen"), F.col("last_seen")]
                    if "first_seen" in entities.columns
                    else []
                ),
            )
        ).alias("_entity"),
    )
    joined = diff.join(ent, diff[key] == F.col("_k"), "left")
    del_line = F.to_json(
        F.struct(
            F.col("op"),
            F.struct(F.col(key).alias("id")).alias("entity"),
        )
    )
    ups_line = F.concat(
        F.lit('{"op": "'), F.col("op"), F.lit('", "entity": '),
        F.coalesce(F.col("_entity"), F.concat(F.lit('{"id": "'), F.col(key), F.lit('"}'))),
        F.lit("}"),
    )
    return joined.select(
        F.col(key),
        F.when(F.col("op") == "DEL", del_line).otherwise(ups_line).alias("line"),
    )


def scd2_intervals(history: DataFrame, key: str = "entity_id",
                   version_col: str = "version",
                   hash_col: str = "entity_hash") -> DataFrame:
    """Collapse a per-version hash history into SCD-2 validity intervals.

    Input: one row per (entity, version) with the entity's content hash at
    that version (the D0 hash over any number of archived runs,
    ``zavod/zavod/runtime/delta.py:46-63``). Output: one row per contiguous
    run of identical hashes — (key, entity_hash, valid_from, valid_to,
    is_current) — the slowly-changing-dimension type-2 view of the
    versioned archive, generalizing first_seen/last_seen from statements
    to whole-entity granularity.

    Single window partitioned by entity, ordered by version: a change
    flag (hash != lag(hash)) marks interval starts; interval ends come
    from lead(version) over the starts. Two passes over one partitioning
    — no joins, no second shuffle. At 100 TB the version axis is tiny
    (bounded history window per the archive's versions.json), so the
    partition is always small; the shuffle key is the uniform entity id.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(version_col)
    changed = history.withColumn(
        "_new",
        (
            F.lag(hash_col).over(w).isNull()
            | (F.col(hash_col) != F.lag(hash_col).over(w))
        ).cast("int"),
    )
    starts = changed.filter(F.col("_new") == 1)
    w2 = Window.partitionBy(key).orderBy(version_col)
    return starts.select(
        F.col(key),
        F.col(hash_col),
        F.col(version_col).alias("valid_from"),
        F.lead(version_col).over(w2).alias("valid_to"),
        F.lead(version_col).over(w2).isNull().alias("is_current"),
    )
