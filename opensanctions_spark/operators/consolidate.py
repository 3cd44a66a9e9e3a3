"""Consolidation window ops: prefix-date dedup, name reduction (SURVEY A8-A10, T4).

ISO *prefix* dates (``1990``, ``1990-05``, ``1990-05-01``) are first-class
in the reference; consolidation drops values that are proper prefixes of a
longer value present for the same entity+prop
(``zavod/zavod/exporters/consolidate.py:48-90``).

Lexicographic insight that makes this a single window pass: in descending
sort order, if ANY value extends v, then the value immediately before v
extends v (any string between v and an extension of v must itself start
with v). So `lag` over a desc-ordered window decides prefix-ness with one
shuffle, no self-join — O(n log n) per entity instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_prefix_values(
    df: DataFrame, keys: list[str], value_col: str = "value"
) -> DataFrame:
    """Within each key group, drop values that are proper prefixes of a
    longer value in the same group. Input rows are deduplicated first."""
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).desc())
    dedup = df.select(*keys, value_col).distinct()
    prev = F.lag(F.col(value_col)).over(w)
    return (
        dedup.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | ~F.col("_prev").startswith(F.col(value_col)))
        .drop("_prev")
    )


def min_max_dates(df: DataFrame, keys: list[str], value_col: str = "value") -> DataFrame:
    """Provenance-date reduction: keep only min and max per group
    (``zavod/zavod/exporters/consolidate.py:76-84`` PROV-prop path).
    Prefix dates order correctly as strings — the reference exploits the
    same property (``zavod/zavod/helpers/sanctions.py:106-112``)."""
    return df.groupBy(*keys).agg(
        F.min(value_col).alias("min_value"), F.max(value_col).alias("max_value")
    )


def reduce_names(df: DataFrame, id_col: str = "canonical_id") -> DataFrame:
    """Name reduction (A9, ``zavod/zavod/exporters/consolidate.py:123-170``):

    - weak aliases are demoted (dropped) when the entity has any strong
      name (kind 'name'/'alias'),
    - case-insensitive duplicates collapse to one casing (the
      lexicographically-first, deterministically),
    - rows flagged ``protected`` (the reference's protected-datasets list)
      are always kept as-is.

    Input columns: id_col, name, kind ('name'|'alias'|'weakAlias')
    [, protected bool]. One window + one groupBy, no Python per row.
    """
    if "protected" not in df.columns:
        df = df.withColumn("protected", F.lit(False))
    w = Window.partitionBy(id_col)
    has_strong = F.max(
        F.when(F.col("kind").isin("name", "alias"), 1).otherwise(0)
    ).over(w)
    kept = df.withColumn("_strong", has_strong).filter(
        F.col("protected") | (F.col("kind") != "weakAlias") | (F.col("_strong") == 0)
    )
    return (
        kept.groupBy(id_col, F.lower(F.col("name")).alias("_ci"))
        .agg(
            F.min("name").alias("name"),
            F.max_by("kind", F.when(F.col("kind") == "name", 2).otherwise(1)).alias("kind"),
            F.max("protected").alias("protected"),
        )
        .drop("_ci")
    )


def collapse_undirected_edges(df: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Normalize undirected edge endpoints to (least, greatest) order —
    the bucket key of edge dedupe (``zavod/zavod/integration/edges.py:78-110``)
    and of the doubled-endpoint cleanup (A10)."""
    return df.withColumn("_lo", F.least(F.col(src_col), F.col(dst_col))).withColumn(
        "_hi", F.greatest(F.col(src_col), F.col(dst_col))
    ).drop(src_col, dst_col).withColumnRenamed("_lo", src_col).withColumnRenamed(
        "_hi", dst_col
    )
