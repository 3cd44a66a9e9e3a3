"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``opensanctions_spark.catalog`` — one entry per
implemented operator from SURVEY.md §2, keyed by operator id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the statement→entity
    assembly (SURVEY A1) — melt customers into the canonical statements IR
    and aggregate back into entities with schema widening."""
    from opensanctions_spark.catalog import QUERIES

    return QUERIES["a1_entity_assembly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from opensanctions_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (same column aliases as the Spark side)."""
    from opensanctions_spark.catalog import ORACLES

    return dict(ORACLES)
