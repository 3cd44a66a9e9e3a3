"""Melt wide source tables into the canonical statements DataFrame.

The reference's crawlers are flatMap(source row) → statements
(``zavod/zavod/crawl.py:19-47``); for the synthetic star-schema test tables
the equivalent is a declarative UNPIVOT (``stack``) that Catalyst folds into
the scan — no Python executes per row.

The statement ``id`` is the content hash over
(dataset, entity_id, prop, value, external), matching the reference's
emit-time hash id (``zavod/zavod/context.py:646-666``); md5 is used because
the DuckDB oracle of the test harness lacks sha1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RUN_TIME = "2026-08-13T00:00:00"


def statement_id(
    dataset: Column, entity_id: Column, prop: Column, value: Column
) -> Column:
    """Deterministic content-hash statement id."""
    return F.md5(F.concat_ws("|", dataset, entity_id, prop, value))


def finish_statements(df: DataFrame, dataset: str, schema_name: str | None = None) -> DataFrame:
    """Stamp provenance columns onto a (entity_id, prop, value[, schema]) frame.

    Mirrors the emit-time stamping of zavod/zavod/context.py:622-666: drop
    null/empty values (P5 guard, zavod/zavod/entity.py:47-48), add dataset,
    hash id, external flag and seen-timestamps.
    """
    out = df.filter(F.col("value").isNotNull() & (F.length("value") > 0))
    if schema_name is not None:
        out = out.withColumn("schema", F.lit(schema_name))
    out = (
        out.withColumn("dataset", F.lit(dataset))
        .withColumn("canonical_id", F.col("entity_id"))
        .withColumn(
            "id",
            statement_id(F.col("dataset"), F.col("entity_id"), F.col("prop"), F.col("value")),
        )
    )
    # keep a caller-provided external flag (enrichment emits externals,
    # zavod/zavod/runner/enrich.py:161-199); default False
    if "external" not in df.columns:
        out = out.withColumn("external", F.lit(False))
    # provenance columns: keep caller-provided values (factories that stamp
    # per-row origin/original_value, e.g. make_sanction's metadata-origin
    # statements), default to NULL
    for prov in ("lang", "origin", "original_value"):
        if prov not in df.columns:
            out = out.withColumn(prov, F.lit(None).cast("string"))
    # seen-timestamps: keep caller-provided columns (multi-run emit shapes
    # stamp per-row times in one projection), default to the run time
    if "first_seen" not in df.columns:
        out = out.withColumn("first_seen", F.lit(RUN_TIME))
    if "last_seen" not in df.columns:
        out = out.withColumn("last_seen", F.lit(RUN_TIME))
    return out.select(
        "id", "entity_id", "canonical_id", "prop", "schema", "value",
        "dataset", "lang", "origin", "original_value", "external",
        "first_seen", "last_seen",
    )


def melt_customers(customer: DataFrame) -> DataFrame:
    """customer table → Person-ish statements (FIXTURES.md F-6 row 1).

    One source row fans out to one statement per non-null property — the
    Spark analogue of a crawler's ``entity.add`` loop
    (``zavod/zavod/tests/fixtures/testdataset1/testentrypoint1.py:12-53``).
    """
    stacked = customer.select(
        F.concat(F.lit("c-"), F.col("c_custkey")).alias("entity_id"),
        F.expr(
            "stack(4, "
            "'name', c_name, "
            "'country', cast(c_nationkey as string), "
            "'balance', cast(c_acctbal as string), "
            "'segment', c_mktsegment) as (prop, value)"
        ),
    )
    return finish_statements(stacked, dataset="customers", schema_name="LegalEntity")


def melt_suppliers(supplier: DataFrame) -> DataFrame:
    """supplier table → Company-ish statements."""
    stacked = supplier.select(
        F.concat(F.lit("s-"), F.col("s_suppkey")).alias("entity_id"),
        F.expr(
            "stack(3, "
            "'name', s_name, "
            "'country', cast(s_nationkey as string), "
            "'balance', cast(s_acctbal as string)) as (prop, value)"
        ),
    )
    return finish_statements(stacked, dataset="suppliers", schema_name="Company")


MELT_CUSTOMERS_SQL = """
WITH stmts AS (
    SELECT 'c-' || c_custkey AS entity_id, 'name' AS prop, c_name AS value FROM customer
    UNION ALL
    SELECT 'c-' || c_custkey, 'country', CAST(c_nationkey AS VARCHAR) FROM customer
    UNION ALL
    SELECT 'c-' || c_custkey, 'balance', CAST(c_acctbal AS VARCHAR) FROM customer
    UNION ALL
    SELECT 'c-' || c_custkey, 'segment', c_mktsegment FROM customer
)
SELECT
    md5('customers' || '|' || entity_id || '|' || prop || '|' || value) AS id,
    entity_id,
    entity_id AS canonical_id,
    prop,
    'LegalEntity' AS schema,
    value,
    'customers' AS dataset,
    FALSE AS external
FROM stmts
WHERE value IS NOT NULL AND len(value) > 0
"""
