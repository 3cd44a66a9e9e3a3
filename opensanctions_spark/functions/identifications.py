"""Identification / Passport entity factory (SURVEY §2 entity-factory
family, ``zavod/zavod/helpers/identification.py:9-76``).

The reference's ``make_identification`` builds one Identification (or
Passport) entity per (holder, number) pair — id =
``make_id(holder_id, number, doc_type, key)`` — with holder / number /
type / country / authority / summary / startDate / endDate properties,
and mirrors the number back onto the holder as ``idNumber`` (or
``passportNumber`` when ``passport=True``). Rows with a NULL number
emit nothing (identification.py:57-58).

Spark rendering: a single stack projection — every property row for
both entities comes out of one ``F.inline`` over the source scan, so
the factory is map-only (no shuffle, no UDF) and the P5 empty-value
guard in ``finish_statements`` performs the same null-dropping the
reference does via ``Entity.add``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.model.melt import finish_statements


def make_identification_id(
    holder_id: Column,
    number: Column,
    doc_type: Column | None = None,
    key: Column | None = None,
) -> Column:
    """Deterministic identification entity id — the reference hashes
    (holder.id, number, doc_type, key) (identification.py:61); md5 here
    for DuckDB-oracle parity. NULL number → NULL id (row is dropped)."""
    parts = [holder_id, number]
    for extra in (doc_type, key):
        if extra is not None:
            parts.append(F.coalesce(extra, F.lit("")))
    return F.when(
        number.isNotNull(),
        F.concat(F.lit("id-"), F.md5(F.concat_ws("|", *parts))),
    )


def make_identification_statements(
    df: DataFrame,
    dataset: str,
    holder_col: str,
    number_col: str,
    doc_type_col: str | None = None,
    country_col: str | None = None,
    authority_col: str | None = None,
    summary_col: str | None = None,
    start_col: str | None = None,
    end_col: str | None = None,
    key_col: str | None = None,
    passport: Column | bool = False,
    holder_schema: Column | str = "Person",
) -> DataFrame:
    """Mention rows → Identification/Passport statements in the
    engine's IR, plus the holder's ``idNumber``/``passportNumber``
    back-reference — the exact emit set of ``make_identification``
    (identification.py:62-75), as one map-only stack projection.

    ``passport`` may be a literal or a per-row boolean column: True
    rows become Passport entities and stamp ``passportNumber`` on the
    holder, mirroring the reference's branch (identification.py:71-74).

    ``holder_schema`` is the schema the back-reference statement carries
    — the reference adds idNumber/passportNumber to the EXISTING holder
    entity with its own schema, so under lattice-rank widening
    (a1_entity_assembly) a LegalEntity holder must not be widened to
    Person; pass the holder's schema column (or a literal) here.
    """
    is_pass = passport if isinstance(passport, Column) else F.lit(bool(passport))
    number = F.col(number_col)
    holder = F.col(holder_col)
    ident_id = make_identification_id(
        holder,
        number,
        F.col(doc_type_col) if doc_type_col else None,
        F.col(key_col) if key_col else None,
    )
    ident_schema = F.when(is_pass, F.lit("Passport")).otherwise(
        F.lit("Identification")
    )

    def prop(name: str, value: Column) -> Column:
        return F.struct(
            ident_id.alias("entity_id"),
            ident_schema.alias("schema"),
            F.lit(name).alias("prop"),
            value.cast("string").alias("value"),
        )

    rows = [
        prop("holder", holder),
        prop("number", number),
    ]
    optional = {
        "type": doc_type_col,
        "country": country_col,
        "authority": authority_col,
        "summary": summary_col,
        "startDate": start_col,
        "endDate": end_col,
    }
    for name, col in optional.items():
        if col is not None:
            rows.append(prop(name, F.col(col)))
    holder_schema_col = (
        holder_schema
        if isinstance(holder_schema, Column)
        else F.lit(str(holder_schema))
    )
    # the holder back-reference (identification.py:71-74)
    rows.append(
        F.struct(
            holder.alias("entity_id"),
            holder_schema_col.alias("schema"),
            F.when(is_pass, F.lit("passportNumber"))
            .otherwise(F.lit("idNumber"))
            .alias("prop"),
            number.cast("string").alias("value"),
        )
    )

    stacked = df.filter(number.isNotNull()).select(F.inline(F.array(*rows)))
    return finish_statements(stacked, dataset=dataset)
