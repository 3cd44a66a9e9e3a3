"""Security-entity helpers (``zavod/zavod/helpers/securities.py``).

The reference builds a Security entity from an ISIN: id ``isin-{ISIN}``,
the ISIN as a property, and — unless the prefix is one of the
international/cleared pseudo-codes — the first two letters as an
INFERRED country. Column-form here: three pure expressions that fold
into any projection, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ISIN prefixes that are NOT country codes
#: (``zavod/zavod/helpers/securities.py:5``): international (XS…),
#: cleared/settled pseudo-jurisdictions.
ISIN_NON_COUNTRY = ("XS", "XD", "XC", "XF", "CS", "QS")

#: provenance marker for values the pipeline derived rather than read
#: (``zavod/zavod/constants.py`` ORIGIN_INFERRED)
ORIGIN_INFERRED = "inferred"


def security_id(isin: Column) -> Column:
    """``isin-{ISIN}`` entity id (securities.py:11-12); NULL passes."""
    up = F.upper(isin)
    return F.when(up.isNotNull(), F.concat(F.lit("isin-"), up))


def security_country(isin: Column) -> Column:
    """The inferred country: first two letters of the ISIN, NULL for the
    non-country prefixes (securities.py:14-16)."""
    cc = F.substring(F.upper(isin), 1, 2)
    return F.when(~cc.isin(*ISIN_NON_COUNTRY), cc)


def make_security_statements(
    df: DataFrame, isin_col: str, dataset: str
) -> DataFrame:
    """ISIN column → Security statements in the engine's IR: one ``isin``
    statement always, one ``country`` statement with ``origin='inferred'``
    when the prefix is a real country — the exact emit set of
    ``make_security`` (securities.py:8-17), as one stack projection."""
    from opensanctions_spark.model.melt import finish_statements

    up = F.upper(F.col(isin_col))
    # one stack projection, one scan: the country row carries NULL when the
    # prefix is a pseudo-code and the P5 guard in finish_statements drops it
    stacked = df.filter(up.isNotNull()).select(
        security_id(F.col(isin_col)).alias("entity_id"),
        F.inline(
            F.array(
                F.struct(F.lit("isin").alias("prop"), up.alias("value")),
                F.struct(
                    F.lit("country").alias("prop"),
                    security_country(F.col(isin_col)).alias("value"),
                ),
            )
        ),
    )
    out = finish_statements(stacked, dataset=dataset, schema_name="Security")
    return out.withColumn(
        "origin",
        F.when(F.col("prop") == "country", F.lit(ORIGIN_INFERRED)).otherwise(
            F.lit(None).cast("string")
        ),
    )
