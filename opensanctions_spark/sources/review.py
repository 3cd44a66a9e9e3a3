"""Human review source (SURVEY §2.1 S12,
``zavod/zavod/stateful/review.py:44-538``): machine extractions flow
through an accept/reject workflow table; only accepted rows (with any
human corrections applied) enter the pipeline.

The review table is an external store (the reference uses SQL) read as a
DataFrame; merging is one broadcast join — accepted rows take the
reviewed value when the reviewer edited it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REVIEW_SCHEMA = (
    "extraction_id STRING, status STRING, reviewed_value STRING, reviewer STRING"
)


def apply_review(extractions: DataFrame, review: DataFrame,
                 id_col: str = "extraction_id",
                 value_col: str = "value") -> DataFrame:
    """Join extractions to review decisions.

    - accepted → kept, value replaced by reviewed_value when present,
    - rejected → dropped,
    - unreviewed → dropped (the reference only publishes reviewed rows).
    """
    decisions = review.select(
        F.col("extraction_id").alias(id_col),
        "status",
        "reviewed_value",
    )
    return (
        extractions.join(F.broadcast(decisions), id_col, "inner")
        .filter(F.col("status") == "accepted")
        .withColumn(value_col, F.coalesce(F.col("reviewed_value"), F.col(value_col)))
        .drop("status", "reviewed_value")
    )


#: the Names payload shape the driver-side review bridge writes
#: (helpers.reviews_to_rows: reviewed_value = JSON of {prop: [values]})
NAMES_PAYLOAD_SCHEMA = (
    "name ARRAY<STRING>, alias ARRAY<STRING>, weakAlias ARRAY<STRING>, "
    "previousName ARRAY<STRING>, abbreviation ARRAY<STRING>"
)

_NAME_PROPS = ("name", "alias", "weakAlias", "previousName", "abbreviation")


def apply_reviewed_names(
    originals: DataFrame,
    review: DataFrame,
    id_col: str = "entity_id",
) -> DataFrame:
    """Review-gated name application, DataFrame-side — the bulk half of
    the driver-side ``helpers.apply_reviewed_names``
    (``zavod/zavod/helpers/names.py:729-790``), consuming the SAME JSON
    names payload the helpers bridge writes (``reviews_to_rows``).

    - ``originals``: one row per (entity, prop, value) original name.
    - ``review``: REVIEW_SCHEMA rows with the reviewed categorisation as
      a ``{prop: [values]}`` JSON payload in ``reviewed_value``.

    Semantics (reference parity): an ACCEPTED review REPLACES the
    entity's original name rows with the payload's categorisation, the
    reviewer stamped as origin; rejected / unreviewed / unposted
    entities keep their original rows with a NULL origin (the reference
    applies the original when ``review is None or not review.accepted``).

    Scale shape: the review table is bounded by analyst throughput —
    humans reviewed every row — so it broadcasts by construction; the
    plan is one broadcast anti-join over the originals plus a map-only
    explode of the accepted payloads. ZERO shuffles of the
    fact-proportional side at any corpus size.
    """
    accepted = review.filter(F.col("status") == "accepted").select(
        F.col("extraction_id").alias(id_col),
        F.from_json("reviewed_value", NAMES_PAYLOAD_SCHEMA).alias("names"),
        F.col("reviewer"),
    )
    empty = F.array().cast("array<string>")

    def tag(p: str):
        # single-arg lambda: F.transform passes (element, index) to 2-arg
        # ones, so a default-arg closure would silently bind the index
        return lambda v: F.struct(F.lit(p).alias("prop"), v.alias("value"))

    pairs = F.flatten(
        F.array(
            *[
                F.transform(F.coalesce(F.col("names")[p], empty), tag(p))
                for p in _NAME_PROPS
            ]
        )
    )
    applied = accepted.select(
        id_col, F.explode(pairs).alias("nv"), "reviewer"
    ).select(
        id_col,
        F.col("nv.prop").alias("prop"),
        F.col("nv.value").alias("value"),
        F.col("reviewer").alias("origin"),
    )
    fallback = originals.join(
        F.broadcast(accepted.select(id_col)), id_col, "left_anti"
    ).select(
        id_col, "prop", "value", F.lit(None).cast("string").alias("origin")
    )
    return fallback.unionByName(applied)
