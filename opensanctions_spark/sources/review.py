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
