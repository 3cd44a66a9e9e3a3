from opensanctions_spark.model.schema import STATEMENT_SCHEMA, STATEMENT_COLUMNS
from opensanctions_spark.model.registry import (
    SCHEMA_SPECIFICITY,
    common_schema_rank_column,
    RISK_TOPICS,
)

__all__ = [
    "STATEMENT_SCHEMA",
    "STATEMENT_COLUMNS",
    "SCHEMA_SPECIFICITY",
    "common_schema_rank_column",
    "RISK_TOPICS",
]
