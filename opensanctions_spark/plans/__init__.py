"""End-to-end dataset run plans (SURVEY §3.1, §7.1)."""

from opensanctions_spark.plans.run import (
    Assertion,
    DatasetConfig,
    RunResult,
    run_dataset,
)

__all__ = ["Assertion", "DatasetConfig", "RunResult", "run_dataset"]
