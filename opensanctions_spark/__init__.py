"""opensanctions_spark — a PySpark-native statement/entity analytics engine.

A brand-new engine with the query and data-processing capabilities of the
opensanctions/opensanctions "zavod" data factory, re-expressed as idiomatic
Spark DataFrame / SQL plans:

- every fact is a provenance-carrying *statement* row (model.schema),
- entities are a groupBy-aggregation over statements (operators.assembly),
- record linkage is a blocking join + union-find canonicalization
  (operators.blocking, operators.resolve),
- exports, deltas, validation and statistics are declarative DataFrame
  plans that Catalyst optimizes (sinks.exporters, operators.delta,
  operators.validate, operators.statistics).

Blueprint: SURVEY.md at the repo root. Reference citations in docstrings
use ``path:line`` into the read-only reference checkout.
"""

__version__ = "0.1.0"
