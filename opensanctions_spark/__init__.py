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

__all__ = ["Context", "Dataset", "Entity", "settings", "helpers"]


def __getattr__(name: str):
    """Lazy top-level compat exports mirroring the reference package
    (``zavod/zavod/__init__.py``: Context, Entity, settings) — lazy so
    importing a submodule (e.g. ``opensanctions_spark.model``) never
    drags the driver-side crawler layer in, and no import cycles form.
    ``from opensanctions_spark import Context, helpers as h`` is the
    reference's ``from zavod import Context, helpers as h`` on a swap.
    """
    if name == "Context":
        from opensanctions_spark.crawler import CrawlerContext

        return CrawlerContext
    if name == "Entity":
        from opensanctions_spark.crawler import Entity

        return Entity
    if name == "settings":
        import importlib

        return importlib.import_module("opensanctions_spark.settings")
    if name == "Dataset":
        from opensanctions_spark.meta import Dataset

        return Dataset
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
