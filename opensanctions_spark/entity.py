"""Compat ``zavod.entity`` (``zavod/zavod/entity.py``): re-export the
driver-side Entity so ``from opensanctions_spark.entity import Entity``
mirrors the reference import path on a swap."""

from opensanctions_spark.crawler import Entity, Schema  # noqa: F401

__all__ = ["Entity", "Schema"]
