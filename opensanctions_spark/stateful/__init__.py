"""Compat ``zavod.stateful`` surface: the review- and position-workflow
modules 200+ reference crawlers import (``from zavod.stateful.positions
import categorise``, ``from zavod.stateful.review import
assert_all_accepted``). Driver-side stores live on the CrawlerContext
and bridge to the engine's S12 review DataFrame (sources/review.py) —
see ``opensanctions_spark.helpers`` for the shared review primitives.
"""
