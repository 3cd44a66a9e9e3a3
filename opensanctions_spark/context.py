"""Compat ``zavod.context`` import path: the crawler context lives in
``opensanctions_spark.crawler``; this mirrors the reference's module
layout (``from zavod.context import Context``)."""

from opensanctions_spark.crawler import CrawlerContext as Context  # noqa: F401

__all__ = ["Context"]
