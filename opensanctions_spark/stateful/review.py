"""Compat ``zavod.stateful.review`` (``zavod/zavod/stateful/review.py``):
the generic extraction-review workflow crawlers drive directly — source
values, ``review_extraction`` and the end-of-crawl
``assert_all_accepted`` gate. Shares the driver-side review store (and
therefore the S12 DataFrame bridge) with the reviewed-names flow in
``opensanctions_spark.helpers``.

Subset notes vs the reference: payloads are ``helpers.Names`` or plain
JSON-able dicts (no pydantic in this environment — reviewer edits are
validated by shape, not by model), and revision history is not kept
(the store holds the latest row; the reference's SQL table versions
every save).
"""

from __future__ import annotations

import json
from typing import Any

from opensanctions_spark.crawler import CrawlerContext
from opensanctions_spark.helpers import (  # noqa: F401 (re-exports)
    Names,
    Review,
    _review_store,
    get_review,
    load_review_rows,
    review_key,
    reviews_to_rows,
)


class SourceValue:
    """review.py:217-233: a serializable source value whose change
    justifies re-extraction/re-review."""

    mime_type: str = "text/plain"

    def __init__(
        self,
        key_parts: str | list[str],
        label: str,
        value_string: str,
        url: str | None = None,
    ) -> None:
        self.key_parts = key_parts
        self.label = label
        self.value_string = value_string
        self.url = url


class TextSourceValue(SourceValue):
    """review.py:235-264."""

    def __init__(
        self,
        key_parts: str | list[str],
        label: str,
        text: str,
        url: str | None = None,
    ) -> None:
        super().__init__(key_parts, label, text, url)


class JSONSourceValue(SourceValue):
    """review.py:267-298: keys sorted for stable comparison; keep array
    values consistently ordered caller-side."""

    mime_type = "application/json"

    def __init__(
        self,
        key_parts: str | list[str],
        label: str,
        data: Any,
        url: str | None = None,
    ) -> None:
        super().__init__(
            key_parts, label, json.dumps(data, indent=2, sort_keys=True), url
        )


class HtmlSourceValue(SourceValue):
    """review.py:301-335: an element subtree as the source value."""

    mime_type = "text/html"

    def __init__(
        self,
        key_parts: str | list[str],
        label: str,
        element: Any,
        url: str | None = None,
    ) -> None:
        from xml.etree import ElementTree

        text = ElementTree.tostring(element, encoding="unicode")
        super().__init__(key_parts, label, text, url)


def _payload_equal(a: Any, b: Any) -> bool:
    if isinstance(a, Names) and isinstance(b, Names):
        return a == b
    return a == b


def review_extraction(
    context: CrawlerContext,
    source_value: SourceValue,
    original_extraction: Any,
    origin: str,
    crawler_version: int = 1,
    default_accepted: bool = False,
) -> Review:
    """Ensure a Review exists for the source value's key
    (review.py:354-478 semantics, store-backed):

    - new → extracted_data = original_extraction, accepted =
      default_accepted;
    - existing + still unaccepted → original/extracted refresh to the
      new extraction;
    - existing + accepted → the analyst's decision stands, UNLESS both
      the source value and the extraction changed (or crawler_version
      was bumped), which resets the review as if new.
    """
    key = review_key(source_value.key_parts)
    store = _review_store(context)
    existing = store.get(key)
    if existing is not None:
        version_bumped = getattr(existing, "crawler_version", 1) < crawler_version
        source_changed = existing.source_value != source_value.value_string
        extraction_changed = not _payload_equal(
            getattr(existing, "original_extraction", existing.extracted_data),
            original_extraction,
        )
        if not version_bumped and not (source_changed and extraction_changed):
            if not existing.accepted:
                existing.extracted_data = original_extraction
                existing.original_extraction = original_extraction
            return existing
        context.log.info("Resetting review", key=key)
    review = Review(
        key=key,
        accepted=default_accepted,
        extracted_data=original_extraction,
        origin=origin,
        source_value=source_value.value_string,
        source_label=source_value.label,
    )
    review.original_extraction = original_extraction
    review.crawler_version = crawler_version
    review.save(context)
    return review


def assert_all_accepted(
    context: CrawlerContext, *, raise_on_unaccepted: bool = True
) -> None:
    """review.py:481-507: fail (or warn) when any review posted this
    crawl is still unaccepted — the publish gate for review-driven
    datasets."""
    count = sum(1 for r in _review_store(context).values() if not r.accepted)
    if count > 0:
        message = (
            f"There are {count} unaccepted items for dataset "
            f"{getattr(context.dataset, 'name', '?')}"
        )
        if raise_on_unaccepted:
            raise AssertionError(message)
        context.log.warning(message)
