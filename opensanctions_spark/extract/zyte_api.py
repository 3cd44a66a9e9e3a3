"""Compat ``zavod.extract.zyte_api`` (``zavod/zavod/extract/zyte_api.py``):
the unblocking-proxy fetch surface 48 reference crawlers import.

The third-party service itself is out of engine scope; this module is
the SEAM: the request/result dataclasses and the fetch_* call shapes
are the reference's, and the actual HTTP leg is a registered unblock
fetcher — ``register_unblock_fetcher(fn)`` where ``fn(request:
ZyteAPIRequest) -> str`` returns the (unblocked) response body. A
deployment wires its proxy vendor there; tests wire fixtures. Without a
registered fetcher every call raises NotImplementedError naming the
seam, so an import-swapped crawler fails loudly at the boundary instead
of silently skipping sources.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass
from enum import Enum
from typing import Any

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


class UnblockFailedException(RuntimeError):
    """zyte_api.py:24-28: the page never validated as unblocked."""

    def __init__(self, url: str, message: str = "Unblocking failed") -> None:
        super().__init__(f"{message}: {url}")
        self.url = url


class ZyteScrapeType(Enum):
    BROWSER_HTML = "browserHtml"
    HTTP_RESPONSE_BODY = "httpResponseBody"


@dataclass
class ZyteAPIRequest:
    """zyte_api.py:159-176."""

    url: str
    method: str | None = None
    body: bytes | None = None
    scrape_type: ZyteScrapeType = ZyteScrapeType.HTTP_RESPONSE_BODY
    actions: list[dict[str, Any]] | None = None
    headers: dict[str, str] | None = None
    geolocation: str | None = None
    javascript: bool | None = None
    request_cookies: list[dict[str, Any]] | None = None
    response_cookies: bool = False


@dataclass
class ZyteResult:
    """zyte_api.py:179-198."""

    response_text: str
    status_code: int | None
    cache_fingerprint: str
    from_cache: bool
    media_type: str | None = None
    charset: str | None = None
    cookies: list[dict[str, Any]] | None = None


def get_cache_fingerprint(request_data: dict[str, Any]) -> str:
    """zyte_api.py:201-208: stable hash over the request payload."""
    return hashlib.sha1(
        json.dumps(request_data, sort_keys=True).encode("utf-8")
    ).hexdigest()


#: (ZyteAPIRequest) -> str — the unblocked response body
_UNBLOCK_FETCHER: Any = None


def register_unblock_fetcher(fn: Any) -> None:
    global _UNBLOCK_FETCHER
    _UNBLOCK_FETCHER = fn


def fetch(
    context: CrawlerContext,
    request: ZyteAPIRequest,
    cache_days: int | None = None,
) -> ZyteResult:
    """zyte_api.py:211-312 seam form: run the registered unblock fetcher
    and wrap the body. Caching discipline belongs to the fetcher a
    deployment registers (the reference keys its cache on the request
    fingerprint — exposed here as ``get_cache_fingerprint``)."""
    if _UNBLOCK_FETCHER is None:
        raise NotImplementedError(
            f"no unblock fetcher registered for {request.url!r}: this "
            "environment has no network/proxy vendor — wire one with "
            "register_unblock_fetcher(fn)"
        )
    body = _UNBLOCK_FETCHER(request)
    fingerprint = get_cache_fingerprint(
        {"url": request.url, "scrape_type": request.scrape_type.value}
    )
    return ZyteResult(
        response_text=body,
        status_code=200,
        cache_fingerprint=fingerprint,
        from_cache=False,
    )


def fetch_text(
    context: CrawlerContext,
    url: str,
    cache_days: int | None = None,
    **kwargs: Any,
) -> str:
    return fetch(context, ZyteAPIRequest(url=url), cache_days=cache_days).response_text


def fetch_json(
    context: CrawlerContext,
    url: str,
    cache_days: int | None = None,
    **kwargs: Any,
) -> Any:
    return json.loads(fetch_text(context, url, cache_days=cache_days))


def fetch_resource(
    context: CrawlerContext,
    name: str,
    url: str,
    expected_media_type: str | None = None,
    cache_days: int | None = None,
    **kwargs: Any,
):
    """zyte_api.py:61-150 shape: fetch through the unblock seam into the
    run's resource directory, returning the local path."""
    body = fetch_text(context, url, cache_days=cache_days)
    path = context.get_resource_path(name)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(body)
    return path


def fetch_html(
    context: CrawlerContext,
    url: str,
    unblock_validator: str,
    actions: list[dict[str, Any]] | None = None,
    html_source: str = "browserHtml",
    javascript: bool | None = None,
    geolocation: str | None = None,
    request_cookies: list[dict[str, Any]] | None = None,
    cache_days: int | None = None,
    retries: int = 3,
    backoff_factor: int = 3,
    previous_retries: int = 0,
    absolute_links: bool = False,
):
    """zyte_api.py:429-520: fetch + parse + VALIDATE the unblock — the
    validator XPath must match at least one element, else retry with
    backoff and finally raise UnblockFailedException (an unparseable or
    empty body takes the same path)."""
    import urllib.parse

    attempt = previous_retries
    while True:
        result = fetch(
            context,
            ZyteAPIRequest(
                scrape_type=ZyteScrapeType(html_source),
                url=url,
                geolocation=geolocation,
                actions=list(actions or []),
                javascript=javascript,
                request_cookies=request_cookies,
            ),
            cache_days=cache_days,
        )
        doc = None
        try:
            doc = h.parse_html(result.response_text)
        except Exception as exc:
            context.log.debug(
                "Response is not parseable HTML", url=url, error=str(exc)
            )
        if doc is not None and h.xpath_elements(doc, unblock_validator):
            if absolute_links:
                for a in doc.iter("a"):
                    href = a.get("href")
                    if href:
                        a.set("href", urllib.parse.urljoin(url, href))
            return doc
        attempt += 1
        if attempt > retries:
            raise UnblockFailedException(url)
        pause = backoff_factor * attempt
        context.log.info(
            "Unblocking not validated; retrying", url=url, attempt=attempt,
        )
        time.sleep(min(pause, 30))
