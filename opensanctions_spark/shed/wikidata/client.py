"""Compat ``zavod.shed.wikidata.client``
(``zavod/zavod/shed/wikidata/client.py``): the client construction
seam.

The reference returns a ``nomenklatura.wikidata.WikidataClient``. A
compat deployment registers a factory producing any object honouring
the minimal protocol the shed logic uses:

- ``client.fetch_item(qid) -> Item | None``
- ``Item.id``, ``Item.types`` (P31 closure), ``Item.claims``,
  ``Item.label`` (LangText)
- ``Claim.property``, ``Claim.qid``, ``Claim.text`` (LangText),
  ``Claim.is_ended()``
- ``LangText.text``, ``LangText.lang``,
  ``LangText.apply(entity, prop, clean=None)``
"""

from __future__ import annotations

from typing import Any

from opensanctions_spark.crawler import CrawlerContext

WIKIDATA_QUERY_CACHE = 10
WIKIDATA_ITEM_CACHE = 60

_CLIENT_FACTORY: Any = None


def register_wikidata_client_factory(fn: Any) -> None:
    global _CLIENT_FACTORY
    _CLIENT_FACTORY = fn


def create_wikidata_client(context: CrawlerContext) -> Any:
    """client.py:9-16: build a Wikidata client carrying the context's
    cache discipline; here, whatever the registered factory returns."""
    if _CLIENT_FACTORY is None:
        raise NotImplementedError(
            "no Wikidata client registered: wire a factory with "
            "register_wikidata_client_factory(fn) — any object with "
            "fetch_item(qid) honouring the Item protocol in this module's "
            "docstring (e.g. the public nomenklatura.wikidata client)"
        )
    return _CLIENT_FACTORY(context)
