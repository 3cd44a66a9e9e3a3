"""wd_peps position-pipeline parity (VERDICT r6 task 7): the reference's
PEP crawl loop (``datasets/_wikidata/peps/crawler.py``) run end-to-end
over a fake wikidata client, through the engine's
``shed/wikidata/position.py`` + ``human.py``. The crawl/crawl_person
bodies below mirror the reference structurally (same passes, same
gating order); discovery's SPARQL/territory sweep is replaced by an
explicit candidate set + the review-database include/exclude logic
(``crawler.py:126-135``) because ``rigour.territories`` is not part of
the engine's surface.

Reference cases pinned (file:line of datasets/_wikidata/peps/crawler.py):
- :207-208  P39 to a non-accepted position yields no occupancy
- :217-218  a person with zero accepted occupancies is never emitted
- :228-246  classification completes before any person is processed;
            redirected QIDs are recorded as aliases (:233-237)
- :252-255  each person is fetched and emitted exactly once
            (done_persons), even when holding several positions
- :277-280  a position is emitted only once it has at least one holder
- :126-135  review-database verdicts: accepted positions are always
            candidates, rejected ones are excluded before classification
"""

from __future__ import annotations

import re
from types import SimpleNamespace

from opensanctions_spark.crawler import CrawlerContext
from opensanctions_spark.shed.wikidata.human import wikidata_basic_human
from opensanctions_spark.shed.wikidata.model import (
    WdClaim,
    WdItem,
    WdRef,
    WdText,
)
from opensanctions_spark.shed.wikidata.position import (
    position_holders,
    wikidata_occupancy,
    wikidata_position,
)
from opensanctions_spark.stateful.positions import load_categorisations


class _Row:
    def __init__(self, d):
        self._d = d

    def plain(self, key):
        return self._d.get(key)


class _Result:
    def __init__(self, rows):
        self.results = [_Row(r) for r in rows]


class _PepsClient:
    """fetch_item + the P39-inverse holders query, with a per-item redirect
    table (old qid → new item) and a fetch counter for the done_persons
    pin."""

    def __init__(self, items, holders_by_position, redirects=None):
        self.items = {i.id: i for i in items}
        self.holders = holders_by_position
        self.redirects = redirects or {}
        self.fetch_counts: dict[str, int] = {}

    def fetch_item(self, qid, **_kw):
        self.fetch_counts[qid] = self.fetch_counts.get(qid, 0) + 1
        if qid in self.redirects:
            return self.items.get(self.redirects[qid])
        return self.items.get(qid)

    def query(self, q, cache_days=None):
        m = re.search(r"wdt:P39 wd:(Q\d+)", q)
        return _Result(self.holders.get(m.group(1), []) if m else [])


def _world():
    germany = WdItem(
        "Q183", {"Q6256"}, [WdClaim("P297", value="DE")],
        WdText("Germany", "eng"),
    )
    minister = WdItem(
        "Q990001", {"Q4164871", "Q83307"},
        [WdClaim("P1001", qid="Q183"), WdClaim("P1308", qid="Q222")],
        WdText("Federal Minister of Things", "eng"),
    )
    award = WdItem(
        "Q990002", {"Q4164871", "Q618779"}, [WdClaim("P17", qid="Q183")],
        WdText("Order of Merit", "eng"),
    )
    governor_unheld = WdItem(
        "Q990005", {"Q4164871", "Q83307"}, [WdClaim("P1001", qid="Q183")],
        WdText("Provincial Governor of Nowhere", "eng"),
    )
    blocked = WdItem(
        "Q990006", {"Q4164871", "Q83307"}, [WdClaim("P1001", qid="Q183")],
        WdText("Reviewed Non-PEP Role", "eng"),
    )
    renamed = WdItem(
        "Q990008", {"Q4164871", "Q83307"}, [WdClaim("P1001", qid="Q183")],
        WdText("State Secretary of Things", "eng"),
    )

    def p39(qid, start, end=None):
        quals = {"P580": [WdClaim("P580", value=start)]}
        if end:
            quals["P582"] = [WdClaim("P582", value=end)]
        return WdClaim(
            "P39", qid=qid, qualifiers=quals,
            references=[
                WdRef({"P854": [WdClaim("P854", value="https://ref.example/s")]})
            ],
        )

    helga = WdItem(
        "Q111", {"Q5"},
        [
            WdClaim("P27", qid="Q183"),
            p39("Q990001", "2010-01-01", "2024-06-30"),
            p39("Q990002", "2015-01-01"),  # award: NOT an accepted position
        ],
        WdText("Helga Holder", "eng"),
    )
    otto = WdItem(
        "Q222", {"Q5"},
        [WdClaim("P27", qid="Q183"), p39("Q990001", "2020-02-02")],
        WdText("Otto Office", "eng"),
    )
    # holds BOTH accepted positions — appears in both holder lists
    # (dates inside the occupancy-relevance window: a term ended before
    # the cutoff is dropped by make_occupancy's status gate, the engine's
    # F13 — covered separately in test_helper_families)
    dora = WdItem(
        "Q333", {"Q5"},
        [
            WdClaim("P27", qid="Q183"),
            p39("Q990001", "2018-01-01", "2022-05-05"),
            # via the OLD qid: the alias table must redirect it
            p39("Q990007", "2023-06-06"),
        ],
        WdText("Dora Double", "eng"),
    )
    # named via P1308 on the minister position but P39 only to the award:
    # crawled, zero accepted occupancies, never emitted
    quintus = WdItem(
        "Q444", {"Q5"},
        [WdClaim("P27", qid="Q183"), p39("Q990002", "2018-01-01")],
        WdText("Quintus Quiet", "eng"),
    )

    holders = {
        "Q990001": [
            {"person": "Q111", "modifiedAt": "2026-01-01T00:00:00Z"},
            {"person": "Q333", "modifiedAt": None},
            {"person": "Q444", "modifiedAt": None},
        ],
        "Q990008": [{"person": "Q333", "modifiedAt": None}],
        "Q990005": [],  # accepted but nobody holds it
    }
    client = _PepsClient(
        [germany, minister, award, governor_unheld, blocked, renamed,
         helga, otto, dora, quintus],
        holders,
        redirects={"Q990007": "Q990008"},
    )
    return client


def _context():
    return CrawlerContext(
        None, SimpleNamespace(name="wd_peps", metadata={}, lookups={})
    )


# -- the reference crawl bodies, structurally mirrored ----------------------


def _crawl_person(context, client, accepted, aliases, person_qid,
                  modified_at) -> set[str]:
    """crawler.py:173-219."""
    occupied: set[str] = set()
    item = client.fetch_item(person_qid, modified_at=modified_at)
    if item is None:
        return occupied
    entity = wikidata_basic_human(context, client, item)
    if entity is None:
        return occupied
    for claim in item.claims:
        if claim.property != "P39" or claim.qid is None:
            continue
        position_qid = aliases.get(claim.qid, claim.qid)
        if position_qid not in accepted:  # :207-208
            continue
        position = wikidata_position(
            context, client, client.fetch_item(position_qid)
        )
        if position is None:
            continue
        occupancy = wikidata_occupancy(context, entity, position, claim)
        if occupancy is not None:
            context.emit(occupancy)
            occupied.add(position_qid)
    if len(occupied) > 0:  # :217-218
        context.emit(entity)
    return occupied


def _crawl(context, client, candidates):
    """crawler.py:222-292 (minus SPARQL discovery/logging/cache plumbing)."""
    # classification pass before any person (:228-246)
    accepted: set[str] = set()
    aliases: dict[str, str] = {}
    for qid in sorted(candidates):
        item = client.fetch_item(qid)
        if item is None:
            continue
        if item.id != qid:  # :233-237
            aliases[qid] = item.id
        position = wikidata_position(context, client, item)
        if position is not None:
            accepted.add(item.id)

    # holders pass (:248-275)
    done_persons: set[str] = set()
    has_holders: set[str] = set()
    for position_qid in sorted(accepted):
        position_item = client.fetch_item(position_qid)
        if position_item is None:
            continue
        if wikidata_position(context, client, position_item) is None:
            continue
        for person_qid, modified_at in position_holders(
            client, position_item
        ).items():
            if person_qid in done_persons:  # :252-255
                continue
            done_persons.add(person_qid)
            has_holders.update(
                _crawl_person(
                    context, client, accepted, aliases, person_qid,
                    modified_at,
                )
            )

    # positions with holders only (:277-280)
    for position_qid in sorted(has_holders):
        position = wikidata_position(
            context, client, client.fetch_item(position_qid)
        )
        if position is not None:
            context.emit(position)
    return accepted, aliases, done_persons, has_holders


def test_wd_peps_crawl_loop_parity():
    from opensanctions_spark.shed.wikidata import country

    country.item_countries.cache_clear()
    country.is_historical_country.cache_clear()

    client = _world()
    ctx = _context()
    # review DB: Q990006 rejected (excluded), nothing else decided
    load_categorisations(ctx, [("Q990006", [], False)])

    # discovery's review include/exclude (:126-135): blocked drops out
    discovered = {
        "Q990001", "Q990002", "Q990005", "Q990006", "Q990007",
    }
    blocked = {
        qid
        for qid, is_pep in [("Q990006", False)]
        if not is_pep
    }
    candidates = discovered - blocked
    assert "Q990006" not in candidates

    accepted, aliases, done_persons, has_holders = _crawl(
        ctx, client, candidates
    )

    # classification: minister + governor + renamed accepted; award gated
    # out; the old qid resolved to the new item id
    assert accepted == {"Q990001", "Q990005", "Q990008"}
    assert aliases == {"Q990007": "Q990008"}

    # every holder crawled once, even Q333 who appears in two holder lists
    assert done_persons == {"Q111", "Q222", "Q333", "Q444"}
    assert client.fetch_counts["Q111"] == 1
    assert client.fetch_counts["Q333"] == 1
    assert client.fetch_counts["Q444"] == 1

    # only positions with at least one accepted occupancy emit
    assert has_holders == {"Q990001", "Q990008"}

    # buffer tuples: (entity_id, schema, prop, value, lang, origin, ...)
    rows: dict[tuple[str, str], list[str]] = {}
    for s in ctx._buffer:
        rows.setdefault((s[0], s[2]), []).append(s[3])

    emitted_ids = {e for (e, _p) in rows}
    # persons with accepted occupancies emitted; Quintus (award-only) not
    assert "Q111" in emitted_ids and "Q333" in emitted_ids
    assert "Q222" in emitted_ids
    assert "Q444" not in emitted_ids
    # unheld governor never emitted; blocked role never classified
    assert not any("Q990005" in e for e in emitted_ids)
    assert not any("Q990006" in e for e in emitted_ids)
    # emitted positions carry the gate's output shape
    assert rows[("Q990001", "name")] == ["Federal Minister of Things"]
    assert rows[("Q990001", "topics")] == ["gov.executive"]
    assert rows[("Q990008", "country")] == ["de"]

    # occupancies: holder/post pairs for the accepted claims only,
    # including the alias-redirected one (Q333 → Q990008)
    occ_posts = {
        (e, v[0])
        for (e, p), v in rows.items()
        if p == "post"
    }
    posts = {post for _e, post in occ_posts}
    assert posts == {"Q990001", "Q990008"}
    holders_of_minister = {
        rows[(e, "holder")][0]
        for (e, post) in occ_posts
        if post == "Q990001"
    }
    assert holders_of_minister == {"Q111", "Q222", "Q333"}
    holders_of_secretary = {
        rows[(e, "holder")][0]
        for (e, post) in occ_posts
        if post == "Q990008"
    }
    assert holders_of_secretary == {"Q333"}
    # qualifier dates carried (earliest start / latest end)
    helga_occ = next(
        e for (e, post) in occ_posts
        if post == "Q990001" and rows[(e, "holder")] == ["Q111"]
    )
    assert rows[(helga_occ, "startDate")] == ["2010-01-01"]
    assert rows[(helga_occ, "endDate")] == ["2024-06-30"]
    assert rows[(helga_occ, "sourceUrl")] == ["https://ref.example/s"]
