"""Ported reference suite: ``zavod/zavod/tests/helpers/test_positions.py``
(round-11 closure campaign; the occupancy-status case table and the
categorisation flow were already ported in ``test_stateful_compat.py``
— this file ports the remaining make_occupancy / earliest_term_start
cases, which exposed two behavior gaps fixed this round: date props now
route through ``apply_date`` (dataset formats + two_digit_year_base),
and the status decision reads the PARSED occupancy dates plus the
person's birth/death through the full ``stateful.positions``
decision order, as the reference does)."""

from __future__ import annotations

from datetime import datetime, timedelta
from types import SimpleNamespace

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


def _context(metadata=None, name="testds"):
    config = SimpleNamespace(name=name, metadata=metadata or {}, lookups={})
    return CrawlerContext(None, config)


DATE_FORMATS = {"dates": {"formats": ["%d. %b %Y", "%d-%b-%y", "%Y-%m-%d"]}}


def _person(ctx, pid="thabo"):
    person = ctx.make("Person")
    person.id = pid
    return person


def test_make_occupancy_full_fields():
    """The reference's all-fields case: the dataset's date format parses
    "2. Jan 2021" into the stored endDate, status resolves ENDED at the
    given current_time, the person gains role.pep but NOT the
    position's country."""
    ctx = _context(metadata=DATE_FORMATS)
    pos = h.make_position(ctx, name="A position", country="ls")
    person = _person(ctx)
    occ = h.make_occupancy(
        ctx,
        person=person,
        position=pos,
        no_end_implies_current=True,
        current_time="2021-01-03T00:00:00",
        start_date="2021-01-01",
        end_date="2. Jan 2021",
    )
    assert occ is not None
    assert occ.get("holder") == ["thabo"]
    assert occ.get("post") == [pos.id]
    assert occ.get("startDate") == ["2021-01-01"]
    assert occ.get("endDate") == ["2021-01-02"]
    assert occ.get("status") == ["ended"]
    assert person.get("country") == []
    assert person.get("topics") == ["role.pep"]


def test_make_occupancy_two_digit_year():
    """The base year picks the century, but the ID keys on the date
    string AS GIVEN, so adopting a base year does not renumber a
    dataset's occupancies (the reference's documented contract)."""
    ctx = _context(metadata=DATE_FORMATS)
    pos = h.make_position(ctx, name="A position", country="ls")
    person = _person(ctx)

    def make(base):
        occ = h.make_occupancy(
            ctx, person=person, position=pos,
            current_time="2000-01-03T00:00:00",
            start_date="16-Jul-68", two_digit_year_base=base,
        )
        assert occ is not None
        return occ

    based = make(1945)
    assert based.get("startDate") == ["1968-07-16"]
    # without a base year, strptime's fixed window picks the next century
    unbased = make(None)
    assert unbased.get("startDate") == ["2068-07-16"]
    assert unbased.id == based.id


def test_occupancy_not_same_start_end_id():
    """Same start/no end vs no start/same end must not collide — the
    'started'/'ended' labels in the id derivation exist for this."""
    ctx = _context(metadata=DATE_FORMATS)
    pos = h.make_position(ctx, name="A position", country="ls")
    person = _person(ctx)

    def make(implies, start, end):
        return h.make_occupancy(
            ctx, person, pos, implies, "2021-01-01T00:00:00", start, end
        )

    current_no_end = make(True, "2020-01-01", None)
    assert current_no_end is not None
    assert current_no_end.get("status") == ["current"]

    ended_no_start = make(True, None, "2020-01-01")
    assert ended_no_start is not None
    assert ended_no_start.get("status") == ["ended"]

    assert ended_no_start.id != current_no_end.id


def test_occupancy_dataset_coverage():
    """A future end date is trusted while the dataset's coverage window
    is open (CURRENT) — once coverage has lapsed the future date is
    distrusted (degrades from CURRENT, but the endDate stays applied)."""
    ctx1 = _context(metadata={**DATE_FORMATS, "coverage": {"end": "2021-01-04"}})
    pos1 = h.make_position(ctx1, name="A position", country="ls")
    occ1 = h.make_occupancy(
        ctx1, person=_person(ctx1), position=pos1,
        current_time="2021-01-03T00:00:00",
        start_date="2021-01-01", end_date="2021-01-05",
    )
    assert occ1 is not None
    assert occ1.get("status") == ["current"]

    ctx2 = _context(metadata={**DATE_FORMATS, "coverage": {"end": "2021-01-02"}})
    pos2 = h.make_position(ctx2, name="A position", country="ls")
    occ2 = h.make_occupancy(
        ctx2, person=_person(ctx2), position=pos2,
        current_time="2021-01-03T00:00:00",
        start_date="2021-01-01", end_date="2021-01-05",
    )
    assert occ2 is not None
    assert occ2.get("endDate") == ["2021-01-05"]
    assert occ2.get("status") != ["current"]


def test_earliest_term_start():
    """Cut-off bounds relative to now (the reference's _years_ago
    bracketing): national ≈ 20y + after-office, subnational tighter."""
    def years_ago(years):
        return (datetime.utcnow() - timedelta(days=365 * years)).date().isoformat()

    topics = ["gov.national"]
    assert h.earliest_term_start(topics) < years_ago(1)
    assert h.earliest_term_start(topics) < years_ago(10)
    assert h.earliest_term_start(topics) > years_ago(50)

    topics = ["gov.state"]
    assert h.earliest_term_start(topics) < years_ago(1)
    assert h.earliest_term_start(topics) < years_ago(10)
    assert h.earliest_term_start(topics) > years_ago(16)
