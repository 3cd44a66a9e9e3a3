"""Parity port of the reference sanctions suite
(``zavod/zavod/tests/helpers/test_sanctions.py``) over the engine's
``make_sanction``/``is_active`` compat helpers. The reference resolves
programs through its stateful program database; the engine takes the
resolved registry as the ``programs`` argument
(``functions/programs.py load_programs``), so the suite supplies an
equivalent registry fixture."""

from __future__ import annotations

from datetime import datetime, timedelta
from types import SimpleNamespace

import pytest

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext
from opensanctions_spark.functions.programs import Program

RUN = datetime.fromisoformat(h.RUN_TIME)

DPL_URL = "https://www.bis.gov/licensing/end-user-guidance/denied-persons-list-dpl"
PROGRAMS = {"US-BIS-DPL": Program(key="US-BIS-DPL", title="DPL", url=DPL_URL)}


def _ctx():
    return CrawlerContext(None, SimpleNamespace(
        name="testds",
        metadata={
            "publisher": {"name": "OpenSanctions", "country": "zz"},
            "url": "https://example.com/source",
        },
        lookups={},
    ))


def _person(ctx):
    p = ctx.make("Person")
    p.id = "jeff"
    return p


def test_sanctions_helper():
    ctx = _ctx()
    person = ctx.make("Person")
    with pytest.raises(AssertionError):
        h.make_sanction(ctx, person)

    person.id = "jeff"
    sanction = h.make_sanction(ctx, person)
    assert "OpenSanctions" in sanction.get("authority")
    assert "jeff" in sanction.get("entity")
    # zz publisher country is never emitted
    assert sanction.get("country") == []

    sanction2 = h.make_sanction(ctx, person)
    assert sanction.id == sanction2.id
    sanction3 = h.make_sanction(ctx, person, key="other")
    assert sanction.id != sanction3.id


def test_sanctions_helper_with_program():
    ctx = _ctx()
    sanction = h.make_sanction(
        ctx, _person(ctx),
        program_name="Test Program", program_key="US-BIS-DPL",
        programs=PROGRAMS,
    )
    assert sanction.get("program")[0] == "Test Program"
    assert sanction.get("programUrl") == [DPL_URL]
    assert sanction.get("programId")[0] == "US-BIS-DPL"


def test_sanctions_helper_with_unknown_program():
    ctx = _ctx()
    sanction = h.make_sanction(
        ctx, _person(ctx),
        program_name="Test Program", program_key="OS-TEST",
        programs=PROGRAMS,
    )
    assert sanction.get("program")[0] == "Test Program"
    assert sanction.get("programUrl") == []
    assert sanction.get("programId") == []
    assert any(
        i["level"] == "warning"
        and i["message"] == "Program with key 'OS-TEST' not found."
        and i["data"].get("entity_id") == "jeff"
        for i in ctx.issues
    )


def test_sanctions_status_agrees_with_is_active():
    ctx = _ctx()
    person = _person(ctx)
    future_start = (RUN + timedelta(days=20)).date().isoformat()
    future_end = (RUN + timedelta(days=30)).date().isoformat()
    sanction = h.make_sanction(
        ctx, person, start_date=future_start, end_date=future_end
    )
    assert not h.is_active(sanction)
    assert sanction.get("status") == ["inactive"]

    past_start = (RUN - timedelta(days=20)).date().isoformat()
    sanction = h.make_sanction(
        ctx, person, key="b", start_date=past_start, end_date=future_end
    )
    assert h.is_active(sanction)
    assert sanction.get("status") == ["active"]

    past_end = (RUN - timedelta(days=10)).date().isoformat()
    sanction = h.make_sanction(
        ctx, person, key="c", start_date=past_start, end_date=past_end
    )
    assert not h.is_active(sanction)
    assert sanction.get("status") == ["inactive"]


def test_sanctions_unparseable_end_date_raises():
    ctx = _ctx()
    with pytest.raises(ValueError, match=r"'see annex'.*'jeff'"):
        h.make_sanction(ctx, _person(ctx), end_date="see annex")


@pytest.fixture
def sanction():
    ctx = _ctx()
    return h.make_sanction(ctx, _person(ctx))


def test_is_active_no_end_date(sanction):
    sanction.set("endDate", None)
    assert h.is_active(sanction)


def test_is_active_end_date_tomorrow(sanction):
    sanction.set("endDate", (RUN + timedelta(days=1)).date().isoformat())
    assert h.is_active(sanction)


def test_is_active_end_date_yesterday(sanction):
    sanction.set("endDate", (RUN - timedelta(days=1)).date().isoformat())
    assert not h.is_active(sanction)


def test_is_active_multiple_end_dates(sanction):
    sanction.set("endDate", [
        (RUN - timedelta(days=20)).date().isoformat(),
        (RUN + timedelta(days=20)).date().isoformat(),
    ])
    assert h.is_active(sanction)


def test_is_active_future_start_date(sanction):
    sanction.set("startDate", (RUN + timedelta(days=20)).date().isoformat())
    sanction.set("endDate", (RUN + timedelta(days=30)).date().isoformat())
    assert not h.is_active(sanction)


def test_is_active_end_date_today(sanction):
    sanction.set("endDate", RUN.date().isoformat())
    assert h.is_active(sanction)


def test_is_active_prefix_dates(sanction):
    # ending some time this year: still active today
    sanction.set("endDate", str(RUN.year))
    assert h.is_active(sanction)
    # month precision in the current month
    sanction.set("endDate", RUN.date().isoformat()[:7])
    assert h.is_active(sanction)
    # ended last year: over
    sanction.set("endDate", str(RUN.year - 1))
    assert not h.is_active(sanction)
    # year-precision start in the current year may already have passed
    sanction.set("endDate", None)
    sanction.set("startDate", str(RUN.year))
    assert h.is_active(sanction)
    sanction.set("startDate", str(RUN.year + 1))
    assert not h.is_active(sanction)


def test_make_sanction_prefix_end_date_status():
    ctx = _ctx()
    person = _person(ctx)
    sanction = h.make_sanction(
        ctx, person, key="this-year", end_date=str(RUN.year)
    )
    assert sanction.get("status") == ["active"]
    sanction = h.make_sanction(
        ctx, person, key="today", end_date=RUN.date().isoformat()
    )
    assert sanction.get("status") == ["active"]
    sanction = h.make_sanction(
        ctx, person, key="last-year", end_date=str(RUN.year - 1)
    )
    assert sanction.get("status") == ["inactive"]
