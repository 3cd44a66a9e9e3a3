"""Parity port of the reference dates suite
(``zavod/zavod/tests/helpers/test_dates.py``) over the engine's compat
date helpers, with testdataset1's dates config (formats
``%b %Y`` / ``%d.%m.%Y`` / ``%Y-%m`` is NOT among them, German month
mappings, year_only toggling)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from types import SimpleNamespace

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext

#: testdataset1.yml dates config shape: strptime formats + month mappings
DATES_META = {
    "dates": {
        "formats": ["%d. %b %Y", "%d.%m.%Y", "%b %Y"],
        "months": {"mar": "März"},
    }
}


def _ctx(metadata=None):
    config = SimpleNamespace(
        name="testds", metadata=metadata or dict(DATES_META), lookups={}
    )
    return CrawlerContext(None, config)


def _person(ctx):
    e = ctx.make("Person")
    e.id = "doe"
    e.dataset = ctx.dataset
    return e


def _values(entity, prop):
    return [s[1] for s in entity._stmts if s[0] == prop]


def test_extract_years():
    assert len(h.extract_years("foo")) == 0
    assert len(h.extract_years("25.2.")) == 0
    assert len(h.extract_years("1602")) == 0
    assert len(h.extract_years("3572")) == 0
    assert len(h.extract_years("1903")) == 1
    assert len(h.extract_years("2023")) == 1
    assert len(h.extract_years("circa 2023")) == 1
    assert len(h.extract_years("between 1980 and 1982")) == 2


def test_extract_date():
    ds = _ctx().dataset
    assert h.extract_date(ds, "foo") == ["foo"]
    assert h.extract_date(ds, "2. mar 2023") == ["2023-03-02"]
    assert h.extract_date(ds, "2. März 2023") == ["2023-03-02"]
    # always-accepted formats even though %Y-%m is not in the dataset list
    assert h.extract_date(ds, "2023-01") == ["2023-01"]


def test_extract_date_two_digit_year():
    ds = _ctx().dataset
    # the base year selects the century
    assert h.extract_date(
        ds, "16-07-68", formats=("%d-%m-%y",), two_digit_year_base=1926
    ) == ["1968-07-16"]
    assert h.extract_date(
        ds, "16-07-68", formats=("%d-%m-%y",), two_digit_year_base=2000
    ) == ["2068-07-16"]
    # without a base, the fixed strptime window applies (68 → 2068 side)
    assert h.extract_date(ds, "23-10-64", formats=("%d-%m-%y",)) == [
        "2064-10-23"
    ]


def test_apply_date_two_digit_year():
    ctx = _ctx()
    person = _person(ctx)
    h.apply_date(
        person, "birthDate", "16-07-68",
        formats=("%d-%m-%y",), two_digit_year_base=1926, dataset=ctx.dataset,
    )
    assert _values(person, "birthDate") == ["1968-07-16"]

    person2 = _person(ctx)
    h.apply_dates(
        person2, "birthDate", ["16-07-68", "23-10-64"],
        formats=("%d-%m-%y",), two_digit_year_base=1926, dataset=ctx.dataset,
    )
    assert sorted(_values(person2, "birthDate")) == ["1964-10-23", "1968-07-16"]


def test_replace_months():
    ds = _ctx().dataset
    assert h.replace_months(ds, "3. März 2021") == "3. mar 2021"
    # no substitution inside a longer token
    assert h.replace_months(ds, "3. März2021") == "3. März2021"


def test_apply_date_good_and_bad_values():
    ctx = _ctx()
    ds = ctx.dataset

    person = _person(ctx)
    h.apply_date(person, "birthDate", None, dataset=ds)
    assert _values(person, "birthDate") == []

    h.apply_date(person, "birthDate", "2024-01-23", dataset=ds)
    assert "2024-01-23" in _values(person, "birthDate")

    person = _person(ctx)
    h.apply_date(person, "birthDate", "14. mar 2021", dataset=ds)
    assert "2021-03-14" in _values(person, "birthDate")

    # unparseable text must NOT be applied (the reference's add-side
    # date-type cleaning rejects the fallback)
    person = _person(ctx)
    h.apply_date(person, "birthDate", "banana", dataset=ds)
    assert _values(person, "birthDate") == []
    h.apply_dates(person, "birthDate", ["banana"], dataset=ds)
    assert _values(person, "birthDate") == []

    # stray integers don't become dates either
    person = _person(ctx)
    h.apply_date(person, "birthDate", 25722, dataset=ds)
    assert _values(person, "birthDate") == []


def test_apply_date_year_only_toggle():
    meta = {"dates": {**DATES_META["dates"], "year_only": False}}
    ctx = _ctx(metadata=meta)
    person = _person(ctx)
    h.apply_dates(person, "birthDate", ["ca 2024"], dataset=ctx.dataset)
    assert "2024" not in _values(person, "birthDate")
    assert _values(person, "birthDate") == []

    meta = {"dates": {**DATES_META["dates"], "year_only": True}}
    ctx = _ctx(metadata=meta)
    person = _person(ctx)
    h.apply_dates(person, "birthDate", ["circa 2024"], dataset=ctx.dataset)
    assert "2024" in _values(person, "birthDate")


def test_apply_date_datetime_and_date_objects():
    ctx = _ctx()
    now = datetime.now()
    bd = now.astimezone(timezone.utc).date().isoformat()

    person = _person(ctx)
    h.apply_date(person, "birthDate", now, dataset=ctx.dataset)
    assert bd in _values(person, "birthDate")

    person = _person(ctx)
    h.apply_date(person, "birthDate", now.date(), dataset=ctx.dataset)
    assert bd in _values(person, "birthDate")


def test_extract_date_aware_datetime_normalizes_to_utc():
    ds = _ctx().dataset
    # 23:30 at UTC+5 is 18:30 UTC the SAME day; 01:30 at UTC+5 is the
    # PREVIOUS day in UTC
    tz = timezone(timedelta(hours=5))
    dt = datetime(2024, 3, 10, 1, 30, tzinfo=tz)
    assert h.extract_date(ds, dt) == ["2024-03-09"]
    dt = datetime(2024, 3, 10, 23, 30, tzinfo=tz)
    assert h.extract_date(ds, dt) == ["2024-03-10"]


def test_backdate():
    assert h.backdate(datetime(2023, 8, 3), timedelta(days=0)) == "2023-08-03"
    assert h.backdate(datetime(2023, 8, 3), timedelta(days=182)) == "2023-02-02"


def test_within_max_age():
    ctx = _ctx()
    run_time = datetime.fromisoformat(h.RUN_TIME)
    assert h.within_max_age(ctx, run_time.date().isoformat())
    # a year-precision date whose year straddles the cutoff may be as
    # late as Dec 31 of that year, so it stays inside the window
    cutoff_year = (run_time - timedelta(days=5 * 365)).year
    assert h.within_max_age(ctx, str(cutoff_year))
    # the year before the cutoff year has fully elapsed
    assert not h.within_max_age(ctx, str(cutoff_year - 1))
    assert not h.within_max_age(ctx, "1999-01-01")
