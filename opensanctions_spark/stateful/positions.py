"""Position categorisation + occupancy-status workflow
(``zavod/zavod/stateful/positions.py``): the review-gated PEP decision
191 reference crawlers call before emitting occupancies.

The reference keeps categorisations in a SQL ``position`` table edited
through a review UI; compat rendering: a driver-side store on the
CrawlerContext (same pattern as the names review store in ``helpers``),
with bridge rows so decisions made elsewhere load back in. The
occupancy-status algorithm is the full reference decision order —
death/age caps, endDate vs periodEnd specificity, dissolution dates,
MAX_OFFICE, dataset-coverage distrust of future end dates — over ISO
prefix dates (rigour ``ended_before``/``starts_after`` re-expressed with
the prefix floor/ceil helpers the engine's column twin uses, so the
routes agree where they overlap: ``functions/positions.py``
``occupancy_status_full``, oracle-pinned by f13/f19).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from enum import Enum
from typing import Any

from opensanctions_spark.crawler import CrawlerContext, Entity
from opensanctions_spark.helpers import _prefix_ceil, _prefix_floor
from opensanctions_spark.model.melt import RUN_TIME

YEAR_DAYS = 365  # days — deliberately not counting leap days (positions.py:17)
DEFAULT_AFTER_OFFICE = timedelta(days=5 * YEAR_DAYS)
EXTENDED_AFTER_OFFICE_YEARS = 20
EXTENDED_AFTER_OFFICE = timedelta(days=EXTENDED_AFTER_OFFICE_YEARS * YEAR_DAYS)
NO_EXPIRATION = timedelta(days=50 * YEAR_DAYS)
AFTER_DEATH = timedelta(days=5 * YEAR_DAYS)
MAX_AGE = timedelta(days=110 * YEAR_DAYS)
MAX_OFFICE = timedelta(days=40 * YEAR_DAYS)


class OccupancyStatus(Enum):
    CURRENT = "current"
    ENDED = "ended"
    UNKNOWN = "unknown"


@dataclass
class PositionCategorisation:
    """positions.py:33-44."""

    topics: list[str]
    is_pep: bool | None


@dataclass
class _PositionRow:
    entity_id: str
    caption: str | None
    countries: list[str]
    subnational_areas: list[str]
    topics: list[str]
    is_pep: bool | None
    reviewed: bool = False


def _position_store(context: CrawlerContext) -> dict[str, _PositionRow]:
    store = getattr(context, "_positions", None)
    if store is None:
        store = {}
        context._positions = store
    return store


def categorise(
    context: CrawlerContext,
    position: Entity,
    *,
    default_is_pep: bool | None = True,
) -> PositionCategorisation:
    """Reviewed categorisation (topics, is_pep) for a position
    (positions.py:47-109): a reviewed row wins and overrides the
    defaults; otherwise the position enrolls with the crawler-supplied
    topics + ``default_is_pep`` and those defaults come back. Caption /
    country changes on an existing row update its metadata but keep the
    decision — exactly the reference's update-in-place."""
    store = _position_store(context)
    countries = sorted(position.get("country"))
    subnational = sorted(position.get("subnationalArea"))
    caption = position.first("name")
    row = store.get(position.id or "")
    if row is not None:
        if (
            row.caption != caption
            or row.countries != countries
            or row.subnational_areas != subnational
        ):
            context.log.info(
                "Updating position metadata",
                entity_id=position.id, caption=caption, countries=countries,
            )
            row.caption = caption
            row.countries = countries
            row.subnational_areas = subnational
        return PositionCategorisation(topics=row.topics, is_pep=row.is_pep)
    store[position.id or ""] = _PositionRow(
        entity_id=position.id or "",
        caption=caption,
        countries=countries,
        subnational_areas=subnational,
        topics=position.get("topics"),
        is_pep=default_is_pep,
    )
    return PositionCategorisation(
        topics=position.get("topics"), is_pep=default_is_pep
    )


def categorise_many(
    context: CrawlerContext, position_ids: list[str]
) -> list[PositionCategorisation]:
    """positions.py:111-128: bulk fetch of stored categorisations."""
    store = _position_store(context)
    return [
        PositionCategorisation(topics=row.topics, is_pep=row.is_pep)
        for pid in position_ids
        if (row := store.get(pid)) is not None
    ]


def load_categorisations(context: CrawlerContext, rows: Any) -> None:
    """Bridge IN: load reviewed decisions — iterable of
    (entity_id, topics, is_pep) tuples or mappings — so a decision made
    in the external review table drives the next crawl."""
    store = _position_store(context)
    for r in rows:
        if isinstance(r, dict):
            pid, topics, is_pep = r["entity_id"], r["topics"], r["is_pep"]
        else:
            pid, topics, is_pep = r[0], r[1], r[2]
        store[pid] = _PositionRow(
            entity_id=pid, caption=None, countries=[], subnational_areas=[],
            topics=list(topics or []), is_pep=is_pep, reviewed=True,
        )


def get_after_office(topics: list[str]) -> timedelta:
    """positions.py:146-153."""
    if "gov.national" in topics:
        if "gov.head" in topics:
            return NO_EXPIRATION
        return EXTENDED_AFTER_OFFICE
    if "gov.igo" in topics or "role.diplo" in topics:
        return EXTENDED_AFTER_OFFICE
    return DEFAULT_AFTER_OFFICE


def _ended_before(prefix: str, dt: datetime) -> bool:
    """rigour ended_before over ISO prefix dates: the LAST day covered
    by the prefix (at midnight) is strictly before ``dt`` — so an end
    date of TODAY has not elapsed yet, a year-precision "2016" only
    counts as ended once 2016-12-31 has, exactly the boundary behaviour
    the reference's occupancy tests pin."""
    return _parse_clamped(_prefix_ceil(prefix[:10])) < dt


def _starts_after(prefix: str, dt: datetime) -> bool:
    """rigour starts_after: the FIRST covered day starts after ``dt``."""
    return _parse_clamped(_prefix_floor(prefix[:10])) > dt


def _parse_clamped(iso_day: str) -> datetime:
    """Parse a padded YYYY-MM-DD, clamping an over-padded day (a month
    prefix ceils to day 31 regardless of month length)."""
    try:
        return datetime.fromisoformat(iso_day)
    except ValueError:
        import calendar

        y, m = int(iso_day[:4]), int(iso_day[5:7])
        return datetime(y, m, calendar.monthrange(y, m)[1])


def _run_time() -> datetime:
    return datetime.fromisoformat(RUN_TIME[:19])


def occupancy_status(
    context: CrawlerContext,
    *,
    person: Entity,
    position: Entity,
    occupancy: Entity,
    no_end_implies_current: bool = True,
    current_time: datetime | None = None,
    birth_date: str | None = None,
    death_date: str | None = None,
    categorisation: PositionCategorisation | None = None,
) -> OccupancyStatus | None:
    """The full reference decision order (positions.py:156-283):

    - death beyond AFTER_DEATH / birth beyond MAX_AGE → not a PEP (None)
    - endDate: past → ENDED within after-office else None; future →
      CURRENT (ENDED if deceased), unless the dataset's coverage has
      lapsed, in which case the future date is distrusted (UNKNOWN)
    - periodEnd: past → ENDED within after-office else None; a FUTURE
      period end implies nothing (an MP can leave a term early)
    - position dissolutionDate past → ENDED/None by after-office
    - effective start older than MAX_OFFICE → None
    - deceased → ENDED; else no_end_implies_current picks
      CURRENT/UNKNOWN.
    """
    now = current_time or _run_time()
    if death_date is not None and _ended_before(death_date, now - AFTER_DEATH):
        return None
    if birth_date is not None and _ended_before(birth_date, now - MAX_AGE):
        return None
    died = death_date is not None and not _starts_after(death_date, now)

    eff_start = max(occupancy.get("startDate"), default=None)
    if eff_start is None:
        eff_start = max(occupancy.get("periodStart"), default=None)
    if eff_start is None:
        eff_start = max(occupancy.get("electionDate"), default=None)
    end_date = max(occupancy.get("endDate"), default=None)
    period_end = max(occupancy.get("periodEnd"), default=None)

    if not (
        death_date or birth_date or end_date or period_end or eff_start
        or no_end_implies_current
    ):
        return None

    topics = (
        categorisation.topics if categorisation is not None
        else position.get("topics")
    )
    after_office = get_after_office(topics)

    if end_date is not None:
        if _ended_before(end_date, now):
            if _ended_before(end_date, now - after_office):
                return None
            return OccupancyStatus.ENDED
        coverage_end = None
        meta = getattr(context.dataset, "metadata", None) or {}
        coverage_end = (meta.get("coverage") or {}).get("end")
        if coverage_end and _ended_before(str(coverage_end), now):
            context.log.warning(
                "Future Occupancy end date is beyond the dataset coverage "
                "date. Check if the source data is being updated.",
                person=person.id, position=position.id, end_date=end_date,
            )
            return OccupancyStatus.ENDED if died else OccupancyStatus.UNKNOWN
        return OccupancyStatus.ENDED if died else OccupancyStatus.CURRENT

    if period_end is not None and _ended_before(period_end, now):
        if _ended_before(period_end, now - after_office):
            return None
        return OccupancyStatus.ENDED

    dis_date = max(position.get("dissolutionDate"), default=None)
    if dis_date is not None and _ended_before(dis_date, now):
        if _ended_before(dis_date, now - after_office):
            return None
        return OccupancyStatus.ENDED

    if eff_start is not None and _ended_before(eff_start, now - MAX_OFFICE):
        return None
    if died:
        return OccupancyStatus.ENDED
    if no_end_implies_current:
        return OccupancyStatus.CURRENT
    return OccupancyStatus.UNKNOWN


_QID_RE = __import__("re").compile(r"^Q[1-9]\d*$")


def categorised_position_qids(context: CrawlerContext):
    """Yield reviewed Wikidata position QIDs with their PEP verdicts
    (positions.py:131-143) — seeds/excludes positions before expensive
    source-side discovery."""
    for pid, row in _position_store(context).items():
        if row.is_pep is not None and _QID_RE.match(pid):
            yield pid, row.is_pep
