"""PEP occupancy status (SURVEY F13,
``zavod/zavod/stateful/positions.py:146-283``): a nested CASE over prefix
dates deciding whether a position holder is current / ended / unknown,
with per-topic "after office" grace windows during which an ended PEP is
still considered relevant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# topic → years after leaving office during which the person stays flagged
AFTER_OFFICE_YEARS: dict[str, int] = {
    "gov.national": 5,
    "gov.igo": 5,
    "gov.state": 2,
    "gov.muni": 1,
    "role.diplo": 5,
}
DEFAULT_AFTER_OFFICE = 5


def _shift_years(prefix_date: Column, years: Column) -> Column:
    """Add N years to an ISO prefix date, lexicographically-safely: only
    the leading year component changes. try_cast: a malformed date yields
    null (status falls through to 'unknown'), never a failed task (ANSI
    casts throw)."""
    year = F.substring(prefix_date, 1, 4).try_cast("int") + years
    return F.concat(year.cast("string"), F.substring(prefix_date, 5, 6))


def occupancy_status(start_date: Column, end_date: Column, topic: Column,
                     current_time: str) -> Column:
    """'current' | 'ended' | 'unknown' (| null = no longer relevant).

    Mirrors the reference's state machine: a dated end in the past means
    ended (but only within the after-office window, else null/expired); no
    end date + a start date means current; neither date → unknown.
    Prefix-date strings compare lexicographically, so all comparisons stay
    JVM-side string ops.
    """
    now = F.lit(current_time[:10])
    grace_map = F.create_map(
        *[F.lit(x) for kv in AFTER_OFFICE_YEARS.items() for x in kv]
    )
    grace_years = F.coalesce(grace_map[topic], F.lit(DEFAULT_AFTER_OFFICE))
    grace_until = _shift_years(end_date, grace_years)
    has_start = start_date.isNotNull() & (start_date != "")
    has_end = end_date.isNotNull() & (end_date != "")
    return (
        F.when(has_end & (end_date > now), "current")        # dated future end
        .when(has_end & (grace_until >= now), "ended")       # within grace
        .when(has_end, F.lit(None).cast("string"))           # expired
        .when(has_start & (start_date <= now), "current")
        .otherwise("unknown")
    )
