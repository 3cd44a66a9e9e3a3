"""PEP positions: occupancy status (SURVEY F13,
``zavod/zavod/stateful/positions.py:146-283``) and the Position /
Occupancy entity factories (``zavod/zavod/helpers/positions.py:21-131``
``make_position`` and ``:132-273`` ``make_occupancy``) — a nested CASE
over prefix dates deciding whether a position holder is current / ended /
unknown, with per-topic "after office" grace windows during which an
ended PEP is still considered relevant, plus map-only stack projections
emitting the two entities' statements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def occupancy_status_full(
    start: Column,
    end: Column,
    period_start: Column,
    period_end: Column,
    election: Column,
    topic: Column,
    current_time: str,
    no_end_implies_current: Column | bool = True,
) -> Column:
    """The full ``occupancy_status`` decision order
    (``zavod/zavod/stateful/positions.py:156-283``) as one CASE chain:

    - ``endDate`` is the most specific signal: future → current; past
      within the after-office grace → ended; past beyond grace → NULL
      (the occupancy is no longer PEP-relevant and the reference returns
      None — callers drop the row);
    - ``periodEnd`` past → ended/NULL by the same grace test; a FUTURE
      period end does NOT imply the person is still in office (an MP can
      leave a term early) and falls through;
    - no end signal at all: ``no_end_implies_current`` decides current
      vs unknown — but if there are NO dates whatsoever and the source
      is not well-maintained (flag false), the reference declines to
      call them a PEP at all → NULL;
    - the effective start is the T5 precedence chain startDate →
      periodStart → electionDate (positions.py:195-201).

    Death/birth-date caps and the dataset coverage gate need person and
    dataset inputs and are layered on by callers that carry them. Date
    comparisons are raw lexicographic ISO-prefix compares, same as
    ``occupancy_status`` above (oracle-pinned by f13).
    """
    now = F.lit(current_time[:10])
    nei = (
        no_end_implies_current
        if isinstance(no_end_implies_current, Column)
        else F.lit(bool(no_end_implies_current))
    )
    grace_map = F.create_map(
        *[F.lit(x) for kv in AFTER_OFFICE_YEARS.items() for x in kv]
    )
    grace_years = F.coalesce(grace_map[topic], F.lit(DEFAULT_AFTER_OFFICE))
    nullif = lambda c: F.when(c.isNotNull() & (c != ""), c)  # noqa: E731
    eff_start = F.coalesce(nullif(start), nullif(period_start), nullif(election))
    has_end = end.isNotNull() & (end != "")
    has_pe = period_end.isNotNull() & (period_end != "")
    end_grace = _shift_years(end, grace_years)
    pe_grace = _shift_years(period_end, grace_years)
    no_dates = ~has_end & ~has_pe & eff_start.isNull()
    null_s = F.lit(None).cast("string")
    return (
        F.when(has_end & (end > now), "current")
        .when(has_end & (end_grace >= now), "ended")
        .when(has_end, null_s)                                  # beyond grace
        .when(has_pe & (period_end <= now) & (pe_grace >= now), "ended")
        .when(has_pe & (period_end <= now), null_s)             # beyond grace
        .when(no_dates & ~nei, null_s)                          # nothing to go on
        .when(nei, "current")
        .otherwise("unknown")
    )


def make_position_id(
    name: Column,
    country: Column | None = None,
    inception: Column | None = None,
    dissolution: Column | None = None,
    subnational: Column | None = None,
    wikidata_id: Column | None = None,
    hash_prefix: str = "position",
) -> Column:
    """Position entity id (``zavod/zavod/helpers/positions.py:76-89``):
    the Wikidata QID verbatim when present, else
    ``make_id(name, country, inception, dissolution, subnational_area)``
    — ``concat_ws`` skips NULL parts exactly like make_id skips None
    parts. md5 for DuckDB-oracle parity."""
    parts = [F.lit(hash_prefix), name]
    for extra in (country, inception, dissolution, subnational):
        if extra is not None:
            parts.append(extra)
    hashed = F.concat(F.lit("osp-"), F.md5(F.concat_ws("|", *parts)))
    if wikidata_id is not None:
        return F.coalesce(wikidata_id, hashed)
    return hashed


def make_position_statements(
    df: DataFrame,
    dataset: str,
    name_col: str,
    country_col: str | None = None,
    topics_col: str | None = None,
    subnational_col: str | None = None,
    organization_col: str | None = None,
    inception_col: str | None = None,
    dissolution_col: str | None = None,
    seats_col: str | None = None,
    wikidata_col: str | None = None,
    source_url_col: str | None = None,
    summary_col: str | None = None,
    description_col: str | None = None,
) -> DataFrame:
    """Position rows → Position statements
    (``zavod/zavod/helpers/positions.py:21-131`` emit set: name, summary,
    description, country, topics, organization, subnationalArea,
    inceptionDate, dissolutionDate, numberOfSeats, wikidataId,
    sourceUrl) as one map-only stack projection; NULL-valued props are
    dropped by the P5 guard, exactly ``Entity.add``'s None skip. Feed a
    DISTINCT attribute projection when several source rows share a
    position so each position emits once."""
    name = F.col(name_col)
    col = lambda c: F.col(c) if c else None  # noqa: E731
    pid = make_position_id(
        name,
        country=col(country_col),
        inception=col(inception_col),
        dissolution=col(dissolution_col),
        subnational=col(subnational_col),
        wikidata_id=col(wikidata_col),
    )

    def prop(pname: str, value: Column) -> Column:
        return F.struct(
            pid.alias("entity_id"),
            F.lit("Position").alias("schema"),
            F.lit(pname).alias("prop"),
            value.cast("string").alias("value"),
        )

    rows = [prop("name", name)]
    optional = {
        "summary": summary_col,
        "description": description_col,
        "country": country_col,
        "topics": topics_col,
        "organization": organization_col,
        "subnationalArea": subnational_col,
        "inceptionDate": inception_col,
        "dissolutionDate": dissolution_col,
        "numberOfSeats": seats_col,
        "wikidataId": wikidata_col,
        "sourceUrl": source_url_col,
    }
    for pname, c in optional.items():
        if c is not None:
            rows.append(prop(pname, F.col(c)))
    from opensanctions_spark.model.melt import finish_statements

    stacked = df.select(F.inline(F.array(*rows)))
    return finish_statements(stacked, dataset=dataset)


def make_occupancy_id(
    person: Column,
    position: Column,
    start: Column,
    end: Column,
    period_start: Column | None = None,
    period_end: Column | None = None,
) -> Column:
    """Occupancy entity id (``zavod/zavod/helpers/positions.py:193-207``):
    hash over (person, position, 'started', start|'unknown', 'ended',
    end|'unknown') plus marker-tagged period bounds when present — the
    started/ended markers keep an occupancy missing its start distinct
    from one missing its end."""
    parts = [
        person,
        position,
        F.lit("started"),
        F.coalesce(start, F.lit("unknown")),
        F.lit("ended"),
        F.coalesce(end, F.lit("unknown")),
    ]
    if period_start is not None:
        parts.append(F.when(period_start.isNotNull(), F.lit("period_start")))
        parts.append(period_start)
    if period_end is not None:
        parts.append(F.when(period_end.isNotNull(), F.lit("period_end")))
        parts.append(period_end)
    return F.concat(F.lit("osp-"), F.md5(F.concat_ws("|", *parts)))


def make_occupancy_statements(
    df: DataFrame,
    dataset: str,
    person_col: str,
    position_col: str,
    start_col: str | None = None,
    end_col: str | None = None,
    period_start_col: str | None = None,
    period_end_col: str | None = None,
    election_col: str | None = None,
    topic_col: str | None = None,
    is_pep_col: str | None = None,
    no_end_implies_current: Column | bool = True,
    current_time: str | None = None,
) -> DataFrame:
    """Holder rows → Occupancy statements — the emit set of
    ``make_occupancy`` (``zavod/zavod/helpers/positions.py:132-273``):
    holder + post + the five date props, the construction-time status
    (omitted when 'unknown', reference :255), and the holder's inferred
    ``role.pep`` topic (:258). Rows whose categorisation is not PEP
    (``is_pep_col`` false — the reference warns and returns None) and
    rows whose status resolves to no-longer-relevant (NULL from
    ``occupancy_status_full``) emit NOTHING — not even the person topic.
    One map-only stack projection; status is a pure column CASE."""
    from opensanctions_spark.model.melt import RUN_TIME, finish_statements

    current_time = current_time or RUN_TIME
    person = F.col(person_col)
    position = F.col(position_col)
    null_s = F.lit(None).cast("string")
    col = lambda c: F.col(c) if c else null_s  # noqa: E731
    start, end = col(start_col), col(end_col)
    pstart, pend = col(period_start_col), col(period_end_col)
    election = col(election_col)
    topic = col(topic_col)
    oid = make_occupancy_id(
        person, position, start, end,
        period_start=pstart if period_start_col else None,
        period_end=pend if period_end_col else None,
    )
    status = occupancy_status_full(
        start, end, pstart, pend, election, topic, current_time,
        no_end_implies_current=no_end_implies_current,
    )

    gated = df.filter(F.col(is_pep_col)) if is_pep_col else df
    gated = gated.filter(status.isNotNull())

    def prop(pname: str, value: Column) -> Column:
        return F.struct(
            oid.alias("entity_id"),
            F.lit("Occupancy").alias("schema"),
            F.lit(pname).alias("prop"),
            value.cast("string").alias("value"),
            null_s.alias("origin"),
        )

    rows = [prop("holder", person), prop("post", position)]
    dates = {
        "startDate": start_col,
        "endDate": end_col,
        "periodStart": period_start_col,
        "periodEnd": period_end_col,
        "electionDate": election_col,
    }
    for pname, c in dates.items():
        if c is not None:
            rows.append(prop(pname, F.col(c)))
    rows.append(prop("status", F.when(status != "unknown", status)))
    # the person picks up the inferred PEP topic (positions.py:258)
    rows.append(
        F.struct(
            person.alias("entity_id"),
            F.lit("Person").alias("schema"),
            F.lit("topics").alias("prop"),
            F.lit("role.pep").alias("value"),
            F.lit("inferred").alias("origin"),
        )
    )
    stacked = gated.select(F.inline(F.array(*rows)))
    return finish_statements(stacked, dataset=dataset)


def earliest_term_start(topics: list[str] | None = None,
                        run_time: str | None = None) -> str:
    """Cut-off start date for historical parliamentary/government terms
    (``zavod/zavod/helpers/positions.py:249-273``): the after-office
    window for the given topics plus 2× the default window of slack,
    subtracted from the run time — crawlers drop occupancies older than
    this before emitting. Driver-side scalar (it parameterizes a filter
    literal, it is not per-row math)."""
    from datetime import date, timedelta

    from opensanctions_spark.model.melt import RUN_TIME

    topics = topics or ["gov.national"]
    years = max(
        (AFTER_OFFICE_YEARS.get(t, DEFAULT_AFTER_OFFICE) for t in topics),
        default=DEFAULT_AFTER_OFFICE,
    )
    years += DEFAULT_AFTER_OFFICE * 2  # extra slack, positions.py:268
    run = date.fromisoformat((run_time or RUN_TIME)[:10])
    return (run - timedelta(days=365 * years)).isoformat()
