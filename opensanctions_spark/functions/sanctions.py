"""Sanction entity factory (``zavod/zavod/helpers/sanctions.py:21-113``) —
the reference's single most-used crawler helper.

``make_sanction`` derives one Sanction entity per (subject, key):

- id = ``make_id("Sanction", entity.id, key)``;
- the subject back-reference (``entity``), the publisher ``country``
  (suppressed for the ``zz`` placeholder), ``authority`` and
  ``sourceUrl`` stamped from dataset metadata with ``origin=metadata``
  (``ORIGIN_METADATA``, sanctions.py:62-65);
- ``program`` (free-text name), and — when the program key resolves in
  the curated program registry (``zavod/zavod/stateful/programs.py``) —
  ``programId`` (original_value = the source's own key) + ``programUrl``
  on the sanction and a ``programId`` back-reference on the subject
  entity, all ``origin=metadata`` (sanctions.py:68-83). Unknown keys
  emit nothing (the reference warns; here ``unknown_program_keys``
  surfaces them for the A7 issue channel);
- ``startDate`` / ``endDate`` parsed against ``ALWAYS_FORMATS``
  (ISO-prefix dates, sanctions.py:10,86-89), and — only when an
  end date is given and parses — a construction-time ``status`` of
  active/inactive with exactly the ``is_active`` semantics
  (sanctions.py:90-97,100-113): active iff the run time falls inside
  [earliest start, latest end] under prefix-date expansion.

Spark rendering: one ``F.inline`` stack projection per source scan —
map-only, no shuffle, no UDF; the program registry is a driver-side
literal map Catalyst constant-folds (it is a few hundred rows in the
reference, always broadcast-sized). The reference raises ValueError on
an unparseable end date; a distributed plan cannot raise per-row, so
``invalid_prefix_dates`` returns the offending rows for an A12
fatal-min assertion instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opensanctions_spark.model.melt import RUN_TIME, finish_statements

#: the reference's ``ORIGIN_METADATA`` (zavod/zavod/constants.py) — marks
#: values stamped from dataset metadata rather than read from the source
ORIGIN_METADATA = "metadata"

#: ISO prefix-date pattern accepted by the reference's ``ALWAYS_FORMATS``
#: ("%Y-%m-%d", "%Y-%m", "%Y" — sanctions.py:10)
PREFIX_DATE_RE = r"^\d{4}(-\d{2}(-\d{2})?)?$"


def make_sanction_id(entity_id: Column, key: Column | None = None) -> Column:
    """``context.make_id("Sanction", entity.id, key)`` — the hash joins
    only the parts that are present, so a NULL key hashes identically to
    no key at all (make_id skips None parts, zavod/zavod/context.py:504).
    md5 for DuckDB-oracle parity."""
    parts = F.concat(
        F.lit("Sanction|"),
        entity_id,
        F.when(key.isNotNull(), F.concat(F.lit("|"), key)).otherwise(F.lit(""))
        if key is not None
        else F.lit(""),
    )
    return F.concat(F.lit("osp-"), F.md5(parts))


def clean_prefix_date(col: Column) -> Column:
    """ALWAYS_FORMATS cleaning: a value already in ISO-prefix form passes
    through, anything else is NULL (the reference parses with exactly the
    three ISO formats — non-ISO inputs go through per-dataset formats
    BEFORE this helper, so at this boundary non-matching means
    unparseable)."""
    trimmed = F.trim(col)
    return F.when(trimmed.rlike(PREFIX_DATE_RE), trimmed)


def invalid_prefix_dates(df: DataFrame, value_col: str) -> DataFrame:
    """Rows whose date value is non-null but not ISO-prefix parseable —
    the distributed stand-in for the reference's ValueError on bad
    ``end_date`` (sanctions.py:90-96): feed the count into an A12
    fatal-min assertion to abort the run."""
    v = F.trim(F.col(value_col))
    return df.filter(F.col(value_col).isNotNull() & ~v.rlike(PREFIX_DATE_RE))


def sanction_is_active(
    start: Column, end: Column, run_time: str = RUN_TIME
) -> Column:
    """``is_active`` (sanctions.py:100-113): active iff the run time is
    not before the earliest start nor after the latest end, under
    prefix-date expansion — a start prefix expands to its FIRST covered
    day (``2026`` starts 2026-01-01) and an end prefix to its LAST
    (``2026`` ends 2026-12-31), exactly rigour's
    ``starts_after``/``ended_before``. NULL on either side passes that
    side. Pure lexicographic string comparison — ISO prefixes order
    correctly by construction (SURVEY §1.3)."""
    run_date = run_time[:10]
    start_floor = F.concat(
        start, F.substring(F.lit("0000-01-01"), F.length(start) + 1, 10)
    )
    end_ceil = F.concat(
        end, F.substring(F.lit("9999-12-31"), F.length(end) + 1, 10)
    )
    started = start.isNull() | (start_floor <= F.lit(run_date))
    not_ended = end.isNull() | (end_ceil >= F.lit(run_date))
    return started & not_ended


def unknown_program_keys(
    df: DataFrame, program_key_col: str, known_keys: list[str]
) -> DataFrame:
    """Distinct program keys that do not resolve in the registry — the
    reference logs a warning per miss (sanctions.py:78-83); route these
    into the issues channel (A7)."""
    pk = F.col(program_key_col)
    return (
        df.filter(pk.isNotNull() & ~pk.isin(*known_keys) if known_keys else pk.isNotNull())
        .select(pk.alias("program_key"))
        .distinct()
    )


def make_sanction_statements(
    df: DataFrame,
    dataset: str,
    entity_col: str,
    publisher_name: str,
    publisher_country: str | None = None,
    source_url: str | None = None,
    key_col: str | None = None,
    program_name_col: str | None = None,
    program_key_col: str | None = None,
    source_program_key_col: str | None = None,
    start_col: str | None = None,
    end_col: str | None = None,
    entity_schema: Column | str = "Thing",
    program_urls: dict[str, str | None] | None = None,
    run_time: str = RUN_TIME,
) -> DataFrame:
    """Subject rows → Sanction statements in the engine's IR — the exact
    emit set of ``make_sanction`` (sanctions.py:21-113) as one map-only
    stack projection.

    ``program_urls`` is the resolved registry slice (program key →
    programUrl, from ``functions.programs.load_programs``): only keys
    present emit programId/programUrl/subject-back-ref, mirroring the
    get_program_by_key gate. ``entity_schema`` is the SUBJECT's schema
    for its programId back-reference (same lattice-widening concern as
    the identification factory). ``publisher_country='zz'`` (or None)
    suppresses the country statement (sanctions.py:62-63).
    """
    program_urls = program_urls or {}
    entity_id = F.col(entity_col)
    key = F.col(key_col) if key_col else None
    sid = make_sanction_id(entity_id, key)
    meta = F.lit(ORIGIN_METADATA)
    null_s = F.lit(None).cast("string")

    def prop(
        name: str, value: Column, origin: Column | None = None,
        original_value: Column | None = None,
    ) -> Column:
        return F.struct(
            sid.alias("entity_id"),
            F.lit("Sanction").alias("schema"),
            F.lit(name).alias("prop"),
            value.cast("string").alias("value"),
            (origin if origin is not None else null_s).alias("origin"),
            (original_value if original_value is not None else null_s).alias(
                "original_value"
            ),
        )

    rows: list[Column] = [prop("entity", entity_id)]
    if publisher_country and publisher_country != "zz":
        rows.append(prop("country", F.lit(publisher_country), origin=meta))
    rows.append(prop("authority", F.lit(publisher_name), origin=meta))
    if source_url:
        rows.append(prop("sourceUrl", F.lit(source_url), origin=meta))
    if program_name_col:
        rows.append(prop("program", F.col(program_name_col)))

    back_ref: Column | None = None
    if program_key_col:
        pk = F.col(program_key_col)
        known = sorted(program_urls)
        resolved = pk.isin(*known) if known else F.lit(False)
        src = (
            F.col(source_program_key_col) if source_program_key_col else null_s
        )
        rows.append(
            prop(
                "programId", F.when(resolved, pk), origin=meta,
                original_value=F.when(resolved, src),
            )
        )
        url_map = (
            F.create_map(
                *[
                    c
                    for k in known
                    for c in (F.lit(k), F.lit(program_urls[k]).cast("string"))
                ]
            )
            if known
            else F.create_map().cast("map<string,string>")
        )
        rows.append(prop("programUrl", url_map[pk], origin=meta))
        schema_col = (
            entity_schema
            if isinstance(entity_schema, Column)
            else F.lit(str(entity_schema))
        )
        # the subject back-reference (sanctions.py:77: entity.add("programId"))
        back_ref = F.struct(
            entity_id.alias("entity_id"),
            schema_col.alias("schema"),
            F.lit("programId").alias("prop"),
            F.when(resolved, pk).cast("string").alias("value"),
            meta.alias("origin"),
            null_s.alias("original_value"),
        )

    start = clean_prefix_date(F.col(start_col)) if start_col else None
    end = clean_prefix_date(F.col(end_col)) if end_col else None
    if start is not None:
        rows.append(prop("startDate", start))
    if end is not None:
        rows.append(prop("endDate", end))
        # status only at construction time, only when the end date parsed
        # (sanctions.py:90-97)
        rows.append(
            prop(
                "status",
                F.when(
                    end.isNotNull(),
                    F.when(
                        sanction_is_active(start if start is not None else null_s,
                                           end, run_time),
                        F.lit("active"),
                    ).otherwise(F.lit("inactive")),
                ),
            )
        )
    if back_ref is not None:
        rows.append(back_ref)

    stacked = df.select(F.inline(F.array(*rows)))
    return finish_statements(stacked, dataset=dataset)


def lookup_sanction_program_key(lookup, source_key_col: Column) -> Column:
    """``lookup_sanction_program_key`` (sanctions.py:13-19): resolve the
    source's own program key to an OpenSanctions program key through the
    dataset's ``sanction.program`` lookup (J13). Column form — the
    lookup compiles to a literal map probe / CASE chain; unresolved keys
    yield NULL (the reference warns; count the NULLs into the issue
    channel). ``lookup`` is a ``functions.lookups.Lookup``."""
    return lookup.value_column(source_key_col, default=F.lit(None).cast("string"))
