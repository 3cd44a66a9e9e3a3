"""Date parsing column functions (SURVEY F1/F2/P6).

The reference parses messy multi-format dates into ISO *prefix* strings —
``1990``, ``1990-05``, ``1990-05-01`` — truncated to day precision
(``zavod/zavod/helpers/dates.py:41-128``,
``zavod/zavod/runtime/cleaning.py:134-136``). Prefix dates stay strings and
order lexicographically; only the parser needs real date semantics.

Spark-first: a coalesce chain of ``try_to_timestamp`` attempts (JVM-side,
null on mismatch — safe under ANSI mode) + regex passthrough for values
already in ISO-prefix form. Month names are normalized with one
regexp_replace pass per language table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_PREFIX_RE = r"^\d{4}(-\d{2}(-\d{2})?)?$"

# month-name → number (German sample mirrors the reference's per-dataset
# month tables, zavod/zavod/meta/dataset.py:108-115)
MONTHS_DE = {
    "Januar": "01", "Februar": "02", "März": "03", "April": "04",
    "Mai": "05", "Juni": "06", "Juli": "07", "August": "08",
    "September": "09", "Oktober": "10", "November": "11", "Dezember": "12",
}


def normalize_month_names(col: Column, table: dict[str, str] | None = None) -> Column:
    """Replace localized month names with zero-padded numbers."""
    out = col
    for name, num in (table or MONTHS_DE).items():
        out = F.regexp_replace(out, rf"(?i)\b{name}\b", num)
    return out


def parse_date(col: Column, formats: list[str]) -> Column:
    """Multi-format parse → ISO day-precision string (F1+F2).

    Values already in ISO prefix form pass through unchanged (the
    reference keeps year/month precision); otherwise the first matching
    format wins; unparseable → null.
    """
    attempts = [
        F.date_format(F.try_to_timestamp(col, F.lit(fmt)), "yyyy-MM-dd")
        for fmt in formats
    ]
    return F.when(col.rlike(ISO_PREFIX_RE), col).otherwise(F.coalesce(*attempts))


def truncate_day_precision(col: Column) -> Column:
    """Cut timestamps to day precision, keep shorter prefixes intact
    (``zavod/zavod/runtime/cleaning.py:134-136``)."""
    return F.substring(col, 1, 10)


def extract_years(col: Column) -> Column:
    """All plausible years mentioned in a string (fallback parser)."""
    return F.regexp_extract_all(col, F.lit(r"\b(1[89]\d{2}|20\d{2})\b"), F.lit(1))


def check_person_cutoff(birth: Column, death: Column, run_date: str,
                        max_age_years: int = 110) -> Column:
    """P7: true when a person should be DROPPED from enrichment expansion —
    dead, or born more than max_age_years before the run date (FtM
    ``check_person_cutoff`` used at
    ``zavod/zavod/runner/local_enricher.py:184``). Lexicographic compare
    on ISO prefixes; missing dates keep the person."""
    birth_cutoff = f"{int(run_date[:4]) - max_age_years}{run_date[4:10]}"
    dead = death.isNotNull() & (death != "") & (death <= F.lit(run_date[:10]))
    too_old = birth.isNotNull() & (birth != "") & (birth < F.lit(birth_cutoff))
    return dead | too_old


def within_max_age(col: Column, run_date: str, max_years: int) -> Column:
    """Recency predicate on prefix dates (P6,
    ``zavod/zavod/helpers/dates.py:210-229``): lexicographic compare
    against the cutoff prefix is correct for ISO prefixes."""
    cutoff = f"{int(run_date[:4]) - max_years}{run_date[4:10]}"
    return col >= F.lit(cutoff)


def convert_excel_date(col: Column) -> Column:
    """Excel date serials → ISO timestamp strings
    (``zavod/zavod/helpers/excel.py:47-69``): numeric strings and floats
    truncate to an integer day count; values outside the plausible
    [4000, 100000] window (≈1910–2173) null out — the reference's guard
    against row numbers and phone-number-looking cells. The 1900 epoch
    quirk (serial 1 = 1900-01-01, with Excel's phantom 1900-02-29)
    matches via the -2 day adjustment."""
    serial = F.floor(col.try_cast("double")).cast("long")
    in_range = (serial >= 4000) & (serial <= 100000)
    day = F.date_add(F.lit("1900-01-01").cast("date"), (serial - 2).cast("int"))
    return F.when(
        in_range, F.concat(day.cast("string"), F.lit("T00:00:00"))
    )


def backdate(date: Column, days: int) -> Column:
    """Partial ISO date string ``days`` before the given timestamp
    (``zavod/zavod/helpers/dates.py:204-207``) — the recency-window
    cutoff builder P6/P7 filters use."""
    return F.date_sub(date.cast("date"), days).cast("string")
