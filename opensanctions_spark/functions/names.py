"""Name assembly & cleaning (SURVEY F5,
``zavod/zavod/helpers/names.py:88-342``): full-name composition from parts,
honorific stripping, comma-form reordering, regularity heuristics — all as
column expressions (regex + concat), no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# honorifics the reference strips before matching (prefixes list analogue)
TITLES = [
    "Mr", "Mrs", "Ms", "Miss", "Dr", "Prof", "Sir", "Dame", "Lord", "Lady",
    "Gen", "Col", "Maj", "Capt", "Lt", "Sgt", "Rev", "Hon",
]
_TITLE_RE = r"(?i)^\s*(?:(?:" + "|".join(TITLES) + r")\.?\s+)+"


def make_name(*parts: Column) -> Column:
    """Compose a full name from ordered parts, skipping null/empty ones
    (``zavod/zavod/helpers/names.py:88-140`` make_name)."""
    arr = F.array(*parts)
    present = F.filter(arr, lambda x: x.isNotNull() & (F.trim(x) != ""))
    # explicit 1-arg lambda: F.trim itself is 2-parameter and F.transform
    # would pass the element index as its trim-character set
    return F.when(
        F.size(present) > 0,
        F.array_join(F.transform(present, lambda x: F.trim(x)), " "),
    )


def strip_titles(col: Column) -> Column:
    """Drop leading honorifics ("Mr. ", "Gen. ", stacked ones too)."""
    return F.regexp_replace(col, _TITLE_RE, "")


def reorder_comma_name(col: Column) -> Column:
    """"Last, First [Middle]" → "First [Middle] Last"; names without
    exactly one comma pass through (the reference's cautious comma split,
    ``zavod/zavod/helpers/names.py:344-420``)."""
    one_comma = F.size(F.split(col, ",")) == 2
    last = F.trim(F.element_at(F.split(col, ","), 1))
    first = F.trim(F.element_at(F.split(col, ","), 2))
    swapped = F.concat_ws(" ", first, last)
    return F.when(one_comma & (first != "") & (last != ""), swapped).otherwise(col)


def clean_name(col: Column) -> Column:
    """Full cleaning chain: strip titles, squash whitespace, trim."""
    return F.trim(F.regexp_replace(strip_titles(col), r"\s+", " "))


def is_name_regular(col: Column) -> Column:
    """Plausibility heuristic (NFC'd letters, spaces, common punctuation
    only; ≥2 chars; has a letter) — the reference rejects junk names at
    clean time (``zavod/zavod/runtime/cleaning.py:110-133``)."""
    return (
        (F.length(col) >= 2)
        & col.rlike(r"^[\p{L}\p{M}\s.,'’\-()&/#0-9]+$")
        & col.rlike(r"\p{L}")
    )
