"""Text cleaning column functions (SURVEY F3/F4/F14/F15).

Mirrors ``zavod/zavod/helpers/text.py`` semantics as Catalyst expressions:
multi_split on N separators, bracketed-content removal, whitespace
squashing, HTML/XSS smell checks, length guards.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def multi_split(col: Column, separators: list[str]) -> Column:
    """Split on any of N separators (F3, ``zavod/zavod/helpers/text.py:46-79``):
    returns an array of trimmed, non-empty segments. The separator union is
    compiled into one regex so the split is a single JVM pass."""
    pattern = "|".join(re.escape(s) for s in separators)
    parts = F.split(col, pattern)
    trimmed = F.transform(parts, lambda x: F.trim(x))
    return F.filter(trimmed, lambda x: x != "")


def explode_multi_split(
    df: DataFrame, col: str, separators: list[str], out: str = "segment"
) -> DataFrame:
    """multi_split + explode: one row per segment."""
    return df.withColumn(out, F.explode(multi_split(F.col(col), separators)))


def remove_bracketed(col: Column) -> Column:
    """Drop (...) and [...] spans (F4, ``zavod/zavod/helpers/text.py:99``)."""
    return F.regexp_replace(col, r"\([^)]*\)|\[[^\]]*\]", " ")


def squash_spaces(col: Column) -> Column:
    """Collapse whitespace runs and trim (clean_note semantics)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def clean_note(col: Column) -> Column:
    """Full note cleaning: strip brackets, squash spaces, empty→null."""
    cleaned = squash_spaces(remove_bracketed(col))
    return F.when(F.length(cleaned) > 0, cleaned)


#: the reference's XSS_SUSPECT_PATTERN (``zavod/zavod/runtime/
#: safety.py:27-37``): closed tags, URI schemes with a required word
#: boundary (so "MANDATA:" does not match the "data:" alternative),
#: word-boundary event handlers, and "&#x"-style entity references.
#: One pattern string, valid in Java regex (rlike), Python re, and
#: DuckDB RE2 — the oracle uses it verbatim.
XSS_PATTERN = r"(?i)(<[^>]*>|\b(?:javascript|data|vbscript):|\bon\w+\s*=|&#[a-zA-Z])"

#: decimal/hex HTML entity references (safety.py:18-25; the named-entity
#: alternative stays disabled there for false-positive reasons)
HTML_ENTITY_PATTERN = r"&(#[0-9]{1,7};|#[xX][0-9a-fA-F]{1,6};)"


def looks_unsafe(col: Column) -> Column:
    """HTML/XSS smell check (F14, ``zavod/zavod/runtime/safety.py``
    XSS_SUSPECT_PATTERN via ``zavod/zavod/runtime/cleaning.py:101-104``)."""
    return col.rlike(XSS_PATTERN)


def has_html_entities(col: Column) -> Column:
    """Decimal/hex entity-reference smell (safety.py HTML_ENTITY_PATTERN)."""
    return col.rlike(HTML_ENTITY_PATTERN)


def exceeds_max_length(col: Column, max_length: int) -> Column:
    """Value-length guard (F15, ``zavod/zavod/runtime/cleaning.py:137-146``)."""
    return F.length(col) > max_length


def token_count(col: Column, pattern: str = "[A-Za-z0-9]+") -> Column:
    """Count word-ish tokens (BPE-ish regex tokenizer's unit count)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))
