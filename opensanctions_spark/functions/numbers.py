"""Number parsing + unit normalization (SURVEY F6,
``zavod/zavod/helpers/numbers.py:19-60``): extract a numeric amount from a
messy string ("1,234.56 kg"), normalize the unit through a factor table.
All JVM-side: regex extract + decimal cast + broadcast-map multiply.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NUMBER_RE = r"([-+]?[0-9][0-9,]*(?:\.[0-9]+)?)"

# unit → (canonical_unit, factor)
UNIT_FACTORS: dict[str, tuple[str, float]] = {
    "kg": ("g", 1000.0),
    "g": ("g", 1.0),
    "t": ("g", 1_000_000.0),
    "km": ("m", 1000.0),
    "m": ("m", 1.0),
    "cm": ("m", 0.01),
}


def extract_amount(col: Column) -> Column:
    """First numeric amount in the string as DECIMAL(28,6), commas
    stripped; null if none."""
    raw = F.regexp_extract(col, NUMBER_RE, 1)
    cleaned = F.replace(raw, F.lit(","), F.lit(""))
    return F.when(cleaned != "", cleaned.cast("decimal(28,6)"))


def extract_unit(col: Column) -> Column:
    """Trailing unit token (letters after the number), lowercased."""
    return F.lower(F.regexp_extract(col, NUMBER_RE + r"\s*([A-Za-z]+)\b", 2))


def normalize_unit(amount: Column, unit: Column) -> tuple[Column, Column]:
    """(canonical_amount, canonical_unit) via the factor table."""
    unit_map = F.create_map(
        *[F.lit(x) for u, (cu, _) in UNIT_FACTORS.items() for x in (u, cu)]
    )
    factor_map = F.create_map(
        *[F.lit(x) for u, (_, f) in UNIT_FACTORS.items() for x in (u, f)]
    )
    canonical = F.coalesce(unit_map[unit], unit)
    # multiply in DECIMAL so the result is exact (a double multiply here
    # would drift vs exact-decimal engines), cast to double at the end
    factor = F.coalesce(factor_map[unit], F.lit(1.0)).cast("decimal(18,6)")
    return (amount * factor).cast("double"), canonical


def render_number(col: Column) -> Column:
    """The reference's number rendering (``zavod/zavod/helpers/numbers.py:
    12-17`` ``_float_str``): integers print bare, everything else at two
    decimals — ``5.0`` → ``'5'``, ``5.125`` → ``'5.12'``."""
    d = col.cast("double")
    # format_string, not format_number: the latter inserts thousands
    # separators ("1,234.50") which _float_str never emits
    return F.when(
        d == F.floor(d), F.floor(d).cast("long").cast("string")
    ).otherwise(F.format_string("%.2f", d))


def apply_number(col: Column) -> Column:
    """``apply_number``'s value text (``zavod/zavod/helpers/numbers.py:
    20-66``): parse the amount, normalize the unit, render
    ``"{num} {unit}"`` (or the bare number); unparseable input → NULL
    (the reference warns and skips the emit — P5 drops the row). Pure
    column math; pair with the statement factories to emit."""
    amount = extract_amount(col)
    unit = extract_unit(col)
    canonical_amount, canonical_unit = normalize_unit(amount, unit)
    num = render_number(canonical_amount)
    return F.when(
        amount.isNotNull(),
        F.when(
            (canonical_unit.isNotNull()) & (canonical_unit != ""),
            F.concat(num, F.lit(" "), canonical_unit),
        ).otherwise(num),
    )
