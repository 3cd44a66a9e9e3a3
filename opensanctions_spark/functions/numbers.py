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
