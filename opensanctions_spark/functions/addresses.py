"""Address composition & parsing (SURVEY F10,
``zavod/zavod/helpers/addresses.py:18-243``): compose a display address
from typed parts, split PO boxes, normalize whitespace/commas — column
expressions only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PO_BOX_RE = r"(?i)\b(?:P\.?\s*O\.?\s*Box|Postfach|Boîte Postale)\s*(\d+)"


def compose_address(*parts: Column) -> Column:
    """Join non-empty address parts with ', ' in the given order
    (street, city, state, postal_code, country — the reference's
    format order)."""
    arr = F.array(*parts)
    present = F.filter(arr, lambda x: x.isNotNull() & (F.trim(x) != ""))
    # explicit 1-arg lambda: F.trim itself is 2-parameter and F.transform
    # would pass the element index as its trim-character set
    return F.when(
        F.size(present) > 0,
        F.array_join(F.transform(present, lambda x: F.trim(x)), ", "),
    )


def extract_po_box(col: Column) -> Column:
    """PO box number if present, else null."""
    box = F.regexp_extract(col, PO_BOX_RE, 1)
    return F.when(box != "", box)


def normalize_address(col: Column) -> Column:
    """Squash repeated separators/whitespace: ' ,, ' → ', '."""
    no_dup_commas = F.regexp_replace(col, r"\s*,[\s,]*", ", ")
    return F.trim(F.regexp_replace(no_dup_commas, r"\s+", " "))
