"""Identifier checksum validation (SURVEY F7,
``zavod/zavod/runtime/cleaning.py:19-63``: bic/isin/lei/imo/iban/inn/ogrn/…).

All validators are pure column expressions — digit extraction via
substring arithmetic and ``F.aggregate`` folds over character arrays, so
they run inside whole-stage codegen rather than as Python UDFs. At 100 TB
an identifier check is applied to billions of values; a row-at-a-time
Python UDF here would dominate the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _digit(col: Column, pos: int) -> Column:
    return F.substring(col, pos, 1).cast("int")


def valid_imo(col: Column) -> Column:
    """IMO ship id: 'IMO' prefix optional, 7 digits, weighted checksum —
    sum(d[i] * (8-i)) for i in 1..6, last digit of sum == d[7]."""
    digits = F.regexp_replace(F.upper(col), r"^IMO\s*", "")
    ok_shape = digits.rlike(r"^\d{7}$")
    weighted = sum(_digit(digits, i) * (8 - i) for i in range(1, 7))
    return ok_shape & ((weighted % 10) == _digit(digits, 7))


def valid_inn(col: Column) -> Column:
    """Russian INN (10-digit org form): checksum with weights
    [2,4,10,3,5,9,4,6,8], control = (sum % 11) % 10 == d10."""
    ok_shape = col.rlike(r"^\d{10}$")
    weights = [2, 4, 10, 3, 5, 9, 4, 6, 8]
    s = sum(_digit(col, i + 1) * w for i, w in enumerate(weights))
    return ok_shape & (((s % 11) % 10) == _digit(col, 10))


def valid_ogrn(col: Column) -> Column:
    """Russian OGRN: 13 digits, (first 12 as number) mod 11, last digit of
    that == d13. The 12-digit prefix exceeds int range → long arithmetic
    via an aggregate fold (still JVM-side)."""
    ok_shape = col.rlike(r"^\d{13}$")
    prefix = F.substring(col, 1, 12)
    num = F.aggregate(
        F.split(prefix, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.when(ch != "", acc * 10 + ch.cast("long")).otherwise(acc),
    )
    return ok_shape & ((num % 11 % 10) == _digit(col, 13))


def _luhn_base36(col: Column) -> Column:
    """Luhn checksum over a base-36 string (ISIN): letters expand to two
    digits (A=10..Z=35), then standard Luhn from the right."""
    # expand chars to digit string: 'US0378331005' -> '3028037833100 5' etc.
    expanded = F.aggregate(
        F.split(F.upper(col), ""),
        F.lit(""),
        lambda acc, ch: F.when(ch == "", acc)
        .when(ch.rlike("[0-9]"), F.concat(acc, ch))
        .otherwise(F.concat(acc, (F.ascii(ch) - 55).cast("string"))),
    )
    # Luhn: from rightmost digit, double every second; sum digits of products
    digits = F.reverse(F.filter(F.split(expanded, ""), lambda x: x != ""))
    indexed = F.zip_with(
        digits,
        F.sequence(F.lit(0), F.size(digits) - 1),
        lambda d, i: F.struct(d.cast("int").alias("d"), i.alias("i")),
    )
    total = F.aggregate(
        indexed,
        F.lit(0),
        lambda acc, x: acc
        + F.when(x["i"] % 2 == 0, x["d"]).otherwise(
            F.when(x["d"] * 2 > 9, x["d"] * 2 - 9).otherwise(x["d"] * 2)
        ),
    )
    return total % 10 == 0


def valid_isin(col: Column) -> Column:
    """ISIN: 2 letters + 9 alnum + check digit, Luhn over base-36."""
    ok_shape = F.upper(col).rlike(r"^[A-Z]{2}[A-Z0-9]{9}\d$")
    return ok_shape & _luhn_base36(col)


def valid_lei(col: Column) -> Column:
    """LEI: 18 alnum + 2 check digits, ISO 7064 mod 97-10 (like IBAN):
    letters → two digits (A=10..), whole number mod 97 == 1. Folded with
    incremental mod to stay in long range."""
    up = F.upper(col)
    ok_shape = up.rlike(r"^[A-Z0-9]{18}\d{2}$")
    rem = F.aggregate(
        F.split(up, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.when(ch == "", acc)
        .when(ch.rlike("[0-9]"), (acc * 10 + ch.cast("long")) % 97)
        .otherwise((acc * 100 + (F.ascii(ch) - 55).cast("long")) % 97),
    )
    return ok_shape & (rem == 1)


def valid_iban(col: Column) -> Column:
    """IBAN: move first 4 chars to the end, letters → digits, mod 97 == 1.
    Shape check is per-country-length in the reference; here ≥15 alnum."""
    up = F.regexp_replace(F.upper(col), r"\s+", "")
    ok_shape = up.rlike(r"^[A-Z]{2}\d{2}[A-Z0-9]{11,30}$")
    rearranged = F.concat(F.substring(up, 5, 99), F.substring(up, 1, 4))
    rem = F.aggregate(
        F.split(rearranged, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.when(ch == "", acc)
        .when(ch.rlike("[0-9]"), (acc * 10 + ch.cast("long")) % 97)
        .otherwise((acc * 100 + (F.ascii(ch) - 55).cast("long")) % 97),
    )
    return ok_shape & (rem == 1)


def imo_id_key(col: Column) -> Column:
    """The IMO portion of a stable vessel/org entity id
    (``zavod/zavod/helpers/vessels.py:5-18``): a checksum-valid IMO
    reduces to its canonical seven digits (an ``IMO`` prefix and stray
    spacing stripped); a present-but-invalid value falls back to a slug
    of the raw text so a faulty source IMO still keys a stable entity;
    NULL only when no usable text exists."""
    from opensanctions_spark.operators.edges import slugify_value

    digits = F.regexp_replace(F.upper(col), r"^\s*IMO\s*|\s", "")
    canonical = F.when(valid_imo(digits), digits)
    return F.coalesce(canonical, slugify_value(col))


def make_vessel_imo_id(col: Column) -> Column:
    """``imo-vsl-<key>`` vessel entity id (vessels.py:21-31); NULL
    passes through."""
    key = imo_id_key(col)
    return F.when(key.isNotNull(), F.concat(F.lit("imo-vsl-"), key))


def make_org_imo_id(col: Column) -> Column:
    """``imo-org-<key>`` IMO-company entity id (vessels.py:34-44)."""
    key = imo_id_key(col)
    return F.when(key.isNotNull(), F.concat(F.lit("imo-org-"), key))
