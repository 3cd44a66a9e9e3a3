"""Compat ``zavod.helpers.dates`` submodule path: re-exports the date
helpers from the package surface."""

from opensanctions_spark.helpers import (  # noqa: F401
    apply_date,
    apply_dates,
    backdate,
    extract_date,
    extract_years,
    parse_formats,
    replace_months,
    within_max_age,
)
