"""Compat ``zavod.helpers.text`` submodule path."""

from opensanctions_spark.helpers import (  # noqa: F401
    clean_note,
    is_empty,
    multi_split,
    remove_bracketed,
)
