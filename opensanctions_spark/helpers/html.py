"""Compat ``zavod.helpers.html`` submodule path."""

from opensanctions_spark.helpers import (  # noqa: F401
    cells_to_str,
    element_text,
    links_to_dict,
    parse_html_table,
    split_html_newline_tags,
)
