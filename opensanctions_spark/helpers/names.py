"""Compat ``zavod.helpers.names`` submodule path (the reviewed-names
flow + name scalars)."""

from opensanctions_spark.helpers import (  # noqa: F401
    Names,
    LangText,
    apply_name,
    apply_names,
    apply_reviewed_name_string,
    apply_reviewed_names,
    check_name_regularity,
    check_names_regularity,
    derive_original_values,
    is_name_irregular,
    make_name,
    review_key_parts,
    review_names,
    split_comma_names,
    strip_name_titles,
)
