"""Compat ``zavod.extract.names.clean`` import path: the Names model
family lives on the helpers surface (one implementation, two reference
import paths); the DataFrame-scale extraction pack is
``sources/names_extract.py``."""

from opensanctions_spark.helpers import (  # noqa: F401
    LangText,
    Names,
    SourceNames,
    clean_names,
)

#: clean.py:11 — the reference pins its cleaning model version here; the
#: compat layer reports the registered cleaner's version at call time
LLM_MODEL_VERSION = "llm"
