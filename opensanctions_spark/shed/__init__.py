"""Compat ``zavod.shed``: auxiliary crawler utilities (transliteration)."""
