"""Compat ``zavod.extract.names`` package path."""
