"""Test utilities: DuckDB-oracle comparison shared by tests and tools."""

from __future__ import annotations

import pandas as pd

ORACLE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, string-normalized frame for compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = equal)."""
    s, o = canonicalize(spark_df), canonicalize(oracle_df)
    problems: list[str] = []
    if list(s.columns) != list(o.columns):
        return [f"columns {list(s.columns)} != {list(o.columns)}"]
    if len(s) != len(o):
        return [f"row count {len(s)} != {len(o)}"]
    if not s.equals(o):
        neq = (s != o) & ~(s.isna() & o.isna())
        for c in s.columns:
            if s[c].dtype != o[c].dtype:
                problems.append(f"dtype[{c}]: {s[c].dtype} != {o[c].dtype}")
            elif neq[c].any():
                idx = neq[c].idxmax()
                problems.append(
                    f"values[{c}] e.g. row {idx}: {s[c][idx]!r} != {o[c][idx]!r}"
                )
        if not problems:
            problems.append("frames differ (unlocated)")
    return problems


def duckdb_with_views(sf_dir: str):
    """A DuckDB connection with the synthetic tables registered as views,
    exactly like the driver's correctness gate."""
    import duckdb

    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con
