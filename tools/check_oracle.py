"""Local replica of the driver's correctness gate.

Runs every catalog query at a scale factor and compares against its DuckDB
oracle: row count, column names/order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]

Exit code 0 iff all checked queries match.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from opensanctions_spark.session import get_session

    spark = get_session("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spark_df)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        s, o = canonicalize(spark_df), canonicalize(oracle_df)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(s.columns)} != {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(s)} != {len(o)}")
            continue
        if not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            failures.append(name)
            print(f"FAIL  {name}: values differ in {bad_cols}")
            for c in bad_cols[:2]:
                idx = neq[c].idxmax()
                print(f"      {c}[{idx}]: spark={s[c][idx]!r} oracle={o[c][idx]!r}")
            continue
        print(f"ok    {name}: rows={len(s)} [{time.time()-t0:.1f}s]")

    missing = sorted(only - set(qs)) if only else []
    for name in missing:
        print(f"FAIL  {name}: not a registered catalog query")
    print(f"\n{checked - len(failures)}/{checked} passed"
          + (f" ({len(missing)} requested name(s) unknown)" if missing else ""))
    return 1 if failures or missing else 0


if __name__ == "__main__":
    sys.exit(main())
