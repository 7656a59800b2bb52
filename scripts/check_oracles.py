"""Local mimic of the driver's correctness gate: run every queries() entry at
a given sf, run the matching oracle_sql() in DuckDB over the same tables,
compare row count, column names and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if only and not (only & set(qs)):
        print(f"no such query: {sorted(only)} (known: {sorted(qs)})")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append((name, f"query raised {type(e).__name__}: {e}"))
            print(f"ERROR  {name}: query raised {e}")
            continue
        if name not in oracles:
            print(f"rows   {name}: {len(got)} rows (no oracle — rows-only)")
            continue
        try:
            want = normalize(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append((name, f"oracle raised {type(e).__name__}: {e}"))
            print(f"ERROR  {name}: oracle raised {e}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            print(f"FAIL   {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            print(f"FAIL   {name}: rows {len(got)} vs {len(want)}")
            continue
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            ndiff = int(diff.to_numpy().sum())
            failures.append((name, f"{ndiff} differing cells"))
            print(f"FAIL   {name}: {ndiff} differing cells of {got.size}")
            bad = diff.any(axis=1)
            print(pd.concat([got[bad].head(3).add_suffix("_got"),
                             want[bad].head(3).add_suffix("_want")], axis=1))
        else:
            print(f"OK     {name}: {len(got)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
