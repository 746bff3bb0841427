"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at the given sf dir,
compare row-count + schema-ish + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from ir_index_construction_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, sqls = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in sqls:
            print(f"rows  {name}: {len(got)} rows (rows-only check)")
            continue
        try:
            want = normalize(con.execute(sqls[name]).df())
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"schema {list(got.columns)} vs {list(want.columns)}"))
            print(f"FAIL  {name}: schema mismatch {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} vs {len(want)}"))
            print(f"FAIL  {name}: row count {len(got)} vs {len(want)}")
            continue
        if not got.equals(want):
            neq = (got != want).any(axis=1)
            failures.append((name, f"{int(neq.sum())} differing rows"))
            print(f"FAIL  {name}: {int(neq.sum())}/{len(got)} rows differ")
            print(pd.concat([got[neq].head(3), want[neq].head(3)]))
            continue
        print(f"OK    {name}: {len(got)} rows match")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
