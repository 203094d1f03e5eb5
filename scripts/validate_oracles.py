"""Local simulation of the driver's correctness harness: run each
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row-count + order-insensitive values (columns sorted by name).
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from geo_polygonize_spark.plans import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional 2nd arg: comma-separated substrings — validate only queries
# whose name contains one of them (fast re-checks while iterating)
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(str(v) for v in t))
    return sorted(rows)


def main():
    spark = build_session("oracle-validate", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY is not None and not any(s in name for s in ONLY):
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:28s} SPARK ERROR: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:28s} DUCKDB ERROR: {str(e)[:200]}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rowcount {len(sdf)} vs {len(odf)}"))
            print(f"{name:28s} ROWCOUNT MISMATCH {len(sdf)} vs {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"{name:28s} COLS MISMATCH {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        a, b = canon(sdf), canon(odf)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"{name:28s} VALUES MISMATCH e.g. {diff}")
        else:
            print(f"{name:28s} OK ({len(sdf)} rows)")
    print()
    print("FAILURES:", len(failures))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
