"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from simplecommoncrawlextractor_spark import get_spark
from simplecommoncrawlextractor_spark.sources.tables import TABLES


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.round(6)
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("int64")
        elif col.dtype == object:
            df[c] = col.astype(str)
    rows = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values()
    return rows


def value_hash(df: pd.DataFrame) -> str:
    rows = norm_frame(df)
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    spark = get_spark(app_name="selfcheck", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[SPARK-ERROR] {name}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[DUCK-ERROR] {name}: {e}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not problems and value_hash(sdf) != value_hash(ddf):
            problems.append("value hash mismatch")
            a, b = norm_frame(sdf).tolist(), norm_frame(ddf).tolist()
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs:
                print(f"    spark: {x[:200]}\n    duck : {y[:200]}")
            extra_s = set(a) - set(b)
            extra_d = set(b) - set(a)
            for x in list(extra_s)[:2]:
                print(f"    only-spark: {x[:200]}")
            for x in list(extra_d)[:2]:
                print(f"    only-duck : {x[:200]}")
        if problems:
            print(f"[MISMATCH  ] {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"[OK        ] {name}: {len(sdf)} rows")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
