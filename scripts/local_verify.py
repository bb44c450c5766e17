#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on SparkEntry.oracleSql against the same parquet tables and
compares with the parquet results graft.Verify wrote. Columns are sorted
by name, rows sorted by all columns; floats compared with small abs/rel
tolerance AND exact-repr check reported separately (the driver may be
stricter than us — aim for exact).

Usage: python3 scripts/local_verify.py [sfdir] [outdir] [prefixes]
  (run `sbt "runMain graft.Verify <sfdir> <outdir> [prefixes]"` first;
  prefixes = comma-separated query-name prefixes for fast iteration on
  a subset — mirrors Verify's optional 3rd arg)
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints as int64 (nullable), floats float64
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS mismatch: spark={len(a)} duck={len(b)}"
    exact = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            close = both_nan | (
                (av - bv).abs() <= (1e-9 + 1e-9 * bv.abs())
            )
            if not close.all():
                i = (~close).idxmax()
                return f"VALUE mismatch col={c} row={i}: spark={av[i]!r} duck={bv[i]!r}"
            ident = both_nan | (av == bv)
            if not ident.all():
                exact = False
        else:
            eq = (av.isna() & bv.isna()) | (av == bv)
            if not eq.fillna(False).all():
                i = (~eq.fillna(False)).idxmax()
                return f"VALUE mismatch col={c} row={i}: spark={av[i]!r} duck={bv[i]!r}"
    return "OK" if exact else "OK (float-tolerance only)"


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    n_ok = 0
    names = sorted(set(oracle) | {p.name for p in OUT.iterdir() if p.is_dir()})
    if len(sys.argv) > 3:
        prefixes = sys.argv[3].split(",")
        names = [n for n in names if any(n.startswith(p) for p in prefixes)]
    for name in names:
        spark_dir = OUT / name
        if not spark_dir.is_dir():
            print(f"[FAIL] {name}: no spark output")
            continue
        spark_df = pd.read_parquet(spark_dir)
        if name not in oracle:
            print(f"[----] {name}: rows-only check, rows={len(spark_df)}"
                  + (" EMPTY!" if len(spark_df) == 0 else ""))
            n_ok += 1 if len(spark_df) > 0 else 0
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            continue
        res = compare(name, spark_df, duck_df)
        tag = "OK  " if res.startswith("OK") else "FAIL"
        if res.startswith("OK"):
            n_ok += 1
        print(f"[{tag}] {name}: {res}")
    print(f"== {n_ok}/{len(names)} pass")


if __name__ == "__main__":
    main()
