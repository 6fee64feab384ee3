#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential-correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, runs each SQL in DuckDB with the fixture
parquet registered as views, loads the Spark parquet result from
<out>/<name>/, sorts columns by name and rows by all columns, and
compares values exactly. Dev tooling only — never shipped in the jar.
"""
import json
import math
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first",
                            kind="mergesort").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL {name}: rows {len(a)} vs {len(b)}"
    bad = []
    # The driver hashes stringified values, so an int-vs-float type skew
    # (e.g. DuckDB SIGN -> TINYINT vs Spark signum -> DOUBLE) fails there
    # even when lenient == passes here. Flag dtype-kind mismatches.
    for c in a.columns:
        ka = "f" if pd.api.types.is_float_dtype(a[c]) else \
             "i" if pd.api.types.is_integer_dtype(a[c]) else "o"
        kb = "f" if pd.api.types.is_float_dtype(b[c]) else \
             "i" if pd.api.types.is_integer_dtype(b[c]) else "o"
        if ka != kb:
            bad.append(f"col {c}: dtype kind spark={a[c].dtype} duck={b[c].dtype}")
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            eq = (av == bv) | (av.isna() & bv.isna())
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
        neq = (~eq.fillna(False)).sum()
        if neq:
            i = (~eq.fillna(False)).idxmax()
            bad.append(f"col {c}: {neq} diffs, first at row {i}: "
                       f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    if bad:
        return f"FAIL {name}: " + "; ".join(bad[:3])
    return f"PASS {name} ({len(a)} rows)"


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        res = compare(name, spark_df, duck_df)
        print(res)
        if res.startswith("PASS"):
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
