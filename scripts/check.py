#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <verifyOutDir> <sfDir> [queryName...]

Reads <verifyOutDir>/<name>/ parquet (Spark result) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against the
sf parquet tables, canonicalizes both sides (columns sorted by name, rows
sorted by all columns), and reports rows/schema/hash match per query.
"""
import json
import sys
import glob
import hashlib

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        for v in s:
            if isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(str(v).encode())
            h.update(b"|")
        h.update(b"#")
    return h.hexdigest()[:16]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat(
                [pd.read_parquet(f) for f in files], ignore_index=True))
            oracle_df = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        rows_ok = len(spark_df) == len(oracle_df)
        cols_ok = list(spark_df.columns) == list(oracle_df.columns)
        hash_ok = rows_ok and cols_ok and df_hash(spark_df) == df_hash(
            oracle_df)
        if hash_ok:
            print(f"PASS {name}: rows={len(spark_df)}")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(oracle_df)}; "
                  f"cols {list(spark_df.columns)} vs {list(oracle_df.columns)}")
            if rows_ok and cols_ok:
                for c in spark_df.columns:
                    a, b = spark_df[c], oracle_df[c]
                    try:
                        neq = (a.astype(str) != b.astype(str)).sum()
                    except Exception:
                        neq = "?"
                    if neq != 0:
                        print(f"  col {c}: {neq} mismatches; "
                              f"spark head {a.head(3).tolist()} "
                              f"oracle head {b.head(3).tolist()}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
