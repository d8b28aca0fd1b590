#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 correctness gate: run each oracle
SQL in DuckDB over the same parquet tables and compare to the Spark dump
(row count, schema-by-sorted-column-name, and value hash). NOT part of
the library — the engine itself is pure Scala/Spark.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def hash_df(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "f":
            vals = ["%.9g" % v if pd.notna(v) else "NULL" for v in s]
        else:
            vals = ["NULL" if pd.isna(v) else str(v) for v in s]
        h.update(("\x00".join(vals) + "|" + col).encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            oracle_df = con.execute(sql).df()
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            a, b = canon(oracle_df), canon(spark_df)
            problems = []
            if list(a.columns) != list(b.columns):
                problems.append(f"schema: oracle={list(a.columns)} spark={list(b.columns)}")
            elif len(a) != len(b):
                problems.append(f"rows: oracle={len(a)} spark={len(b)}")
            elif hash_df(a) != hash_df(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                cols = [c for c in a.columns if diff[c].any()]
                ridx = diff.any(axis=1)
                problems.append(f"hash: cols {cols}; first diff rows:\n"
                                f"oracle:\n{a[ridx].head(3)}\nspark:\n{b[ridx].head(3)}")
            if problems:
                n_fail += 1
                print(f"FAIL {name}: " + "; ".join(problems))
            else:
                n_pass += 1
                print(f"PASS {name} ({len(a)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
