#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables. Compares after sorting columns by name and rows by
all columns. Exact match required (floats compared bit-exactly first,
then with rtol=1e-9 reported separately).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int8", "int16", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        path = f"{outdir}/{name}"
        if not glob.glob(f"{path}/*.parquet"):
            print(f"FAIL {name}: no spark output at {path}")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.read_parquet(path))
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} != {list(duck_df.columns)}")
            n_fail += 1
            continue
        # The driver hashes VALUES as rendered, so an int64 column on one
        # side vs float64 on the other (e.g. DuckDB SUM(int) -> HUGEINT
        # -> pandas float64) fails its gate even when numerically equal.
        # Mirror that strictness here or the local gate silently passes
        # what the driver rejects (the st05 r03/r04 lesson).
        dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
              for c in spark_df.columns
              if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(duck_df)}")
            n_fail += 1
            continue
        diffs = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if a.dtype == np.float64:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            else:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values) \
                    if a.isna().any() or b.isna().any() else a.values == b.values
            if not np.all(eq):
                idx = np.where(~eq)[0][:3]
                diffs.append((c, [(int(i), a.iloc[i], b.iloc[i]) for i in idx]))
        if diffs:
            print(f"FAIL {name}: {len(diffs)} mismatched col(s)")
            for c, rows in diffs:
                for i, av, dv in rows:
                    print(f"   col {c} row {i}: spark={av!r} duck={dv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
