#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_correctness.py <verify_out_dir> <sf_dir>

Runs each oracle SQL from oracle_sql.json against the sf parquet tables,
loads the Spark result parquet, sorts columns by name and rows by all
columns, and compares values (exact; floats compared bitwise after
float64 cast). Prints PASS/FAIL per query.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def kind_class(dtype) -> str:
    """Map a pandas dtype to a coarse class the driver's hash distinguishes."""
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "obj"

def dtype_kinds(df: pd.DataFrame) -> dict:
    return {c: kind_class(df[c].dtype) for c in df.columns}

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    produced = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
    for name in produced:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"EMPTY-OUT {name}"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_fail += 1; continue
        # dtype-strict: the driver hashes typed values, so an int64 1 vs a
        # float64 1.0 fails there even though pandas == coerces. Compare
        # dtype *kinds* BEFORE normalize() canonicalizes them away.
        ka, kb = dtype_kinds(spark_df), dtype_kinds(duck_df)
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols spark={list(a.columns)} duck={list(b.columns)}"); n_fail += 1; continue
        kind_bad = [c for c in a.columns if ka.get(c) != kb.get(c)]
        if kind_bad:
            det = ", ".join(f"{c}: spark={ka.get(c)} duck={kb.get(c)}" for c in kind_bad)
            print(f"FAIL {name}: dtype-kind mismatch ({det})"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        eq = True
        for c in a.columns:
            if a[c].dtype.kind == "f":
                same = ((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
            else:
                same = (a[c] == b[c]) | (a[c].isna() & b[c].isna() if a[c].dtype == object else a[c] == b[c])
            if not same.all():
                bad = (~same).idxmax()
                print(f"FAIL {name}: col {c} first mismatch row {bad}: spark={a[c][bad]!r} duck={b[c][bad]!r}")
                eq = False
                break
        if eq:
            print(f"PASS {name}: {len(a)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(produced)} produced ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
