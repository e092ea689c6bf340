#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB correctness gate:
runs each oracle_sql.json query against the sf parquet tables, loads the
Spark result parquet, sorts columns by name + rows, and compares values.
Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = ok = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    except Exception as e:
        print(f"X {name:24s} NO SPARK OUTPUT: {e}")
        fails += 1
        continue
    if name not in oracle:
        print(f"  {name:24s} rows-only: {len(spark_df)} rows "
              f"{'OK' if len(spark_df) >= 0 else ''}")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"X {name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    sc = sorted(spark_df.columns)
    dc = sorted(duck_df.columns)
    if sc != dc:
        print(f"X {name:24s} SCHEMA(names): spark={sc} duck={dc}")
        fails += 1
        continue
    a = spark_df[sc].sort_values(sc).reset_index(drop=True)
    b = duck_df[dc].sort_values(dc).reset_index(drop=True)
    if len(a) != len(b):
        print(f"X {name:24s} ROWS: spark={len(a)} duck={len(b)}")
        fails += 1
        continue
    mismatch = None
    for c in sc:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xna, yna = pd.isna(x), pd.isna(y)
            same = (xna and yna) or (not xna and not yna and (
                (x == y) or (
                    isinstance(x, float) and isinstance(y, float) and
                    abs(x - y) < 1e-12)))
            if not same:
                mismatch = (c, i, x, y)
                break
        if mismatch:
            break
    if mismatch:
        c, i, x, y = mismatch
        print(f"X {name:24s} VALUE col={c} row={i}: spark={x!r} duck={y!r}")
        fails += 1
    else:
        print(f"✓ {name:24s} {len(a)} rows")
        ok += 1
print(f"\n{ok} ok, {fails} failed")
sys.exit(1 if fails else 0)
