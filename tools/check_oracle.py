#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (spark parquet result) and runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet; compares row count, column names, and a hash of values with
columns sorted by name and rows sorted by all columns (stringified).
"""
import json, os, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if v == int(v) and abs(v) < 1e15: return str(int(v))
        return f"{v:.6g}"
    return str(v)

fails = []
for name, sql in sorted(oracle.items()):
    res_dir = os.path.join(outdir, name)
    if not os.path.isdir(res_dir):
        fails.append((name, "NO SPARK OUTPUT")); print(f"FAIL {name}: no spark output"); continue
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); print(f"FAIL {name}: oracle error: {e}"); continue
    sdf = duckdb.sql(f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        fails.append((name, f"cols spark={scols} oracle={ocols}"))
        print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); continue
    if len(sdf) != len(odf):
        fails.append((name, f"rows spark={len(sdf)} oracle={len(odf)}"))
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}"); continue
    srows = sorted(tuple(norm(v) for v in row) for row in sdf[scols].itertuples(index=False))
    orows = sorted(tuple(norm(v) for v in row) for row in odf[ocols].itertuples(index=False))
    if srows != orows:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
        fails.append((name, f"value mismatch at sorted row {diff[0]}"))
        print(f"FAIL {name}: first diff row {diff[0]}:\n  spark : {diff[1]}\n  oracle: {diff[2]}")
        continue
    print(f"ok   {name} ({len(sdf)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
