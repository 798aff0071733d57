#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracles.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet dir + <out>/oracle_sql.json, runs the SQL in
DuckDB over views named after the sfDir tables, and compares frames after
sorting rows and columns (column names sorted, values stringified).
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        exp.columns = [c.lower() for c in exp.columns]
        got.columns = [c.lower() for c in got.columns]
        if sorted(exp.columns) != sorted(got.columns):
            fails.append((name, f"columns differ: {sorted(exp.columns)} vs {sorted(got.columns)}"))
            continue
        exp = exp[sorted(exp.columns)].astype(str)
        got = got[sorted(got.columns)].astype(str)
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp) != len(got):
            fails.append((name, f"row count {len(got)} != oracle {len(exp)}"))
            continue
        diff = (exp != got).any(axis=1)
        if diff.any():
            i = diff.idxmax()
            fails.append((name, f"first diff at row {i}:\n  oracle: {exp.iloc[i].to_dict()}\n  got:    {got.iloc[i].to_dict()}"))
        else:
            print(f"OK   {name} ({len(got)} rows)")
    except Exception as e:
        fails.append((name, f"error: {e}"))

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n}")
        except Exception as e:
            fails.append((name, f"rows-only read error: {e}"))

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
sys.exit(1 if fails else 0)
