#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB oracle SQL from outDir/oracle_sql.json against the raw
parquet tables and compares each against outDir/<name>.parquet written
by graft.Verify: row count, sorted column names, and a value hash over
rows with columns sorted by name (mirroring the driver's compare).
Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def table_hash(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]
    rows = ["|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    names = sorted(os.path.basename(d)[:-8] for d in glob.glob(f"{out_dir}/*.parquet"))
    for name in names:
        got_files = glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
        entry = {}
        try:
            got = pd.concat([pd.read_parquet(p) for p in got_files]) if got_files else None
            if got is None:
                entry["error"] = "no spark output"
                results[name] = entry
                continue
            entry["rows"] = len(got)
            if name not in oracles:
                entry["check"] = "rows_only"
                entry["ok"] = len(got) > 0
                results[name] = entry
                continue
            want = con.execute(oracles[name]).df()
            entry["rows_match"] = len(got) == len(want)
            entry["schema_match"] = sorted(got.columns) == sorted(want.columns)
            if not entry["schema_match"]:
                entry["got_cols"] = sorted(got.columns)
                entry["want_cols"] = sorted(want.columns)
            entry["hash_match"] = entry["schema_match"] and table_hash(got) == table_hash(want)
            entry["ok"] = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        except Exception as e:
            entry["error"] = str(e)[:300]
            entry["ok"] = False
        results[name] = entry
    bad = [n for n, e in results.items() if not e.get("ok")]
    for n in sorted(results):
        e = results[n]
        print(("PASS " if e.get("ok") else "FAIL "), n, json.dumps(e))
    print(f"\n{len(results)-len(bad)}/{len(results)} ok")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
