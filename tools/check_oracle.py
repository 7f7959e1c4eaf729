#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: replay each oracle SQL
in DuckDB over the sf parquet tables and compare rows/schema/hash with the
Spark parquet dump from graft.Verify. Builder-side validation only."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r4"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
oracle = {k: v for k, v in oracle.items() if not k.endswith(".parquet")}

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

def _driver_sort_crash_probe(df):
    """Driver parity #1: the driver sorts with pandas sort_values, which
    CRASHES on unhashable cells (raw array columns). ONLY the exception
    matters — the sorted result is discarded on purpose (the real
    ordering happens in canon()'s sorted() below)."""
    df.sort_values(by=list(df.columns), kind="mergesort")

def canon(df):
    df = df[sorted(df.columns)]
    _driver_sort_crash_probe(df)
    # Driver parity #2: the driver hashes values exactly, so an int64
    # column vs a float64 column ('11' vs '11.0') is a mismatch. repr()
    # of the exact float keeps the trailing '.0' that %.9g used to hide.
    def norm(v):
        if isinstance(v, float):
            return repr(float(v))
        return str(v)
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
    return rows

fails = []
# Driver parity #3: a query that THREW in graft.Verify writes no parquet
# at all — the driver records that as an error row, so the replica must
# not silently skip it (r12: five batch queries threw on a testdata
# layout change and the replica reported all-green).
dumped = {os.path.basename(p).replace(".parquet", "")
          for p in glob.glob(os.path.join(out_dir, "*.parquet"))}
for qname in sorted(set(oracle) - dumped):
    if only and qname not in only:
        continue
    fails.append(qname)
    print(f"{qname}: MISSING DUMP (query threw in Verify?)")
for name in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
    qname = os.path.basename(name).replace(".parquet", "")
    if only and qname not in only:
        continue
    spark_df = pd.read_parquet(name)
    if qname not in oracle:
        print(f"{qname}: no_oracle rows={len(spark_df)}")
        continue
    try:
        odf = con.execute(oracle[qname]).df()
    except Exception as e:
        fails.append(qname)
        print(f"{qname}: ORACLE SQL ERROR: {e}")
        continue
    rows_ok = len(spark_df) == len(odf)
    schema_ok = sorted(spark_df.columns) == sorted(odf.columns)
    hash_ok = rows_ok and schema_ok and canon(spark_df) == canon(odf)
    status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fails.append(qname)
    print(f"{qname}: {status} rows={len(spark_df)}/{len(odf)} schema={schema_ok} hash={hash_ok}")
    if status == "FAIL" and rows_ok and schema_ok:
        a, b = canon(spark_df), canon(odf)
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        for x, y in diff:
            print(f"   spark={x}\n  oracle={y}")
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
