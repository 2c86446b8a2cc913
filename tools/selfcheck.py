#!/usr/bin/env python3
"""Self-run correctness gate: mirrors the driver's Verify->DuckDB compare.

Usage: python3 selfcheck.py <sfDir> <verifyOutDir>
Reads each <outDir>/<qname>/ parquet (Spark result), runs the oracle SQL from
<outDir>/oracle_sql.json in DuckDB over views of <sfDir>/*.parquet (plus the
<outDir>_inputs/* fintech silver dumps), sorts columns by name and rows by all
columns, and compares values. Prints one line per query + a summary.
"""
import duckdb, glob, json, math, os, sys

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
for d in glob.glob(out_dir.rstrip('/') + "_inputs/*"):
    name = os.path.basename(d)
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{d}/*.parquet')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    def cell(v):
        if v is None: return "NULL"
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            return repr(round(v, 9))
        if isinstance(v, bytes): return v.hex()
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows

results = {}
names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
for name in names:
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet('{os.path.join(out_dir,name)}/*.parquet')").df()
        if name not in oracles:
            results[name] = ("rows-only", len(spark_df))
            print(f"{name:28s} rows-only  ({len(spark_df)} rows)")
            continue
        odf = con.execute(oracles[name]).df()
        sc, sr = canon(spark_df); oc, orows = canon(odf)
        if sc != oc:
            results[name] = ("SCHEMA-MISMATCH", sc, oc)
            print(f"{name:28s} SCHEMA MISMATCH spark={sc} oracle={oc}")
        elif len(sr) != len(orows):
            results[name] = ("ROWCOUNT", len(sr), len(orows))
            print(f"{name:28s} ROWCOUNT spark={len(sr)} oracle={len(orows)}")
        elif sr != orows:
            bad = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            results[name] = ("VALUE-MISMATCH", bad)
            print(f"{name:28s} VALUE MISMATCH e.g. {bad[:1]}")
        else:
            results[name] = ("ok",)
            print(f"{name:28s} ok  ({len(sr)} rows)")
    except Exception as e:
        results[name] = ("ERROR", str(e))
        print(f"{name:28s} ERROR {e}")

# a query that THREW inside Verify writes no outDir subdir, so iterating
# dirs alone would silently pass it (review catch, r17) — every oracle key
# must have a dump, or the gate's "all green" claim is a lie by omission
for name in sorted(set(oracles) - set(names)):
    results[name] = ("MISSING-OUTPUT",)
    print(f"{name:28s} MISSING OUTPUT (oracle present, no parquet dump — "
          "the query likely threw in Verify)")

n_ok = sum(1 for v in results.values() if v[0] == "ok")
n_ro = sum(1 for v in results.values() if v[0] == "rows-only")
n_bad = len(results) - n_ok - n_ro
print(f"\nSUMMARY: {n_ok} ok, {n_ro} rows-only, {n_bad} FAILING of {len(results)}")
sys.exit(0 if n_bad == 0 else 1)
