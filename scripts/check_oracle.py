#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate: read each
query's parquet dump (written by graft.Verify), run the matching oracle SQL
in DuckDB over the same testdata, and compare row counts, schemas and
value hashes (columns sorted by name, rows sorted).

Usage: python3 scripts/check_oracle.py <outDir> [sfDir]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

outdir = sys.argv[1]
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def norm_cell(v):
    # exact compare, including floats: the engine is designed for
    # bit-identical parity (decimal-cast sums, identical double ops), and
    # the driver's hash gate may be exact — so the local gate is too
    return v

fails, passes, rows_only = [], [], []
# iterate EVERY dumped subdir, not a q* glob: a non-'q'-prefixed oracle key
# with a dump would otherwise be neither compared nor flagged missing —
# silently never PASS nor FAIL (ADVICE r17)
dumped = sorted(d for d in os.listdir(outdir)
                if os.path.isdir(os.path.join(outdir, d)))
for name in dumped:
    qdir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        fails.append((name, "no parquet output"))
        continue
    got = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
    if name not in oracles:
        rows_only.append((name, len(got)))
        if len(got) == 0:
            fails.append((name, "rows-only query returned 0 rows"))
        continue
    try:
        exp = con.execute(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"columns differ: got {list(g.columns)} vs oracle {list(e.columns)}"))
        continue
    if len(g) != len(e):
        fails.append((name, f"row count {len(g)} vs oracle {len(e)}"))
        continue
    # dtype comparison (loose: compare kind + width via pyarrow-ish str)
    dt_g, dt_e = [str(t) for t in g.dtypes], [str(t) for t in e.dtypes]
    if dt_g != dt_e:
        fails.append((name, f"dtypes differ: {list(zip(g.columns, dt_g, dt_e))}"))
        continue
    mism = None
    for c in g.columns:
        gv = g[c].map(norm_cell)
        ev = e[c].map(norm_cell)
        neq = ~((gv == ev) | (gv.isna() & ev.isna()))
        if neq.any():
            i = neq.idxmax()
            mism = f"col {c} row {i}: got {g[c][i]!r} vs oracle {e[c][i]!r} ({int(neq.sum())} diffs)"
            break
    if mism:
        fails.append((name, mism))
    else:
        passes.append(name)

# a query that THREW inside Verify writes no outDir subdir (Verify logs to
# stderr and exits 0), so iterating dumped dirs alone would silently pass
# it — every oracle key must have a dump (same fix as tools/selfcheck.py)
for name in sorted(set(oracles) - set(dumped)):
    fails.append((name, "MISSING OUTPUT (oracle present, no parquet dump — "
                  "the query likely threw in Verify)"))

print(f"PASS ({len(passes)}): {' '.join(passes)}")
print(f"ROWS-ONLY ({len(rows_only)}): {' '.join(f'{n}={r}' for n, r in rows_only)}")
if fails:
    print(f"FAIL ({len(fails)}):")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
print("ALL OK")
