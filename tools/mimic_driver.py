#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: runs each
oracle_sql.json entry against the sf tables and compares with the
Verify parquet dumps (columns sorted by name, rows sorted, floats with
tolerance)."""
import json, math, sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["documents", "events", "embeddings", "lineitem", "orders", "customer",
          "supplier", "part", "region", "nation"]:
    try:
        con.sql(f"create view {t} as select * from '{sfdir}/{t}.parquet'")
    except Exception:
        pass

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"select * from parquet_scan('{outdir}/{name}/*.parquet')").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: query error {e}")
        fail += 1
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}")
        fail += 1
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
        fail += 1
        continue
    bad = None
    for c in gcols:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            diff = (gv.astype(float) - ev.astype(float)).abs()
            rel = diff / ev.abs().clip(lower=1e-12)
            if not bool(((diff < 1e-6) | (rel < 1e-6)).all()):
                bad = (c, float(diff.max()))
                break
        else:
            if not bool((gv.astype(str) == ev.astype(str)).all()):
                mism = (gv.astype(str) != ev.astype(str))
                idx = mism[mism].index[0]
                bad = (c, f"row {idx}: {gv[idx]!r} vs {ev[idx]!r}")
                break
    if bad:
        print(f"FAIL {name}: col {bad[0]} -> {bad[1]}")
        fail += 1
    else:
        print(f"ok   {name} ({len(g)} rows)")
        ok += 1

# rows-only entries (no oracle): just report counts
queries_no_oracle = [d for d in __import__('os').listdir(outdir)
                     if d not in oracle and not d.endswith('.json')]
for name in sorted(queries_no_oracle):
    n = con.sql(f"select count(*) from parquet_scan('{outdir}/{name}/*.parquet')").fetchone()[0]
    print(f"rows-only {name}: {n} rows")

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
