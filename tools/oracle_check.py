#!/usr/bin/env python3
"""Dev-only oracle parity checker (mimics the driver's DuckDB compare).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes per-query results in the driver's
CORRECTNESS_r{N}.json shape (rows/schema/hash match + row counts).

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB over the
sfDir parquet tables, sort columns by name + rows, and compare values
exactly (with a float report if only floats differ).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver fixtures are single files; ScaleFixture output is a
    # directory of part files — glob either shape
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    if name not in oracle:
        print(f"{name:22s} rows-only: {len(got)} rows"
              + ("  [EMPTY!]" if len(got) == 0 else ""))
        results[name] = {"rows_match": len(got) > 0, "schema_match": None,
                         "hash_match": None, "spark_rows": len(got),
                         "oracle_rows": None, "err": None}
        continue
    exp = con.sql(oracle[name]).df()
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    status = []
    if list(g.columns) != list(e.columns):
        status.append(f"COLS got={list(g.columns)} exp={list(e.columns)}")
    elif len(g) != len(e):
        status.append(f"ROWS got={len(g)} exp={len(e)}")
    else:
        gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        es = e.sort_values(by=list(e.columns)).reset_index(drop=True)
        for c in g.columns:
            if str(gs[c].dtype) != str(es[c].dtype):
                status.append(f"DTYPE {c}: {gs[c].dtype} vs {es[c].dtype}")
            if not gs[c].equals(es[c]):
                try:
                    diff = (gs[c].astype(float) - es[c].astype(float)).abs().max()
                    status.append(f"VAL {c} maxdiff={diff}")
                except Exception:
                    ne = (gs[c].astype(str) != es[c].astype(str)).sum()
                    status.append(f"VAL {c} ndiff={ne}")
    results[name] = {
        "rows_match": not any(x.startswith("ROWS") for x in status),
        "schema_match": not any(x.startswith(("COLS", "DTYPE")) for x in status),
        "hash_match": not status,
        "spark_rows": len(g), "oracle_rows": len(e),
        "err": "; ".join(status) or None}
    if status:
        fails += 1
        print(f"{name:22s} FAIL  " + "; ".join(status))
    else:
        print(f"{name:22s} OK    ({len(g)} rows)")
# a query declared in oracle_sql.json but ABSENT from the dump failed
# inside Verify (its write threw) — that must read as a failure, not
# silently shrink the artifact (r8: q29's sf1 write failed and the
# 131-entry artifact looked complete at a glance)
for name in sorted(set(oracle) - set(results)):
    results[name] = {"rows_match": False, "schema_match": False,
                     "hash_match": False, "spark_rows": 0,
                     "oracle_rows": None,
                     "err": "MISSING: no Verify output (query failed)"}
    fails += 1
    print(f"{name:22s} FAIL  missing from Verify output")
if len(sys.argv) > 3:
    json.dump(results, open(sys.argv[3], "w"), indent=2, sort_keys=True)
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
