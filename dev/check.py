#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
reads Verify.scala output (<out>/<name>/ parquet + oracle_sql.json),
runs each oracle in DuckDB over the same sf dir, compares sorted
rows/columns exactly. Not part of the engine (driver-side tooling)."""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}"); fail += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}"); fail += 1; continue
    g = got[gcols].sort_values(gcols, ignore_index=True)
    e = exp[gcols].sort_values(gcols, ignore_index=True)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fail += 1; continue
    mismatch = None
    for c in gcols:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            same = (a == b) or (a is None and b is None) \
                or (isinstance(a, float) and isinstance(b, float)
                    and (math.isnan(a) and math.isnan(b) or a == b))
            try:
                import pandas as pd
                if pd.isna(a) and pd.isna(b): same = True
            except Exception: pass
            if not same:
                mismatch = (c, i, a, b); break
        if mismatch: break
    if mismatch:
        c, i, a, b = mismatch
        print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
        fail += 1
    else:
        print(f"ok   {name} ({len(g)} rows)"); ok += 1

# queries without oracle: rows-only presence check
import os
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if os.path.isdir(p) and name not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ok?  {name} (no oracle, {n} rows)")
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}"); fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
