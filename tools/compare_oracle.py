#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <verify_out_dir> <sf_dir> [round_label]

For each query dir under <verify_out_dir>: load the Spark result parquet,
run the oracle SQL (oracle_sql.json) in DuckDB over the sf parquet tables,
sort columns by name and rows by all columns, and compare values
(exact for ints/strings, 1e-9-relative for floats). Queries without oracle
SQL record a rows_only row. Writes a CORRECTNESS-style JSON to stdout.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(x):
    if x is None:
        return None
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return x
    if isinstance(x, bytes):
        return x.hex()
    return x


def cells_equal(a, b):
    a, b = norm_cell(a), norm_cell(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        b = float(b)
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(b, float) and isinstance(a, int):
        return cells_equal(float(a), b)
    return a == b


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    label = sys.argv[3] if len(sys.argv) > 3 else "local"
    oracle_sql = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for qdir in sorted(d for d in out_dir.iterdir() if d.is_dir()):
        name = qdir.name
        # a previous oracle's fatal error can leave the shared
        # connection in an aborted transaction: clear it so one broken
        # oracle cannot cascade into failing every later query
        try:
            con.execute("ROLLBACK")
        except Exception:  # noqa: BLE001 - no transaction open
            pass
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.execute(
                f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')"
            ).fetchone()[0]
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "fail",
                             "detail": f"spark output unreadable: {e}"[:300]}
            continue
        if name not in oracle_sql:
            results[name] = {"status": "rows_only",
                             "detail": f"no oracle, {spark_rows} rows"}
            continue
        try:
            orel = con.sql(oracle_sql[name])
            ocols = sorted(orel.columns)
            if ocols != spark_cols:
                results[name] = {
                    "status": "fail",
                    "detail": f"schema mismatch: spark={spark_cols} oracle={ocols}"}
                continue
            collist = ", ".join(f'"{c}"' for c in spark_cols)
            sdata = con.execute(
                f"SELECT {collist} FROM read_parquet('{qdir}/*.parquet') "
                f"ORDER BY ALL").fetchall()
            con.register("oracle_result_tmp", orel.to_arrow_table())
            odata = con.execute(
                f"SELECT {collist} FROM oracle_result_tmp ORDER BY ALL"
            ).fetchall()
            con.unregister("oracle_result_tmp")
            if len(sdata) != len(odata):
                results[name] = {
                    "status": "fail",
                    "detail": f"rows: spark={len(sdata)} oracle={len(odata)}"}
                continue
            bad = None
            for i, (sr, orr) in enumerate(zip(sdata, odata)):
                for c, (sv, ov) in zip(spark_cols, zip(sr, orr)):
                    if not cells_equal(sv, ov):
                        bad = f"row {i} col {c}: spark={sv!r} oracle={ov!r}"
                        break
                if bad:
                    break
            if bad:
                results[name] = {"status": "fail", "detail": bad}
            else:
                results[name] = {"status": "pass",
                                 "detail": f"{spark_rows} rows"}
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "fail",
                             "detail": f"oracle error: {e}"[:300]}

    summary = {}
    for v in results.values():
        summary[v["status"]] = summary.get(v["status"], 0) + 1
    print(json.dumps({"round": label, "sf": sf_dir.name.replace("sf", ""),
                      "summary": summary, "queries": results}, indent=1,
                     sort_keys=True))
    fails = [k for k, v in results.items() if v["status"] == "fail"]
    if fails:
        print("FAILURES: " + ", ".join(fails), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
