#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Reads the Verify.scala output directory (per-query parquet + oracle_sql.json),
runs each oracle in DuckDB against the sf parquet tables, and compares:
schema (column names, sorted), row count, and a value hash computed over
rows sorted by all columns with columns in name order.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    return str(v)


def table_fingerprint(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    names = sorted(set(oracles) | {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)})
    for name in names:
        res_dir = f"{out_dir}/{name}"
        entry = {}
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [c for c in got.columns]
        except Exception as e:
            results[name] = {"status": "SPARK_MISSING", "err": str(e)[:200]}
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(got_rows)}
            continue
        try:
            exp = con.sql(oracles[name])
            exp_rows, exp_cols = exp.fetchall(), [c for c in exp.columns]
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "err": str(e)[:300]}
            continue
        entry["rows"] = (len(got_rows), len(exp_rows))
        entry["schema_match"] = sorted(got_cols) == sorted(exp_cols)
        if not entry["schema_match"]:
            entry["cols"] = (sorted(got_cols), sorted(exp_cols))
        gh = table_fingerprint(got_rows, got_cols)
        eh = table_fingerprint(exp_rows, exp_cols)
        entry["hash_match"] = gh == eh
        entry["status"] = "OK" if (entry["schema_match"] and gh == eh and
                                   len(got_rows) == len(exp_rows)) else "MISMATCH"
        if entry["status"] == "MISMATCH":
            # show first diff for debugging
            order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            order_e = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            gl = sorted("|".join(norm_cell(r[i]) for i in order_g) for r in got_rows)
            el = sorted("|".join(norm_cell(r[i]) for i in order_e) for r in exp_rows)
            for a, b in zip(gl, el):
                if a != b:
                    entry["first_diff"] = {"spark": a[:300], "oracle": b[:300]}
                    break
        results[name] = entry

    n_ok = sum(1 for r in results.values() if r.get("status") == "OK")
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{n_ok}/{len(results)} OK")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
