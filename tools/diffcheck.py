#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: diffcheck.py SF_DIR OUT_DIR [query ...]

Reads OUT_DIR/<name>/ (Spark parquet output of graft.Verify) and
OUT_DIR/oracle_sql.json, registers each testdata table as a DuckDB view
named by bare table name, runs the oracle SQL, and compares:
  - column name sets
  - row counts
  - multiset of rows (sorted by all columns, floats quantized to 1e-6,
    with a warn band up to the driver's 0.01 tolerance)
"""
import json
import math
import os
import sys

import duckdb


def norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    # sort columns by name (driver convention), then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # a table may be a single driver-written file OR a Spark-written
        # directory (DsScale replicas); replica dirs only carry the four
        # star base tables, so skip absentees (queries not using them
        # still bind)
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            src = f"read_parquet('{p}/*.parquet')"
        elif os.path.exists(p):
            src = f"'{p}'"
        else:
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1
            continue
        gtypes = {d[0]: d[1] for d in got.description}
        etypes = {d[0]: d[1] for d in exp.description}
        for c in gcols:
            if gtypes[c] != etypes[c]:
                print(f"WARN {name}.{c}: dtype spark={gtypes[c]} oracle={etypes[c]}")
        if len(grows) != len(erows):
            print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
            continue
        _, gn = norm_rows(gcols, grows)
        _, en = norm_rows(ecols, erows)
        if gn == en:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(gn, en) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(gn)} rows differ; first: ")
            for a, b in diffs[:3]:
                print(f"   spark : {a}")
                print(f"   oracle: {b}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
