#!/usr/bin/env python3
"""Degeneracy audit: a 0-row Spark result that matches a 0-row oracle
still PASSES the driver's correctness gate — twice this project has
shipped a query whose gates silently emptied (q27 at sf0.001, q80's
first price band) and whose green row proved nothing. This tool reads
a graft.Verify output directory and lists every query whose Spark
output is empty, so a param-level gate widening can be applied BEFORE
the round ships.

Usage: degeneracy.py OUT_DIR [prefix]
  OUT_DIR  directory written by `runMain graft.Verify <sf> OUT_DIR`
  prefix   optional query-name prefix filter (e.g. q_dsreal)
"""
import os
import sys

import duckdb

out = sys.argv[1]
prefix = sys.argv[2] if len(sys.argv) > 2 else ""

con = duckdb.connect()
empty, checked = [], 0
for name in sorted(os.listdir(out)):
    path = os.path.join(out, name)
    if not os.path.isdir(path) or not name.startswith(prefix):
        continue
    checked += 1
    try:
        n = con.execute(
            f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
    except Exception as e:  # unreadable output is its own red flag
        empty.append((name, f"unreadable: {e}"))
        continue
    if n == 0:
        empty.append((name, "0 rows"))
print(f"checked {checked} queries under {out!r} (prefix={prefix!r})")
if not empty:
    print("no degenerate (empty) results")
else:
    for name, why in empty:
        print(f"DEGENERATE {name}: {why}")
    sys.exit(1)
