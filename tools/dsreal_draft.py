#!/usr/bin/env python3
"""Draft harness for q_dsreal_* oracles: extracts DsOracle.prelude from
the Scala source, registers the driver parquet views, and runs the SQL
given on stdin (or a file), printing row count + first rows. Lets a new
oracle be validated for non-degeneracy in DuckDB before the Spark side
exists."""
import re
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
src = open("src/main/scala/graft/dsreal/DsOracle.scala").read()
m = re.search(r'val prelude: String = """(.*?)"""', src, re.S)
prelude = m.group(1)

con = duckdb.connect()
for t in ["orders", "lineitem", "part", "customer"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

sql = sys.stdin.read()
q = prelude + sql
rows = con.execute(q).fetchall()
cols = [d[0] for d in con.description]
print(f"rows={len(rows)} cols={cols}")
for r in rows[:8]:
    print(r)
