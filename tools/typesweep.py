#!/usr/bin/env python3
"""Oracle output-type gate.

Round 5 lost 15 queries to a single authoring slip: DuckDB widens
sum(<integer expr>) to HUGEINT (int128), Spark writes int64, and the
driver's hash is type-sensitive — so rows+schema+values all matched
while hash_match failed. floatsweep.py audits VALUE fragility but never
looked at TYPES, so the class went undetected until the driver ran.

This gate makes that class of red impossible to re-introduce:

  1. loads OUT_DIR/oracle_sql.json (written by graft.Verify),
  2. DESCRIBEs every query in DuckDB over SF_DIR (no execution cost),
  3. fails (exit 1) on any output column whose DuckDB type is not one
     Spark can write to parquet with identical semantics.

Any flagged column means the oracle SQL needs an explicit CAST — e.g.
`CAST(sum(...) AS BIGINT)` for integer sums (DuckDB sum widens BIGINT
to HUGEINT; Spark's stays long).

Usage: typesweep.py SF_DIR OUT_DIR [--report FILE]
"""
import json
import re
import sys

import duckdb

# DuckDB types with an exact Spark/parquet counterpart. Anything else
# (HUGEINT/UHUGEINT int128, unsigned ints, UUID, TIME, INTERVAL, BIT,
# ENUM, ...) either can't be written by Spark or hashes differently.
OK_SCALAR = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BLOB",
}
OK_PARAM = re.compile(r"^DECIMAL\(\d+,\s*\d+\)$")


def type_ok(t: str) -> bool:
    t = t.strip()
    # recurse through nested containers: LIST 'X[]', MAP(K, V), STRUCT(...)
    if t.endswith("[]"):
        return type_ok(t[:-2])
    m = re.match(r"^(MAP|STRUCT)\((.*)\)$", t)
    if m:
        inner, depth, parts, cur = m.group(2), 0, [], []
        for c in inner:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            if c == "," and depth == 0:
                parts.append("".join(cur)); cur = []
            else:
                cur.append(c)
        parts.append("".join(cur))
        if m.group(1) == "STRUCT":
            # fields are 'name TYPE' — strip the name token
            parts = [p.strip().split(" ", 1)[-1] for p in parts]
        return all(type_ok(p) for p in parts)
    return t in OK_SCALAR or bool(OK_PARAM.match(t))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    report_path = None
    if "--report" in sys.argv:
        report_path = sys.argv[sys.argv.index("--report") + 1]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    lines = ["# TYPESWEEP — oracle output-type audit", "",
             "Every oracle query DESCRIBEd in DuckDB; columns must use a",
             "type Spark writes to parquet identically (no HUGEINT /",
             "unsigned / UUID / TIME / INTERVAL).", "",
             "| query | column | duckdb type | ok |",
             "|---|---|---|---|"]
    n_bad = 0
    n_cols = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            lines.append(f"| {name} | (DESCRIBE error) | — | ERR |")
            print(f"ERR  {name}: DESCRIBE failed: {e}")
            n_bad += 1
            continue
        for cname, ctype, *_ in desc:
            n_cols += 1
            ok = type_ok(ctype)
            if not ok:
                n_bad += 1
                print(f"BAD  {name}.{cname}: {ctype}")
                lines.append(f"| {name} | {cname} | {ctype} | **BAD** |")
    lines += ["", f"Checked {n_cols} columns across {len(oracle)} queries; "
              f"{n_bad} non-Spark-writable."]
    if n_bad == 0:
        lines.append("All oracle output types are Spark-parquet-exact.")
    report = "\n".join(lines) + "\n"
    if report_path:
        with open(report_path, "w") as f:
            f.write(report)
    print(report)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
