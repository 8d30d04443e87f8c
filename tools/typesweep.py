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

Round 10 adds a second tier (--schemas FILE): FILE maps each query to
its Spark output schema ([[col, canonical-type], ...], written by
TypesweepSpec from analysis-only `df.schema`). Every oracle column must
then match the Spark column's type EXACTLY (after canonicalization) —
this catches the int32-vs-BIGINT class (rank()/grouping() are int in
Spark, BIGINT in DuckDB) that the allowlist alone waves through.
DECIMAL compares on scale only (Spark and DuckDB widen sum() precision
differently while rendering identical values).

Usage: typesweep.py SF_DIR OUT_DIR [--report FILE] [--schemas FILE]
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


def canon(t: str) -> str:
    """Normalize a type name so DuckDB DESCRIBE output and the Spark
    canonical form written by TypesweepSpec compare as strings."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return canon(t[:-2]) + "[]"
    if t.startswith("STRUCT"):
        return "STRUCT"  # field-level detail handled by value compare
    if t.startswith("MAP"):
        return "MAP"
    if t in ("TIMESTAMP WITH TIME ZONE", "TIMESTAMPTZ", "TIMESTAMP_NS"):
        return "TIMESTAMP"
    m = re.match(r"^DECIMAL\((\d+),\s*(\d+)\)$", t)
    if m:  # precision widens differently (Spark +10, DuckDB →38)
        return f"DECIMAL(*,{m.group(2)})"
    return t


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    report_path = None
    if "--report" in sys.argv:
        report_path = sys.argv[sys.argv.index("--report") + 1]
    spark_schemas = None
    if "--schemas" in sys.argv:
        spark_schemas = json.load(
            open(sys.argv[sys.argv.index("--schemas") + 1]))
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
        spark_cols = (dict(spark_schemas[name])
                      if spark_schemas and name in spark_schemas else None)
        for cname, ctype, *_ in desc:
            n_cols += 1
            ok = type_ok(ctype)
            if not ok:
                n_bad += 1
                print(f"BAD  {name}.{cname}: {ctype}")
                lines.append(f"| {name} | {cname} | {ctype} | **BAD** |")
            elif spark_cols is not None:
                if cname not in spark_cols:
                    n_bad += 1
                    print(f"BAD  {name}.{cname}: oracle column missing "
                          f"from Spark output")
                    lines.append(f"| {name} | {cname} | {ctype} | "
                                 f"**BAD: not in Spark output** |")
                elif canon(ctype) != canon(spark_cols[cname]):
                    n_bad += 1
                    print(f"BAD  {name}.{cname}: oracle {ctype} != "
                          f"spark {spark_cols[cname]}")
                    lines.append(f"| {name} | {cname} | {ctype} | "
                                 f"**BAD: spark={spark_cols[cname]}** |")
        if spark_cols is not None:
            for extra in set(spark_cols) - {c for c, *_ in desc}:
                n_bad += 1
                print(f"BAD  {name}.{extra}: Spark column missing "
                      f"from oracle output")
                lines.append(f"| {name} | {extra} | — | "
                             f"**BAD: not in oracle output** |")
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
