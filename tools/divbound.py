#!/usr/bin/env python3
"""Exact-division invariant checker (ADVICE r14 item 1).

The r14 oracle respelling replaced DuckDB's non-ANSI `X // Y` with the
engine-neutral `CAST((X - (X % Y)) / (Y) AS BIGINT)`. In DuckDB that
spelling routes through DOUBLE division, which is value-identical to
`//` only while |X - (X % Y)| < 2^53 — large micro-unit dividends
(sums of cents * 1e6, variance numerators) could silently diverge at
big scale factors.

This tool proves the bound HOLDS at a given SF dir by construction:
for every oracle text it mechanically reverses the respelling (the
exact textual shape divrewrite.py produced) back to native `//`
(exact integer division at any magnitude), runs BOTH texts in DuckDB,
and compares full sorted results. Equality certifies every respelled
site is exact at that SF; any divergence prints the first differing
rows.

Usage: divbound.py SF_DIR ORACLE_JSON [query ...]
  e.g. divbound.py /root/testdata/sf0.01 /tmp/verify_out/oracle_sql.json
"""
import json
import os
import sys

import duckdb


def balanced_span(s, start):
    """s[start] == '(' -> index just past the matching ')'.
    String-literal-aware (single quotes, '' escapes)."""
    depth = 0
    i = start
    n = len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parens")


def unrewrite(sql):
    """Reverse every `CAST((X - (X % Y)) / (Y) AS BIGINT)` site whose
    inner shape matches the rewriter's output exactly; returns
    (new_sql, sites). Innermost-first via repeated single passes."""
    sites = 0
    changed = True
    while changed:
        changed = False
        i = 0
        while True:
            i = sql.find("CAST(", i)
            if i < 0:
                break
            op = i + len("CAST") # points at '('
            try:
                end = balanced_span(sql, op)
            except ValueError:
                break
            inner = sql[op + 1:end - 1]
            if not inner.rstrip().endswith("AS BIGINT"):
                i += 5
                continue
            body = inner.rstrip()[: -len("AS BIGINT")].rstrip()
            # shape: (X - (X % Y)) / (Y)
            if not body.startswith("("):
                i += 5
                continue
            try:
                lhs_end = balanced_span(body, 0)
            except ValueError:
                i += 5
                continue
            rest = body[lhs_end:].lstrip()
            if not rest.startswith("/"):
                i += 5
                continue
            y_part = rest[1:].lstrip()
            if not (y_part.startswith("(") and
                    balanced_span(y_part, 0) == len(y_part)):
                i += 5
                continue
            y = y_part[1:-1]
            lhs = body[1:lhs_end - 1]
            # lhs must be `X - (X % Y)` with the SAME X and Y
            marker = f" % {y})"
            cut = lhs.rfind(" - (")
            ok = False
            if cut > 0:
                x = lhs[:cut]
                tail = lhs[cut + len(" - ("):]
                ok = tail == f"{x} % {y})"
            if not ok:
                i += 5
                continue
            sql = sql[:i] + f"(({x}) // ({y}))" + sql[end:]
            sites += 1
            changed = True
            # restart scanning from the replacement site
            i = max(0, i - 1)
    return sql, sites


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            src = f"read_parquet('{p}/*.parquet')"
        elif os.path.exists(p):
            src = f"'{p}'"
        else:
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(oracle_json))
    n_sites = n_checked = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        rev, sites = unrewrite(sql)
        if sites == 0:
            continue
        n_sites += sites
        n_checked += 1
        try:
            a = con.execute(sql).fetchall()
            b = con.execute(rev).fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(map(repr, a)) != sorted(map(repr, b)):
            diff = [(x, y) for x, y in zip(sorted(map(repr, a)),
                                           sorted(map(repr, b))) if x != y]
            print(f"FAIL {name}: {sites} sites diverge from native // "
                  f"(2^53 dividend bound BROKEN at {sf_dir}); first: "
                  f"{diff[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({sites} exact-division sites)")
    print(f"== {n_checked} queries / {n_sites} sites checked, "
          f"{n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
