#!/usr/bin/env python3
"""Rounding-boundary fragility sweep over the oracle queries.

Round 4 proved that an output column computed as round(double, 6) can
hash-diverge between engines/builds when the UNROUNDED value sits within
ulps of a 6-decimal rounding boundary (k + 0.5) * 1e-6: Spark rounds the
exact binary expansion via BigDecimal HALF_UP while DuckDB rounds a
float-multiplied intermediate, and different libm builds shift
transcendental results by an ulp. The fix pattern is integer micro-unit
encoding (q_dsir / q_substring_dedup / q_token_entropy).

This tool measures how close every REMAINING float output cell comes to
a boundary, so fragile columns are converted before a driver run trips
on them:

  1. loads OUT_DIR/oracle_sql.json (written by graft.Verify),
  2. strips every two-argument round(expr, 6) call (paren-matched) so
     the oracle computes the RAW values,
  3. runs the stripped SQL in DuckDB over SF_DIR,
  4. for each DOUBLE column, reports the minimum relative distance of
     any cell to its nearest 6-decimal boundary; cells with
     |x - boundary| < max(1e-7 * |x|, 1e-13) are flagged DANGER.

Raw values are engine-representative: division/sqrt are IEEE
exactly-rounded (bit-identical everywhere), and libm transcendentals
agree far beyond the flag threshold. The band is 1e-7 RELATIVE —
deliberately paranoid: the r4 q_substring_dedup dup_frac failure's
worst cell sat 3.1e-8 from a boundary (and old q_token_entropy's at
2.0e-10), so anything an order of magnitude inside that is treated as
convert-to-integer territory.

Stripping round() can perturb row membership where the rounded value
fed an ORDER BY/filter; boundary proximity is a property of the value
population, so the sweep remains valid.

Usage: floatsweep.py SF_DIR OUT_DIR [--report FILE]
Exit 1 if any DANGER cell is found.
"""
import json
import math
import sys

import duckdb


def strip_round6(sql: str) -> str:
    """Replace every two-arg round(X, 6) with (X), innermost first.

    Candidates are scanned RIGHTMOST-first: the rightmost round( has no
    round( inside its argument, so the first strippable match is always
    innermost, and an outer round(X, 6) whose argument contains only
    non-strippable calls (e.g. single-arg round(x * 1000000)) is still
    stripped instead of silently skipped.
    """
    while True:
        low = sql.lower()
        positions = []
        i = low.find("round(")
        while i >= 0:
            positions.append(i)
            i = low.find("round(", i + 1)
        stripped = False
        for i in reversed(positions):
            # find matching close paren and top-level commas
            depth = 0
            commas = []
            j = i + len("round(")
            arg_start = j
            end = -1
            while j < len(sql):
                c = sql[j]
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        end = j
                        break
                    depth -= 1
                elif c == "," and depth == 0:
                    commas.append(j)
                j += 1
            if end < 0:
                continue
            if len(commas) == 1 and sql[commas[0] + 1:end].strip() == "6":
                inner = sql[arg_start:commas[0]]
                sql = sql[:i] + "(" + inner + ")" + sql[end + 1:]
                stripped = True
                break
        if not stripped:
            return sql


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
    lines = ["# FLOATSWEEP — 6-decimal rounding-boundary audit", "",
             f"Danger band: |raw - nearest (k+0.5)e-6| < max(1e-7|raw|, 1e-13).",
             "Columns listed are DOUBLE outputs whose oracle SQL used"
             " round(x, 6); raw (unrounded) values measured in DuckDB.", "",
             "| query | column | cells | min rel dist to boundary | danger |",
             "|---|---|---|---|---|"]
    n_danger_cols = 0
    n_checked_cols = 0
    for name, sql in sorted(oracle.items()):
        stripped = strip_round6(sql)
        if stripped == sql:
            continue  # no round(,6) anywhere — nothing to audit
        try:
            res = con.execute(stripped)
            cols = [d[0] for d in res.description]
            rows = res.fetchall()
        except Exception as e:
            lines.append(f"| {name} | (stripped SQL error) | — | — | ERR |")
            print(f"ERR  {name}: stripped oracle failed: {e}")
            n_danger_cols += 1
            continue
        for ci, cname in enumerate(cols):
            # duckdb's DBAPI description only exposes generic type names
            # ('NUMBER'), so detect float columns from the cell values
            if not any(isinstance(r[ci], float) for r in rows):
                continue
            n_checked_cols += 1
            min_rel = math.inf
            n_danger = 0
            n_cells = 0
            for r in rows:
                x = r[ci]
                if x is None or not isinstance(x, float) or math.isnan(x) \
                        or math.isinf(x):
                    continue
                n_cells += 1
                b = (math.floor(x * 1e6) + 0.5) / 1e6
                d = abs(x - b)
                rel = d / abs(x) if x != 0 else d * 1e6
                min_rel = min(min_rel, rel)
                if d < max(1e-7 * abs(x), 1e-13):
                    n_danger += 1
            flag = str(n_danger) if n_danger else "0"
            if n_danger:
                n_danger_cols += 1
                print(f"DANGER {name}.{cname}: {n_danger}/{n_cells} cells")
            mr = "n/a" if min_rel is math.inf else f"{min_rel:.3e}"
            lines.append(f"| {name} | {cname} | {n_cells} | {mr} | {flag} |")
    lines += ["",
              f"Checked {n_checked_cols} double columns; "
              f"{n_danger_cols} in the danger band."]
    if n_checked_cols == 0:
        lines += ["",
                  "No oracle emits a round(double, 6) output column any"
                  " more: every ratio/similarity/entropy/score output is"
                  " an integer micro-unit (ppm / micro-bits / micro-nats"
                  " / sim_micro) computed with per-row single rounding or"
                  " pure BIGINT arithmetic. round(x, 6) survives only in"
                  " internal ORDER BY quantization, which never reaches"
                  " the hashed output."]
    report = "\n".join(lines) + "\n"
    if report_path:
        with open(report_path, "w") as f:
            f.write(report)
    print(report)
    sys.exit(1 if n_danger_cols else 0)


if __name__ == "__main__":
    main()
