#!/usr/bin/env python3
"""Strip redundant double casts in the oracle SQL texts (ADVICE r14
item 3, cosmetic): divrewrite.py wrapped expressions that already sat
inside a CAST ... AS BIGINT, leaving `CAST(CAST(X AS BIGINT) AS
BIGINT)` — value-identical (BIGINT->BIGINT cast is the identity), but
noisy to review. Rewrites the exact shape

    CAST(<ws>CAST(X AS BIGINT)<ws> AS BIGINT)  ->  CAST(X AS BIGINT)

inside Scala string literals only (same lexer as divrewrite). Every
changed file should be re-validated with a DuckDB dual-run of old vs
new oracle texts (the driver's diffcheck compares Spark OUTPUT to the
oracle, so oracle-text edits need their own equivalence check) AND a
Spark-side verify, because SqlTextPack feeds the same texts to
spark.sql.

Usage: castdedup.py [--apply] FILE...
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from divrewrite import find_strings  # noqa: E402


def balanced(s, i):
    """s[i] == '(' -> index past matching ')' (string-literal aware)."""
    depth = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n and s[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced")


def dedup_once(src, spans):
    i = 0
    while True:
        i = src.find("CAST(", i)
        if i < 0:
            return None
        if not any(a <= i < b for a, b in spans):
            i += 5
            continue
        op = i + 4
        try:
            end = balanced(src, op)
        except ValueError:
            i += 5
            continue
        inner = src[op + 1:end - 1]
        body = inner.rstrip()
        if not body.endswith("AS BIGINT"):
            i += 5
            continue
        body = body[: -len("AS BIGINT")].rstrip()
        core = body.strip()
        # the whole cast argument must BE a single inner CAST(... AS
        # BIGINT) (whitespace allowed around it)
        if not core.startswith("CAST("):
            i += 5
            continue
        # position of the inner CAST within src (core = inner minus
        # leading whitespace, so find() locates exactly its start)
        inner_pos = op + 1 + inner.find("CAST(")
        try:
            inner_close = balanced(src, inner_pos + 4)
        except ValueError:
            i += 5
            continue
        inner_text = src[inner_pos:inner_close]
        if inner_text != core:
            i += 5
            continue
        if not inner_text.rstrip()[:-1].rstrip().endswith("AS BIGINT"):
            i += 5
            continue
        # replace the outer cast span with the inner cast text
        return src[:i] + inner_text + src[end:]


def dedup(src):
    count = 0
    while True:
        spans = find_strings(src)
        new = dedup_once(src, spans)
        if new is None:
            return src, count
        src = new
        count += 1


def main():
    apply = "--apply" in sys.argv
    for path in [a for a in sys.argv[1:] if not a.startswith("--")]:
        src = open(path).read()
        new, n = dedup(src)
        print(f"== {path}: {n} redundant double casts ==")
        if apply and n:
            open(path, "w").write(new)


if __name__ == "__main__":
    main()
