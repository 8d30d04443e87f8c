#!/usr/bin/env python3
"""Respell DuckDB's non-ANSI `//` (integer division, truncating) in the
dsreal ORACLE SQL texts to the engine-neutral exact form

    X // Y   ->   CAST((X - (X % Y)) / (Y) AS BIGINT)

which parses in BOTH Spark and DuckDB and is value-identical to `//`
for |X| < 2^53 at any sign: both engines use truncated `%` (sign
follows the dividend), so X - (X % Y) is the exact multiple of Y that
truncating division implies, and dividing two exactly-representable
integers whose true quotient IS an integer is exact in IEEE double.
This unblocks running the oracle texts verbatim through spark.sql
(PARSE_SYNTAX_ERROR today) without touching the oracle's VALUES, so
every already-validated dsreal hash stays valid.

Only rewrites inside triple-quoted Scala strings (the SQL texts);
Scala line comments also contain `//` and must not be touched.
Refuses ambiguous sites (left operand preceded by * / %, which would
re-associate) so they can be reviewed by hand.

Usage: divrewrite.py [--apply] FILE...
"""
import re
import sys

IDENT = re.compile(r"[A-Za-z0-9_.*$]")


def find_strings(src):
    """Spans of ALL Scala string literals (single- and triple-quoted),
    via a small lexer that also skips // and /* */ comments, so a
    `//` inside prose is never mistaken for SQL."""
    spans = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if src.startswith('"""', i):
            e = src.find('"""', i + 3)
            if e < 0:
                break
            spans.append((i + 3, e))
            i = e + 3
        elif c == '"':
            j = i + 1
            while j < n and src[j] != '"':
                j += 2 if src[j] == "\\" else 1
            spans.append((i + 1, j))
            i = j + 1
        elif src.startswith("//", i):
            i = src.find("\n", i)
            if i < 0:
                break
        elif src.startswith("/*", i):
            e = src.find("*/", i + 2)
            i = n if e < 0 else e + 2
        elif c == "'":  # char literal (never multi-char here)
            i += 3 if i + 1 < n and src[i + 1] != "\\" else 4
        else:
            i += 1
    return spans


def scan_left(src, i):
    """Operand extent ending at i (exclusive). Returns start index."""
    j = i
    while j > 0 and src[j - 1] in " \t\n":
        j -= 1
    end = j
    if src[j - 1] == ")":
        depth = 0
        while j > 0:
            j -= 1
            if src[j] == ")":
                depth += 1
            elif src[j] == "(":
                depth -= 1
                if depth == 0:
                    break
        # function name directly before the '('
        while j > 0 and IDENT.match(src[j - 1]):
            j -= 1
    else:
        while j > 0 and IDENT.match(src[j - 1]):
            j -= 1
    if j == end:
        raise ValueError(f"no left operand at {i}: ...{src[i-40:i]}")
    return j


def scan_right(src, i):
    """Operand extent starting at i. Returns end index (exclusive)."""
    j = i
    while src[j] in " \t":
        j += 1
    start = j
    while j < len(src) and IDENT.match(src[j]):
        j += 1
    if j < len(src) and src[j] == "(":
        depth = 0
        while j < len(src):
            if src[j] == "(":
                depth += 1
            elif src[j] == ")":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            j += 1
    if j == start:
        raise ValueError(f"no right operand at {i}: {src[i:i+40]}...")
    return j


def rewrite(src, path):
    spans = find_strings(src)
    out = []
    pos = 0
    count = 0
    for m in re.finditer(r" // ", src):
        i = m.start()
        if not any(a <= i < b for a, b in spans):
            continue
        ls = scan_left(src, i)
        le = i
        while src[le - 1] in " \t\n":
            le -= 1
        rs = m.end()
        re_ = scan_right(src, rs)
        if ls < pos:
            raise ValueError(f"{path}: chained // at {i} — by hand")
        x = src[ls:le]
        y = src[rs:re_].lstrip()
        before = src[:ls].rstrip()
        if before and before[-1] in "*/%":
            raise ValueError(
                f"{path}: ambiguous precedence before '{x} // {y}' "
                f"(preceded by '{before[-1]}') — rewrite by hand")
        out.append(src[pos:ls])
        out.append(f"CAST(({x} - ({x} % {y})) / ({y}) AS BIGINT)")
        pos = re_
        count += 1
        print(f"{path}: {x!r} // {y!r}")
    out.append(src[pos:])
    return "".join(out), count


def main():
    apply = "--apply" in sys.argv
    files = [a for a in sys.argv[1:] if not a.startswith("--")]
    for path in files:
        src = open(path).read()
        new, n = rewrite(src, path)
        print(f"== {path}: {n} sites ==")
        if apply and n:
            open(path, "w").write(new)


if __name__ == "__main__":
    main()
