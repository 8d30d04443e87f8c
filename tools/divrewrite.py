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


def _skip_simple_string(src, i):
    """src[i] == '\"' opening a simple string -> index past the close."""
    j = i + 1
    n = len(src)
    while j < n and src[j] != '"':
        j += 2 if src[j] == "\\" else 1
    return j + 1


def _triple_end(src, i, interpolated):
    """src[i] is just past an opening \"\"\"; returns (content_spans,
    end_index_past_close). Interpolation-aware (ADVICE r14): inside an
    s/f/raw interpolator, a ${...} block is Scala code that may contain
    NESTED string literals (including \"\"\"), which the old lexer
    mis-closed on — the documented q66 miss. The ${...} code span is
    excluded from the SQL content spans."""
    spans = []
    seg = i
    n = len(src)
    while i < n:
        if src.startswith('"""', i):
            # """" (quote before close) belongs to the content in Scala
            while src.startswith('""""', i):
                i += 1
            spans.append((seg, i))
            return spans, i + 3
        if interpolated and src.startswith("${", i):
            spans.append((seg, i))
            j = i + 1  # at '{'
            depth = 0
            while j < n:
                c = src[j]
                if src.startswith('"""', j):
                    interp2 = j > 0 and src[j - 1] in "sfw"  # s/f/raw
                    _, j = _triple_end(src, j + 3, interp2)
                elif c == '"':
                    j = _skip_simple_string(src, j)
                elif c == "{":
                    depth += 1
                    j += 1
                elif c == "}":
                    depth -= 1
                    j += 1
                    if depth == 0:
                        break
                else:
                    j += 1
            if depth != 0:
                raise ValueError(f"unclosed interpolation at {i}")
            i = seg = j
        else:
            i += 1
    raise ValueError(f"unterminated triple-quoted string at {seg}")


def find_strings(src):
    """Spans of ALL Scala string-literal CONTENT (single- and
    triple-quoted), via a small lexer that skips // and /* */ comments
    and, inside interpolated strings, the ${...} code blocks (whose
    nested literals are lexed recursively rather than mis-closing the
    outer span — ADVICE r14 hardening)."""
    spans = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if src.startswith('"""', i):
            interpolated = i > 0 and IDENT.match(src[i - 1]) is not None
            inner, i = _triple_end(src, i + 3, interpolated)
            spans.extend(inner)
        elif c == '"':
            j = _skip_simple_string(src, i)
            spans.append((i + 1, j - 1))
            i = j
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
    if j == 0:
        raise ValueError(f"// at start of source? index {i}")
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
    # refuse rather than skip un-padded `//` inside SQL spans (ADVICE
    # r14): a missed site would otherwise only surface if the text
    # happens to enter the Spark battery and PARSE_SYNTAX_ERROR there
    for m in re.finditer(r"//", src):
        i = m.start()
        if not any(a <= i < b for a, b in spans):
            continue
        pad = (i >= 1 and src[i - 1] == " " and
               i + 2 < len(src) and src[i + 2] == " ")
        if not pad:
            raise ValueError(
                f"{path}: un-padded // inside a string at {i}: "
                f"...{src[max(0, i - 30):i + 30]}... — respell by hand")
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
