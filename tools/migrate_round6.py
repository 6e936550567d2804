"""One-shot source migration: native scale-6 presentation rounding -> the
engine-agreeing floor-scale recipe (VERDICT r8 item 3).

Spark ROUND(x, 6) (BigDecimal HALF_UP on the exact decimal expansion) and
DuckDB ROUND(x, 6) (scaled-double rounding) disagree on ~1.3% of
boundary-straddling doubles GIVEN THE IDENTICAL INPUT BITS (measured,
tests/test_round_parity.py) — a latent whole-registry driver-hash flake
because the driver regenerates testdata between rounds. The pinned recipe
FLOOR(x * 1e6 + 0.5) / 1e6, spelled identically in both engines, is
bit-identical by construction (same IEEE op sequence).

This script rewrites, in the named source files:
- Spark side: `F.round(EXPR, 6)` call sites (tokenizer-verified to be real
  code, not string/docstring text) -> `PAR.round6(EXPR)` where PAR is
  plenario_mapper_spark.functions.parity.
- Oracle side: `ROUND(EXPR, 6)` / `round(EXPR, 6)` sites INSIDE string
  literals that look like SQL (contain SELECT and FROM) ->
  `FLOOR((EXPR) * 1e6 + 0.5) / 1e6`.

Rounds at other scales (2 = DECIMAL money presentation, exact in both
engines; 12 = round-then-rank grids, re-rounded to 6 by the driver canon;
0/9 = integer/diagnostic) are left alone on purpose — the audit in
tests/test_round_parity.py documents that adjudication.

Idempotent: re-running finds no remaining scale-6 sites. Review `git diff`
after running; the t2 sweep + fuzz clones are the gate.
"""

from __future__ import annotations

import io
import re
import sys
import tokenize


def _match_paren(s: str, i: int) -> int:
    """Index just past the ')' closing the '(' at s[i]. Respects single/double
    quotes inside (SQL string content has none that matter; python code side
    can carry string args)."""
    depth = 0
    j = i
    while j < len(s):
        c = s[j]
        if c in "'\"":
            q = c
            j += 1
            while j < len(s) and s[j] != q:
                j += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    raise ValueError("unbalanced parens")


def _split_last_comma(inner: str) -> tuple[str, str | None]:
    depth = 0
    pos = None
    j = 0
    while j < len(inner):
        c = inner[j]
        if c in "'\"":
            q = c
            j += 1
            while j < len(inner) and inner[j] != q:
                j += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            pos = j
        j += 1
    if pos is None:
        return inner, None
    expr, scale = inner[:pos], inner[pos + 1 :]
    if scale.strip() == "":  # trailing comma: F.round(expr, 6,)
        return _split_last_comma(expr)
    return expr, scale


SCALE = "6"  # override via --scale=N argv flag (round-then-rank grids: 9, 12)


def rewrite_sql_text(sql: str) -> tuple[str, int]:
    """Rewrite every scale-SCALE ROUND site in a SQL string."""
    n = 0
    while True:
        m = None
        for cand in re.finditer(r"(?<![A-Za-z0-9_.])round\s*\(", sql, re.I):
            inner_start = _match_paren(sql, sql.index("(", cand.start()))
            inner = sql[sql.index("(", cand.start()) + 1 : inner_start - 1]
            expr, scale = _split_last_comma(inner)
            if scale is not None and scale.strip() == SCALE and "round" not in expr.lower():
                m = (cand.start(), inner_start, expr)
                break
            if scale is not None and scale.strip() == SCALE:
                # nested round inside: rewrite innermost first
                continue
        if m is None:
            # second pass: any scale-6 site left (its nested rounds now gone)?
            done = True
            for cand in re.finditer(r"(?<![A-Za-z0-9_.])round\s*\(", sql, re.I):
                inner_start = _match_paren(sql, sql.index("(", cand.start()))
                inner = sql[sql.index("(", cand.start()) + 1 : inner_start - 1]
                expr, scale = _split_last_comma(inner)
                if scale is not None and scale.strip() == SCALE:
                    m = (cand.start(), inner_start, expr)
                    done = False
                    break
            if done:
                return sql, n
        start, end, expr = m
        sql = sql[:start] + f"FLOOR(({expr.strip()}) * 1e{SCALE} + 0.5) / 1e{SCALE}" + sql[end:]
        n += 1


def rewrite_code_round(src: str) -> tuple[str, int]:
    """Rewrite F.round(EXPR, 6) call sites in real code (string spans masked
    via the tokenizer) -> PAR.round6(EXPR)."""
    string_spans = []
    tokens = tokenize.generate_tokens(io.StringIO(src).readline)
    lines = src.splitlines(keepends=True)
    offsets = [0]
    for ln in lines:
        offsets.append(offsets[-1] + len(ln))

    def abs_pos(row, col):
        return offsets[row - 1] + col

    for tok in tokens:
        if tok.type == tokenize.STRING:
            string_spans.append(
                (abs_pos(*tok.start), abs_pos(*tok.end))
            )

    def in_string(i):
        return any(a <= i < b for a, b in string_spans)

    n = 0
    out = src
    while True:
        found = None
        for m in re.finditer(r"F\.round\s*\(", out):
            if in_string(m.start()):
                continue
            end = _match_paren(out, out.index("(", m.start()))
            inner = out[out.index("(", m.start()) + 1 : end - 1]
            expr, scale = _split_last_comma(inner)
            if scale is not None and scale.strip() == SCALE:
                found = (m.start(), end, expr)
                break
        if found is None:
            return out, n
        start, end, expr = found
        rep = (
            f"PAR.round6({expr.strip()})"
            if SCALE == "6"
            else f"PAR.round_at({expr.strip()}, {SCALE})"
        )
        out = out[:start] + rep + out[end:]
        n += 1
        # re-tokenize: spans shifted
        string_spans = []
        lines = out.splitlines(keepends=True)
        offsets = [0]
        for ln in lines:
            offsets.append(offsets[-1] + len(ln))
        for tok in tokenize.generate_tokens(io.StringIO(out).readline):
            if tok.type == tokenize.STRING:
                string_spans.append((abs_pos(*tok.start), abs_pos(*tok.end)))


def rewrite_sql_strings(src: str) -> tuple[str, int]:
    """Rewrite scale-6 ROUND sites inside SQL-looking string literals."""
    n = 0
    pieces = []
    last = 0
    lines = src.splitlines(keepends=True)
    offsets = [0]
    for ln in lines:
        offsets.append(offsets[-1] + len(ln))

    def abs_pos(row, col):
        return offsets[row - 1] + col

    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type != tokenize.STRING:
            continue
        a, b = abs_pos(*tok.start), abs_pos(*tok.end)
        raw = src[a:b]
        body_m = re.match(
            r'(?s)^([rRbBuUfF]*)("""|\'\'\'|"|\')(.*)(\2)$', raw
        )
        if not body_m:
            continue
        prefix, quote, body, _ = body_m.groups()
        if not (
            re.search(r"\bSELECT\b", body, re.I)
            and re.search(r"\bFROM\b", body, re.I)
        ):
            continue
        new_body, k = rewrite_sql_text(body)
        if k:
            pieces.append(src[last:a])
            pieces.append(prefix + quote + new_body + quote)
            last = b
            n += k
    pieces.append(src[last:])
    return "".join(pieces), n


IMPORT_LINE = "from plenario_mapper_spark.functions import parity as PAR\n"


def migrate_file(path: str) -> None:
    src = open(path).read()
    src2, n_sql = rewrite_sql_strings(src)
    src3, n_code = rewrite_code_round(src2)
    if n_code and IMPORT_LINE not in src3:
        # insert after the last top-level import block line
        lines = src3.splitlines(keepends=True)
        idx = max(
            i
            for i, ln in enumerate(lines)
            if ln.startswith(("import ", "from ")) and " parity " not in ln
        )
        lines.insert(idx + 1, IMPORT_LINE)
        src3 = "".join(lines)
    if src3 != src:
        open(path, "w").write(src3)
    print(f"{path}: {n_sql} SQL sites, {n_code} F.round sites rewritten")


if __name__ == "__main__":
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--scale="):
            SCALE = a.split("=", 1)[1]
        else:
            args.append(a)
    for p in args:
        migrate_file(p)
