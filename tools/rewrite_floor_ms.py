"""One-shot mechanical rewrite: hand-expanded floor-ms oracle sites ->
``{sql_floor_ms("ARG")}`` interpolation (r10 ADVICE item 1).

Finds every ``CAST(epoch_us(ARG) // 1000 + CASE WHEN epoch_us(ARG) %
1000 < 0 THEN -1 ELSE 0 END AS BIGINT)`` occurrence inside string
literals of the query modules (balanced-paren parse, whitespace-
insensitive, asserts the two ARG copies match), replaces it with an
f-string interpolation of common.sql_floor_ms, promotes plain string
literals to f-strings (escaping any pre-existing braces), and reports
what it did. Idempotent: a second run finds zero sites. Kept in tools/
as the audit trail for the rewrite commit.
"""

from __future__ import annotations

import io
import re
import tokenize

FILES = [
    "airquality_data_pipeline_spark/queries/advanced.py",
    "airquality_data_pipeline_spark/queries/advanced2.py",
    "airquality_data_pipeline_spark/queries/advanced3.py",
    "airquality_data_pipeline_spark/queries/advanced4.py",
    "airquality_data_pipeline_spark/queries/pipeline.py",
    "airquality_data_pipeline_spark/queries/relational.py",
    "airquality_data_pipeline_spark/queries/relational2.py",
    "airquality_data_pipeline_spark/queries/relational3.py",
    "airquality_data_pipeline_spark/queries/tpch2.py",
]

HEAD = "CAST(epoch_us("


def _balanced(s: str, i: int) -> int:
    """s[i] == '(' -> index just past the matching ')'. Skips
    single-quoted SQL literals so parens inside them don't count."""
    depth = 0
    j = i
    while j < len(s):
        c = s[j]
        if c == "'":
            j += 1
            while j < len(s) and s[j] != "'":
                j += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    raise ValueError("unbalanced parens")


def _norm(s: str) -> str:
    return " ".join(s.split())


TAIL = re.compile(
    r"\s*//\s*1000\s*\+\s*CASE\s+WHEN\s+epoch_us\(", re.S
)
TAIL2 = re.compile(
    r"\s*%\s*1000\s*<\s*0\s*THEN\s*-1\s*ELSE\s*0\s*END\s+AS\s+BIGINT\)",
    re.S,
)


def find_sites(body: str) -> list[tuple[int, int, str]]:
    """(start, end, normalized_arg) for each full floor-ms pattern."""
    sites = []
    pos = 0
    while True:
        k = body.find(HEAD, pos)
        if k < 0:
            break
        p1 = k + len("CAST(epoch_us")  # at '('
        try:
            e1 = _balanced(body, p1)
        except ValueError:
            pos = k + 1
            continue
        arg1 = body[p1 + 1 : e1 - 1]
        m = TAIL.match(body, e1)
        if not m:
            pos = k + 1
            continue
        p2 = m.end() - 1  # at '(' of second epoch_us
        try:
            e2 = _balanced(body, p2)
        except ValueError:
            pos = k + 1
            continue
        arg2 = body[p2 + 1 : e2 - 1]
        m2 = TAIL2.match(body, e2)
        if not m2:
            pos = k + 1
            continue
        assert _norm(arg1) == _norm(arg2), (arg1, arg2)
        sites.append((k, m2.end(), _norm(arg1)))
        pos = m2.end()
    return sites


def rewrite_string_token(tok_src: str) -> tuple[str, int]:
    """Rewrite one STRING token's source text; return (new, n_sites)."""
    m = re.match(r"([A-Za-z]*)('''|\"\"\"|'|\")", tok_src)
    prefix, quote = m.group(1), m.group(2)
    body = tok_src[m.end() : -len(quote)]
    sites = find_sites(body)
    if not sites:
        return tok_src, 0
    is_f = "f" in prefix.lower()
    out, last = [], 0
    for start, end, arg in sites:
        chunk = body[last:start]
        if not is_f:
            chunk = chunk.replace("{", "{{").replace("}", "}}")
        out.append(chunk)
        assert '"' not in arg and "\\" not in arg, arg
        out.append('{sql_floor_ms("' + arg + '")}')
        last = end
    chunk = body[last:]
    if not is_f:
        chunk = chunk.replace("{", "{{").replace("}", "}}")
    out.append(chunk)
    new_prefix = prefix if is_f else "f" + prefix
    return new_prefix + quote + "".join(out) + quote, len(sites)


def rewrite_file(path: str) -> int:
    src = open(path).read()
    lines = src.splitlines(keepends=True)
    line_off = [0]
    for ln in lines:
        line_off.append(line_off[-1] + len(ln))
    toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    edits = []  # (abs_start, abs_end, replacement)
    n = 0
    for tok in toks:
        if tok.type != tokenize.STRING:
            continue
        a = line_off[tok.start[0] - 1] + tok.start[1]
        b = line_off[tok.end[0] - 1] + tok.end[1]
        new, k = rewrite_string_token(src[a:b])
        if k:
            edits.append((a, b, new))
            n += k
    for a, b, new in reversed(edits):
        src = src[:a] + new + src[b:]
    if n:
        open(path, "w").write(src)
    return n


IMPORT_RE = re.compile(
    r"from airquality_data_pipeline_spark\.queries\.common import \(([^)]*)\)",
    re.S,
)


def ensure_import(path: str) -> None:
    src = open(path).read()
    m = IMPORT_RE.search(src)
    if not m:
        raise RuntimeError(f"no parenthesized .common import in {path}")
    inner = m.group(1)
    if re.search(r"\bsql_floor_ms\b", inner):
        return
    names = [n.strip().rstrip(",") for n in inner.split("\n") if n.strip()]
    names.append("sql_floor_ms")
    new_inner = (
        "\n" + "\n".join(f"    {n}," for n in sorted(names)) + "\n"
    )
    src = src[: m.start(1)] + new_inner + src[m.end(1) :]
    open(path, "w").write(src)


if __name__ == "__main__":
    total = 0
    for f in FILES:
        k = rewrite_file(f)
        if k:
            ensure_import(f)
        print(f"{f}: {k} sites")
        total += k
    print("total:", total)
