"""Flink 1.11 SQL join-surface compat rewrites (text-level, like
group_windows.py): the two statement forms every migrating lookup /
UDTF-correlate query carries.

``LATERAL TABLE (f(args)) [AS T(c1, ...)]``
    Calcite's collection-table operator (SqlStdOperatorTable
    COLLECTION_TABLE; Flink docs "Joins > Table Function").  Spark
    accepts the same lateral correlation natively as
    ``LATERAL f(args) [AS T(c1, ...)]`` — comma, CROSS JOIN and
    LEFT/LEFT OUTER JOIN ... ON TRUE placements all verified — so the
    rewrite only drops the ``TABLE`` keyword and its wrapping parens.

``JOIN dim FOR SYSTEM_TIME AS OF <time-attr> [AS alias] ON ...``
    Flink 1.11's lookup-join clause (SqlSnapshot;
    LookupJoinITCase).  In 1.11 the clause requires a PROCESSING-time
    attribute: semantics are "join the version current at execution
    time".  A batch/micro-batch plan reads the dimension at execution
    time anyway, so the clause strips to a plain join — identical
    semantics, one less parser error.  Event-time versioned-table
    temporal joins (a 1.12 SQL feature) stay on the dedicated
    operators (operators/joins.asof_join,
    streaming/temporal.streaming_temporal_rowtime_join).
"""

from __future__ import annotations

import re

from .ddl import _quoted_spans

_LATERAL_TABLE_RE = re.compile(
    r"(?<![\w.])LATERAL\s+TABLE\s*\(", re.IGNORECASE
)

# time attribute forms: qualified column (o.proctime), bare column, or
# a no-arg call (PROCTIME())
_FOR_SYSTEM_TIME_RE = re.compile(
    r"\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?:[\w.`]+\s*\(\s*\)|[\w.`]+)",
    re.IGNORECASE,
)


def _balanced_close(s: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx (quote-aware)."""
    depth = 0
    i, n = open_idx, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"`":
            q = ch
            i += 1
            while i < n:
                if q in "'\"" and s[i] == "\\":
                    i += 2
                    continue
                if s[i] == q:
                    if s[i + 1 : i + 2] == q:
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parentheses in LATERAL TABLE")


def rewrite_lateral_table(sql: str) -> str:
    """``LATERAL TABLE (call)`` → ``LATERAL call`` (alias list kept)."""
    if not _LATERAL_TABLE_RE.search(sql):
        return sql
    spans = _quoted_spans(sql)
    out: list[str] = []
    pos = 0
    for m in _LATERAL_TABLE_RE.finditer(sql):
        if m.start() < pos or any(a <= m.start() < b for a, b in spans):
            continue
        open_idx = sql.index("(", m.end() - 1)
        try:
            close_idx = _balanced_close(sql, open_idx)
        except ValueError:
            continue  # comment fragment etc. — leave untouched
        inner = sql[open_idx + 1 : close_idx].strip()
        out.append(sql[pos : m.start()])
        out.append(f"LATERAL {inner}")
        pos = close_idx + 1
    out.append(sql[pos:])
    return "".join(out)


def rewrite_for_system_time(sql: str) -> str:
    """Strip ``FOR SYSTEM_TIME AS OF <proctime-attr>`` (lookup-join
    clause): batch execution reads the dimension's current version by
    construction, which IS the 1.11 proctime lookup contract."""
    if "SYSTEM_TIME" not in sql.upper():
        return sql
    spans = _quoted_spans(sql)
    out: list[str] = []
    pos = 0
    for m in _FOR_SYSTEM_TIME_RE.finditer(sql):
        if m.start() < pos or any(a <= m.start() < b for a, b in spans):
            continue
        out.append(sql[pos : m.start()])
        pos = m.end()
    out.append(sql[pos:])
    return "".join(out)
