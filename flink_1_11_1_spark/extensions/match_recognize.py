"""SQL MATCH_RECOGNIZE front door (SURVEY.md §3.11), lowering onto the
general CEP NFA (streaming/nfa.py).

Reference parity: Flink 1.11 lowers SQL MATCH_RECOGNIZE through
flink-table-planner-blink StreamExecMatch.scala onto the flink-cep NFA;
this module does the same lowering onto PatternSeq.  Supported subset
(the common Flink-SQL shape):

    SELECT * FROM <events_table> MATCH_RECOGNIZE (
        PARTITION BY <key>
        ORDER BY ts [, event_id]
        MEASURES <measure> AS <alias> [, ...]
        [ONE ROW PER MATCH]
        [AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW]
        PATTERN ( VAR[+|*|?|{n}|{n,}|{n,m}] ... )
        [WITHIN INTERVAL '<n>' <unit>]
        DEFINE VAR AS <row-local condition> [, ...]
    )

Measures: FIRST(V.col) / LAST(V.col) / V.col (= LAST, Flink's default
for ONE ROW PER MATCH) / COUNT(V.*).  ``ts`` and ``event_id`` come
straight from the match arrays; any other column is resolved with an
event_id equi-join back to the source table (matches are small relative
to the scanned events, so the join-back adds one shuffle of the match
set only — scale-safe at 100 TB).

Documented deltas (the NFA's deterministic-greedy contract):
- DEFINE conditions must be row-local (``B.price > A.price``-style
  cross-variable references raise ValueError — the NFA evaluates flags
  per event, JVM-side, before the fold).
- Quantified variables are greedy without backtracking: DEFINE
  conditions of adjacent pattern variables should be mutually exclusive
  (true for the event_type-dispatch shape virtually all funnels use).
- The last pattern variable must be exactly quantified ({n} or bare),
  as completion is emitted the moment it is satisfied (same restriction
  Flink documents for greedy-final-variable).
- ALL ROWS PER MATCH and SKIP TO [FIRST|LAST] VAR are not implemented.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..streaming import nfa

_MR_RE = re.compile(
    r"SELECT\s+\*\s+FROM\s+(?P<table>\w+)\s+MATCH_RECOGNIZE\s*"
    r"\((?P<body>.*)\)\s*(?:AS\s+\w+)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_CLAUSE_RE = re.compile(
    r"PARTITION\s+BY\s+(?P<key>\w+)\s+"
    r"ORDER\s+BY\s+(?P<order>[\w\s,]+?)\s+"
    r"MEASURES\s+(?P<measures>.*?)\s+"
    r"(?:ONE\s+ROW\s+PER\s+MATCH\s+)?"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)\s+)?"
    r"PATTERN\s*\(\s*(?P<pattern>[^)]*?)\s*\)\s+"
    r"(?:WITHIN\s+INTERVAL\s+'(?P<within_n>\d+)'\s+(?P<within_unit>\w+)\s+)?"
    r"DEFINE\s+(?P<define>.*)$",
    re.IGNORECASE | re.DOTALL,
)

_QUANT_RE = re.compile(r"^(?P<var>\w+)(?P<q>[+*?]|\{\d+(?:,\d*)?\})?$")

_MEASURE_RE = re.compile(
    r"^(?:(?P<fn>FIRST|LAST|COUNT)\s*\(\s*)?(?P<var>\w+)\.(?P<col>\w+|\*)\s*\)?"
    r"\s+AS\s+(?P<alias>\w+)$",
    re.IGNORECASE,
)


def _split_top(text: str) -> list[str]:
    """Split on commas not nested in parentheses or quotes."""
    parts, depth, q, cur = [], 0, None, []
    for ch in text:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _parse_quant(tok: str) -> tuple[str, int, int | None]:
    m = _QUANT_RE.match(tok)
    if not m:
        raise ValueError(f"unsupported pattern token {tok!r}")
    var, q = m.group("var"), m.group("q")
    if q is None:
        return var, 1, 1
    if q == "+":
        return var, 1, None
    if q == "*":
        return var, 0, None
    if q == "?":
        return var, 0, 1
    inner = q[1:-1]
    if "," in inner:
        lo, hi = inner.split(",")
        return var, int(lo), (int(hi) if hi else None)
    return var, int(inner), int(inner)


def _row_local(cond: str, variables: list[str], this: str) -> str:
    """Strip ``THIS.`` prefixes; reject cross-variable references."""
    for v in variables:
        if v == this:
            continue
        if re.search(rf"\b{v}\.", cond):
            raise ValueError(
                f"cross-variable reference {v}.* in DEFINE {this} — the NFA "
                "evaluates conditions row-locally (documented subset)"
            )
    return re.sub(rf"\b{this}\.", "", cond)


def _first_ts(label: str):
    return F.expr(f"get(tss, array_position(labels, '{label}') - 1)")


def _last_ts(label: str):
    return F.expr(
        "try_element_at(filter(arrays_zip(labels, tss), x -> x.labels = "
        f"'{label}'), -1).tss"
    )


def match_recognize(
    spark: SparkSession,
    sql: str,
    sf_dir: str | None = None,
    events: DataFrame | None = None,
) -> DataFrame:
    """Parse and execute a MATCH_RECOGNIZE statement (subset above).

    Source resolution: explicit ``events`` DataFrame (streaming allowed —
    lowers onto the keyed-state NFA backend, mirroring Flink's
    StreamExecMatch), else ``catalog.load_table(sf_dir, <table>)``, else
    ``spark.table(<table>)``.
    """
    m = _MR_RE.match(sql.strip())
    if not m:
        raise ValueError("expected SELECT * FROM <table> MATCH_RECOGNIZE (...)")
    table, body = m.group("table"), m.group("body")
    c = _CLAUSE_RE.match(body.strip())
    if not c:
        raise ValueError("unparseable MATCH_RECOGNIZE body (see module doc)")
    if re.search(r"ALL\s+ROWS\s+PER\s+MATCH", body, re.IGNORECASE):
        raise ValueError("ALL ROWS PER MATCH is not implemented")

    key = c.group("key")
    order = [o.strip() for o in c.group("order").split(",")]
    if order not in (["ts"], ["ts", "event_id"]):
        raise ValueError("ORDER BY must be ts [, event_id] (NFA fold order)")

    # pattern → quantified variables
    toks = c.group("pattern").split()
    seq = [_parse_quant(t) for t in toks]
    variables = [v for v, _, _ in seq]
    if len(set(variables)) != len(variables):
        raise ValueError("repeated pattern variables are not supported")

    # defines → row-local conditions
    defines: dict[str, str] = {}
    for d in _split_top(c.group("define")):
        dm = re.match(r"(?P<var>\w+)\s+AS\s+(?P<cond>.+)$", d, re.IGNORECASE | re.DOTALL)
        if not dm:
            raise ValueError(f"unparseable DEFINE {d!r}")
        defines[dm.group("var")] = _row_local(
            dm.group("cond").strip(), variables, dm.group("var")
        )
    missing = [v for v in variables if v not in defines]
    if missing:
        raise ValueError(f"PATTERN variables with no DEFINE: {missing}")

    # lower onto PatternSeq: MATCH_RECOGNIZE concatenation is strict
    # row-contiguity → strict_in edges + consecutive repeats
    pat = nfa.PatternSeq.begin(seq[0][0], defines[seq[0][0]])
    pat = pat._mod_last(min_count=seq[0][1], max_count=seq[0][2], consecutive=True)
    for var, lo, hi in seq[1:]:
        pat = pat.next_(var, defines[var])
        pat = pat._mod_last(min_count=lo, max_count=hi, consecutive=True)
    skip = (c.group("skip") or "PAST LAST ROW").upper()
    pat = pat.after_match_skip(
        "past_last" if skip.startswith("PAST") else "to_next"
    )
    if c.group("within_n"):
        pat = pat.within(f"{c.group('within_n')} {c.group('within_unit')}")
    else:
        pat = pat.within("36500 days")  # effectively unbounded

    if events is None:
        events = (
            catalog.load_table(spark, sf_dir, table)
            if sf_dir is not None
            else spark.table(table)
        )
    if events.isStreaming:
        out = pat.match_stream(events, key=key)
    else:
        out = pat.match_batch(events, key=key)

    # measures
    cols = [F.col("user_id").alias(key)] if key == "user_id" else [F.col(key)]
    joinbacks: list[tuple[str, str]] = []  # (tmp id col, measure alias->source col)
    for i, mtext in enumerate(_split_top(c.group("measures"))):
        mm = _MEASURE_RE.match(mtext.strip())
        if not mm:
            raise ValueError(f"unsupported measure {mtext!r}")
        fn = (mm.group("fn") or "LAST").upper()
        var, col, alias = mm.group("var"), mm.group("col"), mm.group("alias")
        if var not in variables:
            raise ValueError(f"measure references unknown variable {var}")
        if fn == "COUNT":
            if col != "*":
                raise ValueError("COUNT measure must be COUNT(V.*)")
            cols.append(nfa.label_count(var).cast("bigint").alias(alias))
        elif col == "ts":
            cols.append((_first_ts(var) if fn == "FIRST" else _last_ts(var)).alias(alias))
        elif col == "event_id":
            cols.append(
                (nfa.first_id(var) if fn == "FIRST" else nfa.last_id(var)).alias(alias)
            )
        else:
            # resolve via event_id join-back against the source table
            tmp = f"_mrid_{i}"
            cols.append(
                (nfa.first_id(var) if fn == "FIRST" else nfa.last_id(var)).alias(tmp)
            )
            joinbacks.append((tmp, f"{alias}:{col}"))

    if events.isStreaming and joinbacks:
        raise ValueError(
            "streaming MATCH_RECOGNIZE measures are limited to ts/event_id/"
            "COUNT (join-back to the source needs a bounded side)"
        )
    res = out.select(*cols)
    for tmp, spec in joinbacks:
        alias, col = spec.split(":")
        side = events.select(
            F.col("event_id").alias(f"{tmp}_k"), F.col(col).alias(alias)
        )
        res = res.join(side, res[tmp] == side[f"{tmp}_k"], "left").drop(tmp, f"{tmp}_k")
    return res
