"""Flink 1.11 Table-API expression-string parser → Spark Columns.

Reference parity: the string DSL accepted by every Table API method in
Flink 1.11 (``table.select("a, b.sum as total")``), parsed there by
``flink-table/flink-table-planner-blink/src/main/scala/org/apache/
flink/table/planner/expressions/PlannerExpressionParserImpl.scala``
and resolved by ``flink-table/flink-table-api-java/src/main/java/org/
apache/flink/table/expressions/resolver/ExpressionResolver.java``.
PyFlink 1.11 (`flink-python/pyflink/table/table.py`) passes these
strings through verbatim, so they ARE the Python user surface.

This module implements the documented grammar subset as a
recursive-descent parser producing **pyspark Columns directly** — no
IR of our own (SURVEY.md §4.2: Spark's Column tree is the resolved
expression layer).  Supported, mirroring the Flink docs' published
expression table:

- field references, ``*``, literals (int / float / 'string' with ''
  escape / true / false / null)
- arithmetic ``+ - * / %`` (``+`` concatenates when a string literal
  is involved, as in Flink), comparisons ``= == === != !== <> < <= >
  >=``, logic ``&& || !``
- suffix calls ``a.fn`` / ``a.fn(args)`` for the scalar + aggregate
  library (sum, sum0, min, max, avg, count, stddevPop/Samp,
  varPop/Samp, upperCase, lowerCase, charLength, substring, trim,
  like, similar, in, between, cast(TYPE), isNull, toDate, ...), and
  prefix calls ``fn(args)`` (concat, coalesce, if, array, row, ...)
- interval literals ``10.minutes`` / ``2.rows`` (window sizes, OVER
  precedings, timestamp arithmetic)
- item-level ``AS name`` aliases, ``.asc``/``.desc`` sort markers, and
  ``agg over w`` OVER-window references

Deliberate deltas (documented, not silent): expressions Flink types at
plan time are typed by Catalyst here, so e.g. integer ``/`` follows
Spark (fractional) semantics; unsupported names raise with the token
position rather than falling through.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import functions as _flinkfn

# ---------------------------------------------------------------- tokens

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<num>\d+\.\d+|\d+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>===|!==|==|!=|<>|<=|>=|&&|\|\||[-+*/%!<>=(),.])
    )""",
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str  # num | str | ident | op
    text: str
    pos: int


def _tokenize(s: str) -> list[_Tok]:
    out, i, n = [], 0, len(s)
    while i < n:
        m = _TOKEN_RE.match(s, i)
        if not m or m.end() == m.start():
            if s[i:].strip() == "":
                break
            raise ValueError(f"unrecognized token at {i}: {s[i:i+20]!r}")
        for kind in ("num", "str", "ident", "op"):
            t = m.group(kind)
            if t is not None:
                out.append(_Tok(kind, t, m.start()))
                break
        i = m.end()
    return out


# ------------------------------------------------------- parsed expression

@dataclass
class PE:
    """A parsed expression: a Column plus the metadata the Table API
    layer needs (agg-ness for groupBy routing, interval/row-count
    values for window builders, alias, OVER reference)."""

    col: Column | None = None
    is_agg: bool = False
    interval: tuple[int, str] | None = None  # (n, singular unit)
    rows: int | None = None                  # n.rows count literal
    is_str: bool = False                     # string literal operand
    lit_val: Any = None                      # python literal value if literal
    name: str | None = None                  # bare field-reference name
    wref: str | None = None                  # window-alias reference
    alias: str | None = None                 # AS name
    over: str | None = None                  # OVER window alias
    sort: str | None = None                  # 'asc' | 'desc'
    flatten: bool = False                    # expand composite to fields
    agg_names: list[str] = field(default_factory=list)  # fields under aggs


def _interval_sql(n: int, unit: str) -> Column:
    return F.expr(f"INTERVAL '{n}' {unit.upper()}")


def interval_str(pe: PE) -> str:
    """Render an interval PE for window()/session_window() size args."""
    if pe.interval is None:
        raise ValueError("expected an interval literal like 10.minutes")
    n, unit = pe.interval
    return f"{n} {unit}" + ("s" if n != 1 else "")


_UNITS = {
    "milli": "millisecond", "millis": "millisecond",
    "second": "second", "seconds": "second",
    "minute": "minute", "minutes": "minute",
    "hour": "hour", "hours": "hour",
    "day": "day", "days": "day",
    "month": "month", "months": "month",
    "year": "year", "years": "year",
}

_CAST_TYPES = {
    "BYTE": "tinyint", "TINYINT": "tinyint",
    "SHORT": "smallint", "SMALLINT": "smallint",
    "INT": "int", "INTEGER": "int",
    "LONG": "bigint", "BIGINT": "bigint",
    "FLOAT": "float", "DOUBLE": "double",
    "STRING": "string", "VARCHAR": "string",
    "BOOLEAN": "boolean", "DATE": "date",
    "TIMESTAMP": "timestamp", "DECIMAL": "decimal",
}

# zero-arg suffix properties / one-arg-self functions
_SUFFIX0: dict[str, Callable[[Column], Column]] = {
    "upperCase": F.upper, "lowerCase": F.lower, "initCap": F.initcap,
    "trim": F.trim, "ltrim": F.ltrim, "rtrim": F.rtrim,
    "charLength": F.length, "abs": F.abs, "sqrt": F.sqrt,
    "exp": F.exp, "ln": F.log, "log10": F.log10, "log2": F.log2,
    "floor": F.floor, "ceil": F.ceil,
    "isNull": lambda c: c.isNull(), "isNotNull": lambda c: c.isNotNull(),
    "isTrue": lambda c: F.coalesce(c, F.lit(False)),
    "isFalse": lambda c: F.coalesce(~c, F.lit(False)),
    "toDate": lambda c: c.cast("date"),
    "toTimestamp": lambda c: c.cast("timestamp"),
    "md5": F.md5, "sha256": lambda c: F.sha2(c, 256),
    "hex": F.hex, "bin": F.bin,
    "rowtime": lambda c: c, "proctime": lambda c: c,
}

_AGG_SUFFIX: dict[str, Callable[[Column], Column]] = {
    "sum": F.sum, "sum0": _flinkfn.sum0, "min": F.min, "max": F.max,
    "avg": F.avg, "mean": F.avg, "count": F.count,
    "stddevPop": F.stddev_pop, "stddevSamp": F.stddev_samp,
    "varPop": F.var_pop, "varSamp": F.var_samp,
    "firstValue": lambda c: F.first(c, ignorenulls=True),
    "lastValue": lambda c: F.last(c, ignorenulls=True),
    "singleValue": _flinkfn.single_value,
}

_PREFIX: dict[str, Callable[..., Column]] = {
    "concat": F.concat, "coalesce": F.coalesce,
    "array": F.array, "row": F.struct, "map": F.create_map,
    "least": F.least, "greatest": F.greatest,
    "not": lambda c: ~c,
}


class ExprParser:
    """One parser instance per Table-API call site.

    ``resolver(name)`` maps a bare identifier to a PE — the Table layer
    injects window aliases and scope checks here; default is a plain
    ``F.col`` reference.
    """

    def __init__(self, text: str,
                 resolver: Callable[[str], PE | None] | None = None,
                 wprop: Callable[[str, str], Column] | None = None):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0
        self.resolver = resolver
        self.wprop = wprop  # (window_alias, prop) -> Column

    # -- token helpers -------------------------------------------------
    def _peek(self, k: int = 0) -> _Tok | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise ValueError(f"unexpected end of expression: {self.text!r}")
        self.i += 1
        return t

    def _eat_op(self, text: str) -> bool:
        t = self._peek()
        if t and t.kind == "op" and t.text == text:
            self.i += 1
            return True
        return False

    def _expect_op(self, text: str) -> None:
        if not self._eat_op(text):
            t = self._peek()
            raise ValueError(
                f"expected {text!r} at "
                f"{t.pos if t else len(self.text)} in {self.text!r}")

    def _ident_is(self, *names: str) -> bool:
        t = self._peek()
        return bool(t and t.kind == "ident" and t.text.lower() in names)

    # -- entry points --------------------------------------------------
    def parse_items(self) -> list[PE]:
        """Comma-separated select/group/order item list."""
        items = [self._item()]
        while self._eat_op(","):
            items.append(self._item())
        if self._peek() is not None:
            t = self._peek()
            raise ValueError(f"trailing input at {t.pos} in {self.text!r}")
        return items

    def parse_single(self) -> PE:
        pe = self._item()
        if self._peek() is not None:
            t = self._peek()
            raise ValueError(f"trailing input at {t.pos} in {self.text!r}")
        return pe

    def _item(self) -> PE:
        pe = self._expr()
        if self._ident_is("over"):
            self._next()
            w = self._next()
            if w.kind != "ident":
                raise ValueError(f"OVER needs a window alias in {self.text!r}")
            pe = replace(pe, over=w.text)
        if self._ident_is("as"):
            self._next()
            a = self._next()
            if a.kind == "str":
                pe = replace(pe, alias=a.text[1:-1].replace("''", "'"))
            elif a.kind == "ident":
                pe = replace(pe, alias=a.text)
            else:
                raise ValueError(f"AS needs a name in {self.text!r}")
        return pe

    # -- precedence ladder ---------------------------------------------
    def _expr(self) -> PE:
        return self._or()

    def _binary(self, sub, ops: dict[str, Callable[[PE, PE], PE]]) -> PE:
        left = sub()
        while True:
            t = self._peek()
            if t and t.kind == "op" and t.text in ops:
                self.i += 1
                right = sub()
                left = ops[t.text](left, right)
            else:
                return left

    def _merge(self, l: PE, r: PE, col: Column) -> PE:
        return PE(col=col, is_agg=l.is_agg or r.is_agg,
                  agg_names=l.agg_names + r.agg_names)

    def _or(self) -> PE:
        return self._binary(
            self._and, {"||": lambda l, r: self._merge(l, r, l.col | r.col)})

    def _and(self) -> PE:
        return self._binary(
            self._not, {"&&": lambda l, r: self._merge(l, r, l.col & r.col)})

    def _not(self) -> PE:
        if self._eat_op("!"):
            pe = self._not()
            return replace(pe, col=~pe.col)
        return self._cmp()

    def _cmp(self) -> PE:
        left = self._add()
        t = self._peek()
        cmps = {"=": "==", "==": "==", "===": "==",
                "!=": "!=", "!==": "!=", "<>": "!=",
                "<": "<", "<=": "<=", ">": ">", ">=": ">="}
        if t and t.kind == "op" and t.text in cmps:
            self.i += 1
            right = self._add()
            op = cmps[t.text]
            lc, rc = left.col, right.col
            col = {"==": lambda: lc == rc, "!=": lambda: lc != rc,
                   "<": lambda: lc < rc, "<=": lambda: lc <= rc,
                   ">": lambda: lc > rc, ">=": lambda: lc >= rc}[op]()
            return self._merge(left, right, col)
        return left

    def _add(self) -> PE:
        def plus(l: PE, r: PE) -> PE:
            if l.interval is not None and r.col is not None:
                return replace(r, col=r.col + _interval_sql(*l.interval))
            if r.interval is not None and l.col is not None:
                return replace(l, col=l.col + _interval_sql(*r.interval))
            if l.is_str or r.is_str:  # Flink: string + concatenates
                return self._merge(
                    l, r, F.concat(l.col.cast("string"), r.col.cast("string")))
            return self._merge(l, r, l.col + r.col)

        def minus(l: PE, r: PE) -> PE:
            if r.interval is not None and l.col is not None:
                return replace(l, col=l.col - _interval_sql(*r.interval))
            return self._merge(l, r, l.col - r.col)

        return self._binary(self._mul, {"+": plus, "-": minus})

    def _mul(self) -> PE:
        return self._binary(self._unary, {
            "*": lambda l, r: self._merge(l, r, l.col * r.col),
            "/": lambda l, r: self._merge(l, r, l.col / r.col),
            "%": lambda l, r: self._merge(l, r, l.col % r.col),
        })

    def _unary(self) -> PE:
        if self._eat_op("-"):
            pe = self._unary()
            if pe.interval is not None:
                raise ValueError("negative intervals are not supported")
            # keep lit_val a literal: truncate(-1)/round(-2) consume it
            lit = (-pe.lit_val
                   if isinstance(pe.lit_val, (int, float))
                   and not isinstance(pe.lit_val, bool) else None)
            return replace(pe, col=-pe.col, lit_val=lit)
        return self._postfix()

    # -- postfix: .prop / .fn(args) / interval units -------------------
    def _postfix(self) -> PE:
        pe = self._primary()
        while self._eat_op("."):
            name_t = self._next()
            if name_t.kind != "ident":
                raise ValueError(
                    f"expected a name after '.' at {name_t.pos} "
                    f"in {self.text!r}")
            name = name_t.text
            # interval / row-count literal: 10.minutes, 2.rows
            if pe.lit_val is not None and isinstance(pe.lit_val, int):
                if name in _UNITS:
                    pe = PE(interval=(pe.lit_val, _UNITS[name]))
                    continue
                if name in ("rows", "row"):
                    pe = PE(rows=pe.lit_val)
                    continue
            pe = self._apply_suffix(pe, name)
        return pe

    def _apply_suffix(self, pe: PE, name: str) -> PE:
        # window-alias properties resolved by the Table layer
        if pe.wref is not None:
            if self.wprop is None:
                raise ValueError(
                    f"window alias {pe.wref!r} is not valid here "
                    f"({self.text!r})")
            return PE(col=self.wprop(pe.wref, name))
        has_args = self._peek() and self._peek().kind == "op" \
            and self._peek().text == "("
        if name == "cast":
            self._expect_op("(")
            ty = self._next()
            if ty.kind != "ident" or ty.text.upper() not in _CAST_TYPES:
                raise ValueError(f"unsupported cast type in {self.text!r}")
            spark_ty = _CAST_TYPES[ty.text.upper()]
            if self._eat_op("("):  # DECIMAL(p, s) / TIMESTAMP(3)
                p = self._next().text
                s = "0"
                if self._eat_op(","):
                    s = self._next().text
                self._expect_op(")")
                if spark_ty == "decimal":
                    spark_ty = f"decimal({p},{s})"
            elif spark_ty == "decimal":
                spark_ty = "decimal(10,0)"
            self._expect_op(")")
            return replace(pe, col=pe.col.cast(spark_ty), name=None)
        if name in ("as", "alias"):
            self._expect_op("(")
            a = self._next()
            self._expect_op(")")
            val = a.text[1:-1].replace("''", "'") if a.kind == "str" else a.text
            return replace(pe, alias=val)
        if name in ("asc", "desc") and not has_args:
            return replace(pe, sort=name)
        if name == "distinct" and not has_args:
            # only directly under an aggregate: a.count.distinct
            raise ValueError(
                "use SQL for DISTINCT aggregates (documented delta)")
        if name == "flatten":
            # Flink's flatten expands a composite (ROW) field into its
            # flat fields — a MULTI-column select item, resolved at the
            # Table.select layer (Spark ``col.*``); field names follow
            # Spark's convention (bare field names, not Flink's a$f0).
            if has_args and self._parse_args():
                raise ValueError("flatten takes no arguments")
            if pe.name is None:
                raise ValueError(
                    "flatten applies to a direct composite field "
                    "reference (Spark: select 'col.*')")
            return replace(pe, flatten=True)
        if not has_args:
            if name in _SUFFIX0:
                return replace(pe, col=_SUFFIX0[name](pe.col), name=None)
            if name in _AGG_SUFFIX:
                if pe.name == "*":  # *.count == COUNT(*)
                    if name != "count":
                        raise ValueError(f"only count applies to * "
                                         f"({self.text!r})")
                    return PE(col=F.count(F.lit(1)), is_agg=True)
                names = [pe.name] if pe.name else list(pe.agg_names)
                return PE(col=_AGG_SUFFIX[name](pe.col), is_agg=True,
                          agg_names=names)
            raise ValueError(f"unknown property .{name} in {self.text!r}")
        # method with args
        args = self._parse_args()
        return self._call_method(pe, name, args)

    def _parse_args(self) -> list[PE]:
        self._expect_op("(")
        if self._eat_op(")"):
            return []
        args = [self._expr()]
        while self._eat_op(","):
            args.append(self._expr())
        self._expect_op(")")
        return args

    def _call_method(self, pe: PE, name: str, args: list[PE]) -> PE:
        c = pe.col
        a = [x.col for x in args]

        def out(col: Column) -> PE:
            return PE(col=col,
                      is_agg=pe.is_agg or any(x.is_agg for x in args),
                      agg_names=pe.agg_names
                      + [n for x in args for n in x.agg_names])

        if name == "substring":
            if len(args) == 1:
                return out(c.substr(a[0], F.length(c)))
            return out(c.substr(a[0], a[1]))
        if name == "like":
            return out(c.like(args[0].lit_val))
        if name == "similar":
            return out(c.rlike(args[0].lit_val))
        if name == "in":
            vals = [x.lit_val if x.lit_val is not None else x.col
                    for x in args]
            return out(c.isin(*vals))
        if name == "between":
            return out(c.between(a[0], a[1]))
        if name == "notBetween":
            return out(~c.between(a[0], a[1]))
        if name == "round":
            return out(F.round(c, args[0].lit_val))
        if name == "power":
            return out(F.pow(c, a[0]))
        if name == "mod":
            return out(c % a[0])
        if name == "log":
            return out(F.log(float(args[0].lit_val), c))
        if name == "truncate":
            # round toward ZERO (Flink TRUNCATE): floor for positives,
            # ceil for negatives — bare floor would send -1.23 to -1.3.
            # Computed on the DECIMAL rendering of the value (Flink's
            # SqlFunctions.struncate is BigDecimal-based): scaling the
            # binary double directly yields 0.29*100 = 28.999..., so
            # truncate(0.29, 2) would drop to 0.28.  Spark's double →
            # decimal cast goes through Double.toString (shortest
            # decimal form), matching BigDecimal.valueOf semantics.
            n = args[0].lit_val if args else 0
            d = c.cast("decimal(38,18)")
            if n >= 0:
                p = F.lit(10 ** n).cast("decimal(20,0)")
                return out(
                    F.when(c >= 0, F.floor(d * p) / p)
                    .otherwise(F.ceil(d * p) / p)
                    .cast("double")
                )
            # negative scale: 10**n is a fractional float whose
            # decimal(20,0) rendering is 0 (division by zero under
            # ANSI) — divide by the integer power instead.
            q = F.lit(10 ** (-n)).cast("decimal(20,0)")
            return out(
                F.when(c >= 0, F.floor(d / q) * q)
                .otherwise(F.ceil(d / q) * q)
                .cast("double")
            )
        if name == "position":
            return out(F.instr(a[0], c))
        if name == "regexpReplace":
            return out(F.regexp_replace(c, args[0].lit_val, args[1].lit_val))
        if name == "regexpExtract":
            idx = args[1].lit_val if len(args) > 1 else 0
            return out(F.regexp_extract(c, args[0].lit_val, idx))
        if name == "replace":
            repl = args[1].lit_val.replace("\\", "\\\\").replace("$", r"\$")
            return out(F.regexp_replace(c, re.escape(args[0].lit_val), repl))
        if name in ("lpad", "rpad"):
            fn = F.lpad if name == "lpad" else F.rpad
            return out(fn(c, args[0].lit_val, args[1].lit_val))
        if name == "repeat":
            return out(F.repeat(c, args[0].lit_val))
        if name == "at":
            # 1-based array/map access (Flink AT); get() avoids ANSI OOB
            return out(F.get(c, a[0] - F.lit(1)))
        if name == "element":
            return out(F.get(c, F.lit(0)))
        if name == "cardinality":
            return out(F.size(c))
        if name == "ifNull":
            return out(F.coalesce(c, a[0]))
        raise ValueError(f"unknown method .{name}(...) in {self.text!r}")

    # -- primary -------------------------------------------------------
    def _primary(self) -> PE:
        t = self._next()
        if t.kind == "num":
            if "." in t.text:
                return PE(col=F.lit(float(t.text)), lit_val=float(t.text))
            return PE(col=F.lit(int(t.text)), lit_val=int(t.text))
        if t.kind == "str":
            v = t.text[1:-1].replace("''", "'")
            return PE(col=F.lit(v), lit_val=v, is_str=True)
        if t.kind == "op":
            if t.text == "(":
                pe = self._expr()
                self._expect_op(")")
                return pe
            if t.text == "*":
                return PE(name="*")
            raise ValueError(
                f"unexpected {t.text!r} at {t.pos} in {self.text!r}")
        # identifier
        low = t.text.lower()
        if low == "true":
            return PE(col=F.lit(True), lit_val=True)
        if low == "false":
            return PE(col=F.lit(False), lit_val=False)
        if low == "null":
            return PE(col=F.lit(None))
        nxt = self._peek()
        if nxt and nxt.kind == "op" and nxt.text == "(":
            # prefix function call
            name = t.text
            args = self._parse_args()
            if name == "if":
                if len(args) != 3:
                    raise ValueError("if(cond, then, else) takes 3 args")
                col = F.when(args[0].col, args[1].col).otherwise(args[2].col)
                return PE(col=col, is_agg=any(x.is_agg for x in args),
                          agg_names=[n for x in args for n in x.agg_names])
            if name in _PREFIX:
                return PE(col=_PREFIX[name](*[x.col for x in args]),
                          is_agg=any(x.is_agg for x in args),
                          agg_names=[n for x in args for n in x.agg_names])
            # registered-function fallback (PyFlink: udfs called by name
            # inside expression strings); resolution/typo errors surface
            # at Catalyst analysis, same as Flink's late binding
            return PE(col=F.call_udf(name, *[x.col for x in args]),
                      is_agg=any(x.is_agg for x in args),
                      agg_names=[n for x in args for n in x.agg_names])
        if self.resolver is not None:
            r = self.resolver(t.text)
            if r is not None:
                return r
        return PE(col=F.col(t.text), name=t.text)
