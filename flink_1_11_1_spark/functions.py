"""Flink built-in functions absent from Spark (SURVEY.md §3.10 gaps).

Reference parity: FlinkSqlOperatorTable / BuiltInFunctionDefinitions,
runtime bodies in SqlFunctionUtils.java / SqlDateTimeUtils.java.  Spark
covers the whole 1.11 library natively except the ~10 names below; each
is a thin JVM-expression alias (no UDFs — everything stays inside
codegen).  ``register_flink_functions`` exposes the SQL names via Spark
SQL-macro UDFs so ``engine.sql("SELECT SPLIT_INDEX(...)")`` works.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# ----------------------------------------------------------- python API


def split_index(s: Column | str, sep: str, index: int) -> Column:
    """SPLIT_INDEX(s, sep, i) — 0-based field extract, NULL past the end
    (Flink semantics; plain ``[i]`` would *error* under Spark 4 ANSI mode)."""
    return F.get(F.split(F.col(s) if isinstance(s, str) else s, _lit_escape(sep)), index)


def rand_integer(n: int | Column, seed: int | None = None) -> Column:
    """RAND_INTEGER(n): uniform int in [0, n)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * (F.lit(n) if isinstance(n, int) else n)).cast("int")


# Flink's IS_* checks are Character.isLetter/isDigit per char (unicode)
# and parseable-decimal (signed) — the old ASCII/unsigned regexes
# diverged (round-13 review)
def is_alpha(s: Column | str) -> Column:
    return _c(s).rlike(r"^\p{L}+$")


def is_digit(s: Column | str) -> Column:
    return _c(s).rlike(r"^\p{Nd}+$")


def is_decimal(s: Column | str) -> Column:
    return _c(s).rlike(r"^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)$")


def proctime() -> Column:
    """PROCTIME(): evaluated once per (micro-)batch plan, not per record —
    the documented semantic delta (SURVEY.md §8.3 item 4)."""
    return F.current_timestamp()


def sum0(col: Column | str) -> Column:
    """SUM0: sum that yields 0 (not NULL) on empty/all-null input."""
    return F.coalesce(F.sum(_c(col)), F.lit(0))


def ceil_to(ts: Column | str, unit: str) -> Column:
    """CEIL(ts TO unit): next unit boundary unless already aligned."""
    t = _c(ts)
    floored = F.date_trunc(unit, t)
    return F.when(floored == t, t).otherwise(floored + F.expr(f"INTERVAL 1 {unit}"))


def _c(s: Column | str) -> Column:
    return F.col(s) if isinstance(s, str) else s


def _lit_escape(sep: str) -> str:
    """split() takes a regex; Flink SPLIT_INDEX takes a literal."""
    import re

    return re.escape(sep)


def overlaps(
    a_start: Column | str, a_end: Column | str, b_start: Column | str, b_end: Column | str
) -> Column:
    """SQL-standard (a_start, a_end) OVERLAPS (b_start, b_end) — Flink
    supports the literal syntax, Spark does not (found by the §3.10
    inventory test).  SQL OVERLAPS normalizes each pair with
    least/greatest before comparing (Calcite does the same) — reversed
    bounds are legal input (round-13 review)."""
    a_lo, a_hi = F.least(_c(a_start), _c(a_end)), F.greatest(_c(a_start), _c(a_end))
    b_lo, b_hi = F.least(_c(b_start), _c(b_end)), F.greatest(_c(b_start), _c(b_end))
    return (a_lo <= b_hi) & (b_lo <= a_hi)


def collect_multiset(col: str, element_type: str = "string") -> Column:
    """COLLECT aggregate → MULTISET convention (SURVEY.md §2.2): Spark
    has no MULTISET type; the engine convention is ``map<value, count>``.
    Implemented as a fold over one collect_list (order-independent, so
    safe despite collect_list's nondeterministic ordering).
    ``element_type`` is the element's DDL type (for the empty-map seed)."""
    return F.expr(
        f"""aggregate(
              collect_list({col}),
              cast(map() as map<{element_type}, int>),
              (acc, x) -> map_concat(
                  map_filter(acc, (k, c) -> NOT (k <=> x)),
                  map(x, CASE WHEN map_contains_key(acc, x)
                              THEN element_at(acc, x) + 1 ELSE 1 END)))"""
    )


def to_time_millis(ts: Column | str) -> Column:
    """TIME type convention (SURVEY.md §2.2): Spark has no TIME; the
    engine represents time-of-day as INT milliseconds since midnight."""
    t = _c(ts)
    return (
        (F.hour(t) * 3600_000 + F.minute(t) * 60_000 + F.second(t) * 1000)
        # pmod: Spark % follows the dividend sign, so a pre-epoch
        # fractional second went NEGATIVE (round-13 review)
        + F.pmod(F.unix_micros(t), F.lit(1_000_000)) / 1000
    ).cast("int")


# Flink's operations over the two convention-mapped types ([t-common]
# types/logical/ TimeType, MultisetType — round 7, making the
# round-1 "mapped by convention" rows executable end-to-end):
# TIME literals/rendering over INT millis-of-day, and the MULTISET
# function library over map<value, count>.


def time_literal_millis(text: str) -> int:
    """``TIME '10:30:00.500'`` → millis-of-day (driver-side literal
    helper; comparisons are then plain INT comparisons)."""
    parts = text.strip().split(":")
    if len(parts) != 3:
        raise ValueError(f"not a TIME literal: {text!r}")
    h, m = int(parts[0]), int(parts[1])
    if "." in parts[2]:
        s, frac = parts[2].split(".")
        ms = int((frac + "000")[:3])
    else:
        s, ms = parts[2], 0
    if not (0 <= h < 24 and 0 <= m < 60 and 0 <= int(s) < 60):
        raise ValueError(f"TIME out of range: {text!r}")
    return (h * 3600 + m * 60 + int(s)) * 1000 + ms


def time_format(millis: Column | str) -> Column:
    """INT millis-of-day → 'HH:mm:ss.SSS' string (the cast-to-STRING
    rendering Flink's TIME gives)."""
    t = _c(millis)
    return F.concat_ws(
        ":",
        F.lpad((t / 3600_000).cast("int").cast("string"), 2, "0"),
        F.lpad(((t / 60_000).cast("int") % 60).cast("string"), 2, "0"),
        F.concat(
            F.lpad(((t / 1000).cast("int") % 60).cast("string"), 2, "0"),
            F.lit("."),
            F.lpad((t % 1000).cast("int").cast("string"), 3, "0"),
        ),
    )


def multiset_cardinality(ms: Column | str) -> Column:
    """CARDINALITY(multiset): total element count incl. duplicates
    (sum of the count map's values)."""
    return F.expr(
        f"aggregate(map_values({_expr_str(ms)}), 0, (a, c) -> a + c)"
    )


def multiset_count_of(ms: Column | str, element: Column) -> Column:
    """``element_count`` access (Flink: ``multiset[element]``): how
    many times ``element`` occurs — 0 when absent."""
    return F.coalesce(F.element_at(_c(ms), element), F.lit(0))


def multiset_union(a: Column | str, b: Column | str) -> Column:
    """MULTISET UNION ALL: per-element count addition."""
    ea, eb = _expr_str(a), _expr_str(b)
    return F.expr(
        f"""map_concat(
              map_filter({ea}, (k, c) -> NOT map_contains_key({eb}, k)),
              map_filter({eb}, (k, c) -> NOT map_contains_key({ea}, k)),
              transform_values(
                map_filter({ea}, (k, c) -> map_contains_key({eb}, k)),
                (k, c) -> c + element_at({eb}, k)))"""
    )


def _expr_str(c: Column | str) -> str:
    if isinstance(c, str):
        return c
    raise TypeError(
        "multiset SQL-expression helpers take a COLUMN NAME string "
        "(they splice it into an expr); pass the column's name"
    )


# ------------------------------------------------------- SQL registration

_SQL_MACROS = {
    # name: (param list, body) — registered as SQL scalar UDFs
    # sep is LITERAL in Flink; Spark split() takes a regex -> escape every
    # non-alphanumeric char of sep before splitting
    "SPLIT_INDEX": (
        "s STRING, sep STRING, i INT",
        "STRING",
        r"get(split(s, regexp_replace(sep, '([^a-zA-Z0-9])', '\\\\$1'), -1), i)",
    ),
    "RAND_INTEGER": ("n INT", "INT", "cast(floor(rand() * n) as int)"),
    "IS_ALPHA": ("s STRING", "BOOLEAN", r"s rlike '^\\p{L}+$'"),
    "IS_DIGIT": ("s STRING", "BOOLEAN", r"s rlike '^\\p{Nd}+$'"),
    "IS_DECIMAL": ("s STRING", "BOOLEAN",
                   r"s rlike '^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)$'"),
    "PROCTIME": ("", "TIMESTAMP", "current_timestamp()"),
}


def register_flink_functions(spark: SparkSession) -> None:
    """Register the Flink-only SQL names as temporary SQL functions."""
    for name, (params, rtype, body) in _SQL_MACROS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {rtype} RETURN {body}"
        )


def single_value(col: Column | str) -> Column:
    """SINGLE_VALUE aggregate (Flink SqlSingleValueAggFunction): the
    group's one value; ERRORS if the group holds more than one ROW —
    including duplicate values and multiple NULLs, matching Flink's
    row-count (not distinct-value) gate.  Composed from count+raise_error
    since Spark has no equivalent."""
    c = _c(col)
    return F.when(
        F.count(F.lit(1)) > 1,
        F.raise_error(F.lit("SINGLE_VALUE: more than one row in group")),
    ).otherwise(F.first(c))  # first, not max: non-orderable types
    # (maps) are legal SINGLE_VALUE inputs; deterministic because the
    # >1-row case raises (round-13 review)
