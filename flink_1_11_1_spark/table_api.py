"""Fluent Table API façade (Flink 1.11 ``Table`` / PyFlink surface).

Reference parity: ``flink-table/flink-table-api-java/src/main/java/org/
apache/flink/table/api/Table.java`` (the fluent methods), its window
descriptors ``api/{Tumble,Slide,Session,Over}.java``, and the PyFlink
1.11 mirror ``flink-python/pyflink/table/table.py`` — the exact method
names and string-expression arguments a PyFlink 1.11 program uses:

    t = t_env.from_path("orders")
    (t.filter("amount > 2")
      .group_by("user_id")
      .select("user_id, amount.sum as total"))

    t.window(Tumble.over("10.minutes").on("rowtime").alias("w")) \
     .group_by("w, user_id") \
     .select("user_id, w.start, w.end, amount.sum as total")

Each call delegates 1:1 to the Spark DataFrame API (SURVEY.md §4.2:
Spark's LogicalPlan IS the QueryOperation layer), with expression
strings parsed by ``expr.ExprParser``.  No plan IR of our own; what
Catalyst sees is exactly what a hand-written DataFrame program builds,
so pushdown / codegen / AQE apply unchanged.

Deliberate deltas (documented): DISTINCT aggregates and UDTF joins go
through SQL; ``fetch`` without ``order_by`` is Spark's limit (row
order undefined, same caveat Flink documents).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

from .expr import PE, ExprParser, interval_str

__all__ = [
    "Table", "Tumble", "Slide", "Session", "Over",
    "TableSchema", "TableResult",
]


# ------------------------------------------------------- window descriptors

@dataclass
class GroupWindow:
    kind: str                  # tumble | slide | session | count
    alias: str
    on: str
    size: str | None = None    # interval string for window()/session_window
    slide: str | None = None
    rows: int | None = None    # count-window size


class _WindowBuilder:
    def __init__(self, kind: str):
        self._kind = kind
        self._size_pe: PE | None = None
        self._slide_pe: PE | None = None
        self._gap_pe: PE | None = None
        self._on: str | None = None

    def on(self, time_field: str) -> _WindowBuilder:
        self._on = ExprParser(time_field).parse_single().name or time_field
        return self

    def alias(self, name: str) -> GroupWindow:
        if self._on is None:
            raise ValueError("window needs .on(<time attribute>)")
        if self._kind == "session":
            return GroupWindow("session", name, self._on,
                               size=interval_str(self._gap_pe))
        size = self._size_pe
        if size.rows is not None:
            if self._kind != "tumble":
                raise ValueError("row-count windows must be tumbling")
            return GroupWindow("count", name, self._on, rows=size.rows)
        if self._kind == "slide":
            return GroupWindow("slide", name, self._on,
                               size=interval_str(size),
                               slide=interval_str(self._slide_pe))
        return GroupWindow("tumble", name, self._on,
                           size=interval_str(size))


class Tumble:
    """``Tumble.over("10.minutes").on("ts").alias("w")`` — also accepts
    ``over("5.rows")`` for count windows (KeyedStream.countWindow)."""

    @staticmethod
    def over(size: str) -> _WindowBuilder:
        b = _WindowBuilder("tumble")
        b._size_pe = ExprParser(size).parse_single()
        return b


class Slide:
    @staticmethod
    def over(size: str) -> _WindowBuilder:
        b = _WindowBuilder("slide")
        b._size_pe = ExprParser(size).parse_single()
        return b


# .every() belongs to Slide's builder only
def _slide_every(self: _WindowBuilder, slide: str) -> _WindowBuilder:
    self._slide_pe = ExprParser(slide).parse_single()
    return self


_WindowBuilder.every = _slide_every


class Session:
    @staticmethod
    def with_gap(gap: str) -> _WindowBuilder:
        b = _WindowBuilder("session")
        b._gap_pe = ExprParser(gap).parse_single()
        return b


@dataclass
class OverWindow:
    alias: str
    partition_by: list[str]
    order_by: str
    preceding: PE | str
    following: PE | str


class _OverBuilder:
    def __init__(self):
        self._partition: list[str] = []
        self._order: str | None = None
        self._preceding: PE | str = "unbounded_range"
        self._following: PE | str | None = None

    def partition_by(self, fields: str) -> _OverBuilder:
        self._partition = [pe.name for pe in ExprParser(fields).parse_items()]
        return self

    def order_by(self, field: str) -> _OverBuilder:
        self._order = ExprParser(field).parse_single().name or field
        return self

    def preceding(self, spec: str) -> _OverBuilder:
        self._preceding = _over_bound(spec)
        return self

    def following(self, spec: str) -> _OverBuilder:
        self._following = _over_bound(spec)
        return self

    def alias(self, name: str) -> OverWindow:
        if self._order is None:
            raise ValueError("OVER window needs .order_by(<time attribute>)")
        following = self._following
        if following is None:
            pre = self._preceding
            is_rows = isinstance(pre, PE) and pre.rows is not None \
                or pre == "unbounded_row"
            following = "current_row" if is_rows else "current_range"
        return OverWindow(name, self._partition, self._order,
                          self._preceding, following)


def _over_bound(spec: str) -> PE | str:
    low = spec.strip().lower()
    if low in ("unbounded_range", "unbounded_row",
               "current_range", "current_row"):
        return low
    return ExprParser(spec).parse_single()


class Over:
    @staticmethod
    def partition_by(fields: str) -> _OverBuilder:
        return _OverBuilder().partition_by(fields)

    @staticmethod
    def order_by(field: str) -> _OverBuilder:
        return _OverBuilder().order_by(field)


# ------------------------------------------------------------- schema/result

class TableSchema:
    """``TableSchema`` shape: field names + data types (Spark types)."""

    def __init__(self, df: DataFrame):
        self._schema = df.schema

    def get_field_names(self) -> list[str]:
        return [f.name for f in self._schema.fields]

    def get_field_data_types(self) -> list:
        return [f.dataType for f in self._schema.fields]

    def __str__(self) -> str:
        return "\n".join(
            f"{f.name}: {f.dataType.simpleString()}"
            for f in self._schema.fields)


class TableResult:
    """FLIP-84 ``TableResult``: iterate, print, or inspect a result."""

    def __init__(self, df: DataFrame):
        self._df = df

    def collect(self):
        return iter(self._df.collect())

    def print(self) -> None:  # noqa: A003 - Flink method name
        self._df.show(truncate=False)

    def get_table_schema(self) -> TableSchema:
        return TableSchema(self._df)


# --------------------------------------------------------------------- Table

def _auto_alias(pe: PE, i: int) -> str:
    return pe.alias or pe.name or f"EXPR${i}"


def _finalize(pe: PE, i: int) -> Column:
    col = pe.col
    if pe.sort:
        col = col.asc() if pe.sort == "asc" else col.desc()
        return col  # sort markers never get aliases
    if pe.alias:
        return col.alias(pe.alias)
    if pe.name is None:
        return col.alias(f"EXPR${i}")
    return col


class Table:
    """Fluent façade over a Spark DataFrame (Flink ``Table``)."""

    def __init__(self, df: DataFrame, tenv=None):
        self.df = df
        self._tenv = tenv

    def _wrap(self, df: DataFrame) -> Table:
        return Table(df, self._tenv)

    def _items(self, fields: str, **kw) -> list[PE]:
        return ExprParser(fields, **kw).parse_items()

    # -- projection / filter ------------------------------------------
    def select(self, fields: str) -> Table:
        items = self._items(fields)
        if any(pe.is_agg for pe in items):
            bad = [pe for pe in items
                   if not pe.is_agg and pe.lit_val is None]
            if bad:
                raise ValueError(
                    "select with aggregates and non-aggregate fields "
                    "requires group_by (Flink: ExpressionResolver error)")
            aggs = [_finalize(pe, i) for i, pe in enumerate(items)]
            return self._wrap(self.df.agg(*aggs))
        cols = []
        for i, pe in enumerate(items):
            if pe.name == "*":
                cols.append(F.col("*"))
            elif pe.flatten:
                # Flink flatten: expand the composite field into all of
                # its fields (one select item → N output columns)
                cols.append(F.col(f"{pe.name}.*"))
            else:
                cols.append(_finalize(pe, i))
        return self._wrap(self.df.select(*cols))

    def alias(self, fields: str) -> Table:
        names = [pe.name for pe in self._items(fields)]
        if len(names) != len(self.df.columns):
            raise ValueError(
                f"alias needs {len(self.df.columns)} names, got {len(names)}")
        return self._wrap(self.df.toDF(*names))

    def filter(self, predicate: str | Column) -> Table:
        if isinstance(predicate, Column):
            return self._wrap(self.df.filter(predicate))
        return self._wrap(
            self.df.filter(ExprParser(predicate).parse_single().col))

    where = filter

    def distinct(self) -> Table:
        return self._wrap(self.df.distinct())

    # -- grouping ------------------------------------------------------
    def group_by(self, fields: str) -> GroupedTable:
        return GroupedTable(self, self._items(fields))

    # -- joins ---------------------------------------------------------
    def _join(self, right: Table, predicate: str | Column | None,
              how: str) -> Table:
        dupes = sorted(set(self.df.columns) & set(right.df.columns))
        if dupes:
            raise ValueError(
                f"ambiguous fields across join inputs: {dupes} "
                "(Flink requires unique names; rename with .alias())")
        if predicate is None:
            cond = F.lit(True)
        elif isinstance(predicate, Column):
            cond = predicate
        else:
            cond = ExprParser(predicate).parse_single().col
        return self._wrap(self.df.join(right.df, cond, how))

    def join(self, right: Table, predicate: str | Column | None = None,
             ) -> Table:
        return self._join(right, predicate, "inner")

    def left_outer_join(self, right: Table,
                        predicate: str | Column | None = None) -> Table:
        return self._join(right, predicate, "left")

    def right_outer_join(self, right: Table,
                         predicate: str | Column | None = None) -> Table:
        return self._join(right, predicate, "right")

    def full_outer_join(self, right: Table,
                        predicate: str | Column | None = None) -> Table:
        return self._join(right, predicate, "full")

    def _join_lateral(self, call: str, how: str) -> Table:
        import re

        m = re.match(
            r"^\s*(\w+)\s*\((.*?)\)\s*"
            r"(?:[aA][sS]\s*\(\s*([\w\s,]+?)\s*\)\s*)?$", call, re.S)
        if not m:
            raise ValueError(
                "join_lateral expects 'fn(args) [as (c1, c2, ...)]'")
        name, args, aliases = m.group(1), m.group(2), m.group(3)
        spark = self.df.sparkSession
        view = "__tapi_lateral_src"
        self.df.createOrReplaceTempView(view)
        lat = f"LATERAL (SELECT * FROM {name}({args})) __lat"
        if how == "inner":
            sql = f"SELECT {view}.*, __lat.* FROM {view}, {lat}"
        else:
            sql = (f"SELECT {view}.*, __lat.* FROM {view} "
                   f"LEFT OUTER JOIN {lat} ON true")
        try:
            out = spark.sql(sql)
        finally:
            spark.catalog.dropTempView(view)
        if aliases:
            names = [a.strip() for a in aliases.split(",")]
            new_cols = out.columns[len(self.df.columns):]
            if len(names) != len(new_cols):
                raise ValueError(
                    f"alias arity {len(names)} != function arity "
                    f"{len(new_cols)}")
            for old, new in zip(new_cols, names):
                out = out.withColumnRenamed(old, new)
        return self._wrap(out)

    def join_lateral(self, call: str) -> Table:
        """``Table.joinLateral("split(line) as (word, cnt)")`` — the
        UDTF correlate (Flink LATERAL TABLE); the function must be
        registered via ``TableEnvironment.register_function``.  Args
        are spliced as SQL (column refs / literals)."""
        return self._join_lateral(call, "inner")

    def left_outer_join_lateral(self, call: str) -> Table:
        """As ``join_lateral`` but rows with no UDTF output survive
        with NULLs (Flink leftOuterJoinLateral)."""
        return self._join_lateral(call, "left")

    # -- set operations ------------------------------------------------
    def union(self, right: Table) -> Table:
        return self._wrap(self.df.union(right.df).distinct())

    def union_all(self, right: Table) -> Table:
        return self._wrap(self.df.union(right.df))

    def intersect(self, right: Table) -> Table:
        return self._wrap(self.df.intersect(right.df))

    def intersect_all(self, right: Table) -> Table:
        return self._wrap(self.df.intersectAll(right.df))

    def minus(self, right: Table) -> Table:
        return self._wrap(self.df.subtract(right.df))

    def minus_all(self, right: Table) -> Table:
        return self._wrap(self.df.exceptAll(right.df))

    # -- ordering / paging ---------------------------------------------
    def order_by(self, fields: str) -> Table:
        cols = [_finalize(pe, i)
                for i, pe in enumerate(self._items(fields))]
        return self._wrap(self.df.orderBy(*cols))

    def offset(self, n: int) -> Table:
        return self._wrap(self.df.offset(n))

    def fetch(self, n: int) -> Table:
        return self._wrap(self.df.limit(n))

    limit = fetch

    # -- column surgery ------------------------------------------------
    def add_columns(self, fields: str) -> Table:
        df = self.df
        for i, pe in enumerate(self._items(fields)):
            name = _auto_alias(pe, i)
            if name in df.columns:
                raise ValueError(
                    f"add_columns: {name!r} exists "
                    "(use add_or_replace_columns)")
            df = df.withColumn(name, pe.col)
        return self._wrap(df)

    def add_or_replace_columns(self, fields: str) -> Table:
        df = self.df
        for i, pe in enumerate(self._items(fields)):
            df = df.withColumn(_auto_alias(pe, i), pe.col)
        return self._wrap(df)

    def rename_columns(self, fields: str) -> Table:
        df = self.df
        for pe in self._items(fields):
            if not pe.name or not pe.alias:
                raise ValueError("rename_columns needs 'old as new' items")
            df = df.withColumnRenamed(pe.name, pe.alias)
        return self._wrap(df)

    def drop_columns(self, fields: str) -> Table:
        names = [pe.name for pe in self._items(fields)]
        return self._wrap(self.df.drop(*names))

    # -- windows -------------------------------------------------------
    def window(self, window: GroupWindow) -> GroupWindowedTable:
        return GroupWindowedTable(self, window)

    def over_window(self, *windows: OverWindow) -> OverWindowedTable:
        return OverWindowedTable(self, list(windows))

    # -- execution / introspection -------------------------------------
    def get_schema(self) -> TableSchema:
        return TableSchema(self.df)

    def print_schema(self) -> None:
        print(str(self.get_schema()))

    def to_pandas(self):
        return self.df.toPandas()

    def execute(self) -> TableResult:
        return TableResult(self.df)

    def explain(self) -> str:
        qe = self.df._jdf.queryExecution()
        return ("== Optimized Logical Plan ==\n"
                + qe.optimizedPlan().toString()
                + "\n== Physical Plan ==\n"
                + qe.executedPlan().toString())

    def execute_insert(self, table_path: str,
                       overwrite: bool = False) -> TableResult:
        """INSERT this table's rows into a declared sink (FLIP-84
        ``Table.executeInsert``) — routed through the DDL front door so
        declared-sink semantics (NOT NULL, partitioning) apply."""
        if self._tenv is None:
            raise ValueError("execute_insert needs a TableEnvironment-"
                             "created Table")
        view = "__table_api_insert_src"
        self.df.createOrReplaceTempView(view)
        verb = "OVERWRITE" if overwrite else "INTO"
        try:
            self._tenv.execute_sql(
                f"INSERT {verb} {table_path} SELECT * FROM {view}")
        finally:
            self._tenv.spark.catalog.dropTempView(view)
        return TableResult(self.df)

    insert_into = execute_insert


# ------------------------------------------------------------ grouped select

class GroupedTable:
    def __init__(self, table: Table, key_items: list[PE]):
        self._table = table
        self._keys = key_items

    def select(self, fields: str) -> Table:
        df = self._table.df
        key_cols, key_names = [], set()
        for i, pe in enumerate(self._keys):
            name = _auto_alias(pe, i)
            key_cols.append(pe.col.alias(name))
            key_names.add(name)
        items = ExprParser(fields).parse_items()
        agg_cols, final = [], []
        for i, pe in enumerate(items):
            if pe.is_agg:
                name = _auto_alias(pe, i)
                agg_cols.append(pe.col.alias(name))
                final.append(F.col(name))
            else:
                final.append(_finalize(pe, i))
        if not agg_cols:
            # Flink allows key-only select after group_by == DISTINCT keys
            return self._table._wrap(
                df.groupBy(*key_cols).agg(F.count(F.lit(1))).select(*final))
        return self._table._wrap(
            df.groupBy(*key_cols).agg(*agg_cols).select(*final))


# ----------------------------------------------------------- group windows

_STRUCT_NAME = {"tumble": "window", "slide": "window",
                "session": "session_window"}


class GroupWindowedTable:
    def __init__(self, table: Table, window: GroupWindow):
        self._table = table
        self._window = window

    def group_by(self, fields: str) -> WindowGroupedTable:
        items = ExprParser(fields).parse_items()
        keys = [pe for pe in items if pe.name != self._window.alias]
        if len(keys) == len(items):
            raise ValueError(
                f"group_by must include the window alias "
                f"{self._window.alias!r}")
        return WindowGroupedTable(self._table, self._window, keys)


class WindowGroupedTable:
    def __init__(self, table: Table, window: GroupWindow, keys: list[PE]):
        self._table = table
        self._window = window
        self._keys = keys

    def select(self, fields: str) -> Table:
        w = self._window
        df = self._table.df
        key_cols = []
        for i, pe in enumerate(self._keys):
            key_cols.append(pe.col.alias(_auto_alias(pe, i)))
        if w.kind == "count":
            from .operators.windows import count_tumble
            names = [_auto_alias(pe, i) for i, pe in enumerate(self._keys)]
            df = count_tumble(df, names, w.rows, order=[w.on])
            group = [F.col("count_window"), *key_cols]
            struct = None
        else:
            if w.kind == "tumble":
                wcol = F.window(w.on, w.size)
            elif w.kind == "slide":
                wcol = F.window(w.on, w.size, w.slide)
            else:
                wcol = F.session_window(w.on, w.size)
            # group by the window STRUCT itself (never its .start
            # projection — that drops the event-time metadata)
            group = [wcol, *key_cols]
            struct = _STRUCT_NAME[w.kind]

        def wprop(alias: str, prop: str) -> Column:
            if struct is None:
                raise ValueError(
                    "count windows have no time bounds; select the "
                    f"bare alias {w.alias!r} for the window index")
            if prop == "start":
                return F.col(f"{struct}.start")
            if prop == "end":
                return F.col(f"{struct}.end")
            if prop in ("rowtime", "proctime"):
                return F.col(f"{struct}.end") - F.expr(
                    "INTERVAL '0.001' SECOND")
            raise ValueError(f"unknown window property {prop!r}")

        def resolver(name: str) -> PE | None:
            if name == w.alias:
                if w.kind == "count":
                    # the bare alias IS the per-key window index
                    return PE(col=F.col("count_window"))
                return PE(wref=name)
            return None

        items = ExprParser(fields, resolver=resolver,
                           wprop=wprop).parse_items()
        agg_cols, final = [], []
        for i, pe in enumerate(items):
            if pe.wref is not None:
                raise ValueError(
                    f"select the window via {pe.wref}.start / .end")
            if pe.is_agg:
                name = _auto_alias(pe, i)
                agg_cols.append(pe.col.alias(name))
                final.append(F.col(name))
            else:
                final.append(_finalize(pe, i))
        out = df.groupBy(*group).agg(*agg_cols) if agg_cols else \
            df.groupBy(*group).agg(F.count(F.lit(1)))
        return self._table._wrap(out.select(*final))


# ------------------------------------------------------------- over windows

class OverWindowedTable:
    def __init__(self, table: Table, windows: list[OverWindow]):
        self._table = table
        self._windows = {w.alias: w for w in windows}

    def _spec(self, w: OverWindow) -> WindowSpec:
        base = Window.partitionBy(*w.partition_by) if w.partition_by \
            else Window.partitionBy()

        def ms(col: str) -> Column:
            return (F.col(col).cast("timestamp").cast("double")
                    * 1000).cast("long")

        pre, fol = w.preceding, w.following
        pre_rows = isinstance(pre, PE) and pre.rows is not None
        pre_ivl = isinstance(pre, PE) and pre.interval is not None
        fol_rows = isinstance(fol, PE) and fol.rows is not None
        fol_ivl = isinstance(fol, PE) and fol.interval is not None

        def str_bound(s: str):
            return Window.unboundedPreceding if s.startswith("unbounded") \
                else Window.currentRow

        if pre == "unbounded_row" or pre_rows or fol_rows:
            lo = str_bound(pre) if isinstance(pre, str) else -pre.rows
            hi = fol.rows if fol_rows else Window.currentRow
            return base.orderBy(w.order_by).rowsBetween(lo, hi)
        if pre_ivl or fol_ivl:
            to_ms = {"millisecond": 1, "second": 1000, "minute": 60_000,
                     "hour": 3_600_000, "day": 86_400_000}

            def bound(pe: PE) -> int:
                n, unit = pe.interval
                if unit not in to_ms:
                    raise ValueError(
                        f"RANGE OVER interval unit {unit!r} unsupported")
                return n * to_ms[unit]

            lo = str_bound(pre) if isinstance(pre, str) else -bound(pre)
            hi = bound(fol) if fol_ivl else Window.currentRow
            return base.orderBy(ms(w.order_by)).rangeBetween(lo, hi)
        # unbounded_range / current_range defaults
        return base.orderBy(w.order_by).rangeBetween(
            str_bound(pre), Window.currentRow)

    def select(self, fields: str) -> Table:
        specs = {a: self._spec(w) for a, w in self._windows.items()}
        items = ExprParser(fields).parse_items()
        cols = []
        for i, pe in enumerate(items):
            if pe.over is not None:
                if pe.over not in specs:
                    raise ValueError(f"unknown OVER window {pe.over!r}")
                col = pe.col.over(specs[pe.over])
                cols.append(col.alias(_auto_alias(pe, i)))
            else:
                cols.append(_finalize(pe, i))
        return self._table._wrap(self._table.df.select(*cols))
