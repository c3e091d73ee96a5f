"""Declared entries exercising the fluent Table API façade end-to-end.

Each entry builds its query exclusively through ``table_api.Table``
with Flink 1.11 expression strings (the PyFlink user surface —
flink-python/pyflink/table/table.py), so the driver's DuckDB oracle
verifies the façade's parsing + delegation, not just the underlying
DataFrame ops.

Cross-engine contract rules applied (CLAUDE.md): integer-cents
measures via ``(x * 100).floor.cast(LONG)`` (floor is IEEE-correct on
both engines; bare double→bigint casts disagree), outer
``cast(... as bigint)`` on DuckDB sums (HUGEINT), and a deterministic
total ORDER BY on every entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from ..table_api import Over, Table, Tumble
from . import registry


def _t(spark: SparkSession, sf_dir: str, name: str) -> Table:
    return Table(catalog.load_table(spark, sf_dir, name))


# ------------------------------------------------- filter + group + agg

def tapi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (
        _t(spark, sf_dir, "orders")
        .filter("o_totalprice > 150000.0")
        .group_by("o_orderpriority")
        .select("o_orderpriority, *.count as n, "
                "(o_totalprice * 100).floor.cast(LONG).sum as cents")
        .order_by("o_orderpriority.asc")
    )
    return out.df


TAPI_AGG_ORACLE = """
SELECT o_orderpriority,
       cast(count(*) as bigint) n,
       cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint) cents
FROM orders
WHERE o_totalprice > 150000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------------- tumble window

def tapi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (
        _t(spark, sf_dir, "events")
        .window(Tumble.over("1.hours").on("ts").alias("w"))
        .group_by("w, event_type")
        .select("event_type, w.start.cast(STRING) as wstart, "
                "*.count as n, "
                "(value * 100).floor.cast(LONG).sum as v_cents")
        .order_by("wstart.asc, event_type.asc")
    )
    return out.df


TAPI_WINDOW_ORACLE = """
WITH events_ms AS (
  SELECT * REPLACE (cast(date_trunc('milliseconds', ts) as timestamp) AS ts)
  FROM events)
SELECT event_type,
       cast(date_trunc('hour', ts) as string) wstart,
       cast(count(*) as bigint) n,
       cast(sum(cast(floor(value * 100) as bigint)) as bigint) v_cents
FROM events_ms
GROUP BY event_type, date_trunc('hour', ts)
ORDER BY wstart, event_type
"""


# ---------------------------------------------------------- over window

def tapi_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (
        _t(spark, sf_dir, "lineitem")
        .filter("l_orderkey < 1000")
        .over_window(
            Over.partition_by("l_orderkey").order_by("l_linenumber")
                .preceding("unbounded_row").alias("w"))
        .select("l_orderkey, l_linenumber, "
                "l_quantity.floor.cast(LONG).sum over w as run_qty")
        .order_by("l_orderkey.asc, l_linenumber.asc")
    )
    return out.df


TAPI_OVER_ORACLE = """
SELECT l_orderkey, l_linenumber,
       cast(sum(cast(floor(l_quantity) as bigint)) OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) run_qty
FROM lineitem
WHERE l_orderkey < 1000
ORDER BY l_orderkey, l_linenumber
"""


# ----------------------------------------------------- join + set ops

def tapi_join_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    building = (
        _t(spark, sf_dir, "customer")
        .filter("c_mktsegment = 'BUILDING'")
        .select("c_custkey")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_custkey")
        .alias("c_custkey")
        .distinct()
    )
    both = building.intersect(urgent).add_columns("'both' as tag")
    only = building.minus(urgent).add_columns("'building_only' as tag")
    return both.union_all(only).order_by("c_custkey.asc, tag.asc").df


TAPI_SETOPS_ORACLE = """
WITH building AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
urgent AS (
  SELECT DISTINCT o_custkey c_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT')
SELECT c_custkey, 'both' tag
FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM urgent)
UNION ALL
SELECT c_custkey, 'building_only' tag
FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM urgent)
ORDER BY c_custkey, tag
"""


def register_all() -> None:
    registry.register("x_tapi_agg", tapi_agg, TAPI_AGG_ORACLE)
    registry.register("x_tapi_window", tapi_window, TAPI_WINDOW_ORACLE)
    registry.register("x_tapi_over", tapi_over, TAPI_OVER_ORACLE)
    registry.register("x_tapi_join_setops", tapi_join_setops,
                      TAPI_SETOPS_ORACLE)
