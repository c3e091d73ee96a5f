"""Declared entries exercising the DataStream API façade end-to-end
(datastream.py) — the driver's DuckDB oracle proves the façade's keyed
operators, including the Arrow ``reduce`` fold path.

Determinism contracts: ``max_by`` ties break by the documented
deterministic column order (value desc, then the remaining columns
ascending — mirrored exactly in the oracle's ROW_NUMBER ordering);
``reduce`` folds in rowtime order with ``event_id`` as the rowtime, so
the concatenation equals DuckDB's ordered ``string_agg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession

from .. import catalog
from ..datastream import StreamExecutionEnvironment
from . import registry


def ds_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    events = catalog.load_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "event_type", "value")
    out = env.from_dataframe(events).key_by("user_id").max_by("value")
    return out.df.orderBy("user_id")


DS_MAXBY_ORACLE = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY value DESC, user_id, event_id, event_type) rn
  FROM events)
WHERE rn = 1
ORDER BY user_id
"""


def ds_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = StreamExecutionEnvironment.get_execution_environment(spark)
    events = catalog.load_table(spark, sf_dir, "events") \
        .filter("user_id % 7 = 0") \
        .select("user_id", "event_id", "event_type")
    out = (env.from_dataframe(events)
           .assign_timestamps_and_watermarks("event_id", "0 seconds")
           .key_by("user_id")
           .reduce(lambda a, b: Row(user_id=a.user_id,
                                    event_id=b.event_id,
                                    event_type=a.event_type
                                    + "|" + b.event_type)))
    return out.df.withColumnRenamed("event_type", "sig").orderBy("user_id")


DS_REDUCE_ORACLE = """
SELECT user_id,
       max(event_id) AS event_id,
       string_agg(event_type, '|' ORDER BY event_id) AS sig
FROM events
WHERE user_id % 7 = 0
GROUP BY user_id
ORDER BY user_id
"""


def register_all() -> None:
    registry.register("x_ds_maxby", ds_maxby, DS_MAXBY_ORACLE)
    registry.register("x_ds_reduce", ds_reduce, DS_REDUCE_ORACLE)
