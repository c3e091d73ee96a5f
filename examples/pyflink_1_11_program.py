"""A PyFlink 1.11 program, verbatim in shape (cf. the official Flink
1.11 Python Table API walkthrough and udf/window docs) — the ONLY
engine-specific line is the shim import.  Run:

    python examples/pyflink_1_11_program.py
"""

import flink_1_11_1_spark.pyflink_shim  # noqa: F401  <- the one new line

from pyflink.table import DataTypes, EnvironmentSettings, TableEnvironment
from pyflink.table.udf import udf, udtf
from pyflink.table.window import Tumble

settings = EnvironmentSettings.new_instance() \
    .in_streaming_mode().use_blink_planner().build()
t_env = TableEnvironment.create(settings)

# -- scalar UDF + fluent aggregation (udfs doc shape) -------------------
add = udf(lambda a, b: a + b,
          [DataTypes.BIGINT(), DataTypes.BIGINT()], DataTypes.BIGINT())
t_env.register_function("add", add)

orders = t_env.from_elements(
    [("Alice", 2, 1), ("Bob", 3, 2), ("Alice", 5, 3)],
    schema="name string, amount bigint, bonus bigint")
result = (orders
          .select("name, add(amount, bonus) as total")
          .group_by("name")
          .select("name, total.sum as spent")
          .order_by("name.asc"))
SPENT = {r.name: r.spent for r in result.execute().collect()}
assert SPENT == {"Alice": 11, "Bob": 5}

# -- UDTF word count (udtf doc shape) -----------------------------------
split = udtf(lambda line: [(w, 1) for w in line.split()],
             [DataTypes.STRING()],
             [DataTypes.STRING(), DataTypes.BIGINT()],
             field_names=["word", "cnt"])
t_env.register_function("split", split)
t_env.from_elements([("flink spark flink",)], schema="line string") \
    .df.createOrReplaceTempView("lines")
wc = t_env.execute_sql(
    "SELECT word, sum(cnt) c FROM lines, LATERAL split(line) "
    "GROUP BY word ORDER BY word").collect()
assert [(r.word, r.c) for r in wc] == [("flink", 2), ("spark", 1)]

# -- tumbling group window (table_api windows doc shape) ----------------
import datetime as dt

t0 = dt.datetime(2024, 1, 1)
clicks = t_env.from_elements(
    [("u1", t0 + dt.timedelta(minutes=m), v)
     for m, v in [(1, 10), (5, 20), (12, 30)]],
    schema="user string, rowtime timestamp, amount bigint")
windowed = (clicks
            .window(Tumble.over("10.minutes").on("rowtime").alias("w"))
            .group_by("w, user")
            .select("user, w.start as ws, amount.sum as total")
            .order_by("ws.asc"))
rows = list(windowed.execute().collect())
assert [r.total for r in rows] == [30, 30]

# -- DDL + INSERT INTO a declared filesystem sink (sql docs shape) ------
import tempfile

sink_dir = tempfile.mkdtemp(prefix="pyflink_sink_")
t_env.execute_sql(f"""
    CREATE TABLE spent_sink (name STRING, spent BIGINT)
    WITH ('connector' = 'filesystem', 'path' = '{sink_dir}/spent',
          'format' = 'parquet')""")
result.execute_insert("spent_sink")
back = t_env.spark.read.parquet(f"{sink_dir}/spent")
assert back.count() == 2

print("pyflink-1.11 program ran unchanged: OK")
