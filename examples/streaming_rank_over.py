"""Flink 1.11 streaming SQL rank/over programs, verbatim in shape
(cf. the Flink 1.11 "Over Aggregation" and "Top-N" Queries docs —
StreamExecOverAggregate / StreamExecRank) — running OVER aggregates,
Top-N over an updating aggregate, and Top-N over a raw insert-only
stream, all through the SQL front door.  Run:

    python examples/streaming_rank_over.py
"""

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from flink_1_11_1_spark.streaming import replay
from flink_1_11_1_spark.table_env import TableEnvironment

spark = (SparkSession.builder.master("local[4]")
         .appName("streaming-rank-over-example")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
tenv = TableEnvironment(spark)

# -- a replayed click stream (one file per micro-batch) ------------------
base = dt.datetime(2024, 1, 1)
SCHEMA = "user_id long, event_id long, ts timestamp, value double"


def frame(rows):
    return spark.createDataFrame(
        [(u, e, base + dt.timedelta(minutes=m), v) for u, e, m, v in rows],
        SCHEMA)


frames = [
    frame([(1, 1, 0, 5.0), (2, 2, 1, 7.0), (1, 3, 2, 4.0)]),
    frame([(2, 4, 3, 1.0), (1, 5, 4, 2.0)]),
    frame([(9, 99, 60 * 24 * 30, 0.0)]),  # watermark flush sentinel
]
rdir = tempfile.mkdtemp(prefix="rank_over_src_")
replay.write_replay_frames(frames, rdir)


def clicks():
    s = (spark.readStream.format("parquet").schema(frames[0].schema)
         .option("maxFilesPerTrigger", 1).load(rdir)
         .withWatermark("ts", "10 minutes"))
    s.createOrReplaceTempView("clicks")


# -- 1. running OVER aggregate (Over Aggregation doc shape) --------------
clicks()
out = tenv.execute_sql(
    "SELECT user_id, event_id, sum(value) OVER "
    "(PARTITION BY user_id ORDER BY ts) AS total FROM clicks")
got, _ = replay.run_stream(out, "append", "ex_rank_over")
RUNNING = {r.event_id: r.total for r in got if r.user_id <= 2}
assert RUNNING == {1: 5.0, 3: 9.0, 5: 11.0, 2: 7.0, 4: 8.0}, RUNNING

# -- 2. Top-N over an updating aggregate (Top-N doc shape) ---------------
clicks()
h = tenv.execute_sql(
    "SELECT user_id, total, rn FROM (SELECT user_id, sum(value) AS total, "
    "ROW_NUMBER() OVER (ORDER BY sum(value) DESC) AS rn FROM clicks "
    "WHERE user_id <= 2 GROUP BY user_id) WHERE rn <= 2")
q = h.start(tempfile.mkdtemp(prefix="topn_upd_"),
            checkpoint_dir=tempfile.mkdtemp(prefix="topn_upd_ck_"))
q.processAllAvailable()
q.stop()
TOP = sorted((r.rn, r.user_id, r.total) for r in h.snapshot(spark).collect())
assert TOP == [(1, 1, 11.0), (2, 2, 8.0)], TOP

# -- 3. Top-N over the raw insert-only stream (AppendOnlyTopNFunction) ---
clicks()
h2 = tenv.execute_sql(
    "SELECT user_id, event_id, value, rn FROM (SELECT user_id, event_id, "
    "ts, value, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value "
    "DESC, event_id) AS rn FROM clicks WHERE user_id <= 2) WHERE rn <= 2")
assert h2.append_only
q2 = h2.start(tempfile.mkdtemp(prefix="topn_app_"),
              checkpoint_dir=tempfile.mkdtemp(prefix="topn_app_ck_"))
q2.processAllAvailable()
q2.stop()
TOP2 = sorted((r.user_id, r.rn, r.event_id)
              for r in h2.snapshot(spark).collect())
assert TOP2 == [(1, 1, 1), (1, 2, 3), (2, 1, 2), (2, 2, 4)], TOP2

print("OK streaming rank/over")
