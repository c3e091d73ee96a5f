"""A Flink sql-client style session, verbatim in shape (cf. the Flink
1.11 sql-client and CREATE TABLE docs) — DDL with computed columns,
FLIP-110 LIKE derivation, the Hive dialect switch with a multi-INSERT,
and a composable MATCH_RECOGNIZE funnel joined to a dimension.  Run:

    python examples/flink_sql_client_script.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_1_11_1_spark.session import get_spark
from flink_1_11_1_spark.table_env import TableEnvironment

spark = get_spark("sql-client-example")
spark.sparkContext.setLogLevel("ERROR")
tenv = TableEnvironment(spark)
work = tempfile.mkdtemp(prefix="sqlclient_")

# -- seed data (stands in for an upstream feed) -------------------------
spark.createDataFrame(
    [(1, "2024-01-01 10:00:00", "click", 9.5),
     (1, "2024-01-01 10:00:30", "purchase", 120.0),
     (2, "2024-01-01 11:00:00", "click", 3.0),
     (2, "2024-01-01 11:02:00", "view", 1.0),
     (2, "2024-01-01 11:03:00", "click", 4.0),
     (2, "2024-01-01 11:03:30", "purchase", 55.0)],
    "user_id bigint, ts_s string, event_type string, value double",
).selectExpr("user_id", "cast(ts_s as timestamp) ts", "event_type", "value",
             "monotonically_increasing_id() + 1 event_id") \
 .write.parquet(f"{work}/events")
spark.createDataFrame(
    [(1, "gold"), (2, "basic")], "user_id bigint, tier string"
).createOrReplaceTempView("tiers")

# -- Flink DDL front door: declaration + FLIP-110 LIKE ------------------
tenv.execute_script(f"""
CREATE TABLE clicks (
  user_id BIGINT, ts TIMESTAMP(3), event_type STRING, value DOUBLE,
  event_id BIGINT,
  cents AS cast(floor(value * 100) as bigint)
) WITH ('connector'='filesystem', 'path'='{work}/events',
        'format'='parquet');

-- FLIP-110: derive an identically-shaped archive declaration
CREATE TABLE clicks_archive (is_big AS value > 50)
  WITH ('path'='{work}/archive') LIKE clicks;

CREATE TABLE hi_sink (user_id BIGINT, cents BIGINT) WITH (
  'connector'='filesystem', 'path'='{work}/hi', 'format'='parquet');
CREATE TABLE lo_sink (user_id BIGINT, cents BIGINT) WITH (
  'connector'='filesystem', 'path'='{work}/lo', 'format'='parquet');
""")

# -- Hive dialect + multi-INSERT (one scan, two sinks) -------------------
tenv.execute_sql("SET 'table.sql-dialect' = 'hive'")
tenv.execute_sql("""
FROM clicks
INSERT OVERWRITE TABLE hi_sink SELECT user_id, cents WHERE value >= 50
INSERT OVERWRITE TABLE lo_sink SELECT user_id, cents WHERE value < 50
""")
tenv.execute_sql("RESET 'table.sql-dialect'")
print("hi rows:", tenv.execute_sql("SELECT count(*) n FROM hi_sink").collect()[0].n)
print("lo rows:", tenv.execute_sql("SELECT count(*) n FROM lo_sink").collect()[0].n)

# -- composable MATCH_RECOGNIZE: funnel joined to a dimension -----------
rows = tenv.execute_sql("""
SELECT t.tier, count(*) AS funnels, sum(m.spend_cents) AS cents
FROM clicks MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES LAST(A.event_id) AS a_id, LAST(B.cents) AS spend_cents
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B)
  WITHIN INTERVAL '1' HOUR
  DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase'
) AS m
JOIN tiers t ON m.user_id = t.user_id
GROUP BY t.tier
ORDER BY t.tier
""").collect()
for r in rows:
    print(f"tier={r.tier} funnels={r.funnels} cents={r.cents}")
assert [(r.tier, r.funnels, r.cents) for r in rows] == [
    ("basic", 1, 5500), ("gold", 1, 12000)]

# -- SQL group windows (the 1.11 windowing syntax) ----------------------
win = tenv.execute_sql("""
SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws,
       count(*) AS n, sum(cents) AS cents
FROM clicks
GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
ORDER BY ws
""").collect()
for r in win:
    print(f"window={r.ws} n={r.n} cents={r.cents}")
assert [(str(r.ws), r.n, r.cents) for r in win] == [
    ("2024-01-01 10:00:00", 2, 12950), ("2024-01-01 11:00:00", 4, 6300)]

# -- FLIP-79 CREATE FUNCTION + LATERAL TABLE + lookup join --------------
tenv.execute_sql(
    "CREATE TEMPORARY FUNCTION tokenize AS "
    "'flink_1_11_1_spark.udf_examples.pair_tokens' LANGUAGE PYTHON")
lat = tenv.execute_sql("""
SELECT t.tier, w AS token, count(*) AS n
FROM clicks JOIN tiers FOR SYSTEM_TIME AS OF clicks.ts AS t
  ON t.user_id = clicks.user_id,
LATERAL TABLE(tokenize(clicks.event_type)) AS T(w)
GROUP BY t.tier, w ORDER BY t.tier, w
""").collect()
for r in lat:
    print(f"tier={r.tier} token={r.token} n={r.n}")
assert ("gold", "purchase", 1) in [(r.tier, r.token, r.n) for r in lat]
print("OK")
