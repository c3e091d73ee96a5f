"""Oracle-backed declared entries for the DataFrame operators.

Each entry runs an operator from this package (NOT SQL text) and is
compared against a DuckDB oracle — proving the DataFrame API layer
computes the same thing as the relational definition.  Keys are
``x_*_df`` to distinguish from the §3.13 SQL-text queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog, declared
from ..extensions import registry
from . import cdc, joins, rank, windows

_EVENTS_CTE = (
    "WITH events_ms AS (SELECT * REPLACE "
    "(cast(date_trunc('milliseconds', ts) as timestamp) AS ts) FROM events)"
)


# ------------------------------------------------------------ as-of join


def asof_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event at-or-before each order's derived time (temporal join,
    StreamExecTemporalJoin batch-equivalent) via operators.joins.asof_join."""
    orders = catalog.load_table(spark, sf_dir, "orders").where("o_orderkey < 500")
    left = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("u"),
        F.expr(
            "timestamp '2024-01-15 00:00:00' + (o_orderkey % 14) * INTERVAL 1 DAY"
        ).alias("t"),
    )
    right = (
        catalog.load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("u"), "ts", "event_id")
    )
    out = joins.asof_join(
        left, right, on=["u"], left_time="t", right_time="ts",
        right_cols=["event_id"], tie_break=["event_id"],
    )
    return out.select("o_orderkey", F.col("event_id").alias("ev")).orderBy("o_orderkey")


ASOF_ORACLE = f"""
{_EVENTS_CTE},
o AS (SELECT o_orderkey, o_custkey % 150 u,
             timestamp '2024-01-15 00:00:00' + (o_orderkey % 14) * INTERVAL 1 DAY t
      FROM orders WHERE o_orderkey < 500)
SELECT o.o_orderkey,
       (SELECT e.event_id FROM events_ms e
         WHERE e.user_id = o.u AND e.ts <= o.t
         ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) ev
FROM o ORDER BY o_orderkey
"""


# -------------------------------------------------------- interval join


def interval_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q38 semantics through operators.joins.interval_join."""
    ev = catalog.load_table(spark, sf_dir, "events")
    a = ev.where("event_type = 'signup'").select(
        "user_id", F.col("event_id").alias("s_id"), F.col("ts").alias("a_ts")
    )
    b = ev.where("event_type = 'purchase'").select(
        F.col("user_id").alias("b_user"), F.col("event_id").alias("p_id"),
        F.col("ts").alias("b_ts"),
    )
    out = joins.interval_join(
        a, b, on=F.col("user_id") == F.col("b_user"),
        left_time="a_ts", right_time="b_ts", lower="0 SECOND", upper="1 HOUR",
    )
    return out.select("user_id", "s_id", "p_id").orderBy("user_id", "s_id", "p_id").limit(1000)


# ---------------------------------------------------------------- top-n


def topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 semantics through operators.rank.top_n (WindowGroupLimit path)."""
    orders = catalog.load_table(spark, sf_dir, "orders")
    out = rank.top_n(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        n=3,
    )
    return out.orderBy("o_custkey", "rn").limit(300)


# ---------------------------------------------------------- deduplicate


def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q37 semantics through operators.rank.deduplicate (keep-first)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    out = rank.deduplicate(
        ev.select("user_id", "event_id", "event_type", "ts"),
        keys=["user_id"],
        order_by=[F.col("ts"), F.col("event_id")],
        keep="first",
    )
    return out.select("user_id", "event_id", "event_type").orderBy("user_id")


# -------------------------------------------------------- group windows


def tumble_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q34 semantics through operators.windows.tumble_agg (native window())."""
    ev = catalog.load_table(spark, sf_dir, "events")
    out = windows.tumble_agg(
        ev, "ts", "1 hour", ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv")],
    )
    return (
        out.select(
            F.col("window_start").cast("string").alias("wstart"), "event_type", "n", "sv"
        )
        .orderBy("wstart", "event_type")
    )


def hop_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q35 semantics through operators.windows.hop_agg (1h size / 30m slide)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    out = windows.hop_agg(
        ev, "ts", "1 hour", "30 minutes", [],
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv")],
    )
    return out.select(
        F.col("window_start").cast("string").alias("ws"), "n", "sv"
    ).orderBy("ws")


def session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q36 semantics through operators.windows.session_agg (native
    session_window + per-key session ids)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    out = windows.session_agg(
        ev, "ts", "30 minutes", ["user_id"],
        [
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sv"),
            F.min("ts").alias("_min_ts"),
        ],
        with_session_id=True,
    )
    return (
        out.select(
            "user_id", "sid", "n", "sv",
            F.date_trunc("second", F.col("_min_ts")).cast("string").alias("sstart"),
        )
        .orderBy("user_id", "sid")
        .limit(1000)
    )


def session_dynamic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessions (Flink withDynamicGap, round 6): purchases
    hold a session open 45 minutes, everything else 15 — through the
    native session_window Column-gap path.  The oracle derives the SAME
    sessions independently (gaps-and-islands with a running max of
    per-event window ends), so a green row proves Spark's session-merge
    semantics against the relational definition."""
    ev = catalog.load_table(spark, sf_dir, "events")
    gap = F.expr(
        "CASE WHEN event_type = 'purchase' THEN make_interval(0,0,0,0,0,45,0) "
        "ELSE make_interval(0,0,0,0,0,15,0) END"
    )
    out = windows.session_agg(
        ev, "ts", gap, ["user_id"],
        [F.count("*").alias("n"), F.min("ts").alias("_min_ts")],
        with_session_id=True,
    )
    return (
        out.select(
            "user_id",
            F.col("sid").cast("long").alias("sid"),
            "n",
            F.date_trunc("second", F.col("_min_ts")).cast("string").alias("sstart"),
        )
        .orderBy("user_id", "sid")
    )


# Independent formulation: per-event window end = ts + gap(event); a row
# starts a new session iff its ts is at-or-after the running max end of
# every earlier row (Spark merges only OVERLAPPING windows — adjacent
# [a,b) [b,c) do not merge).
SESSION_DYNAMIC_ORACLE = """
WITH e AS (SELECT user_id,
                  cast(date_trunc('millisecond', ts) as timestamp) AS ts,
                  event_type
           FROM events),
g AS (SELECT user_id, ts,
             epoch_ms(ts) + CASE WHEN event_type = 'purchase'
                                 THEN 2700000 ELSE 900000 END AS endp
      FROM e),
s AS (SELECT user_id, ts, endp,
             max(endp) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_end
      FROM g),
b AS (SELECT user_id, ts,
             CASE WHEN run_end IS NULL OR epoch_ms(ts) >= run_end
                  THEN 1 ELSE 0 END AS brk
      FROM s),
sess AS (SELECT user_id, ts,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sid
         FROM b)
SELECT user_id, cast(sid as bigint) AS sid, cast(count(*) as bigint) AS n,
       cast(date_trunc('second', min(ts)) as varchar) AS sstart
FROM sess GROUP BY user_id, sid ORDER BY user_id, sid
"""


def count_window_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling count-window (KeyedStream.countWindow(5)) per customer."""
    orders = catalog.load_table(spark, sf_dir, "orders")
    tagged = windows.count_tumble(
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        keys=["o_custkey"], size=5, order=["o_orderdate", "o_orderkey"],
    )
    return (
        tagged.groupBy("o_custkey", F.col("count_window").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sv"))
        .orderBy("o_custkey", "w")
        .limit(500)
    )


COUNT_WINDOW_ORACLE = """
WITH t AS (
  SELECT o_custkey, o_totalprice,
         (row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1) // 5 w
  FROM orders)
SELECT o_custkey, w, count(*) n, round(sum(o_totalprice), 2) sv
FROM t GROUP BY o_custkey, w ORDER BY o_custkey, w LIMIT 500
"""


# ------------------------------------------------------------ CDC decode

_DEBEZIUM_ENVELOPES = [
    '{"before": null, "after": {"id": 1, "name": "alpha", "qty": 10}, "op": "c"}',
    '{"before": null, "after": {"id": 2, "name": "beta", "qty": 20}, "op": "c"}',
    '{"before": {"id": 1, "name": "alpha", "qty": 10}, '
    '"after": {"id": 1, "name": "alpha2", "qty": 11}, "op": "u"}',
    '{"before": null, "after": {"id": 3, "name": "gamma", "qty": 30}, "op": "r"}',
    '{"before": {"id": 2, "name": "beta", "qty": 20}, "after": null, "op": "d"}',
]


def cdc_debezium_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """debezium-json decode + changelog materialization (deterministic
    literal input; final state per key)."""
    from pyspark.sql.types import IntegerType, StringType, StructType

    row_schema = (
        StructType()
        .add("id", IntegerType())
        .add("name", StringType())
        .add("qty", IntegerType())
    )
    src = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_DEBEZIUM_ENVELOPES)], ["seq", "value"]
    )
    decoded = cdc.debezium_decode(src, "value", row_schema)
    # changelog sequence from the envelope's arrival order; within one
    # update envelope +U follows -U (partitioning-independent)
    decoded = decoded.withColumn(
        "_seq", F.col("seq") * 2 + F.when(F.col("row_kind") == "+U", 1).otherwise(0)
    )
    final = cdc.materialize(decoded, keys=["id"], seq_col="_seq").drop("_seq", "seq")
    return final.orderBy("id")


CDC_ORACLE = """
SELECT * FROM (VALUES (1, 'alpha2', 11), (3, 'gamma', 30)) t(id, name, qty)
ORDER BY id
"""


_CANAL_ENVELOPES = [
    '{"data": [{"id": 1, "name": "iron", "qty": 5}, '
    '{"id": 2, "name": "steel", "qty": 7}], "old": null, "type": "INSERT"}',
    '{"data": [{"id": 1, "name": "iron", "qty": 6}], '
    '"old": [{"qty": 5}], "type": "UPDATE"}',
    '{"data": [{"id": 2, "name": "steel", "qty": 7}], "old": null, "type": "DELETE"}',
    '{"data": [{"id": 3, "name": "copper", "qty": 9}], "old": null, "type": "INSERT"}',
]


def cdc_canal_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canal-json decode + changelog materialization: partial-field
    ``old`` arrays merge over data for -U, then the upsert fold yields
    final state per key (CanalJsonDeserializationSchema parity)."""
    from pyspark.sql.types import IntegerType, StringType, StructType

    row_schema = (
        StructType()
        .add("id", IntegerType())
        .add("name", StringType())
        .add("qty", IntegerType())
    )
    src = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_CANAL_ENVELOPES)], ["seq", "value"]
    )
    decoded = cdc.canal_decode(src, "value", row_schema)
    decoded = decoded.withColumn(
        "_seq", F.col("seq") * 2 + F.when(F.col("row_kind") == "+U", 1).otherwise(0)
    )
    final = cdc.materialize(decoded, keys=["id"], seq_col="_seq").drop("_seq", "seq")
    return final.orderBy("id")


CANAL_ORACLE = """
SELECT * FROM (VALUES (1, 'iron', 6), (3, 'copper', 9)) t(id, name, qty)
ORDER BY id
"""


def register_all() -> None:
    registry.register("x_asof_join_df", asof_orders_events, ASOF_ORACLE)
    registry.register(
        "x_interval_join_df", interval_signup_purchase,
        declared.oracle_text(declared.QUERIES["q38"]),
    )
    registry.register("x_topn_df", topn_orders, declared.oracle_text(declared.QUERIES["q22"]))
    registry.register(
        "x_dedup_first_df", dedup_first_event, declared.oracle_text(declared.QUERIES["q37"])
    )
    registry.register("x_tumble_df", tumble_events, declared.oracle_text(declared.QUERIES["q34"]))
    registry.register("x_hop_df", hop_events, declared.oracle_text(declared.QUERIES["q35"]))
    registry.register(
        "x_session_df", session_events, declared.oracle_text(declared.QUERIES["q36"])
    )
    registry.register(
        "x_session_dynamic", session_dynamic_events, SESSION_DYNAMIC_ORACLE
    )
    registry.register("x_count_window_df", count_window_orders, COUNT_WINDOW_ORACLE)
    registry.register("x_cdc_debezium", cdc_debezium_materialized, CDC_ORACLE)
    registry.register("x_cdc_canal", cdc_canal_materialized, CANAL_ORACLE)
