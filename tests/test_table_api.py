"""Fluent Table API façade battery: every façade method vs its SQL twin.

The contract is 1:1 delegation to DataFrame ops — each test builds the
same query twice (façade with Flink expression strings / plain Spark
SQL) and asserts identical sorted rows, the same way PyFlink 1.11's
``test_table.py`` checks Table methods against expected results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_11_1_spark import catalog
from flink_1_11_1_spark.expr import ExprParser
from flink_1_11_1_spark.table_api import Over, Session, Slide, Table, Tumble
from flink_1_11_1_spark.table_env import TableEnvironment

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tenv(spark):
    env = TableEnvironment(spark)
    env.register_fixture_catalog(SF_SMOKE)
    return env


def same(a, b):
    ra = sorted(map(tuple, a.df.collect() if isinstance(a, Table) else a.collect()))
    rb = sorted(map(tuple, b.df.collect() if isinstance(b, Table) else b.collect()))
    assert ra == rb, f"{ra[:3]} != {rb[:3]} ({len(ra)} vs {len(rb)} rows)"


# ----------------------------------------------------------- expressions

def test_expr_literals_arith_logic(tenv):
    t = tenv.from_path("nation")
    got = t.select(
        "n_nationkey + 1 as k, n_name.lowerCase as ln, "
        "n_regionkey % 2 = 0 as even, 'x' + n_name as tagged"
    )
    want = tenv.spark.sql(
        "SELECT n_nationkey + 1 k, lower(n_name) ln, "
        "n_regionkey % 2 = 0 even, concat('x', n_name) tagged FROM nation")
    same(got, want)


def test_expr_functions(tenv):
    t = tenv.from_path("nation")
    got = t.select(
        "n_name.substring(1, 3) as pre, n_name.charLength as len, "
        "n_nationkey.cast(STRING) as ks, "
        "if(n_regionkey > 2, 'hi', 'lo') as band, "
        "n_name.like('A%') as a_name, n_regionkey.in(0, 2) as r02"
    )
    want = tenv.spark.sql(
        "SELECT substring(n_name, 1, 3) pre, length(n_name) len, "
        "cast(n_nationkey as string) ks, "
        "IF(n_regionkey > 2, 'hi', 'lo') band, "
        "n_name LIKE 'A%' a_name, n_regionkey IN (0, 2) r02 FROM nation")
    same(got, want)


def test_expr_errors():
    with pytest.raises(ValueError, match="unknown property"):
        ExprParser("a.nope").parse_single()
    with pytest.raises(ValueError, match="trailing"):
        ExprParser("a b").parse_single()
    with pytest.raises(ValueError, match="unknown property"):
        ExprParser("w.start").parse_single()  # no window scope here


def test_interval_and_rowcount_literals():
    pe = ExprParser("10.minutes").parse_single()
    assert pe.interval == (10, "minute")
    pe = ExprParser("5.rows").parse_single()
    assert pe.rows == 5
    # timestamp arithmetic with an interval literal
    pe = ExprParser("ts + 10.minutes").parse_single()
    assert pe.col is not None


# ------------------------------------------------------ select/filter/agg

def test_filter_group_select(tenv):
    t = tenv.from_path("orders")
    got = (t.filter("o_totalprice > 100000.0")
             .group_by("o_orderpriority")
             .select("o_orderpriority, o_totalprice.sum as total, "
                     "*.count as n"))
    want = tenv.spark.sql(
        "SELECT o_orderpriority, sum(o_totalprice) total, count(*) n "
        "FROM orders WHERE o_totalprice > 100000.0 GROUP BY o_orderpriority")
    same(got, want)


def test_global_aggregate(tenv):
    t = tenv.from_path("orders")
    got = t.select("o_totalprice.sum as s, *.count as n")
    want = tenv.spark.sql("SELECT sum(o_totalprice) s, count(*) n FROM orders")
    same(got, want)
    with pytest.raises(ValueError, match="group_by"):
        t.select("o_orderkey, o_totalprice.sum")


def test_agg_expression_and_sum0(tenv):
    t = tenv.from_path("lineitem")
    got = (t.group_by("l_returnflag")
             .select("l_returnflag, l_quantity.sum + 1 as s1, "
                     "l_quantity.avg as av"))
    want = tenv.spark.sql(
        "SELECT l_returnflag, sum(l_quantity) + 1 s1, avg(l_quantity) av "
        "FROM lineitem GROUP BY l_returnflag")
    same(got, want)


def test_distinct_alias_rename_drop_add(tenv):
    t = tenv.from_path("region")
    got = (t.select("r_regionkey, r_name")
             .alias("k, name")
             .add_columns("k * 10 as k10")
             .rename_columns("name as region_name")
             .drop_columns("k")
             .distinct())
    want = tenv.spark.sql(
        "SELECT DISTINCT r_name region_name, r_regionkey * 10 k10 "
        "FROM region").select("region_name", "k10")
    # column order must match too
    assert got.df.columns == ["region_name", "k10"]
    same(got, want.select("region_name", "k10"))

    with pytest.raises(ValueError, match="exists"):
        tenv.from_path("region").add_columns("r_name as r_regionkey")


def test_order_offset_fetch(tenv):
    t = tenv.from_path("nation")
    got = t.order_by("n_name.desc").offset(3).fetch(4)
    want = tenv.spark.sql(
        "SELECT * FROM nation ORDER BY n_name DESC LIMIT 4 OFFSET 3")
    assert [r.n_name for r in got.df.collect()] == \
        [r.n_name for r in want.collect()]


# ------------------------------------------------------------------ joins

def test_join_and_outer_join(tenv):
    n = tenv.from_path("nation").select("n_nationkey, n_regionkey, n_name")
    r = tenv.from_path("region").select("r_regionkey, r_name")
    got = n.join(r, "n_regionkey = r_regionkey").select("n_name, r_name")
    want = tenv.spark.sql(
        "SELECT n_name, r_name FROM nation "
        "JOIN region ON n_regionkey = r_regionkey")
    same(got, want)

    got = r.left_outer_join(
        n.filter("n_nationkey < 3"), "r_regionkey = n_regionkey"
    ).select("r_name, n_name")
    want = tenv.spark.sql(
        "SELECT r_name, n_name FROM region LEFT JOIN "
        "(SELECT * FROM nation WHERE n_nationkey < 3) "
        "ON r_regionkey = n_regionkey")
    same(got, want)


def test_join_ambiguity_raises(tenv):
    n = tenv.from_path("nation")
    with pytest.raises(ValueError, match="ambiguous"):
        n.join(n, "n_nationkey = n_nationkey")


def test_set_ops(tenv):
    lo = tenv.from_path("nation").filter("n_nationkey < 10").select("n_name")
    hi = tenv.from_path("nation").filter("n_nationkey >= 5").select("n_name")
    same(lo.union(hi),
         tenv.spark.sql("SELECT n_name FROM nation WHERE n_nationkey < 10 "
                        "UNION SELECT n_name FROM nation WHERE n_nationkey >= 5"))
    same(lo.union_all(hi),
         tenv.spark.sql("SELECT n_name FROM nation WHERE n_nationkey < 10 "
                        "UNION ALL SELECT n_name FROM nation WHERE n_nationkey >= 5"))
    same(lo.intersect(hi),
         tenv.spark.sql("SELECT n_name FROM nation WHERE n_nationkey < 10 "
                        "INTERSECT SELECT n_name FROM nation WHERE n_nationkey >= 5"))
    same(lo.minus(hi),
         tenv.spark.sql("SELECT n_name FROM nation WHERE n_nationkey < 10 "
                        "EXCEPT SELECT n_name FROM nation WHERE n_nationkey >= 5"))


# ---------------------------------------------------------- group windows

@pytest.fixture(scope="module")
def events_table(tenv):
    df = catalog.load_table(tenv.spark, SF_SMOKE, "events")
    df.createOrReplaceTempView("events_tapi")
    return tenv.from_path("events_tapi")


def test_tumble_window(tenv, events_table):
    got = (events_table
           .window(Tumble.over("10.minutes").on("ts").alias("w"))
           .group_by("w, event_type")
           .select("event_type, w.start as ws, w.end as we, "
                   "value.sum as total, *.count as n"))
    want = tenv.spark.sql(
        "SELECT event_type, window.start ws, window.end we, "
        "sum(value) total, count(*) n FROM events_tapi "
        "GROUP BY window(ts, '10 minutes'), event_type")
    same(got, want)


def test_slide_window(tenv, events_table):
    got = (events_table
           .window(Slide.over("10.minutes").every("5.minutes")
                   .on("ts").alias("w"))
           .group_by("w, event_type")
           .select("event_type, w.start as ws, value.max as mx"))
    want = tenv.spark.sql(
        "SELECT event_type, window.start ws, max(value) mx "
        "FROM events_tapi "
        "GROUP BY window(ts, '10 minutes', '5 minutes'), event_type")
    same(got, want)


def test_session_window(tenv, events_table):
    got = (events_table.filter("user_id < 50")
           .window(Session.with_gap("30.minutes").on("ts").alias("w"))
           .group_by("w, user_id")
           .select("user_id, w.start as ws, w.end as we, *.count as n"))
    want = tenv.spark.sql(
        "SELECT user_id, session_window.start ws, session_window.end we, "
        "count(*) n FROM events_tapi WHERE user_id < 50 "
        "GROUP BY session_window(ts, '30 minutes'), user_id")
    same(got, want)


def test_count_window(tenv, events_table):
    got = (events_table.filter("user_id < 20")
           .window(Tumble.over("5.rows").on("event_id").alias("w"))
           .group_by("w, user_id")
           .select("user_id, w as win, *.count as n"))
    from flink_1_11_1_spark.operators.windows import count_tumble
    df = catalog.load_table(tenv.spark, SF_SMOKE, "events") \
        .filter("user_id < 20")
    want = (count_tumble(df, ["user_id"], 5, order=["event_id"])
            .groupBy("user_id", "count_window").agg(F.count("*").alias("n"))
            .select(F.col("user_id"), F.col("count_window").alias("win"),
                    F.col("n")))
    same(got, want)


def test_window_rowtime_property(events_table, tenv):
    got = (events_table
           .window(Tumble.over("1.hours").on("ts").alias("w"))
           .group_by("w")
           .select("w.rowtime as rt, *.count as n"))
    want = tenv.spark.sql(
        "SELECT window.end - INTERVAL '0.001' SECOND rt, count(*) n "
        "FROM events_tapi GROUP BY window(ts, '1 hour')")
    same(got, want)


# ----------------------------------------------------------- over windows

def test_over_unbounded_and_rows(tenv):
    t = tenv.from_path("lineitem").filter("l_orderkey < 100")
    got = t.over_window(
        Over.partition_by("l_orderkey").order_by("l_linenumber")
            .preceding("unbounded_row").alias("w")
    ).select("l_orderkey, l_linenumber, l_quantity.sum over w as run")
    want = tenv.spark.sql(
        "SELECT l_orderkey, l_linenumber, "
        "sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run "
        "FROM lineitem WHERE l_orderkey < 100")
    same(got, want)

    got = t.over_window(
        Over.partition_by("l_orderkey").order_by("l_linenumber")
            .preceding("2.rows").alias("w")
    ).select("l_orderkey, l_linenumber, l_quantity.avg over w as mavg")
    want = tenv.spark.sql(
        "SELECT l_orderkey, l_linenumber, "
        "avg(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) mavg "
        "FROM lineitem WHERE l_orderkey < 100")
    same(got, want)


def test_over_range_interval(tenv, events_table):
    got = events_table.filter("user_id < 30").over_window(
        Over.partition_by("user_id").order_by("ts")
            .preceding("10.minutes").alias("w")
    ).select("user_id, event_id, value.sum over w as s10")
    want = tenv.spark.sql(
        "SELECT user_id, event_id, "
        "sum(value) OVER (PARTITION BY user_id "
        "ORDER BY cast(cast(ts as double) * 1000 as long) "
        "RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) s10 "
        "FROM events_tapi WHERE user_id < 30")
    same(got, want)


# ------------------------------------------------------- env entry points

def test_from_elements_and_schema(tenv):
    t = tenv.from_elements([(1, "a"), (2, "b")], schema="id int, s string")
    assert t.get_schema().get_field_names() == ["id", "s"]
    rows = list(t.select("id + 1 as id2, s.upperCase as up")
                .execute().collect())
    assert [(r.id2, r.up) for r in rows] == [(2, "A"), (3, "B")]


def test_execute_insert_into_declared_sink(tenv, tmp_path):
    tenv.execute_sql(f"""
        CREATE TABLE tapi_sink (r_regionkey BIGINT, r_name STRING)
        WITH ('connector'='filesystem', 'path'='{tmp_path}/sink',
              'format'='parquet')""")
    tenv.from_path("region").select("r_regionkey, r_name") \
        .execute_insert("tapi_sink")
    back = tenv.spark.read.parquet(f"{tmp_path}/sink")
    assert back.count() == 5


def test_explain_and_print_schema(tenv, capsys):
    t = tenv.from_path("nation").select("n_name")
    plan = t.explain()
    assert "Physical Plan" in plan
    t.print_schema()
    assert "n_name: string" in capsys.readouterr().out


def test_environment_settings_and_datastream_bridge(tenv):
    from flink_1_11_1_spark.datastream import DataStream
    from flink_1_11_1_spark.table_env import (
        EnvironmentSettings, TableEnvironment)

    settings = EnvironmentSettings.new_instance() \
        .in_streaming_mode().use_blink_planner().build()
    assert settings.streaming
    env2 = TableEnvironment.create(settings)
    assert env2.spark is tenv.spark  # one unified session

    ds = tenv.to_append_stream(tenv.from_path("region"))
    assert isinstance(ds, DataStream)
    back = tenv.from_data_stream(ds.map(["r_regionkey * 2 as k"]))
    got = sorted(r.k for r in back.execute().collect())
    assert got == [0, 2, 4, 6, 8]


def test_table_config_set_string(tenv):
    cfg = tenv.get_config().get_configuration()
    old = cfg.get_string("table.exec.resource.default-parallelism")
    try:
        cfg.set_string("table.exec.resource.default-parallelism", "7")
        assert tenv.spark.conf.get("spark.sql.shuffle.partitions") == "7"
        assert cfg.get_string(
            "table.exec.resource.default-parallelism") == "7"
        # sql_update runs DDL/DML eagerly (documented delta)
        tenv.sql_update("CREATE VIEW cfg_v AS SELECT 1 AS one")
        assert tenv.execute_sql("SELECT * FROM cfg_v").first().one == 1
    finally:
        cfg.set_string("table.exec.resource.default-parallelism", old)
        tenv.execute_sql("DROP VIEW cfg_v")


def test_join_lateral_udtf(tenv):
    from flink_1_11_1_spark.udf import DataTypes, udtf

    split = udtf(lambda line: [(w, len(w)) for w in (line or "").split()],
                 [DataTypes.STRING()],
                 [DataTypes.STRING(), DataTypes.INT()],
                 field_names=["word", "wlen"])
    tenv.register_function("lat_split", split)
    t = tenv.from_elements([(1, "ab c"), (2, "")], schema="id int, s string")
    got = t.join_lateral("lat_split(s) as (w, n)") \
        .select("id, w, n").order_by("id.asc, w.asc")
    assert [tuple(r) for r in got.execute().collect()] == [
        (1, "ab", 2), (1, "c", 1)]
    outer = t.left_outer_join_lateral("lat_split(s)") \
        .select("id, word").order_by("id.asc, word.asc")
    assert [tuple(r) for r in outer.execute().collect()] == [
        (1, "ab"), (1, "c"), (2, None)]
    with pytest.raises(ValueError, match="arity"):
        t.join_lateral("lat_split(s) as (only_one)").df.collect()


def test_to_retract_stream_streaming_and_bounded(tenv, tmp_path):
    """`t_env.to_retract_stream` name-parity: streaming update-mode
    aggregate → boolean-tagged records whose fold equals the batch
    result; bounded table → all-adds DataFrame."""
    from flink_1_11_1_spark import catalog as _catalog
    from flink_1_11_1_spark.streaming import replay
    from flink_1_11_1_spark.streaming.changelog import (
        fold_retracts, read_retracts)

    # bounded case
    t = tenv.from_path("region").select("r_regionkey")
    b = tenv.to_retract_stream(t, ["r_regionkey"], str(tmp_path / "na"))
    assert b.columns[0] == "add" and b.count() == 5
    assert all(r.add for r in b.collect())

    # streaming case: per-type count over replayed events
    d = str(tmp_path / "replay_trs")
    replay.write_replay(tenv.spark, SF_SMOKE, d, parts=3)
    from pyspark.sql import functions as F

    stream = replay.events_stream(tenv.spark, d).filter("user_id >= 0") \
        .groupBy("event_type").agg(F.count("*").alias("n"))
    q = tenv.to_retract_stream(
        tenv.from_dataframe(stream), ["event_type"],
        str(tmp_path / "trs"))
    q.processAllAvailable()
    q.stop()
    recs = [(r.add, (r.event_type, r.n))
            for r in read_retracts(tenv.spark, str(tmp_path / "trs"))
            .collect()]
    folded = sorted(fold_retracts(recs))
    want = sorted(
        (r.event_type, r.n)
        for r in _catalog.load_table(tenv.spark, SF_SMOKE, "events")
        .groupBy("event_type").agg(F.count("*").alias("n")).collect())
    assert folded == want


def test_expression_precedence_matrix(tenv):
    """Mixed-operator precedence vs SQL (the per-op fuzzer shapes are
    single-operator; this pins the ladder)."""
    t = tenv.from_path("lineitem")
    cases = [
        ("l_orderkey + l_linenumber * 3 as x",
         "l_orderkey + l_linenumber * 3 x"),
        ("(l_orderkey + l_linenumber) * 3 as x",
         "(l_orderkey + l_linenumber) * 3 x"),
        ("-l_linenumber + 10 as x", "-l_linenumber + 10 x"),
        ("l_orderkey % 7 = 0 && !(l_linenumber > 3) as x",
         "l_orderkey % 7 = 0 AND NOT (l_linenumber > 3) x"),
        ("if(l_linenumber > 2, l_orderkey, -1) + 1 as x",
         "IF(l_linenumber > 2, l_orderkey, -1) + 1 x"),
    ]
    for fe, se in cases:
        a = [r.x for r in t.select(fe).order_by("x.asc").fetch(50)
             .df.collect()]
        b = [r.x for r in tenv.spark.sql(
            f"SELECT {se} FROM lineitem ORDER BY x LIMIT 50").collect()]
        assert a == b, fe


def test_group_by_expression_key(tenv):
    got = sorted(map(tuple, tenv.from_path("nation")
                 .group_by("n_regionkey % 2 as par")
                 .select("par, *.count as n").df.collect()))
    want = sorted(map(tuple, tenv.spark.sql(
        "SELECT n_regionkey % 2 par, count(*) n FROM nation GROUP BY 1"
    ).collect()))
    assert got == want
