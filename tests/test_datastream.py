"""DataStream API façade battery — each fluent pipeline vs its
DataFrame/SQL twin (bounded semantics: final result per key, Flink's
own batch-execution contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_1_11_1_spark import catalog
from flink_1_11_1_spark.datastream import (
    EventTimeSessionWindows,
    SlidingEventTimeWindows,
    StreamExecutionEnvironment,
    TumblingEventTimeWindows,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def env(spark):
    return StreamExecutionEnvironment.get_execution_environment(spark)


def rows(ds):
    return sorted(map(tuple, ds.df.collect()))


def test_map_expression_and_python(env):
    s = env.from_collection([(1, "a"), (2, "b")], schema="x int, s string")
    got = s.map(["x * 2 as x2", "upper(s) as up"])
    assert rows(got) == [(2, "A"), (4, "B")]
    got = s.map(lambda r: (r.x * 2, r.s.upper()),
                output_type="x2 int, up string")
    assert rows(got) == [(2, "A"), (4, "B")]
    with pytest.raises(ValueError, match="output_type"):
        s.map(lambda r: r)


def test_flat_map_filter_union(env):
    s = env.from_collection([(1, "a b"), (2, "c")], schema="k int, s string")
    got = s.flat_map(lambda r: [(r.k, w) for w in r.s.split()],
                     output_type="k int, w string")
    assert rows(got) == [(1, "a"), (1, "b"), (2, "c")]
    assert rows(s.filter("k > 1")) == [(2, "c")]
    assert rows(s.filter(lambda r: r.k > 1)) == [(2, "c")]
    both = s.union(s)
    assert len(rows(both)) == 4


def test_keyed_running_aggregates(env):
    s = env.from_collection(
        [("a", 1, 10), ("a", 2, 20), ("b", 5, 30)],
        schema="k string, v int, w int")
    assert rows(s.key_by("k").sum("v")) == [("a", 3, 10), ("b", 5, 30)]
    assert rows(s.key_by("k").max("v")) == [("a", 2, 10), ("b", 5, 30)]
    # min_by / max_by return the achieving ROW
    assert rows(s.key_by("k").min_by("w")) == [("a", 1, 10), ("b", 5, 30)]
    assert rows(s.key_by("k").max_by("w")) == [("a", 2, 20), ("b", 5, 30)]


def test_keyed_reduce_fold_order(env):
    # fold concatenates in rowtime order — the fold order is observable
    s = env.from_collection(
        [("a", 3, "x"), ("a", 1, "y"), ("a", 2, "z")],
        schema="k string, ts int, s string")
    # reduce without assigned time: stable input order (x, y, z)
    out = s.key_by("k").reduce(
        lambda a, b: Row(k=a.k, ts=b.ts, s=a.s + b.s))
    assert rows(out) == [("a", 2, "xyz")]
    # with event time: fold in ts order (y, z, x)
    out = (s.assign_timestamps_and_watermarks("ts", "0 seconds")
           .key_by("k")
           .reduce(lambda a, b: Row(k=a.k, ts=b.ts, s=a.s + b.s)))
    assert rows(out) == [("a", 3, "yzx")]


def test_event_time_window_sum(env, spark):
    events = catalog.load_table(spark, SF_SMOKE, "events")
    ds = (env.from_dataframe(events)
          .assign_timestamps_and_watermarks("ts", "10 minutes")
          .key_by("event_type")
          .window(TumblingEventTimeWindows.of("1 hour"))
          .aggregate(F.count("*").alias("n"),
                     F.sum("value").alias("sv")))
    want = (events.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
            .select("event_type",
                    F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"), "n", "sv"))
    got = set(map(tuple, ds.df.select(
        "event_type", "window_start", "window_end", "n", "sv").collect()))
    assert got == set(map(tuple, want.collect()))


def test_window_requires_rowtime(env):
    s = env.from_collection([("a", 1)], schema="k string, v int")
    with pytest.raises(ValueError, match="assign_timestamps"):
        s.key_by("k").window(TumblingEventTimeWindows.of("1 hour"))


def test_sliding_and_session_assigners(env, spark):
    events = catalog.load_table(spark, SF_SMOKE, "events") \
        .filter("user_id < 30")
    base = (env.from_dataframe(events)
            .assign_timestamps_and_watermarks("ts", "10 minutes")
            .key_by("user_id"))
    slid = base.window(
        SlidingEventTimeWindows.of("1 hour", "30 minutes")).sum("value")
    want = events.groupBy(F.window("ts", "1 hour", "30 minutes"), "user_id") \
        .agg(F.sum("value").alias("value")).count()
    assert slid.df.count() == want
    sess = base.window(
        EventTimeSessionWindows.with_gap("30 minutes")).sum("value")
    want = events.groupBy(F.session_window("ts", "30 minutes"), "user_id") \
        .agg(F.sum("value").alias("value")).count()
    assert sess.df.count() == want


def test_window_reduce(env):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [("a", t0, 1), ("a", t0 + dt.timedelta(minutes=5), 2),
            ("a", t0 + dt.timedelta(minutes=90), 10)]
    s = (env.from_collection(data, schema="k string, ts timestamp, v int")
         .assign_timestamps_and_watermarks("ts", "1 minute"))
    out = s.key_by("k").window(TumblingEventTimeWindows.of("1 hour")) \
        .reduce(lambda a, b: Row(k=a.k, ts=b.ts, v=a.v + b.v))
    got = sorted((r.k, r.v, r.window_start.hour) for r in out.df.collect())
    assert got == [("a", 3, 0), ("a", 10, 1)]


def test_count_window(env, spark):
    events = catalog.load_table(spark, SF_SMOKE, "events") \
        .filter("user_id < 20")
    ds = (env.from_dataframe(events)
          .assign_timestamps_and_watermarks("ts", "10 minutes")
          .key_by("user_id").count_window(5)
          .aggregate(F.count("*").alias("n")))
    # every window except possibly the per-key last has exactly 5 rows
    pdf = ds.df.toPandas()
    last = pdf.groupby("user_id")["count_window"].transform("max")
    assert (pdf[pdf.count_window < last]["n"] == 5).all()
    assert pdf.groupby("user_id")["n"].sum().sum() == events.count()


def test_keyed_process_and_sink(env, tmp_path):
    s = env.from_collection(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 5.0)],
        schema="k string, ts int, v double")

    def dedup_first(key, pdf):
        return pdf.head(1)

    out = (s.assign_timestamps_and_watermarks("ts", "0 seconds")
           .key_by("k")
           .process(dedup_first, schema="k string, ts int, v double"))
    assert rows(out) == [("a", 1, 1.0), ("b", 1, 5.0)]
    out.add_sink(str(tmp_path / "sink"))
    back = env.spark.read.parquet(str(tmp_path / "sink"))
    assert back.count() == 2
    assert list(out.execute_and_collect(limit=1))
    env.execute("job")  # no-op contract


def test_connect_tags(env):
    a = env.from_collection([(1,)], schema="v int")
    b = env.from_collection([(2.5,)], schema="w double")
    tagged = a.connect(b)
    got = sorted(map(tuple, tagged.df.select("v", "w", "__side").collect()),
                 key=str)
    assert got == [(1, None, 0), (None, 2.5, 1)]


def test_streaming_capstone_window_to_file_sink(env, spark, tmp_path):
    """DataStream façade end-to-end on a REAL stream: replayed events →
    watermark assignment → keyed tumble window aggregate → exactly-once
    streaming file sink; committed files == the batch twin (modulo the
    final in-flight window, which needs the next watermark advance)."""
    from flink_1_11_1_spark import catalog
    from flink_1_11_1_spark.streaming import replay

    d = str(tmp_path / "replay_ds")
    replay.write_replay(spark, SF_SMOKE, d, parts=4)
    stream = replay.events_stream(spark, d).select(
        "user_id", "event_id", "ts", "event_type", "value")
    ds = (env.from_dataframe(stream)
          .assign_timestamps_and_watermarks("ts", "10 minutes")
          .key_by("event_type")
          .window(TumblingEventTimeWindows.of("1 hour"))
          .aggregate(F.count("*").alias("n"), F.sum("value").alias("sv")))
    sink = str(tmp_path / "sink")
    q = ds.add_sink(sink, checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    got = {(r.event_type, r.window_start, r.n, round(r.sv, 6))
           for r in spark.read.parquet(sink).collect()}
    events = catalog.load_table(spark, SF_SMOKE, "events")
    want = {(r.event_type, r.window_start, r.n, round(r.sv, 6))
            for r in (events.groupBy(F.window("ts", "1 hour"), "event_type")
                      .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
                      .select("event_type",
                              F.col("window.start").alias("window_start"),
                              "n", "sv")).collect()}
    # append-mode emission: everything at-or-below the final watermark
    assert got <= want
    missing = want - got
    assert len(got) > 0.8 * len(want)
    # the unemitted remainder is only the per-key tail window(s)
    max_emitted = max(w for _, w, _, _ in got)
    assert all(w >= max_emitted for _, w, _, _ in missing)


def test_interval_join(env, spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def mk(rows, schema):
        return env.from_collection(
            [(k, t0 + dt.timedelta(minutes=m), v) for k, m, v in rows],
            schema=schema).assign_timestamps_and_watermarks("ts", "1 hour")

    orders = mk([("a", 0, 1), ("a", 60, 2), ("b", 0, 3)],
                "k string, ts timestamp, oid int")
    ships = mk([("a", 10, 101), ("a", 59, 102), ("a", 120, 103),
                ("b", 45, 104)],
               "k string, ts timestamp, sid int")
    got = (orders.key_by("k")
           .interval_join(ships.key_by("k"))
           .between("0 minutes", "45 minutes"))
    pairs = sorted((r.oid, r.sid) for r in got.df.collect())
    # a@0 → ship@10 (in [0,45]); a@60 → ship@59 before, @120 past 105;
    # b@0 → ship@45 exactly at the inclusive upper bound
    assert pairs == [(1, 101), (3, 104)]
    # right rowtime is exposed as ts_r
    assert "ts_r" in got.df.columns


def test_window_join(env, spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    a = env.from_collection(
        [("a", t0 + dt.timedelta(minutes=10), 1),
         ("a", t0 + dt.timedelta(minutes=70), 2)],
        schema="k string, ts timestamp, av int") \
        .assign_timestamps_and_watermarks("ts", "1 hour")
    b = env.from_collection(
        [("a", t0 + dt.timedelta(minutes=20), 9),
         ("a", t0 + dt.timedelta(minutes=50), 8),
         ("a", t0 + dt.timedelta(minutes=80), 7)],
        schema="k string, bts timestamp, bv int") \
        .assign_timestamps_and_watermarks("bts", "1 hour")
    got = a.key_by("k").window_join(
        b.key_by("k"), TumblingEventTimeWindows.of("1 hour"))
    pairs = sorted((r.av, r.bv) for r in got.df.collect())
    assert pairs == [(1, 8), (1, 9), (2, 7)]


def test_sliding_count_window(env):
    """countWindow(3, 2): fires at elements 2, 4, 6... each window =
    the trailing 3 elements at the fire point (Flink CountTrigger +
    CountEvictor semantics)."""
    s = env.from_collection(
        [("a", i, i) for i in range(1, 8)],  # 7 elements, v = 1..7
        schema="k string, ts int, v int") \
        .assign_timestamps_and_watermarks("ts", "0 seconds")
    got = s.key_by("k").count_window(3, 2).aggregate(
        F.sum("v").alias("sv"), F.count("*").alias("n"))
    rows = sorted((r.count_window, r.sv, r.n) for r in got.df.collect())
    # fires at rn=2 (window {1,2}), rn=4 ({2,3,4}), rn=6 ({4,5,6});
    # rn=8 never reached with 7 elements
    assert rows == [(0, 3, 2), (1, 9, 3), (2, 15, 3)]


def test_process_with_state_running_count(env, spark, tmp_path):
    """The generic streaming KeyedProcessFunction tier: a running
    per-key count kept in GroupState across micro-batches equals the
    batch count."""
    import pandas as pd

    from flink_1_11_1_spark import catalog
    from flink_1_11_1_spark.streaming import replay

    d = str(tmp_path / "replay_pws")
    replay.write_replay(spark, SF_SMOKE, d, parts=3)
    # user_id >= 0 drops the replay harness's flush sentinel row
    stream = replay.events_stream(spark, d) \
        .filter("user_id >= 0").select("user_id", "event_id")

    def running_count(key, frames, state):
        total = state.get[0] if state.exists else 0
        for pdf in frames:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

    ds = (env.from_dataframe(stream)
          .key_by("user_id")
          .process_with_state(running_count,
                              schema="user_id long, n long",
                              state_schema="n long",
                              output_mode="update"))
    got, _ = replay.run_stream(ds.df, "update", "pws_count")
    final = {}
    for r in got:  # last update per key wins
        final[r.user_id] = r.n
    want = dict(catalog.load_table(spark, SF_SMOKE, "events")
                .groupBy("user_id").count().collect())
    assert final == want

    bounded = env.from_collection([(1, 1)], schema="user_id long, v int")
    with pytest.raises(ValueError, match="streaming"):
        bounded.key_by("user_id").process_with_state(
            running_count, "user_id long, n long", "n long")


def test_windowed_lateness_facade(env, spark, tmp_path):
    """allowed_lateness widens the effective watermark (S18 contract)
    and side_output_late_data captures exactly the aggregate's
    watermark-dropped rows (S20 contract) — through the façade names."""
    from flink_1_11_1_spark.streaming import replay
    from flink_1_11_1_spark.streaming.late import read_late_rows

    base = (1_700_000_000 // 3600) * 3600

    def frame(rows):  # (event_id, minute)
        return spark.createDataFrame(
            [(i, (base + int(m * 60)) * 10**6, 0) for i, m in rows],
            "event_id long, us long, k int",
        ).select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                 "k")

    frames = [frame([(1, 10), (2, 70)]), frame([(3, 400)]),
              frame([(4, 30), (5, 90), (6, 350)])]
    rdir = str(tmp_path / "late_facade")
    replay.write_replay_frames(frames, rdir)
    src = (spark.readStream.format("parquet").schema(frames[0].schema)
           .option("maxFilesPerTrigger", 1).load(rdir))
    ws = (env.from_dataframe(src)
          .assign_timestamps_and_watermarks("ts", "60 minutes")
          .key_by("k")
          .window(TumblingEventTimeWindows.of("1 hour")))

    # side output: the dual-watermark capture
    side = str(tmp_path / "side_out")
    q = ws.side_output_late_data(side, checkpoint=str(tmp_path / "sck"))
    q.processAllAvailable()
    q.stop()
    assert sorted(r.event_id
                  for r in read_late_rows(spark, side).collect()) == [4, 5]

    # allowed_lateness: the effective watermark widens on the plan
    widened = ws.allowed_lateness("300 minutes")
    meta = widened._keyed.df.schema["ts"].metadata
    assert meta["spark.watermarkDelayMs"] == (60 + 300) * 60 * 1000

    # a non-façade watermark cannot be widened (documented guard)
    pre = env.from_dataframe(src.withWatermark("ts", "60 minutes")) \
        .assign_timestamps_and_watermarks("ts", "60 minutes")
    with pytest.raises(ValueError, match="faç|fac"):
        pre.key_by("k").window(
            TumblingEventTimeWindows.of("1 hour")) \
            .allowed_lateness("10 minutes")


# ---------------- DataSet niches (round 8) ----------------------------


def test_sort_partition_sorts_within_not_across(env):
    s = env.from_collection(
        [(i, i % 4, 100 - i) for i in range(40)], schema="id int, g int, v int"
    )
    # force a known partitioning first, then sort within it
    parted = s._wrap(s.df.repartition(4, "g"))
    out = parted.sort_partition("v").df
    import pyspark.sql.functions as F

    pdf = out.withColumn("pid", F.spark_partition_id()).toPandas()
    # within every physical partition the v column is non-decreasing
    for _, grp in pdf.groupby("pid"):
        vs = list(grp["v"])
        assert vs == sorted(vs)
    # no shuffle happened: same partition count, same row placement keys
    assert out.rdd.getNumPartitions() == parted.df.rdd.getNumPartitions()


def test_sort_partition_chained_secondary_key(env):
    s = env.from_collection(
        [(1, 2, 9), (1, 1, 8), (2, 2, 7), (2, 1, 6)],
        schema="a int, b int, c int",
    )
    one = s._wrap(s.df.coalesce(1))
    got = [tuple(r) for r in
           one.sort_partition("a").sort_partition("b", "desc").df.collect()]
    assert got == [(1, 2, 9), (1, 1, 8), (2, 2, 7), (2, 1, 6)]


def test_partition_custom_colocates_groups(env):
    import pyspark.sql.functions as F

    s = env.from_collection(
        [(i,) for i in range(60)], schema="id bigint"
    )
    out = s.partition_custom(lambda k: int(k) % 5, "id", num_partitions=8)
    pdf = out.df.withColumn("pid", F.spark_partition_id()) \
        .withColumn("grp", F.col("id") % 5).toPandas()
    # the co-location contract: one physical partition per custom group
    assert (pdf.groupby("grp")["pid"].nunique() == 1).all()
    # expression-string variant stays native (no Python stage)
    out2 = s.partition_custom("id % 5", "id", num_partitions=8)
    plan = out2.df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan
    pdf2 = out2.df.withColumn("pid", F.spark_partition_id()) \
        .withColumn("grp", F.col("id") % 5).toPandas()
    assert (pdf2.groupby("grp")["pid"].nunique() == 1).all()


def test_broadcast_set_and_accumulator(env):
    dim = env.from_collection(
        [(1, "gold"), (2, "silver")], schema="k int, tier string"
    )
    fact = env.from_collection(
        [(1, 10), (2, 20), (1, 30), (3, 40)], schema="k int, v int"
    )
    env.register_accumulator("n_misses")

    def enrich(row, ctx):
        tiers = {r.k: r.tier for r in ctx.get_broadcast_variable("tiers")}
        t = tiers.get(row.k)
        if t is None:
            ctx.add_accumulator_value("n_misses")
        return (row.k, row.v, t or "unknown")

    out = (
        fact.with_broadcast_set("tiers", dim)
        .map(enrich, output_type="k int, v int, tier string")
    )
    got = rows(out)
    assert got == [(1, 10, "gold"), (1, 30, "gold"), (2, 20, "silver"),
                   (3, 40, "unknown")]
    assert env.get_accumulator_result("n_misses") == 1


def test_broadcast_set_missing_name_raises(env):
    fact = env.from_collection([(1,)], schema="k int")

    def f(row, ctx):
        return (len(ctx.get_broadcast_variable("nope")),)

    with pytest.raises(Exception, match="no broadcast set"):
        fact.map(f, output_type="n int").df.collect()
