"""Flink 1.11 SQL group-window functions (GROUP BY TUMBLE/HOP/SESSION)
through the DDL front door — rewrite unit tests + Spark equivalence
against the native window()/session_window() twins, batch and
streaming.  Reference surface: BuiltInFunctionDefinitions TUMBLE/HOP/
SESSION groups + blink-planner LogicalWindowAggregate (SURVEY §3.6)."""

import pytest

from flink_1_11_1_spark.group_windows import (
    _interval_ms,
    rewrite_group_windows,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tenv(spark):
    from flink_1_11_1_spark.table_env import TableEnvironment

    return TableEnvironment(spark)


# ------------------------------------------------------------- rewrite unit

def test_interval_single_units():
    assert _interval_ms("INTERVAL '1' HOUR") == 3_600_000
    assert _interval_ms("interval '30' minute") == 1_800_000
    assert _interval_ms("INTERVAL '10' SECOND") == 10_000
    assert _interval_ms("INTERVAL '2' DAY") == 172_800_000
    assert _interval_ms("INTERVAL '0.001' SECOND") == 1


def test_interval_range_forms():
    assert _interval_ms("INTERVAL '1 02:03:04.5' DAY TO SECOND") == (
        86_400_000 + 2 * 3_600_000 + 3 * 60_000 + 4_500
    )
    assert _interval_ms("INTERVAL '1:30' HOUR TO MINUTE") == 5_400_000
    assert _interval_ms("INTERVAL '2:05' MINUTE TO SECOND") == 125_000


def test_interval_rejects_year_month_and_fractional_ms():
    with pytest.raises(ValueError, match="year-month"):
        _interval_ms("INTERVAL '1' MONTH")
    with pytest.raises(ValueError, match="year-month"):
        _interval_ms("INTERVAL '1' YEAR")
    with pytest.raises(ValueError, match="whole number"):
        _interval_ms("INTERVAL '0.0001' SECOND")
    with pytest.raises(ValueError, match="INTERVAL"):
        _interval_ms("'1' HOUR")


def test_rewrite_basic_forms():
    out = rewrite_group_windows(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) ws FROM t "
        "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '3600000 milliseconds')" in out
    assert "window.start ws" in out
    # HOP: Flink (time, slide, size) -> Spark (time, size, slide)
    out = rewrite_group_windows(
        "SELECT 1 FROM t GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '3600000 milliseconds', '1800000 milliseconds')" in out
    out = rewrite_group_windows(
        "SELECT SESSION_END(ts, INTERVAL '5' MINUTE) se FROM t "
        "GROUP BY SESSION(ts, INTERVAL '5' MINUTE)"
    )
    assert "session_window(ts, '300000 milliseconds')" in out
    assert "session_window.end se" in out


def test_rewrite_rowtime_is_end_minus_1ms():
    out = rewrite_group_windows(
        "SELECT TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR) rt FROM t "
        "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    assert "(window.end - INTERVAL '0.001' SECOND) rt" in out


def test_rewrite_skips_literals_and_identifier_boundaries():
    sql = "SELECT 'TUMBLE(x, INTERVAL ''1'' HOUR)' lit, user_session(x) FROM t"
    assert rewrite_group_windows(sql) == sql
    # no group-window token at all -> same object back (cheap path)
    sql2 = "SELECT 1"
    assert rewrite_group_windows(sql2) is sql2


def test_rewrite_nested_expression_args():
    out = rewrite_group_windows(
        "SELECT 1 FROM t GROUP BY k, "
        "TUMBLE(coalesce(ts, cast('2024-01-01' as timestamp)), INTERVAL '1' HOUR)"
    )
    assert (
        "window(coalesce(ts, cast('2024-01-01' as timestamp)), "
        "'3600000 milliseconds')" in out
    )


# --------------------------------------------------------- batch equivalence

def test_tumble_sql_equals_native(tenv):
    from flink_1_11_1_spark import catalog

    catalog.register(tenv.spark, SF_SMOKE)
    got = tenv.execute_sql(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) ws, "
        "TUMBLE_END(ts, INTERVAL '1' HOUR) we, "
        "TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR) rt, count(*) n "
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR) ORDER BY ws"
    ).collect()
    want = tenv.spark.sql(
        "SELECT date_trunc('hour', ts) ws, count(*) n FROM events "
        "GROUP BY date_trunc('hour', ts) ORDER BY ws"
    ).collect()
    assert [(r.ws, r.n) for r in got] == [(r.ws, r.n) for r in want]
    for r in got:
        assert (r.we - r.ws).total_seconds() == 3600
        assert (r.we - r.rt).total_seconds() == pytest.approx(0.001)


def test_hop_sql_equals_union_of_shifted(tenv):
    from flink_1_11_1_spark import catalog

    catalog.register(tenv.spark, SF_SMOKE)
    got = tenv.execute_sql(
        "SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) ws, "
        "count(*) n FROM events "
        "GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) ORDER BY ws"
    ).collect()
    want = tenv.spark.sql(
        """
        WITH half AS (
          SELECT CASE WHEN extract(minute from ts) >= 30
                      THEN date_trunc('hour', ts) + INTERVAL 30 MINUTE
                      ELSE date_trunc('hour', ts) END slot FROM events)
        SELECT ws, count(*) n FROM (
          SELECT slot ws FROM half
          UNION ALL SELECT slot - INTERVAL 30 MINUTE FROM half)
        GROUP BY ws ORDER BY ws
        """
    ).collect()
    assert [(r.ws, r.n) for r in got] == [(r.ws, r.n) for r in want]


def test_session_sql_equals_gaps_and_islands(tenv):
    from flink_1_11_1_spark import catalog

    catalog.register(tenv.spark, SF_SMOKE)
    got = tenv.execute_sql(
        "SELECT user_id, SESSION_START(ts, INTERVAL '30' MINUTE) ss, count(*) n "
        "FROM events GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE) "
        "ORDER BY user_id, ss"
    ).collect()
    want = tenv.spark.sql(
        """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END brk FROM events),
         sess AS (SELECT user_id, ts,
                         sum(brk) OVER (PARTITION BY user_id ORDER BY ts) sid
                  FROM marked)
        SELECT user_id, min(ts) ss, count(*) n
        FROM sess GROUP BY user_id, sid ORDER BY user_id, ss
        """
    ).collect()
    assert [(r.user_id, r.ss, r.n) for r in got] == [
        (r.user_id, r.ss, r.n) for r in want
    ]


def test_group_window_in_create_view_body(tenv):
    from flink_1_11_1_spark import catalog

    catalog.register(tenv.spark, SF_SMOKE)
    tenv.execute_sql(
        "CREATE VIEW gw_hourly_v AS "
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) ws, count(*) n "
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    try:
        total = tenv.execute_sql(
            "SELECT sum(n) s FROM gw_hourly_v"
        ).collect()[0].s
        want = tenv.spark.sql("SELECT count(*) c FROM events").collect()[0].c
        assert total == want
    finally:
        tenv.execute_sql("DROP VIEW gw_hourly_v")


# ----------------------------------------------------- streaming equivalence

def test_streaming_tumble_sql_equals_batch(tenv, tmp_path):
    """The Flink streaming SQL text (GROUP BY TUMBLE over a watermarked
    replay source) through execute_sql — spark.sql over a streaming temp
    view keeps the plan streaming, so the rewrite must land on the
    native window() for the append-mode aggregate to run."""
    from flink_1_11_1_spark import catalog
    from flink_1_11_1_spark.streaming import replay

    d = str(tmp_path / "replay_gw")
    replay.write_replay(tenv.spark, SF_SMOKE, d, parts=4)
    tenv.execute_sql(
        f"""
        CREATE TABLE gw_events_s (
          event_id BIGINT, ts TIMESTAMP(3), user_id BIGINT,
          event_type STRING, value DOUBLE, props STRING,
          WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE
        ) WITH ('connector'='filesystem', 'path'='{d}', 'format'='parquet',
                'source.max-files-per-trigger'='1')
        """
    )
    try:
        stream = tenv.stream_table("gw_events_s")
        stream.createOrReplaceTempView("gw_events_stream_v")
        agg = tenv.execute_sql(
            "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) ws, event_type, "
            "count(*) n FROM gw_events_stream_v "
            "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type"
        )
        assert agg.isStreaming
        got, dropped = replay.run_stream(agg, "append", "gw_sql_tumble")
        assert dropped == 0
        catalog.register(tenv.spark, SF_SMOKE)
        batch = tenv.spark.sql(
            "SELECT date_trunc('hour', ts) ws, event_type, count(*) n "
            "FROM events GROUP BY date_trunc('hour', ts), event_type"
        )
        want_m = {(str(r.ws), r.event_type): r.n for r in batch.collect()}
        got_m = {(str(r.ws), r.event_type): r.n for r in got}
        assert got_m == want_m
    finally:
        tenv.execute_sql("DROP TABLE gw_events_s")
        tenv.spark.catalog.dropTempView("gw_events_stream_v")


def test_rewrite_tolerates_unbalanced_comment_fragment():
    s = "SELECT 1 -- TUMBLE(oops\nFROM t"
    assert rewrite_group_windows(s) == s
    out = rewrite_group_windows(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) ws FROM t "
        "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR) -- HOP(x"
    )
    assert "window(ts, '3600000 milliseconds')" in out and "-- HOP(x" in out


def test_streaming_hop_and_session_sql_equal_batch(tenv, tmp_path):
    """HOP and SESSION families through the streaming SQL path (the
    tumble twin above covers TUMBLE): Spark plans both natively on a
    watermarked streaming view after the rewrite."""
    from flink_1_11_1_spark import catalog
    from flink_1_11_1_spark.streaming import replay

    d = str(tmp_path / "replay_gw2")
    replay.write_replay(tenv.spark, SF_SMOKE, d, parts=4)
    tenv.execute_sql(
        f"""
        CREATE TABLE gw_events_s2 (
          event_id BIGINT, ts TIMESTAMP(3), user_id BIGINT,
          event_type STRING, value DOUBLE, props STRING,
          WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE
        ) WITH ('connector'='filesystem', 'path'='{d}', 'format'='parquet',
                'source.max-files-per-trigger'='1')
        """
    )
    try:
        stream = tenv.stream_table("gw_events_s2")
        stream.createOrReplaceTempView("gw_events_stream_v2")
        hop = tenv.execute_sql(
            "SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) ws, "
            "count(*) n FROM gw_events_stream_v2 "
            "GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)"
        )
        assert hop.isStreaming
        got_hop, dropped = replay.run_stream(hop, "append", "gw_sql_hop")
        assert dropped == 0
        catalog.register(tenv.spark, SF_SMOKE)
        want_hop = tenv.execute_sql(
            "SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) ws, "
            "count(*) n FROM events "
            "GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)"
        ).collect()
        assert {(str(r.ws), r.n) for r in got_hop} == {
            (str(r.ws), r.n) for r in want_hop
        }

        sess = tenv.execute_sql(
            "SELECT user_id, SESSION_START(ts, INTERVAL '30' MINUTE) ss, "
            "count(*) n FROM gw_events_stream_v2 "
            "GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)"
        )
        assert sess.isStreaming
        got_sess, dropped2 = replay.run_stream(sess, "append", "gw_sql_sess")
        assert dropped2 == 0
        want_sess = tenv.execute_sql(
            "SELECT user_id, SESSION_START(ts, INTERVAL '30' MINUTE) ss, "
            "count(*) n FROM events "
            "GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)"
        ).collect()
        assert {(r.user_id, str(r.ss), r.n) for r in got_sess} == {
            (r.user_id, str(r.ss), r.n) for r in want_sess
        }
    finally:
        tenv.execute_sql("DROP TABLE gw_events_s2")
        tenv.spark.catalog.dropTempView("gw_events_stream_v2")


@pytest.mark.parametrize("slide_min,size_min", [(30, 60), (20, 60), (30, 90)])
def test_hop_equivalence_general_multiples(tenv, slide_min, size_min):
    """HOP(ts, slide, size) with size = k*slide must equal the union of
    k phase-shifted slide-grained tumbles — the general-k version of
    the q35 identity (k=2, 3 covered)."""
    from flink_1_11_1_spark import catalog

    catalog.register(tenv.spark, SF_SMOKE)
    got = tenv.execute_sql(
        f"SELECT HOP_START(ts, INTERVAL '{slide_min}' MINUTE, "
        f"INTERVAL '{size_min}' MINUTE) ws, count(*) n FROM events "
        f"GROUP BY HOP(ts, INTERVAL '{slide_min}' MINUTE, "
        f"INTERVAL '{size_min}' MINUTE) ORDER BY ws"
    ).collect()
    k = size_min // slide_min
    ms = slide_min * 60000
    want = tenv.spark.sql(
        f"""
        WITH base AS (
          SELECT timestamp_millis(
                   floor(unix_millis(ts) / {ms}) * {ms}) slot FROM events)
        SELECT ws, count(*) n FROM (
          SELECT slot - make_interval(0, 0, 0, 0, 0, {slide_min} * i, 0) ws
          FROM base LATERAL VIEW explode(sequence(0, {k - 1})) t AS i)
        GROUP BY ws ORDER BY ws
        """
    ).collect()
    assert [(r.ws, r.n) for r in got] == [(r.ws, r.n) for r in want]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _MS_U = {"SECOND": 1000, "MINUTE": 60000, "HOUR": 3600000,
             "DAY": 86400000}

    @given(st.integers(1, 10**6),
           st.sampled_from(["SECOND", "MINUTE", "HOUR", "DAY"]))
    @settings(max_examples=60, deadline=None)
    def test_interval_fuzz_single_field(v, unit):
        assert _interval_ms(f"INTERVAL '{v}' {unit}") == v * _MS_U[unit]

    @given(st.integers(0, 3), st.integers(0, 23),
           st.integers(0, 59), st.integers(0, 59))
    @settings(max_examples=60, deadline=None)
    def test_interval_fuzz_day_to_second(d, h, m, s):
        want = ((d * 24 + h) * 60 + m) * 60000 + s * 1000
        if want == 0:
            return  # zero-length windows are rejected by design
        got = _interval_ms(f"INTERVAL '{d} {h}:{m}:{s}' DAY TO SECOND")
        assert got == want
except ImportError:  # pragma: no cover
    pass
