"""TableEnvironment façade, TableSpec DDL layer, async-batch enrichment,
MULTISET/TIME conventions."""

import shutil
import tempfile

import pandas as pd

from pyspark.sql import functions as F

from flink_1_11_1_spark import catalog
from flink_1_11_1_spark import functions as ffn
from flink_1_11_1_spark.operators import enrich
from flink_1_11_1_spark.table_env import TableEnvironment, TableSpec, events_spec

from .conftest import SF_SMOKE


def test_table_environment_front_door(spark):
    env = TableEnvironment(spark)
    env.register_fixture_catalog(SF_SMOKE)
    df = env.execute_sql(
        "SELECT c_mktsegment, count(*) n FROM customer GROUP BY c_mktsegment"
    )
    assert df.count() == 5
    # Flink-only SQL names are registered by the environment
    assert env.execute_sql("SELECT SPLIT_INDEX('a:b', ':', 0) s").first().s == "a"
    # fluent layer: from_path returns the DataFrame itself
    t = env.from_path("customer")
    assert t.where(F.col("c_custkey") < 10).count() == 10


def test_table_spec_computed_column_and_watermark(spark):
    spec = events_spec(SF_SMOKE)
    batch = spec.load(spark)
    # computed column applied: ts is a proper timestamp, ms-floored
    assert dict(batch.dtypes)["ts"] == "timestamp"
    want = catalog.load_table(spark, SF_SMOKE, "events")
    assert batch.agg(F.max("ts")).first()[0] == want.agg(F.max("ts")).first()[0]
    stream = spec.stream(spark)
    assert stream.isStreaming
    # watermark wired into the plan
    assert "EventTimeWatermark" in stream._jdf.queryExecution().logical().toString()


def test_table_spec_create_table_roundtrip(spark):
    env = TableEnvironment(spark)
    env.create_table("events_ddl", events_spec(SF_SMOKE))
    n = env.execute_sql("SELECT count(*) c FROM events_ddl").first().c
    assert n == catalog.load_table(spark, SF_SMOKE, "events").count()


def test_async_batch_enrich(spark):
    calls = []

    def service(values: pd.Series) -> pd.Series:
        calls.append(len(values))
        return values.map(lambda s: s.upper())

    nation = catalog.load_table(spark, SF_SMOKE, "nation")
    out = enrich.enrich(nation, "n_name", "n_upper", "string", service, batch_size=7)
    rows = out.orderBy("n_nationkey").collect()
    assert [r.n_upper for r in rows] == [r.n_name.upper() for r in rows]
    # ordered emission preserved alongside original columns
    assert rows[0].n_nationkey == 0


def test_collect_multiset(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "a"), (2, "c")], ["k", "v"]
    )
    got = {
        r.k: dict(r.ms)
        for r in df.groupBy("k").agg(ffn.collect_multiset("v").alias("ms")).collect()
    }
    assert got == {1: {"a": 2, "b": 1}, 2: {"c": 1}}


def test_to_time_millis(spark):
    r = spark.sql(
        "SELECT timestamp '2024-01-01 01:02:03.456' t1, timestamp '2024-01-01 00:00:00' t2"
    ).select(
        ffn.to_time_millis("t1").alias("m1"), ffn.to_time_millis("t2").alias("m2")
    ).first()
    assert r.m1 == 1 * 3600_000 + 2 * 60_000 + 3_000 + 456 and r.m2 == 0
