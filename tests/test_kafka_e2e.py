"""Opt-in end-to-end Kafka proof (VERDICT r9 next #6).

The sandbox has no broker, so the Kafka surface is contract-tested
broker-less in tests/test_kafka.py (option mapping, reader
construction, format decode).  THIS module is the turnkey proof for a
real deployment: point ``KAFKA_BOOTSTRAP`` at a broker and the same
Flink-1.11 property surface round-trips real records through Spark's
Kafka DSv2 source/sink.

Run recipe (documented in COVERAGE.md):

    KAFKA_BOOTSTRAP=host:9092 python -m pytest tests/test_kafka_e2e.py -q

The Spark session needs the Kafka connector JAR on a real cluster:

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>

(in-sandbox the module skips before any cluster call is attempted).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="KAFKA_BOOTSTRAP not set — opt-in e2e against a real broker "
    "(see module docstring / COVERAGE.md for the run recipe)",
)


def _props(topic: str, **extra: str) -> dict[str, str]:
    return {
        "connector": "kafka",
        "topic": topic,
        "properties.bootstrap.servers": BOOTSTRAP,
        "format": "json",
        **extra,
    }


def test_sink_then_source_round_trip(spark):
    """Flink property map → Spark kafka batch sink → batch source →
    format decode: the full option-mapping path against a live broker."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from flink_1_11_1_spark.sources.kafka import (
        decode_value,
        kafka_sink_options,
        kafka_source_options,
    )

    topic = f"spark_graft_e2e_{uuid.uuid4().hex[:12]}"
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    rows = [(i, f"n{i}") for i in range(50)]
    df = spark.createDataFrame(rows, schema)
    (
        df.select(
            F.col("id").cast("string").alias("key"),
            F.to_json(F.struct("id", "name")).alias("value"),
        )
        .write.format("kafka")
        .options(**kafka_sink_options(_props(topic)))
        .save()
    )
    opts = kafka_source_options(_props(topic, **{
        "scan.startup.mode": "earliest-offset"}))
    raw = spark.read.format("kafka").options(**opts).load()
    got = decode_value(raw, _props(topic), schema)
    assert sorted((r.id, r.name) for r in got.collect()) == rows


def test_streaming_reader_available_now(spark, tmp_path):
    """kafka_stream_reader consumes a pre-filled topic with an
    availableNow trigger — the streaming half of the surface."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from flink_1_11_1_spark.sources.kafka import (
        decode_value,
        kafka_sink_options,
        kafka_stream_reader,
    )

    topic = f"spark_graft_e2e_{uuid.uuid4().hex[:12]}"
    schema = StructType([StructField("id", LongType())])
    spark.range(20).select(
        F.to_json(F.struct("id")).alias("value")
    ).write.format("kafka").options(**kafka_sink_options(_props(topic))).save()

    props = _props(topic, **{"scan.startup.mode": "earliest-offset"})
    stream = kafka_stream_reader(spark, props).load()
    out = decode_value(stream, props, schema)
    q = (
        out.writeStream.format("memory")
        .queryName("kafka_e2e_mem")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.sql(
        "SELECT id FROM kafka_e2e_mem").collect())
    assert got == list(range(20))


def test_specific_offsets_live(spark):
    """scan.startup.mode = specific-offsets starts mid-topic on a real
    partition — the one mapping the broker-less tests can only check
    syntactically."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from flink_1_11_1_spark.sources.kafka import (
        decode_value,
        kafka_sink_options,
        kafka_source_options,
    )

    topic = f"spark_graft_e2e_{uuid.uuid4().hex[:12]}"
    schema = StructType([StructField("id", LongType())])
    spark.range(10).select(
        F.to_json(F.struct("id")).alias("value")
    ).write.format("kafka").options(**kafka_sink_options(_props(topic))).save()

    props = _props(topic, **{
        "scan.startup.mode": "specific-offsets",
        "scan.startup.specific-offsets": "partition:0,offset:4",
    })
    opts = kafka_source_options(props)
    assert json.loads(opts["startingOffsets"]) == {topic: {"0": 4}}
    raw = spark.read.format("kafka").options(**opts).load()
    got = decode_value(raw, props, schema)
    # single-partition auto-created topic: offsets 4..9 remain
    assert sorted(r.id for r in got.collect()) == list(range(4, 10))
