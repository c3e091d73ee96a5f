"""Kafka connector option-mapping contract (sources/kafka.py).

No broker exists here; the contract under test is the Flink-1.11
WITH-property surface → Spark Kafka DSv2 option translation, reader
construction (connection-free), and the format → value-decode routing.
"""

import json

import pytest

from pyspark.sql.types import StructType

from flink_1_11_1_spark.sources import kafka as K

BASE = {
    "connector": "kafka",
    "topic": "orders",
    "properties.bootstrap.servers": "broker1:9092,broker2:9092",
}


def test_default_mode_forwards_group_id_without_offsets():
    opts = K.kafka_source_options({**BASE, "properties.group.id": "flink-job"})
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "orders"
    assert opts["kafka.group.id"] == "flink-job"
    assert "startingOffsets" not in opts  # group-offsets: checkpoint-owned


@pytest.mark.parametrize(
    "mode,expected", [("earliest-offset", "earliest"), ("latest-offset", "latest")]
)
def test_simple_startup_modes(mode, expected):
    opts = K.kafka_source_options({**BASE, "scan.startup.mode": mode})
    assert opts["startingOffsets"] == expected


def test_timestamp_mode():
    opts = K.kafka_source_options(
        {**BASE, "scan.startup.mode": "timestamp",
         "scan.startup.timestamp-millis": "1620000000000"}
    )
    assert opts["startingTimestamp"] == "1620000000000"
    with pytest.raises(K.KafkaOptionError, match="timestamp-millis"):
        K.kafka_source_options({**BASE, "scan.startup.mode": "timestamp"})


def test_specific_offsets_rendered_as_spark_json():
    opts = K.kafka_source_options(
        {**BASE, "scan.startup.mode": "specific-offsets",
         "scan.startup.specific-offsets": "partition:0,offset:42;partition:1,offset:300"}
    )
    assert json.loads(opts["startingOffsets"]) == {"orders": {"0": 42, "1": 300}}


def test_client_property_passthrough():
    opts = K.kafka_source_options(
        {**BASE, "properties.security.protocol": "SASL_SSL",
         "properties.max.poll.records": "1000"}
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.max.poll.records"] == "1000"


def test_required_and_unknown_options_rejected():
    with pytest.raises(K.KafkaOptionError, match="required"):
        K.kafka_source_options({"connector": "kafka", "topic": "t"})
    with pytest.raises(K.KafkaOptionError, match="scan.startup.mode"):
        K.kafka_source_options({**BASE, "scan.startup.mode": "bogus"})
    with pytest.raises(K.KafkaOptionError, match="format"):
        K.kafka_source_options({**BASE, "format": "protobuf"})


def test_sink_options_and_partitioner_gate():
    opts = K.kafka_sink_options({**BASE})
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "topic": "orders",
    }
    with pytest.raises(K.KafkaOptionError, match="partitioner"):
        K.kafka_sink_options({**BASE, "sink.partitioner": "com.example.Custom"})


def test_reader_construction_is_connection_free(spark):
    reader = K.kafka_stream_reader(
        spark, {**BASE, "scan.startup.mode": "earliest-offset"}
    )
    # builder exists and is configured; .load() would need the broker
    assert reader is not None


def test_decode_value_routes_debezium(spark):
    schema = StructType().add("id", "long").add("name", "string")
    payload = json.dumps(
        {"before": {"id": 1, "name": "a"}, "after": {"id": 1, "name": "b"}, "op": "u"}
    )
    df = spark.createDataFrame([(payload.encode(),)], "value binary")
    rows = K.decode_value(df, {**BASE, "format": "debezium-json"}, schema).collect()
    assert [(r.row_kind, r.id, r.name) for r in rows] == [("-U", 1, "a"), ("+U", 1, "b")]


def test_decode_value_routes_json_and_csv(spark):
    schema = StructType().add("id", "long").add("name", "string")
    dj = spark.createDataFrame([(b'{"id": 7, "name": "x"}',)], "value binary")
    got = K.decode_value(dj, {**BASE, "format": "json"}, schema).collect()
    assert [(r.id, r.name) for r in got] == [(7, "x")]
    dc = spark.createDataFrame([(b"7,x",)], "value binary")
    got = K.decode_value(dc, {**BASE, "format": "csv"}, schema).collect()
    assert [(r.id, r.name) for r in got] == [(7, "x")]
