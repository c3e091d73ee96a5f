"""Kafka connector option mapping (SURVEY.md §3.1 Kafka source/sink).

Reference parity: flink-connector-kafka FlinkKafkaConsumer /
KafkaDynamicTableFactory — the Flink SQL `WITH (...)` property surface
of the 1.11 `connector = 'kafka'` table:

    'topic', 'properties.bootstrap.servers', 'properties.group.id',
    'scan.startup.mode'          earliest-offset | latest-offset |
                                 group-offsets | timestamp | specific-offsets
    'scan.startup.timestamp-millis', 'scan.startup.specific-offsets'
                                 ("partition:0,offset:42;partition:1,offset:300")
    'format'                     json | csv | debezium-json | canal-json
    'sink.partitioner'           fixed | round-robin

This module translates that property map onto Spark's native Kafka
DSv2 source/sink options (the translation IS the operator — Spark's
`format("kafka")` supplies the runtime).  No broker exists in this
sandbox, so the contract tests cover the mapping + reader construction;
`load()`/`start()` are the only calls that touch a cluster.  CDC formats
route the decoded value through operators/cdc.debezium_decode /
canal_decode exactly as Flink's format stack does.

At scale: Spark's Kafka source maps one Kafka partition to one Spark
task (minPartitions can split further) — partition parallelism carries
over 1:1 from the Flink job.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

_STARTUP_MODES = {
    "earliest-offset": "earliest",
    "latest-offset": "latest",
    "group-offsets": None,  # Spark: committed offsets are not a start mode
    "timestamp": "__timestamp__",
    "specific-offsets": "__specific__",
}

_FORMATS = ("json", "csv", "debezium-json", "canal-json")


class KafkaOptionError(ValueError):
    """Flink-style early validation error for the option surface."""


def _parse_specific_offsets(spec: str, topic: str) -> str:
    """'partition:0,offset:42;partition:1,offset:300' → Spark JSON."""
    per_partition: dict[str, int] = {}
    for chunk in spec.split(";"):
        fields = dict(kv.split(":", 1) for kv in chunk.split(","))
        try:
            per_partition[str(int(fields["partition"]))] = int(fields["offset"])
        except KeyError as e:
            raise KafkaOptionError(
                f"scan.startup.specific-offsets chunk {chunk!r} needs "
                "partition:<n>,offset:<n>"
            ) from e
    return json.dumps({topic: per_partition})


def kafka_source_options(props: dict[str, str]) -> dict[str, str]:
    """Map Flink 1.11 kafka WITH-properties to Spark readStream options."""
    if props.get("connector") not in ("kafka", None):
        raise KafkaOptionError(f"not a kafka connector: {props.get('connector')!r}")
    topic = props.get("topic")
    servers = props.get("properties.bootstrap.servers")
    if not topic or not servers:
        raise KafkaOptionError(
            "'topic' and 'properties.bootstrap.servers' are required"
        )
    fmt = props.get("format", "json")
    if fmt not in _FORMATS:
        raise KafkaOptionError(f"unsupported format {fmt!r} (supported: {_FORMATS})")

    out = {"kafka.bootstrap.servers": servers, "subscribe": topic}
    mode = props.get("scan.startup.mode", "group-offsets")
    if mode not in _STARTUP_MODES:
        raise KafkaOptionError(
            f"unknown scan.startup.mode {mode!r} (known: {sorted(_STARTUP_MODES)})"
        )
    mapped = _STARTUP_MODES[mode]
    if mapped == "__timestamp__":
        ts = props.get("scan.startup.timestamp-millis")
        if not ts:
            raise KafkaOptionError(
                "scan.startup.mode=timestamp requires scan.startup.timestamp-millis"
            )
        out["startingTimestamp"] = str(int(ts))
    elif mapped == "__specific__":
        spec = props.get("scan.startup.specific-offsets")
        if not spec:
            raise KafkaOptionError(
                "scan.startup.mode=specific-offsets requires "
                "scan.startup.specific-offsets"
            )
        out["startingOffsets"] = _parse_specific_offsets(spec, topic)
    elif mapped:
        out["startingOffsets"] = mapped
    # group-offsets: Spark tracks progress in its own checkpoint; the
    # group id is still forwarded for quota/monitoring parity.
    gid = props.get("properties.group.id")
    if gid:
        out["kafka.group.id"] = gid
    # passthrough of remaining kafka client properties.*
    for k, v in props.items():
        if k.startswith("properties.") and k not in (
            "properties.bootstrap.servers",
            "properties.group.id",
        ):
            out["kafka." + k[len("properties."):]] = v
    return out


def kafka_sink_options(props: dict[str, str]) -> dict[str, str]:
    """Map Flink kafka sink properties to Spark writeStream options."""
    topic = props.get("topic")
    servers = props.get("properties.bootstrap.servers")
    if not topic or not servers:
        raise KafkaOptionError(
            "'topic' and 'properties.bootstrap.servers' are required"
        )
    partitioner = props.get("sink.partitioner", "fixed")
    if partitioner not in ("fixed", "round-robin"):
        raise KafkaOptionError(
            f"unsupported sink.partitioner {partitioner!r} (custom classes "
            "need a JVM partitioner; route through a 'key' column instead)"
        )
    return {"kafka.bootstrap.servers": servers, "topic": topic}


def kafka_stream_reader(spark: SparkSession, props: dict[str, str]):
    """Configured (not started) readStream builder for the table props."""
    return spark.readStream.format("kafka").options(**kafka_source_options(props))


def decode_value(df: DataFrame, props: dict[str, str], row_schema) -> DataFrame:
    """Apply the table's 'format' to the raw kafka value column —
    json/csv straight parse, CDC formats through operators/cdc."""
    from pyspark.sql import functions as F

    from ..operators import cdc

    fmt = props.get("format", "json")
    val = F.col("value").cast("string")
    if fmt == "debezium-json":
        return cdc.debezium_decode(df.select(val.alias("v")), "v", row_schema)
    if fmt == "canal-json":
        return cdc.canal_decode(df.select(val.alias("v")), "v", row_schema)
    if fmt == "json":
        return df.select(F.from_json(val, row_schema).alias("r")).select("r.*")
    if fmt == "csv":
        return df.select(F.from_csv(val, row_schema.simpleString()).alias("r")).select(
            "r.*"
        )
    raise KafkaOptionError(f"unsupported format {fmt!r}")
