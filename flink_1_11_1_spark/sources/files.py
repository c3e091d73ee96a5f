"""Filesystem source/sink + debug connectors.

Reference parity (SURVEY.md §3.1): FileSystemTableSource/FileSystemTableSink
(flink-table-runtime-blink table/filesystem/), formats flink-formats/
flink-{csv,json,orc,parquet}; DataGenTableSourceFactory, Print and
BlackHole sinks; StreamingFileSink with partition commit.

Scale conventions baked in:
- partitioned layout (``partitionBy``) so partition pruning applies;
- parquet/orc scans keep predicate + projection pushdown (asserted in
  tests/test_plan_shape.py — ``PushedFilters``/``ReadSchema``);
- streaming file sink is exactly-once via the checkpoint manifest (the
  Spark equivalent of Flink's partition-commit protocol).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

# avro: spark-avro (org.apache.spark:spark-avro) is an external module
# absent in this offline sandbox; round 6 ships a pure-Python OCF codec
# (sources/avro_format.py — spec-conformant container files, deflate)
# behind the same read_table/write_table API.  On a cluster with
# --packages spark-avro, swap `_AVRO_NATIVE = True` to route through
# the JVM reader (block-splittable scans) — the API is unchanged.
FORMATS = ("parquet", "orc", "json", "csv", "avro")
_AVRO_NATIVE = False


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Partitioned batch sink (FileSystemTableSink equivalent)."""
    if fmt == "avro" and not _AVRO_NATIVE:
        from .avro_format import write_avro

        if partition_by:
            raise ValueError("python-codec avro sink: partitioning not supported")
        if mode == "overwrite":
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        write_avro(df, path)
        return
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.option("header", True)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Batch scan; schema mandatory for csv/json to keep types exact
    (Flink DDL-declared schemas — never inferred in production paths)."""
    if fmt == "avro" and not _AVRO_NATIVE:
        from .avro_format import read_avro

        return read_avro(spark, path)
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", True)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} source requires an explicit schema (engine contract)")
    return r.load(path)


def datagen_stream(
    spark: SparkSession, rows_per_second: int = 100
) -> DataFrame:
    """datagen connector equivalent: rate source (value, timestamp)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def to_console(df: DataFrame, num_rows: int = 20) -> StreamingQuery:
    """print connector equivalent."""
    return (
        df.writeStream.format("console")
        .option("numRows", num_rows)
        .outputMode("append")
        .start()
    )


def to_blackhole(df: DataFrame, checkpoint: str) -> StreamingQuery:
    """blackhole connector equivalent (noop sink)."""
    return (
        df.writeStream.format("noop")
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def write_stream_files(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
) -> StreamingQuery:
    """StreamingFileSink equivalent: exactly-once file sink.

    Readers that go through ``spark.read`` observe only committed files
    (the ``_spark_metadata`` manifest) — Flink's partition-commit
    guarantee, by manifest instead of rename protocol.
    """
    w = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.start()


def partition_values(spark: SparkSession, path: str, column: str) -> list[str]:
    """List partition directory values (metadata-only, no data scan)."""
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith(f"{column}=")
    )
