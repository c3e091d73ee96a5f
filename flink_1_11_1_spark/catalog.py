"""Canonical fixture catalog (FIXTURES.md contract).

Role analogue in the reference: ``GenericInMemoryCatalog`` +
``CREATE TABLE ... WITH ('connector'='filesystem','format'='parquet')``
DDL (flink-table/flink-table-common/.../catalog/Catalog.java,
flink-table/flink-sql-parser ddl/SqlCreateTable).  Here the "DDL" is a
loader that registers the ten driver-generated parquet tables as temp
views, applying the one *computed column* the contract requires
(``events.ts``: INT64 nanos → ms-floored TimestampType) — the Spark
analogue of a Flink computed-column + watermark spec on a source table.

Scale: views are plain parquet scans — predicate/projection pushdown and
partition pruning stay available to Catalyst (verified in
tests/test_plan_shape.py).  The ns→ts projection is a cheap per-row
expression fused into the scan stage by WholeStageCodegen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table as a DataFrame."""
    configure(spark)  # nanosAsLong/UTC must hold on driver-owned sessions too
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts arrives as BIGINT nanoseconds (nanosAsLong=true).  Contract:
        # floor to milliseconds, expose as TimestampType (µs precision,
        # ms-aligned) so Spark and the DuckDB oracle see identical values.
        df = df.withColumn("ts", F.timestamp_millis(F.expr("ts div 1000000")))
    return df


def register(spark: SparkSession, sf_dir: str | None = None) -> SparkSession:
    """Register all canonical views on the session. Idempotent."""
    configure(spark)
    sf_dir = sf_dir or DEFAULT_SF_DIR
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark
