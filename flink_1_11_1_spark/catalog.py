"""Canonical fixture catalog (FIXTURES.md contract).

Role analogue in the reference: ``GenericInMemoryCatalog`` +
``CREATE TABLE ... WITH ('connector'='filesystem','format'='parquet')``
DDL (flink-table/flink-table-common/.../catalog/Catalog.java,
flink-table/flink-sql-parser ddl/SqlCreateTable).  Here the "DDL" is a
loader that registers the ten driver-generated parquet tables as temp
views, applying the one *computed column* the contract requires
(``events.ts``: physical ns-long or µs-timestamp → ms-floored
TimestampType) — the Spark
analogue of a Flink computed-column + watermark spec on a source table.

Scale: views are plain parquet scans — predicate/projection pushdown and
partition pruning stay available to Catalyst (verified in
tests/test_plan_shape.py).  The ns→ts projection is a cheap per-row
expression fused into the scan stage by WholeStageCodegen.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

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


def ts_norm_sql(dt) -> str:
    """SQL expr normalizing events.ts to ms-floored TimestampType.

    The driver has shipped events.parquet in two physical encodings across
    rounds: INT64 TIMESTAMP(NANOS) (read as BIGINT under nanosAsLong=true)
    and plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).  The contract is
    encoding-independent: ms-floored TimestampType, matching the DuckDB
    oracle's ``date_trunc('milliseconds', ts)`` view of the same file.
    """
    from pyspark.sql.types import LongType

    if isinstance(dt, LongType):
        return "timestamp_millis(ts div 1000000)"
    return "date_trunc('MILLISECOND', cast(ts as timestamp))"


# Lazy DataFrame HANDLES per (session, sf_dir, table) — round 14: each
# spark.read.parquet call re-lists the path and re-reads the footer for
# schema (~85 ms measured), and the suite makes hundreds of load_table
# calls.  A DataFrame is an immutable plan, not data: reusing the handle
# skips only the repeated schema/footer round-trip — every action still
# computes from the parquet files (no result caching).  Same staleness
# trust as _REGISTERED below: the fixture files are immutable per the
# contract.  Keyed weakly so dropped sessions don't pin memory.
_TABLES_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table as a DataFrame."""
    configure(spark)  # nanosAsLong/UTC must hold on driver-owned sessions too
    # (configure re-runs even on cache hits — a test may have flipped a
    # runtime conf since, and register() re-asserts the same way)
    cache = _TABLES_CACHE.setdefault(spark, {})
    df = cache.get((sf_dir, name))
    if df is not None:
        return df
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Contract: ts exposed as ms-floored TimestampType regardless of
        # the parquet physical encoding (see ts_norm_sql) so Spark and the
        # DuckDB oracle compare identical values.
        df = df.withColumn("ts", F.expr(ts_norm_sql(df.schema["ts"].dataType)))
    cache[(sf_dir, name)] = df
    return df


# Which sf_dir each live session currently has registered.  The views
# are engine-owned and the parquet fixtures immutable, so re-running
# register() with the SAME sf_dir is a no-op; a DIFFERENT sf_dir always
# re-registers (alternating sf_dirs in one session must never serve
# stale views — probed in the verify skill).  Keyed weakly so dropped
# sessions don't pin memory.
_REGISTERED: WeakKeyDictionary = WeakKeyDictionary()


def register(
    spark: SparkSession, sf_dir: str | None = None, *, force: bool = False
) -> SparkSession:
    """Register all canonical views on the session. Idempotent (cached
    per session until the requested sf_dir changes).

    The cache trusts that nobody shadows the ten canonical view names
    in-session: a caller that does ``createOrReplaceTempView("events",
    derived_df)`` must pass ``force=True`` on the next register() (or
    use a different name) — otherwise the cache would silently serve
    the foreign view instead of restoring the canonical one.
    """
    configure(spark)
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if not force and _REGISTERED.get(spark) == sf_dir:
        return spark
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _REGISTERED[spark] = sf_dir
    return spark
