"""Queryable state (SURVEY.md §3.11 — the flink-queryable-state/ row,
a recorded scope call in rounds 1–5, closed in round 6).

Reference parity: ``QueryableStateClient.getKvState`` (public tree
flink-queryable-state/flink-queryable-state-client-java) lets an
external process read a running job's keyed state by key.  Spark's
native equivalent is the State Data Source (``format("statestore")`` /
``format("state-metadata")``, Spark 4): every stateful streaming
operator's keyed state is readable as a DataFrame straight from the
checkpoint location — the last COMMITTED micro-batch's snapshot, which
is exactly the consistency Flink's client gives (state as of the last
completed checkpoint for that key group).

Differences, documented: Flink serves point lookups over RPC against
live TaskManager memory; Spark serves a scan over the checkpoint files
— higher latency per lookup, but a full relational surface (filter,
join, aggregate over the state itself) instead of a get-by-key API,
and no extra serving infrastructure.  The lookup here pushes the key
filter into the scan, so a point read touches only matching state
files' key ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The checkpoint's stateful operators + batch ranges
    (``state-metadata`` source): which state exists to query."""
    return spark.read.format("state-metadata").load(checkpoint)


def query_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int | None = None,
    batch_id: int | None = None,
    store_name: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """The keyed state of a (possibly running) streaming query as a
    DataFrame — Flink's queryable-state surface, relational.

    Defaults to the last committed batch of operator 0's default store.
    ``flatten`` lifts the key/value struct fields to top-level columns
    (key fields first), the shape a lookup join against state wants.
    """
    r = spark.read.format("statestore")
    if operator_id is not None:
        r = r.option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    df = r.load(checkpoint)
    if not flatten:
        return df
    key_names = [f.name for f in df.schema["key"].dataType.fields]
    key_cols = [F.col(f"key.{n}") for n in key_names]
    # collision-safe: a value field repeating a key field's name (state
    # that stores its own key) gets a value_ prefix — a bare flatten
    # produced duplicate columns and state_lookup then failed with
    # AMBIGUOUS_REFERENCE (round-13 review)
    val_cols = [
        F.col(f"value.{f.name}").alias(
            f"value_{f.name}" if f.name in key_names else f.name
        )
        for f in df.schema["value"].dataType.fields
    ]
    return df.select(*key_cols, *val_cols)


def state_lookup(
    spark: SparkSession,
    checkpoint: str,
    key: dict,
    **kwargs,
) -> list:
    """Point lookup — ``QueryableStateClient.getKvState`` shape: the
    state rows whose key struct matches ``key`` exactly.  Returns
    collected rows (a point read IS driver-side by definition)."""
    df = query_state(spark, checkpoint, **kwargs)
    for k, v in key.items():
        df = df.where(F.col(k) == F.lit(v))
    return df.collect()
