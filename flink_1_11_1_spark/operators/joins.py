"""Temporal join family (SURVEY.md §3.4).

Reference parity:
- ``asof_join``     — StreamExecTemporalJoin / TemporalRowTimeJoinOperator
  (flink-table-runtime-blink operators/join/temporal/): enrich each left
  row with the right-side version valid at the left row's time
  (``FOR SYSTEM_TIME AS OF``).
- ``interval_join`` — StreamExecIntervalJoin / TimeIntervalJoin
  (operators/join/interval/): equi-join constrained to a relative time
  window.
- ``lookup_join``   — StreamExecLookupJoin / LookupJoinRunner
  (operators/join/lookup/): per-row enrichment against a (refreshable)
  dimension table, realized as a broadcast join per (micro-)batch.

Scale notes: ``asof_join`` is the union-then-window formulation — ONE
shuffle on the join keys, then a per-partition ordered scan with
``last(..., ignorenulls)``; no per-key pandas, no driver loop, no
cross product.  This survives arbitrarily many left rows per key and is
the standard 100 TB-safe as-of plan.  ``interval_join`` relies on
Spark's range-join handling (the equi-key shuffle dominates; the range
residual filters within partitions).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _interval_us(text: str | int | float) -> int:
    """Signed interval → microseconds ('-1 hour', '0', '30 minutes',
    bare numbers = seconds)."""
    if isinstance(text, (int, float)):
        return int(text * 1_000_000)
    t = text.strip()
    if re.fullmatch(r"[+-]?\d+", t):
        return int(t) * 1_000_000
    neg = t.startswith("-")
    from ..streaming.pattern import _parse_interval

    return (-1 if neg else 1) * _parse_interval(t.lstrip("+-").strip()) * 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str] | None = None,
    tie_break: Sequence[str] = (),
    how: str = "left",
) -> DataFrame:
    """For each left row: the right row with the greatest
    ``right_time <= left_time`` per key (ties broken by ``tie_break``
    ascending — the *last* wins, matching "latest version").

    Returns all left columns plus ``right_cols`` (null when no match and
    ``how='left'``; inner drops unmatched).
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload")

    l_cols = left.columns
    ldt = dict(left.dtypes)
    # a NULL right_time is no version at all: NULLS FIRST in the window
    # order would otherwise make its payload the "earliest version"
    # fallback, where the SQL twin (right_time <= left_time) excludes it
    # (round-13 review).  Null-pad left-only columns in ONE projection
    # (the old per-column withColumn loop built O(columns) plan nodes).
    r = right.where(F.col(right_time).isNotNull()).select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        payload,
        *[
            F.lit(None).cast(ldt[c]).alias(c)
            for c in l_cols
            if c not in on
        ],
    )
    lft = left.select(
        *[F.col(c) for c in l_cols],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    r = r.select(*lft.columns)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"), *[F.col(f"_asof_payload.{c}") for c in tie_break])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lft.unionByName(r)
        .withColumn("_match", F.last("_asof_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if how == "inner":
        # the match marker is the struct itself: a right row's payload
        # struct is non-null even when every payload FIELD is null, so
        # filtering on a payload column would drop legitimately-matched
        # rows whose first right column happens to be NULL
        matched = matched.where(F.col("_match").isNotNull())
    return matched.select(
        *l_cols, *[F.col(f"_match.{c}").alias(c) for c in right_cols]
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join constrained to ``left.time + lower <= right.time <=
    left.time + upper`` (interval strings like ``'-1 hour'``/``'0'``;
    bare numbers are seconds).

    Works identically on batch DataFrames and on watermarked streams
    (where the bound also drives state cleanup — Spark native).
    Bounds normalize to microsecond interval literals and time columns
    are dataframe-qualified (round-13 review: the docstring's own '0'
    example was a parse error, and a time column name shared by both
    sides hit AMBIGUOUS_REFERENCE).
    """
    lo = F.expr(f"INTERVAL {_interval_us(lower)} MICROSECOND")
    up = F.expr(f"INTERVAL {_interval_us(upper)} MICROSECOND")
    lt, rt = left[left_time], right[right_time]
    cond = on & (rt >= lt + lo) & (rt <= lt + up)
    return left.join(right, cond, how)


class StreamingLookupJoin:
    """foreachBatch adapter for the streaming lookup join
    (StreamExecLookupJoin with a periodically-refreshed dimension).

    ``loader()`` is called once per micro-batch — the dimension snapshot
    visible when the batch starts serves every row of the batch (the
    documented batch-level contract replacing Flink's per-row lookup).

    Usage::

        q = (stream.writeStream
             .foreachBatch(StreamingLookupJoin(loader, on_cond, sink_fn))
             .start())
    """

    def __init__(self, loader, on, sink, how: str = "left"):
        self.loader = loader
        self.on = on
        self.sink = sink
        self.how = how

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        dim = self.loader()
        self.sink(batch_id, lookup_join(batch_df, dim, self.on, self.how))


def lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Enrich facts against a small dimension — always broadcast.

    Flink's per-row (async) point lookup has no Spark analogue; the
    batch-level contract is: the dimension snapshot visible when the
    (micro-)batch starts is used for every row of the batch.  For
    streaming, call this inside ``foreachBatch`` with a freshly loaded
    ``dim`` to get the "periodically refreshed" semantics.
    """
    return facts.join(F.broadcast(dim), on, how)
