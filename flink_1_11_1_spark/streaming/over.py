"""Streaming OVER aggregates + Top-N (SURVEY.md §3.7/§3.8 stream rows).

Reference parity:
- ``running_sum`` — StreamExecOverAggregate /
  RowTimeRowsUnboundedPrecedingFunction (flink-table-runtime-blink
  operators/over/): per-key running aggregate in event-time order.
  Faithful semantics require exactly Flink's trick: BUFFER rows in keyed
  state and only fold+emit those at or below the current WATERMARK —
  later-arriving earlier rows would otherwise corrupt the running value.
  ``applyInPandasWithState`` exposes the watermark
  (``GroupState.getCurrentWatermarkMs``), so the operator is a direct
  translation; rows above the watermark stay buffered for a later
  trigger (the replay flush sentinel drains them at end of input).
- ``TopNRetractWriter`` — the capability matrix's documented
  replacement for streaming Top-N: recompute the Top-N of each
  complete-mode aggregate snapshot per trigger and render the rank
  revisions as a StreamExecRank-style retract stream, executor-side
  (``changelog.RetractStreamWriter`` keyed by rank slot).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OVER_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("running_sum", DoubleType()),
    ]
)

_OVER_STATE = StructType(
    [
        StructField("acc", DoubleType()),
        StructField("ids", ArrayType(LongType())),
        StructField("tss", ArrayType(LongType())),  # epoch micros
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def running_sum(events: DataFrame) -> DataFrame:
    """Event-time running sum of ``value`` per ``user_id`` (ROWS
    UNBOUNDED PRECEDING, order ts/event_id), watermark-gated emission.

    Input columns: user_id, event_id, ts, value (stream must carry a
    watermark on ts).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..session import configure

    configure(events.sparkSession)

    def fn(key, rows: Iterator[pd.DataFrame], state: GroupState):
        parts = [p for p in rows if len(p)]
        if state.exists:
            acc, ids, tss, vals = state.get
            buf = list(zip(ids, tss, vals))
        else:
            acc, buf = 0.0, []
        for p in parts:
            for ev in p.itertuples():
                buf.append((int(ev.event_id), int(ev.ts.value // 1000), float(ev.value)))
        wm_us = state.getCurrentWatermarkMs() * 1000
        buf.sort(key=lambda r: (r[1], r[0]))
        out, keep = [], []
        for eid, ts_us, val in buf:
            if ts_us <= wm_us:
                acc += val
                out.append((key[0], eid, pd.Timestamp(ts_us * 1000), acc))
            else:
                keep.append((eid, ts_us, val))
        if keep or not state.hasTimedOut:
            state.update(
                (acc, [r[0] for r in keep], [r[1] for r in keep], [r[2] for r in keep])
            )
            if keep:
                # event-time timer (Flink's registerEventTimeTimer): fire
                # when the watermark reaches the earliest buffered row, so
                # the tail drains even if the key receives no new input.
                state.setTimeoutTimestamp(
                    max(min(r[1] for r in keep) // 1000, state.getCurrentWatermarkMs() + 1)
                )
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "ts", "running_sum"])

    return events.groupBy("user_id").applyInPandasWithState(
        fn, OVER_SCHEMA, _OVER_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )


class TopNRetractWriter:
    """Per-trigger Top-N revision stream over a complete-mode aggregate
    snapshot, rendered executor-side as retract records.

    Flink's StreamExecRank emits the Top-N as an updating table —
    retract the row leaving a rank slot, add its replacement.  This
    adapter reproduces exactly that: each trigger ranks the snapshot
    (WindowGroupLimit plan), then delegates to
    ``changelog.RetractStreamWriter`` keyed by (partition, rank-slot),
    so a rank whose occupant changed appends ``(False, old)`` then
    ``(True, new)`` and the folded records table always equals the
    current Top-N (read with ``changelog.read_retracts``).  Nothing is
    collected on the driver — the round-5 version materialized n×keys
    rows per trigger."""

    def __init__(
        self,
        partition_by: Sequence[str],
        order_by: Sequence[Column],
        n: int,
        workdir: str,
    ):
        from .changelog import RetractStreamWriter

        self.partition_by = list(partition_by)
        self.order_by = list(order_by)
        self.n = n
        self._writer = RetractStreamWriter([*self.partition_by, "rn"], workdir)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.rank import top_n

        ranked = top_n(batch_df, self.partition_by, self.order_by, self.n)
        self._writer(ranked, batch_id)
