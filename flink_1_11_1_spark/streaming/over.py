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
- ``ForeachBatchTopN`` — the capability matrix's documented replacement
  for streaming Top-N (StreamExecRank emits a retract stream Spark
  cannot): recompute the Top-N of each complete-mode aggregate snapshot
  per trigger and hand revisions to a callback.
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


class ForeachBatchTopN:
    """Per-trigger Top-N over a complete-mode aggregate snapshot.

    ``on_result(batch_id, rows)`` receives the current Top-N list each
    trigger — successive calls ARE the revision stream Flink's
    StreamExecRank would emit as retractions.
    """

    def __init__(
        self,
        partition_by: Sequence[str],
        order_by: Sequence[Column],
        n: int,
        on_result: Callable[[int, list], None],
    ):
        self.partition_by = list(partition_by)
        self.order_by = list(order_by)
        self.n = n
        self.on_result = on_result

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.rank import top_n

        rows = top_n(batch_df, self.partition_by, self.order_by, self.n).collect()
        self.on_result(batch_id, rows)
