"""Late-data side output (SURVEY.md §3.11 row "Late-data handling" —
the ``WindowedStream#sideOutputLateData`` half of the contract; the
allowedLateness re-fire half is S18's update-mode rendering).

Flink tags rows that arrive behind the watermark with an OutputTag and
diverts them to a side stream.  Spark drops them inside the stateful
operator with only a counter (``numRowsDroppedByWatermark``).  This
adapter reconstructs the side output with the dual-watermark pattern
the survey prescribed: a SECOND, stateless consumer of the same source
replays the main query's watermark arithmetic (watermark = max event
time of PREVIOUS batches − delay, exactly Spark's update rule) and
appends the would-be-dropped rows to a side sink — executor-side
filtering and writes, per-batch idempotent paths; the driver holds two
numbers (previous max, delay), never rows.

Granularity delta, documented: Spark's window aggregate drops by
WINDOW END ≤ watermark, so a row can be row-late here yet still
absorbed by its open window there (delay-wide windows).  The adapter's
row-level rule (``ts < watermark``) is Flink's DataStream semantics —
the conservative superset; pass ``window_size`` to reproduce the
window-level rule instead (late iff the row's window END ≤ watermark,
matching numRowsDroppedByWatermark's accounting exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pattern import _parse_interval


class LateSideOutput:
    """foreachBatch adapter: appends rows behind the replayed watermark
    to ``sink_path`` (parquet, per-batch idempotent subdirectory)."""

    def __init__(
        self,
        ts_col: str,
        delay: str | int,
        sink_path: str,
        window_size: str | int | None = None,
    ):
        self.ts_col = ts_col
        self.delay_us = _parse_interval(delay) * 1_000_000
        self.window_us = (
            _parse_interval(window_size) * 1_000_000 if window_size else None
        )
        self.sink_path = str(sink_path)
        self._max_us: int | None = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        ts_us = F.unix_micros(F.col(self.ts_col))
        if self._max_us is not None:
            wm_us = self._max_us - self.delay_us
            if self.window_us:
                # window-level rule: late iff the row's window END <= wm
                win_end = (
                    (ts_us / self.window_us).cast("long") + 1
                ) * self.window_us
                cond = win_end <= F.lit(wm_us)
            else:
                cond = ts_us < F.lit(wm_us)
            batch_df.where(cond).write.mode("overwrite").parquet(
                f"{self.sink_path}/b{batch_id}"
            )
        # watermark update rule: max event time of batches SEEN SO FAR
        # feeds the NEXT batch's watermark (Spark updates between
        # micro-batches)
        row = batch_df.agg(F.max(ts_us).alias("m")).first()
        if row and row.m is not None:
            self._max_us = max(self._max_us or 0, int(row.m))


def read_late_rows(spark: SparkSession, sink_path: str) -> DataFrame:
    """The captured side output across batches."""
    return spark.read.parquet(f"{sink_path}/b*")
