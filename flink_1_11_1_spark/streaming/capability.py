"""Changelog / output-mode capability matrix (SURVEY.md §5.2 last rows).

Reference parity: FlinkChangelogModeInferenceProgram.scala decides,
per plan edge, whether the stream is insert-only / upsert / retract and
rejects plans whose sink can't consume the mode.  Spark's equivalent
decision is which ``outputMode`` a plan supports; the runtime
(``UnsupportedOperationChecker``) rejects late, with generic messages.
This module implements the *decision table* up front with Flink-planner
-style errors, so engine users get the same early, specific failure
Flink gives.

The table is the documented contract of SURVEY.md §8.3 item 1 (what is
deliberately NOT supported and why).
"""

from __future__ import annotations


class UnsupportedStreamingPlan(Exception):
    """Mirror of Flink's TableException for unsupported changelog modes."""


# (plan_feature, output_mode) -> None if fine, else error text.
# plan features: scan, project_filter, agg, windowed_agg, join_inner,
# join_outer_time_bounded, join_outer_unbounded, dedup, topn, sort
_MATRIX: dict[tuple[str, str], str | None] = {
    ("scan", "append"): None,
    ("project_filter", "append"): None,
    ("agg", "append"): (
        "Non-windowed aggregation produces an update stream; 'append' "
        "would never emit. Use output mode 'update'/'complete', or add a "
        "window + watermark (Flink: GroupAggregate requires a retract/upsert sink)."
    ),
    ("agg", "update"): None,
    ("agg", "complete"): None,
    ("windowed_agg", "append"): None,  # requires watermark; checked at wiring
    ("windowed_agg", "update"): None,
    ("join_inner", "append"): None,
    ("join_outer_time_bounded", "append"): None,
    ("join_outer_unbounded", "append"): (
        "Unbounded streaming outer join would hold both sides forever and "
        "retract nulls; not expressible in Spark micro-batch (Flink: "
        "StreamingJoinOperator with retraction). Bound it with a time "
        "condition + watermarks, or compute per-batch via foreachBatch."
    ),
    # semi/anti lower onto streaming/semi_anti.py (horizon-bounded
    # append rendering of StreamingSemiAntiJoinOperator)
    ("join_semi", "append"): None,
    ("join_anti", "append"): None,
    ("dedup", "append"): None,
    ("topn", "append"): (
        "Streaming Top-N revises earlier output (retract stream), so a "
        "pure append sink cannot render it. Route the SQL rank pattern "
        "through execute_sql — updating inners snapshot in complete "
        "mode (TopNRetractWriter), insert-only inners use the append-"
        "merge writer (AppendOnlyTopNWriter, round 12); both emit "
        "retract records (Flink: StreamExecRank's retract/upsert stream)."
    ),
    ("topn", "update"): None,
    # rowtime OVER routes via streaming/sql_over (running_over); the
    # ProcTime* OVER family (Flink 1.11 ships seven ProcTime{Rows,
    # Range}{Bounded,Unbounded}* functions) is a NAMED delta — see the
    # matching error in sql_over._PROCTIME_ERR (round 12).
    ("over_rowtime", "append"): None,
    ("over_proctime", "append"): (
        "Processing-time OVER is arrival-order-nondeterministic and has "
        "no micro-batch equivalent; order by the watermarked rowtime "
        "attribute (Flink 1.11: ProcTime{Rows,Range}{Bounded,Unbounded}* "
        "vs the implemented RowTime* family)."
    ),
    ("sort", "append"): (
        "General streaming ORDER BY is not supported (same restriction as "
        "Flink: only time-ascending or bounded sort-limit). Sort inside "
        "foreachBatch or in complete mode."
    ),
    ("sort", "complete"): None,
}


def validate(plan_feature: str, output_mode: str) -> None:
    """Raise UnsupportedStreamingPlan with a Flink-planner-style message
    if the (feature, mode) pair can't run; no-op otherwise."""
    err = _MATRIX.get((plan_feature, output_mode))
    if err:
        raise UnsupportedStreamingPlan(f"[{plan_feature} -> {output_mode}] {err}")
    if (plan_feature, output_mode) not in _MATRIX:
        raise UnsupportedStreamingPlan(
            f"[{plan_feature} -> {output_mode}] combination not in the engine's "
            "capability matrix; see flink_1_11_1_spark.streaming.capability"
        )


def supported_modes(plan_feature: str) -> list[str]:
    return [
        mode
        for (feat, mode), err in _MATRIX.items()
        if feat == plan_feature and err is None
    ]
