"""Rank / TopN / Deduplicate (SURVEY.md §3.8).

Reference parity: FlinkLogicalRankRule -> BatchExecRank /
StreamExecRank (AppendOnlyTopNFunction etc.) and StreamExecDeduplicate
(DeduplicateKeepFirst/LastRowFunction).  On Spark the same rewrite is
built in since 3.5: a ``row_number() <= k`` filter compiles to
``WindowGroupLimitExec`` (per-partition heap, no full sort) — asserted
in tests/test_plan_shape.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RANK_FNS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_n(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    n: int,
    rank_function: str = "row_number",
    rank_col: str = "rn",
    keep_rank_col: bool = True,
) -> DataFrame:
    """Top-N rows per key (Flink Rank node; WindowGroupLimit on Spark)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, _RANK_FNS[rank_function]().over(w)).where(
        F.col(rank_col) <= n
    )
    return out if keep_rank_col else out.drop(rank_col)


def deduplicate(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    keep: str = "first",
) -> DataFrame:
    """Keep first/last row per key by event order (StreamExecDeduplicate).

    Deterministic (explicit order), unlike ``dropDuplicates`` whose
    survivor is partition-order dependent.  For streams use
    ``dropDuplicatesWithinWatermark`` (keep-first) — see streaming/.

    ``keep='last'`` selects the LAST row in the GIVEN order (round-13
    review: the old ``.desc()``-every-column reversal broke on
    directional sort Columns — .desc() on an existing SortOrder — and
    an unknown ``keep`` silently meant 'last').
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep!r}")
    if keep == "first":
        return top_n(df, keys, order_by, 1, keep_rank_col=False)
    # last-in-order without reversing the (possibly directional) spec:
    # rn == count over the same partition
    w = Window.partitionBy(*keys).orderBy(*order_by)
    wall = Window.partitionBy(*keys)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(wall))
        .where("_rn = _cnt")
        .drop("_rn", "_cnt")
    )
