"""Skew mitigation (SURVEY.md "Optimize for scale": salting, split-agg).

Reference parity: Flink's SplitAggregateRule
(table.optimizer.distinct-agg.split.enabled) rewrites a skewed
aggregate into partial-on-``hash(key) % N``-buckets + final merge; its
skew-join answer is static hints.  Spark gives AQE skew-join splitting
for free at runtime; these helpers cover the cases AQE does not:

- ``salted_agg``: two-phase aggregate through an explicit salt — for a
  *pathologically* hot grouping key whose single post-shuffle partition
  would not fit an executor even after AQE coalescing.
- ``salted_join``: replicate the (small-ish) build side across N salts
  and scatter the probe side — the classic hot-key equi-join fix when
  the build side is too big to broadcast outright.

Both are algebraic rewrites: results are exactly equal to the unsalted
plan (asserted in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial agg fn, merge fn) per supported aggregate
_MERGE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate via explicit salting.

    ``aggs``: output name -> (fn, column) with fn in count/sum/min/max
    (the decomposable aggregates; avg = sum/count composed by the
    caller).  Phase 1 groups on (keys, salt) — hot keys spread over
    ``num_salts`` partitions; phase 2 merges per key.
    """
    keys = list(keys)
    salt = (F.rand() * num_salts).cast("int").alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[_MERGE[fn][0](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn][1](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join: scatter the probe side over ``num_salts``,
    replicate the build side across every salt, join on (keys, salt).

    Exact same rows as ``probe.join(build, on, how)``; the shuffle for
    any single key is split num_salts ways.  Build-side cost: one extra
    explode (rows x num_salts) — use when build is too big to broadcast
    but small enough to replicate.
    """
    on = list(on)
    p = probe.withColumn("_salt", (F.rand() * num_salts).cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return p.join(b, on + ["_salt"], how).drop("_salt")
