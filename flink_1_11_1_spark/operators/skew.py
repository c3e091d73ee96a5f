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


def salted_session_agg(
    df: DataFrame,
    ts: str,
    gap: str,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    bucket: str = "1 day",
) -> DataFrame:
    """Session aggregate with a gap-safe time pre-bucket (round 12 —
    the 100 TB lever SCALE_NOTES r11 names for hot session keys).

    ``session_agg`` shuffles on the session keys alone, so one hot key's
    entire timeline merges on a single reducer.  This variant:

    1. groups on ``(keys, tumbling bucket, session_window)`` — a hot
       key's work spreads across its time buckets;
    2. keeps a local session as FINAL when it provably cannot merge
       across its bucket boundary (first event ≥ gap after the bucket
       start AND ``session_end < bucket_end``, since end = last_ts +
       gap and Spark merges touching windows);
    3. re-merges only the boundary-touching sessions (≤ 2 per key per
       bucket, bounded by the time range — not by row count) with an
       interval merge: sessions A, B merge globally iff B.start <=
       A.end (end already carries ``+ gap``; Spark's session merge is
       inclusive at exact-gap abutment — verified against the native
       operator).  Each session is
       atomic in this pass — replaying first/last pseudo-events
       through a second session_window is WRONG (a session's own
       endpoints can be further than gap apart and would split).

    ``aggs``: output name -> (fn, column), fn in count/sum/min/max (the
    re-mergeable set, same contract as ``salted_agg``); ``gap`` and
    ``bucket`` are literal interval strings (no dynamic gap — a per-row
    gap has no bucket-safety proof).  Output schema and rows are exactly
    ``session_agg(df, ts, gap, keys, [aggs])``'s (asserted in tests).
    """
    keys = list(keys)
    gap_i = F.expr(f"INTERVAL {gap}")
    partials = [
        _MERGE[fn][0](col).alias(name) for name, (fn, col) in aggs.items()
    ]
    merges = [
        _MERGE[fn][1](name).alias(name) for name, (fn, _) in aggs.items()
    ]
    names = list(aggs)
    loc = (
        df.withColumn("_bkt", F.window(ts, bucket))
        .groupBy(*keys, "_bkt", F.session_window(ts, gap))
        .agg(*partials)
        .select(
            *keys,
            F.col("_bkt.start").alias("_blo"),
            F.col("_bkt.end").alias("_bhi"),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *names,
        )
        .localCheckpoint(eager=False)  # read twice (interior + boundary)
    )
    # right-mergeable iff next_first <= last_ts + gap = end, and
    # next_first >= bucket_end  =>  end >= bucket_end (inclusive merge);
    # left-mergeable iff first_ts < bucket_start + gap
    boundary = (F.col("session_start") < F.col("_blo") + gap_i) | (
        F.col("session_end") >= F.col("_bhi")
    )
    out_cols = [*keys, "session_start", "session_end", *names]
    interior = loc.where(~boundary).select(*out_cols)
    bnd = loc.where(boundary)
    # islands merge: per key in session_start order, a session starts a
    # new island iff its start is strictly after every earlier session's
    # end (touching sessions merge, matching the native operator).
    # Per-key sequential, but over BOUNDARY SESSIONS only (bounded by
    # the key's bucket count, not its row count).
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy("session_start", "session_end")
    prev_end = F.max("session_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    stitched = (
        bnd.withColumn(
            "_new",
            F.when(
                prev_end.isNull()
                | (F.col("session_start") > prev_end), 1
            ).otherwise(0),
        )
        .withColumn(
            "_isl",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(*keys, "_isl")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            *merges,
        )
        .select(*out_cols)
    )
    return interior.unionByName(stitched)


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
