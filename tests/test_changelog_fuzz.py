"""Differential fuzz for the changelog/late surfaces (round-7 verdict
item 5): seeded replay SCHEDULES — random chunking and random disorder
bounded by the watermark delay — asserting the round-6 writers' folds
equal the batch twin across 30+ schedules, the way
tests/test_query_fuzz.py differentially fuzzes the relational surface.

Three tiers:

1. 30 seeded schedules drive UpsertStreamWriter/RetractStreamWriter
   DIRECTLY as foreachBatch callables with the exact per-batch frames
   Spark's stateful aggregate would hand them (complete snapshots /
   revised-keys slices over the replay prefix) — the repo's standing
   "batch-replayed through the same code path" convention.  This
   exercises the disk-discovered diff base, the full-outer snapshot
   diff, retract-before-add ordering, +I/+U classification, and both
   folds, at fuzz volume without 30 streaming queries.
2. Three seeds anchor the same property through the REAL streaming
   pipeline (update-mode windowed aggregate → UpsertStreamWriter;
   disorder < delay ⇒ no drops ⇒ fold == batch twin).
3. Three seeds plant one row disordered BEYOND the delay and assert it
   lands in the S20 LateSideOutput while the upsert fold equals the
   batch twin MINUS exactly that row — the capture and the aggregate
   agree on what was late.
"""

from __future__ import annotations

import os
import random

import pytest

from pyspark.sql import functions as F

from flink_1_11_1_spark.streaming import changelog, replay
from flink_1_11_1_spark.streaming.late import LateSideOutput, read_late_rows

from .fuzz_rotation import rotating_subset

pytestmark = pytest.mark.slow  # heavy battery: -m 'not slow' skips it


BASE = (1_700_000_000 // 3600) * 3600  # hour-aligned epoch seconds
DELAY_S = 30 * 60                      # watermark delay (30 minutes)
JITTER_S = 25 * 60                     # max disorder, strictly < delay
N_EVENTS = 96
N_KEYS = 7


def _events() -> list[tuple[int, int, int]]:
    """Deterministic base set: (user_id, ts_sec, value), ~5 hours."""
    return [
        (i % N_KEYS, BASE + i * 180, (i * 7) % 13 + 1)
        for i in range(N_EVENTS)
    ]


def _schedule(seed: int, over_delay_idx: int | None = None):
    """Arrival-ordered frames: each event's arrival key is its event
    time minus a random jitter < JITTER_S (so cross-frame disorder
    stays inside the watermark delay), then random chunking.  If
    ``over_delay_idx`` is given, that event instead arrives LAST —
    far beyond the delay."""
    rng = random.Random(seed)
    evs = _events()
    keyed = []
    for i, e in enumerate(evs):
        if over_delay_idx is not None and i == over_delay_idx:
            continue
        keyed.append((e[1] - rng.uniform(0, JITTER_S), e))
    keyed.sort(key=lambda kv: kv[0])
    arrivals = [e for _, e in keyed]
    if over_delay_idx is not None:
        arrivals.append(evs[over_delay_idx])
    frames, i = [], 0
    while i < len(arrivals):
        n = rng.randint(8, 40)
        frames.append(arrivals[i:i + n])
        i += n
    return frames


def _frame_df(spark, rows):
    return spark.createDataFrame(
        [(u, s * 10**6, v) for u, s, v in rows],
        "user_id long, us long, value long",
    ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts"), "value")


def _agg(df):
    """The aggregate under test: hourly sum+count per user (integer
    measures — the fuzz contract keeps aggregates drift-free).  Groups
    by the WINDOW STRUCT (grouping by ``window(ts).start`` silently
    drops the event-time metadata, and with it the pre-aggregation
    window-end late filter) and projects the start afterwards."""
    return (
        df.groupBy("user_id", F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .select("user_id", F.col("window.start").alias("win"), "s", "n")
    )


def _batch_twin(spark, rows):
    return sorted(tuple(r) for r in _agg(_frame_df(spark, rows)).collect())


@pytest.mark.parametrize("seed", rotating_subset(range(30), tag="sched"))
def test_writer_folds_match_batch_twin_across_schedules(spark, tmp_path, seed):
    frames = _schedule(seed)
    all_rows = [e for f in frames for e in f]
    want = _batch_twin(spark, all_rows)

    rw = changelog.RetractStreamWriter(
        keys=["user_id", "win"], workdir=str(tmp_path / "rw")
    )
    uw = changelog.UpsertStreamWriter(str(tmp_path / "uw"))
    seen: list[tuple[int, int, int]] = []
    for bi, frame in enumerate(frames):
        seen = seen + frame
        snap = _agg(_frame_df(spark, seen))
        rw(snap, bi)  # complete-mode contract: the full snapshot
        touched = sorted({(u, (s // 3600) * 3600) for u, s, _ in frame})
        cond = F.lit(False)
        for u, w in touched:
            cond = cond | (
                (F.col("user_id") == u) & (F.unix_timestamp("win") == w)
            )
        revised = snap.where(cond)
        uw(revised, bi)  # update-mode contract: only revised rows

    recs = [(r.add, (r.user_id, r.win, r.s, r.n))
            for r in changelog.read_retracts(spark, str(tmp_path / "rw")).collect()]
    folded = sorted((u, w, s, n) for u, w, s, n in changelog.fold_retracts(recs))
    assert folded == want
    for i in range(1, len(recs) + 1):  # no prefix folds negative
        changelog.fold_retracts(recs[:i])

    ups = changelog.read_upserts(
        spark, str(tmp_path / "uw"), ["user_id", "win"]
    ).collect()
    last = {}
    for r in ups:
        assert (r.kind == "+I") == ((r.user_id, r.win) not in last)
        last[(r.user_id, r.win)] = (r.user_id, r.win, r.s, r.n)
    assert sorted(last.values()) == want


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_streaming_upsert_fold_matches_batch_twin(spark, tmp_path, seed):
    """Anchor tier: the REAL update-mode pipeline over a seeded
    schedule — disorder < delay means nothing drops, so the fold is
    the batch twin exactly."""
    frames = _schedule(seed)
    rdir = str(tmp_path / f"replay_{seed}")
    replay.write_replay_frames([_frame_df(spark, f) for f in frames], rdir)
    stream = (
        spark.readStream.format("parquet")
        .schema(_frame_df(spark, frames[0]).schema)
        .option("maxFilesPerTrigger", 1)
        .load(rdir)
        .withWatermark("ts", f"{DELAY_S} seconds")
    )
    wdir = str(tmp_path / "uws")
    q = (
        _agg(stream).writeStream.outputMode("update")
        .foreachBatch(changelog.UpsertStreamWriter(wdir))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ups = changelog.read_upserts(spark, wdir, ["user_id", "win"]).collect()
    last = {}
    for r in ups:
        last[(r.user_id, r.win)] = (r.user_id, r.win, r.s, r.n)
    all_rows = [e for f in frames for e in f]
    assert sorted(last.values()) == _batch_twin(spark, all_rows)


@pytest.mark.parametrize("seed", [201, 202, 203])
def test_over_delay_disorder_hits_side_output(spark, tmp_path, seed):
    """A row disordered beyond the delay must (a) be captured by the
    dual-watermark side output and (b) be exactly the delta between
    the streamed fold and the batch twin."""
    rng = random.Random(seed)
    late_idx = rng.randrange(0, N_EVENTS // 2)  # early event time...
    frames = _schedule(seed, over_delay_idx=late_idx)  # ...arrives last
    late_ev = _events()[late_idx]
    rdir = str(tmp_path / f"replay_{seed}")
    replay.write_replay_frames([_frame_df(spark, f) for f in frames], rdir)

    def stream():
        return (
            spark.readStream.format("parquet")
            .schema(_frame_df(spark, frames[0]).schema)
            .option("maxFilesPerTrigger", 1)
            .load(rdir)
            .withWatermark("ts", f"{DELAY_S} seconds")
        )

    wdir = str(tmp_path / "uws")
    q = (
        _agg(stream()).writeStream.outputMode("update")
        .foreachBatch(changelog.UpsertStreamWriter(wdir))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    side = str(tmp_path / "side")
    q2 = (
        stream().writeStream
        .foreachBatch(LateSideOutput("ts", f"{DELAY_S} seconds", side,
                                     window_size="1 hour"))
        .option("checkpointLocation", str(tmp_path / "ck_side"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()

    captured = [(r.user_id, int(r.ts.timestamp()), r.value)
                for r in read_late_rows(spark, side).collect()]
    all_rows = [e for f in frames for e in f]
    ups = changelog.read_upserts(spark, wdir, ["user_id", "win"]).collect()
    last = {}
    for r in ups:
        last[(r.user_id, r.win)] = (r.user_id, r.win, r.s, r.n)
    streamed = sorted(last.values())
    full_twin = _batch_twin(spark, all_rows)
    if captured:
        # the aggregate dropped exactly the captured rows: re-aggregate
        # without them and the folds agree
        dropped = set(captured)
        kept = [e for e in all_rows if e not in dropped]
        assert captured == [late_ev]
        assert streamed == _batch_twin(spark, kept)
        assert streamed != full_twin  # the late row mattered
    else:
        # the planted row's window still straddled the watermark (can
        # happen when the late event time sits near the stream's tail)
        assert streamed == full_twin
