"""StateTtlConfig parity tests (streaming/ttl.py): update types,
NeverReturnExpired visibility, processing-time expiry, and cleanup."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from flink_1_11_1_spark.streaming import replay
from flink_1_11_1_spark.streaming.ttl import dedup_first_ttl

pytestmark = pytest.mark.streaming  # replay e2e battery: -m "not streaming" skips


def _stream(spark, tmp_path, frames, tag):
    rdir = str(tmp_path / tag)
    replay.write_replay_frames(frames, rdir)
    return (
        spark.readStream.format("parquet")
        .schema(frames[0].schema)
        .option("maxFilesPerTrigger", 1)
        .load(rdir)
    )


def _frame(spark, rows):  # (k, event_id, logical_ms)
    return spark.createDataFrame(rows, "k long, event_id long, t long")


@pytest.mark.parametrize(
    "update_type,want",
    [
        # ttl=1000ms; key 1 rows at t=0, 600, 1100, 2500:
        #  OnCreateAndWrite: expire@1000 -> 600 suppressed (read does
        #  not extend), 1100 expired-> FIRST again (expire@2100), 2500
        #  expired -> FIRST again
        ("OnCreateAndWrite", [10, 12, 13]),
        #  OnReadAndWrite: 600 suppressed but extends to 1600, 1100
        #  suppressed and extends to 2100, 2500 expired -> FIRST
        ("OnReadAndWrite", [10, 13]),
    ],
)
def test_update_types_drive_expiry(spark, tmp_path, update_type, want):
    frames = [
        _frame(spark, [(1, 10, 0), (1, 11, 600)]),
        _frame(spark, [(1, 12, 1100), (2, 20, 1100)]),
        _frame(spark, [(1, 13, 2500)]),
    ]
    out = dedup_first_ttl(
        _stream(spark, tmp_path, frames, f"ttl_{update_type}"),
        keys=["k"], ttl=1, update_type=update_type, time_col="t",
    )
    got, _ = replay.run_stream(out, "append", f"ttl_{update_type}")
    assert sorted(r.event_id for r in got if r.k == 1) == want
    assert [r.event_id for r in got if r.k == 2] == [20]  # other key: first


def test_never_return_expired_within_one_batch(spark, tmp_path):
    """Expiry is checked at ACCESS time (NeverReturnExpired): a key's
    state can expire and be re-created INSIDE one batch, without any
    cleanup timer having fired."""
    frames = [
        _frame(spark, [(1, 1, 0), (1, 2, 500), (1, 3, 1500), (1, 4, 1700),
                       (1, 5, 3000)]),
    ]
    out = dedup_first_ttl(
        _stream(spark, tmp_path, frames, "ttl_vis"),
        keys=["k"], ttl=1, time_col="t",
    )
    got, _ = replay.run_stream(out, "append", "ttl_vis")
    # 0 first (exp 1000); 500 dup; 1500 expired -> first (exp 2500);
    # 1700 dup; 3000 expired -> first
    assert sorted(r.event_id for r in got) == [1, 3, 5]


def test_processing_time_expiry_end_to_end(spark, tmp_path):
    """The production clock: a key re-arriving after the wall-clock TTL
    is first again; re-arriving within it is suppressed."""
    rdir = str(tmp_path / "ttl_proc")
    replay.write_replay_frames([_frame(spark, [(1, 1, 0), (1, 2, 0)])], rdir)
    stream = (
        spark.readStream.format("parquet")
        .schema("k long, event_id long, t long")
        .option("maxFilesPerTrigger", 1)
        .load(rdir)
    )
    out = dedup_first_ttl(stream, keys=["k"], ttl="2 seconds")
    q = (
        out.writeStream.format("memory").queryName("ttl_proc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ttl_proc_ck"))
        .start()
    )
    q.processAllAvailable()          # batch 1: one of 1/2 emitted
    time.sleep(3)                    # wall clock passes the TTL
    replay.write_replay_frames(
        [_frame(spark, [(1, 3, 0), (1, 4, 0)])], rdir, start=1
    )
    q.processAllAvailable()          # batch 2: state expired -> 3 or 4
    q.stop()
    got = sorted(r.event_id for r in spark.sql("SELECT * FROM ttl_proc").collect())
    assert len(got) == 2 and got[0] in (1, 2) and got[1] in (3, 4)


def test_bad_update_type_raises(spark):
    df = spark.createDataFrame([(1, 1, 0)], "k long, event_id long, t long")
    with pytest.raises(ValueError, match="update_type"):
        dedup_first_ttl(df, keys=["k"], ttl=1, update_type="OnWrite")
