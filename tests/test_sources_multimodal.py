"""Sources/sinks, multimodal plumbing, changelog adapters, iterations."""

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from flink_1_11_1_spark import catalog
from flink_1_11_1_spark.extensions import multimodal as mm
from flink_1_11_1_spark.operators import iterate
from flink_1_11_1_spark.sources import files as src
from flink_1_11_1_spark.streaming import changelog, replay

from .conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="srcsink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------------- sources/sinks


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_formats(spark, tmpdir, fmt):
    df = catalog.load_table(spark, SF_SMOKE, "nation")
    path = os.path.join(tmpdir, fmt)
    src.write_table(df, path, fmt)
    back = src.read_table(spark, path, fmt, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, tmpdir):
    orders = catalog.load_table(spark, SF_SMOKE, "orders")
    path = os.path.join(tmpdir, "orders_part")
    src.write_table(orders, path, "parquet", partition_by=["o_orderstatus"])
    assert set(src.partition_values(spark, path, "o_orderstatus")) == {"F", "O", "P"}
    back = src.read_table(spark, path, "parquet").where("o_orderstatus = 'F'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: only the o_orderstatus=F directory is scanned
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert back.count() == orders.where("o_orderstatus = 'F'").count()


def test_csv_requires_schema(spark, tmpdir):
    with pytest.raises(ValueError, match="explicit schema"):
        src.read_table(spark, tmpdir, "csv")


def test_streaming_file_sink_exactly_once(spark, tmpdir):
    replay_dir = os.path.join(tmpdir, "replay")
    replay.write_replay(spark, SF_SMOKE, replay_dir, parts=3, flush=False)
    stream = replay.events_stream(spark, replay_dir, watermark=None)
    out_dir = os.path.join(tmpdir, "out")
    q = src.write_stream_files(
        stream, out_dir, os.path.join(tmpdir, "ckpt"), "parquet"
    )
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(out_dir)
    want = catalog.load_table(spark, SF_SMOKE, "events")
    assert back.count() == want.count()
    # committed-manifest present (exactly-once marker)
    assert os.path.isdir(os.path.join(out_dir, "_spark_metadata"))


def test_datagen_and_blackhole(spark, tmpdir):
    q = src.to_blackhole(
        src.datagen_stream(spark, 50), os.path.join(tmpdir, "bh_ckpt")
    )
    import time

    time.sleep(2)
    assert q.isActive
    q.stop()


# ----------------------------------------------------------- multimodal


def test_media_schema_and_decode(spark):
    docs = catalog.load_table(spark, SF_SMOKE, "documents").limit(50)
    media = mm.attach_fake_media(docs)
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    decoded = mm.decode_media(media)
    assert decoded.schema.simpleString() == mm.DECODED_SCHEMA.simpleString()
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.width == r.doc_id % 8 + 4 and r.height == r.doc_id % 5 + 4
        assert len(r.features) == mm.FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-5  # normalized histogram


def test_media_decode_matches_local_reference(spark):
    blob = mm.encode_fake_media(6, 4, 1, b"abcdef")
    w, h, c, arr = mm._decode_payload(blob)
    assert (w, h, c) == (6, 4, 1) and arr.shape == (4, 6, 1)
    assert bytes(arr[0, :, 0]) == b"abcdef"


def test_media_resize_and_frames(spark):
    docs = catalog.load_table(spark, SF_SMOKE, "documents").limit(10)
    media = mm.attach_fake_media(docs)
    small = mm.resize_media(media, 3, 2)
    rows = small.collect()
    assert all(r.meta.width == 3 and r.meta.height == 2 for r in rows)
    redecoded = mm.decode_media(small).collect()
    assert all(r.width == 3 and r.height == 2 for r in redecoded)
    frames = mm.frame_sample(media, n_frames=2)
    got = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in got)


# ----------------------------------------------------------- changelog


def test_changelog_batcher_emits_rowkinds(spark, tmpdir):
    ev = catalog.load_table(spark, SF_SMOKE, "events")
    frames = [
        ev.where("event_id < 300"),
        ev.where("event_id >= 300 AND event_id < 600"),
        ev.where("event_id >= 600"),
    ]
    rdir = os.path.join(tmpdir, "cl_replay")
    replay.write_replay_frames(frames, rdir)
    stream = replay.events_stream(spark, rdir, watermark=None)
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))

    wdir = os.path.join(tmpdir, "cl_records")
    writer = changelog.ChangelogWriter(keys=["event_type"], workdir=wdir)
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(writer)
        .option("checkpointLocation", os.path.join(tmpdir, "cl_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    seen = [(r.kind, (r.event_type,), (r.n,))
            for r in changelog.read_changelog(spark, wdir).collect()]
    kinds = {k for k, _, _ in seen}
    assert "+I" in kinds and "+U" in kinds  # first batch inserts, later updates
    # final upsert state equals the batch aggregate
    final = {}
    for kind, key, val in seen:
        if kind == "-D":
            final.pop(key, None)
        else:
            final[key] = val
    want = {
        (r.event_type,): (r.n,)
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert final == want


def test_s13_retract_stream_fold_equals_batch(spark, tmpdir):
    """toRetractStream parity: the boolean-tagged record stream's
    multiset fold equals the batch aggregate, updates emit retract
    before add, and every retract has a prior add (fold never goes
    negative — fold_retracts raises otherwise)."""
    ev = catalog.load_table(spark, SF_SMOKE, "events")
    frames = [
        ev.where("event_id < 300"),
        ev.where("event_id >= 300 AND event_id < 600"),
        ev.where("event_id >= 600"),
    ]
    rdir = os.path.join(tmpdir, "rs_replay")
    replay.write_replay_frames(frames, rdir)
    stream = replay.events_stream(spark, rdir, watermark=None)
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))

    wdir = os.path.join(tmpdir, "rs_records")
    writer = changelog.RetractStreamWriter(keys=["event_type"], workdir=wdir)
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(writer)
        .option("checkpointLocation", os.path.join(tmpdir, "rs_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    seen = [(r.add, (r.event_type, r.n))
            for r in changelog.read_retracts(spark, wdir).collect()]

    assert any(not add for add, _ in seen)  # later batches retract old counts
    folded = sorted(changelog.fold_retracts(seen))
    want = sorted(
        tuple(r)
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    )
    assert folded == want
    # prefix-consistency (retract-before-add ordering): every prefix
    # folds without negative counts
    for i in range(1, len(seen) + 1):
        changelog.fold_retracts(seen[:i])


# ----------------------------------------------------------- iterations


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 6), (7, 8), (8, 9), (9, 1)],
        ["src", "dst"],
    )
    got = {
        r.vertex: r.component
        for r in iterate.connected_components(edges, max_iterations=15).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 7: 1, 8: 1, 4: 4, 5: 4, 6: 6}


def test_delta_iterate_shortest_path(spark):
    # single-source shortest hops from vertex 1 on a small chain+branch
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5)], ["src", "dst"]
    )
    inf = 10**9
    vertices = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select("dst"))
        .distinct()
        .withColumn("dist", F.when(F.col("v") == 1, 0).otherwise(inf))
    )
    work = vertices.where("dist = 0")

    def step(solution, workset, _i):
        cand = (
            edges.join(workset, edges["src"] == workset["v"])
            .select(F.col("dst").alias("v"), (F.col("dist") + 1).alias("dist"))
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
        )
        return (
            solution.alias("s")
            .join(cand.alias("c"), "v", "left")
            .select(
                "v",
                F.least(F.col("s.dist"), F.coalesce(F.col("c.dist"), F.lit(inf))).alias(
                    "dist"
                ),
            )
        )

    got = {
        r.v: r.dist
        for r in iterate.delta_iterate(
            vertices, work, ["v"], step, max_iterations=10
        ).collect()
    }
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 3}


def test_checkpoint_recovery_exactly_once(spark, tmpdir):
    """Stop a streaming file-sink query, add input, restart from the same
    checkpoint: every event lands exactly once (Flink's checkpoint-resume
    guarantee, realized by offset log + sink manifest)."""
    ev = catalog.load_table(spark, SF_SMOKE, "events")
    first = [ev.where("event_id < 400"), ev.where("event_id >= 400 AND event_id < 700")]
    rdir = os.path.join(tmpdir, "rec_replay")
    replay.write_replay_frames(first, rdir)
    out_dir = os.path.join(tmpdir, "rec_out")
    ckpt = os.path.join(tmpdir, "rec_ckpt")

    def run_once():
        stream = replay.events_stream(spark, rdir, watermark=None)
        q = src.write_stream_files(stream, out_dir, ckpt, "parquet")
        q.processAllAvailable()
        q.stop()

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 700
    # new data arrives while the query is DOWN; restart resumes from ckpt
    replay.write_replay_frames([ev.where("event_id >= 700")], rdir, start=2)
    run_once()
    back = spark.read.parquet(out_dir)
    assert back.count() == ev.count()  # no loss
    assert back.select("event_id").distinct().count() == ev.count()  # no dupes


def test_approx_count_distinct_extension(spark):
    """Spark bonus surface (absent in the reference, SURVEY.md §1):
    approx_count_distinct within 5% of exact."""
    orders = catalog.load_table(spark, SF_SMOKE, "orders")
    approx = orders.agg(F.approx_count_distinct("o_custkey").alias("a")).first().a
    exact = orders.select("o_custkey").distinct().count()
    assert abs(approx - exact) / exact < 0.05


def test_cdc_stream_end_to_end(spark, tmpdir):
    """CDC envelopes through a real file stream: decode -> foreachBatch
    materialize into an upsert dict -> final state equals the hand-known
    outcome (the streaming ingestion path of debezium-json)."""
    from pyspark.sql.types import IntegerType, StringType, StructType

    from flink_1_11_1_spark.operators import cdc

    envs = [
        (0, '{"before": null, "after": {"id": 1, "name": "a", "qty": 1}, "op": "c"}'),
        (1, '{"before": null, "after": {"id": 2, "name": "b", "qty": 2}, "op": "c"}'),
        (2, '{"before": {"id": 1, "name": "a", "qty": 1}, '
            '"after": {"id": 1, "name": "a2", "qty": 5}, "op": "u"}'),
        (3, '{"before": {"id": 2, "name": "b", "qty": 2}, "after": null, "op": "d"}'),
        (4, '{"before": null, "after": {"id": 3, "name": "c", "qty": 9}, "op": "c"}'),
    ]
    df1 = spark.createDataFrame(envs[:3], ["seq", "value"])
    df2 = spark.createDataFrame(envs[3:], ["seq", "value"])
    from flink_1_11_1_spark.streaming import replay

    rdir = os.path.join(tmpdir, "cdc_replay")
    replay.write_replay_frames([df1, df2], rdir)
    schema = spark.read.parquet(os.path.join(rdir, "chunk_000.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(rdir, "chunk_*.parquet"))
    )
    row_schema = (
        StructType()
        .add("id", IntegerType())
        .add("name", StringType())
        .add("qty", IntegerType())
    )
    decoded = cdc.debezium_decode(stream, "value", row_schema)

    state = {}

    def apply_batch(batch_df, batch_id):
        for r in sorted(batch_df.collect(), key=lambda r: (r.seq, r.row_kind == "+U")):
            if r.row_kind in ("+I", "+U"):
                state[r.id] = (r.name, r.qty)
            elif r.row_kind == "-D":
                state.pop(r.id, None)

    q = (
        decoded.writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(tmpdir, "cdc_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert state == {1: ("a2", 5), 3: ("c", 9)}


# ---------------------- round 6: real-codec branch (PIL), skip-gated


def test_real_codec_decode_schema_stable(spark):
    """With PIL installed, a real PNG routes through the PIL branch of
    _decode_payload and decode_media emits the same DECODED_SCHEMA rows
    as the fake codec — the swap point is live, not hypothetical.
    Skipped where PIL is absent (this sandbox)."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from flink_1_11_1_spark.extensions import multimodal

    rng = np.random.RandomState(9)
    rows = []
    for doc_id, (w, h) in enumerate([(6, 4), (8, 8), (3, 7)]):
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        png = buf.getvalue()
        rows.append(
            (doc_id, "image", bytearray(png),
             {"width": w, "height": h, "channels": 3, "n_bytes": len(png)})
        )
    media = spark.createDataFrame(
        rows,
        "doc_id long, media_type string, content binary, "
        "meta struct<width:int,height:int,channels:int,n_bytes:bigint>",
    )
    out = multimodal.decode_media(media)
    assert out.schema == multimodal.DECODED_SCHEMA
    got = {r.doc_id: r for r in out.collect()}
    assert {(r.width, r.height, r.channels) for r in got.values()} == {
        (6, 4, 3), (8, 8, 3), (3, 7, 3)
    }
    # lossless container: mean intensity equals the numpy mean exactly
    assert all(0.0 <= r.mean_intensity <= 255.0 for r in got.values())
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in got.values())


def test_fake_codec_gate_raises_without_pil():
    """Without PIL the non-FMK1 path raises the documented gate error
    (NotImplementedError), never a silent wrong decode."""
    from flink_1_11_1_spark.extensions import multimodal

    if multimodal._HAS_PIL:
        pytest.skip("PIL present: gate branch not reachable")
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal._decode_payload(b"\x89PNG\r\n\x1a\nnot-really")


def test_retract_writer_survives_restart_and_retry(spark, tmpdir):
    """The diff base is discovered on disk: a fresh writer object
    (query restart) resumes against the last committed snapshot, and
    re-running a batch id (foreachBatch retry, possibly after its own
    snapshot landed) reproduces identical records instead of an empty
    or double-counted diff."""
    wdir = os.path.join(tmpdir, "rsw_restart")
    w1 = changelog.RetractStreamWriter(keys=["k"], workdir=wdir)
    s0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    s1 = spark.createDataFrame([(1, 11), (3, 30)], "k long, v long")
    w1(s0, 0)
    # restart: new writer object, next batch
    w2 = changelog.RetractStreamWriter(keys=["k"], workdir=wdir)
    w2(s1, 1)
    recs = [(r.batch_id, r.add, r.k, r.v)
            for r in changelog.read_retracts(spark, wdir).collect()]
    folded = changelog.fold_retracts(
        [(add, (k, v)) for _, add, k, v in recs]
    )
    # complete-mode semantics: batch 1 IS the current table, so key 2
    # was retracted (-D) when it vanished from the snapshot
    assert sorted(folded) == [(1, 11), (3, 30)]
    assert (1, False, 2, 20) in recs
    # retry batch 1 (its own snapshot already on disk) → identical records
    w3 = changelog.RetractStreamWriter(keys=["k"], workdir=wdir)
    w3(s1, 1)
    recs2 = [(r.batch_id, r.add, r.k, r.v)
             for r in changelog.read_retracts(spark, wdir).collect()]
    assert sorted(recs2) == sorted(recs)
