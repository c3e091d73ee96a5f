"""Operator-package tests: oracle parity at sf0.001 for the DataFrame
operators (as-of/interval joins, windows, top-n, dedup, CDC) plus
semantic unit tests for the pieces oracles can't reach (lookup join,
canal decode, Flink function shims)."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructType

from flink_1_11_1_spark import catalog, functions as ffn, testing
from flink_1_11_1_spark.extensions import registry
from flink_1_11_1_spark.operators import cdc, joins

from .conftest import SF_SMOKE

OP_KEYS = [
    "x_asof_join_df",
    "x_interval_join_df",
    "x_topn_df",
    "x_dedup_first_df",
    "x_tumble_df",
    "x_hop_df",
    "x_session_df",
    "x_count_window_df",
    "x_cdc_debezium",
]


@pytest.mark.parametrize("name", OP_KEYS)
def test_operator_matches_oracle(spark, duck, name):
    df = registry.queries()[name](spark, SF_SMOKE)
    sc, sr = df.columns, [tuple(r) for r in df.collect()]
    dc, dr = testing.run_duckdb(duck, registry.oracle_sql()[name])
    ok, msg = testing.compare(sc, sr, dc, dr)
    assert ok, f"{name}: {msg}"


def test_lookup_join_broadcasts(spark):
    cust = catalog.load_table(spark, SF_SMOKE, "customer")
    nation = catalog.load_table(spark, SF_SMOKE, "nation")
    out = joins.lookup_join(
        cust, nation, F.col("c_nationkey") == F.col("n_nationkey")
    )
    assert out.count() == cust.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_asof_join_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 5)], ["k", "t"])
    right = spark.createDataFrame([(1, 10, "late")], ["k", "t2", "v"])
    out = joins.asof_join(left, right, on=["k"], left_time="t", right_time="t2").collect()
    assert out[0].v is None
    inner = joins.asof_join(
        left, right, on=["k"], left_time="t", right_time="t2", how="inner"
    ).collect()
    assert inner == []


def test_asof_join_inner_keeps_null_payload_match(spark):
    """Inner mode must keep a matched row whose first right payload
    column is NULL — the match marker is the payload struct, not any
    one field (regression: isNotNull on right_cols[0] dropped these)."""
    left = spark.createDataFrame([(1, 20)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 10, None, "kept")], "k int, t2 int, v string, w string"
    )
    inner = joins.asof_join(
        left, right, on=["k"], left_time="t", right_time="t2",
        right_cols=["v", "w"], how="inner",
    ).collect()
    assert len(inner) == 1 and inner[0].v is None and inner[0].w == "kept"


def test_canal_decode(spark):
    schema = (
        StructType()
        .add("id", IntegerType())
        .add("name", StringType())
    )
    rows = [
        ('{"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], "old": null, "type": "INSERT"}',),
        ('{"data": [{"id": 1, "name": "a2"}], "old": [{"name": "a"}], "type": "UPDATE"}',),
        ('{"data": [{"id": 2, "name": "b"}], "old": null, "type": "DELETE"}',),
    ]
    df = spark.createDataFrame(rows, ["value"])
    got = [(r.row_kind, r.id, r.name) for r in cdc.canal_decode(df, "value", schema).collect()]
    assert ("+I", 1, "a") in got and ("+I", 2, "b") in got
    # canal 'old' carries only changed fields: -U merges old over data
    assert ("-U", 1, "a") in got and ("+U", 1, "a2") in got
    assert ("-D", 2, "b") in got
    assert len(got) == 5


def test_canal_decode_truncated_old_array(spark):
    """Round-13 review: a truncated 'old' array (producer omitted the
    entry) must fall back to the data row via get(), not die with
    ANSI INVALID_ARRAY_INDEX."""
    schema = StructType().add("id", IntegerType()).add("name", StringType())
    rows = [
        ('{"data": [{"id": 1, "name": "a2"}, {"id": 2, "name": "b2"}], '
         '"old": [{"name": "a"}], "type": "UPDATE"}',),
    ]
    df = spark.createDataFrame(rows, ["value"])
    got = {(r.row_kind, r.id, r.name)
           for r in cdc.canal_decode(df, "value", schema).collect()}
    # row 0 has an old entry (merged); row 1 falls back to its data row
    assert ("-U", 1, "a") in got and ("-U", 2, "b2") in got
    assert ("+U", 1, "a2") in got and ("+U", 2, "b2") in got


def test_cdc_malformed_envelope_raises_unless_opted_out(spark):
    """Round-13 review (Flink ignore-parse-errors parity): an unknown
    op / unparseable payload FAILS the decode by default; the opt-out
    drops it; null payloads (tombstones) are skipped either way."""
    import pytest as _pytest

    schema = StructType().add("id", IntegerType())
    bad = spark.createDataFrame(
        [('{"after": {"id": 1}, "op": "zz"}',), ("not json at all",), (None,)],
        "value string",
    )
    with _pytest.raises(Exception, match="malformed debezium"):
        cdc.debezium_decode(bad, "value", schema).collect()
    assert cdc.debezium_decode(
        bad, "value", schema, ignore_parse_errors=True
    ).collect() == []
    cbad = spark.createDataFrame(
        [('{"data": [{"id": 1}], "old": null, "type": "TRUNCATE"}',)],
        "value string",
    )
    with _pytest.raises(Exception, match="malformed canal"):
        cdc.canal_decode(cbad, "value", schema).collect()
    assert cdc.canal_decode(
        cbad, "value", schema, ignore_parse_errors=True
    ).collect() == []


def test_materialize_same_seq_update_pair_keeps_addition(spark):
    """Round-13 review: the -U/+U pair of one update envelope shares
    its seq — the +U must win deterministically (the old seq-only order
    let -U win arbitrarily and wrongly delete the key)."""
    rows = [
        (10, "+I", 1, "a"),
        (20, "-U", 1, "a"),   # same seq as the +U below (one envelope)
        (20, "+U", 1, "a2"),
    ]
    log = spark.createDataFrame(rows, "seq long, row_kind string, id int, name string")
    got = cdc.materialize(log, ["id"], "seq").collect()
    assert [(r.id, r.name) for r in got] == [(1, "a2")]
    # and a genuine delete at the head still removes the key
    log2 = log.union(spark.createDataFrame(
        [(30, "-D", 1, "a2")], "seq long, row_kind string, id int, name string"))
    assert cdc.materialize(log2, ["id"], "seq").collect() == []


def test_flink_function_shims(spark):
    ffn.register_flink_functions(spark)
    row = spark.sql(
        "SELECT SPLIT_INDEX('a,b,c', ',', 1) s, IS_DIGIT('123') d1, "
        "IS_DIGIT('12x') d2, IS_ALPHA('abc') a1, IS_DECIMAL('1.25') dec, "
        "RAND_INTEGER(10) r, PROCTIME() pt"
    ).first()
    assert row.s == "b" and row.d1 and not row.d2 and row.a1 and row.dec
    assert 0 <= row.r < 10 and row.pt is not None
    # Flink semantics: past-the-end index is NULL, not an ANSI error
    assert spark.sql("SELECT SPLIT_INDEX('x,y', ',', 5) s").first().s is None
    # Flink semantics: separator is a LITERAL, incl. regex metachars
    r2 = spark.sql(
        "SELECT SPLIT_INDEX('x|y', '|', 1) a, SPLIT_INDEX('a.b.c', '.', 2) b, "
        "SPLIT_INDEX('p$$q', '$$', 1) c"
    ).first()
    assert (r2.a, r2.b, r2.c) == ("y", "c", "q")


def test_python_function_api(spark):
    df = spark.range(1).select(
        ffn.split_index(F.lit("x|y|z"), "|", 2).alias("s"),
        ffn.is_decimal(F.lit("3.14")).alias("d"),
        ffn.sum0(F.lit(None).cast("int")).alias("z"),
    )
    r = df.first()
    assert r.s == "z" and r.d and r.z == 0


def test_ceil_to_unit(spark):
    df = spark.sql(
        "SELECT timestamp '2024-01-01 10:30:00' t1, timestamp '2024-01-01 10:00:00' t2"
    ).select(
        ffn.ceil_to("t1", "hour").alias("c1"), ffn.ceil_to("t2", "hour").alias("c2")
    )
    r = df.first()
    assert str(r.c1) == "2024-01-01 11:00:00" and str(r.c2) == "2024-01-01 10:00:00"


def test_streaming_lookup_join_refreshes_dim(spark, tmp_path):
    """The dimension is re-loaded per micro-batch: rows arriving in batch
    1 see the UPDATED dim (Flink's periodically-refreshed lookup)."""
    from flink_1_11_1_spark.streaming import replay

    ev = catalog.load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "ts"
    )
    rdir = str(tmp_path / "lk_replay")
    replay.write_replay_frames(
        [ev.where("event_id < 500"), ev.where("event_id >= 500")], rdir
    )
    schema = spark.read.parquet(rdir + "/chunk_000.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rdir + "/chunk_*.parquet")
    )

    versions = iter(["v1", "v2", "v2", "v2"])  # one loader call per batch

    def loader():
        v = next(versions)
        return spark.createDataFrame(
            [(t, f"{t}-{v}") for t in ["click", "purchase", "error", "signup", "view"]],
            ["event_type", "label"],
        )

    got = {}

    def sink(batch_id, df):
        got[batch_id] = [(r.event_id, r.label) for r in df.collect()]

    q = (
        stream.writeStream.foreachBatch(
            joins.StreamingLookupJoin(loader, "event_type", sink)
        )
        .option("checkpointLocation", str(tmp_path / "lk_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(got) >= 2
    first_batch_labels = {lab for _, lab in got[0]}
    last_batch_labels = {lab for _, lab in got[max(got)]}
    assert all(lab.endswith("-v1") for lab in first_batch_labels)
    assert all(lab.endswith("-v2") for lab in last_batch_labels)


def test_to_upsert_stream_update_mode(spark, tmp_path):
    from flink_1_11_1_spark.streaming import changelog, replay

    ev = catalog.load_table(spark, SF_SMOKE, "events")
    rdir = str(tmp_path / "up_replay")
    replay.write_replay_frames(
        [ev.where("event_id < 500"), ev.where("event_id >= 500")], rdir
    )
    schema = spark.read.parquet(rdir + "/chunk_000.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rdir + "/chunk_*.parquet")
    )
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    q = changelog.to_upsert_stream(
        agg, str(tmp_path / "up_ckpt"), "memory", queryName="upsert_t"
    )
    q.processAllAvailable()
    q.stop()
    # update mode: last revision per key equals the batch aggregate
    rows = spark.sql("SELECT * FROM upsert_t").collect()
    last = {}
    for r in rows:  # memory sink appends revisions in trigger order
        last[r.event_type] = r.n
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert last == want


def test_table_spec_csv_with_schema(spark, tmp_path):
    from flink_1_11_1_spark.table_env import TableSpec

    nation = catalog.load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(path)
    spec = TableSpec(
        path=path,
        fmt="csv",
        schema="n_nationkey INT, n_name STRING, n_regionkey INT",
        computed={"region_bucket": "n_regionkey % 2"},
    )
    df = spec.load(spark)
    assert df.count() == 25 and "region_bucket" in df.columns


def test_window_join(spark):
    """DataStream window join: same key + same tumbling window."""
    from flink_1_11_1_spark.operators import windows as W

    ev = catalog.load_table(spark, SF_SMOKE, "events")
    a = ev.where("event_type = 'view'").select(
        "user_id", F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    b = ev.where("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    got = W.window_join(a, b, ["user_id"], "a_ts", "b_ts", "1 hour")
    want = a.join(b, "user_id").where(
        F.date_trunc("hour", "a_ts") == F.date_trunc("hour", "b_ts")
    )
    assert {(r.user_id, r.a_id, r.b_id) for r in got.collect()} == {
        (r.user_id, r.a_id, r.b_id) for r in want.collect()
    }
    assert got.count() > 0


def test_single_value_aggregate(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    rows = df.groupBy("k").agg(ffn.single_value("v").alias("sv")).collect()
    assert {(r.k, r.sv) for r in rows} == {(1, "x"), (2, "y")}
    bad = spark.createDataFrame([(1, "x"), (1, "z")], ["k", "v"])
    with pytest.raises(Exception, match="SINGLE_VALUE"):
        bad.groupBy("k").agg(ffn.single_value("v").alias("sv")).collect()
    # Flink's SqlSingleValueAggFunction errors on >1 ROW, not >1 distinct
    # value: duplicate values and multiple NULLs must both raise
    dup = spark.createDataFrame([(1, "x"), (1, "x")], ["k", "v"])
    with pytest.raises(Exception, match="SINGLE_VALUE"):
        dup.groupBy("k").agg(ffn.single_value("v").alias("sv")).collect()
    nn = spark.createDataFrame([(1, None), (1, None)], "k int, v string")
    with pytest.raises(Exception, match="SINGLE_VALUE"):
        nn.groupBy("k").agg(ffn.single_value("v").alias("sv")).collect()


def test_session_window_dynamic_gap(spark):
    """withDynamicGap parity: per-row gap expression — purchase events
    hold sessions open 3x longer; verified against the gaps-and-islands
    hand formulation with the same per-row gaps."""
    import datetime as dt

    from flink_1_11_1_spark.operators.windows import session_agg

    base = dt.datetime(2026, 3, 1)
    rows = []
    for uid, offsets, types in [
        (1, [0, 5, 30, 40, 100], ["view", "view", "purchase", "view", "view"]),
        (2, [0, 20, 120], ["purchase", "view", "view"]),
    ]:
        rows += [
            (uid, base + dt.timedelta(minutes=m), t)
            for m, t in zip(offsets, types)
        ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    # gap must be CalendarIntervalType (make_interval), not the ANSI
    # DayTimeIntervalType an INTERVAL literal produces
    gap = F.expr(
        "CASE WHEN event_type = 'purchase' THEN make_interval(0,0,0,0,0,30,0) "
        "ELSE make_interval(0,0,0,0,0,10,0) END"
    )
    got = session_agg(
        df, "ts", gap, ["user_id"], [F.count("*").alias("n")],
        with_session_id=True,
    )
    sessions = {(r.user_id, r.sid): r.n for r in got.collect()}
    # user 1: views at 0,5 chain (gap 10); purchase at 30 is >10 past 5
    #   -> new session; purchase's 30-min gap covers 40; 40's view gap
    #   covers to 50 < 100 -> third session
    # user 2: purchase at 0 covers 20 (30-min gap); view at 20 covers to
    #   30 < 120 -> second session
    assert sessions == {(1, 0): 2, (1, 1): 2, (1, 2): 1, (2, 0): 2, (2, 1): 1}


def test_delta_iterate_value_first_columns(spark):
    """Round-13 review: delta_iterate's merge re-mints attributes with a
    positional toDF — a solution schema that does NOT lead with the key
    columns silently swapped column labels.  Value-column-first schema,
    keys=['v']: the contraction must converge to dist=10 per vertex."""
    from flink_1_11_1_spark.operators.iterate import delta_iterate

    sol = spark.createDataFrame([(30, 1), (20, 2)], "dist int, v int")

    def step(solution, workset, i):
        # returns value-first order on purpose
        return (
            solution.select((F.col("dist") - F.lit(10)).alias("dist"), "v")
            .where("dist >= 10")
        )

    out = delta_iterate(sol, sol, ["v"], step, max_iterations=10)
    assert sorted((r.v, r.dist) for r in out.collect()) == [(1, 10), (2, 10)]


def test_delta_iterate_updates_are_changed_matches_default(spark):
    """Round-14 optimization: a step that already emits only changed
    rows must produce the identical solution with and without the
    subtract-skipping flag (BFS hop counts over a chain + branch)."""
    from flink_1_11_1_spark.operators.iterate import delta_iterate

    inf = 10**9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4), (6, 7)], ["src", "dst"]
    )
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
            .join(cand.alias("c"), "v")
            .where(F.col("c.dist") < F.col("s.dist"))
            .select("v", F.col("c.dist").alias("dist"))
        )

    got_default = delta_iterate(vertices, work, ["v"], step, 10).collect()
    got_flagged = delta_iterate(
        vertices, work, ["v"], step, 10, updates_are_changed=True
    ).collect()
    expect = [(1, 0), (2, 1), (3, 2), (4, 2), (5, 1), (6, inf), (7, inf)]
    assert sorted((r.v, r.dist) for r in got_default) == expect
    assert sorted((r.v, r.dist) for r in got_flagged) == expect


def test_connected_components_delta_matches_bulk(spark):
    """Round-14 optimization: connected_components moved from the bulk
    converged-by-subtract loop to the delta frontier form.  Pin the
    schedule equivalence on a graph needing several propagation rounds
    (a 7-chain), plus a triangle and an isolated pair."""
    from flink_1_11_1_spark.operators.iterate import (
        bulk_iterate,
        connected_components,
    )

    raw = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
           (10, 11), (11, 12), (12, 10), (20, 21)]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    got = {
        r.vertex: r.component
        for r in connected_components(edges, max_iterations=20).collect()
    }

    # inline bulk reference (the pre-round-14 formulation)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )

    def step(cur, _i):
        nm = (
            sym.join(cur, sym["src"] == cur["vertex"])
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("component").alias("nc"))
        )
        return cur.join(nm, "vertex", "left").select(
            "vertex",
            F.least(
                F.col("component"), F.coalesce(F.col("nc"), F.col("component"))
            ).alias("component"),
        )

    ref = {
        r.vertex: r.component
        for r in bulk_iterate(
            labels, step, 20, lambda p, c: c.subtract(p).take(1) == []
        ).collect()
    }
    assert got == ref
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_asof_join_null_right_time_is_no_version(spark):
    """Round-13 review: a right row with NULL right_time is not a
    version at all — NULLS FIRST ordering made its payload the
    'earliest version' fallback where the SQL twin yields NULL."""
    left = spark.createDataFrame([(1, 5)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, None, "ghost"), (1, 3, "real")], "k int, t2 int, v string"
    )
    out = joins.asof_join(left, right, on=["k"], left_time="t", right_time="t2").collect()
    assert out[0].v == "real"
    # with ONLY the null-time row, there is no match
    right2 = spark.createDataFrame([(1, None, "ghost")], "k int, t2 int, v string")
    out2 = joins.asof_join(left, right2, on=["k"], left_time="t", right_time="t2").collect()
    assert out2[0].v is None


def test_interval_join_zero_literal_and_shared_ts_name(spark):
    """Round-13 review: lower='0' (the docstring's own example) was a
    parse error, and a time column name shared by both sides hit
    AMBIGUOUS_REFERENCE."""
    a = spark.createDataFrame([(1, 100)], ["k", "ts"]).select(
        "k", F.timestamp_seconds("ts").alias("ts"))
    b = spark.createDataFrame([(1, 150), (1, 99), (1, 4000)], ["k2", "ts"]).select(
        "k2", F.timestamp_seconds("ts").alias("ts"))
    out = joins.interval_join(
        a, b, a["k"] == b["k2"], "ts", "ts", lower="0", upper="1 hour"
    ).collect()
    assert sorted(int(r[3].timestamp()) for r in out) == [150]


def test_deduplicate_keep_last_with_directional_order(spark):
    """Round-13 review: keep='last' must honor directional sort Columns
    (the old .desc()-everything reversal broke on them) and unknown
    keep values must raise."""
    from flink_1_11_1_spark.operators import rank

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (1, 20, "c"), (2, 5, "d")],
        "k int, ts int, v string",
    )
    # last by ascending ts -> the max-ts row
    got = {(r.k, r.v) for r in rank.deduplicate(df, ["k"], [F.col("ts")], "last").collect()}
    assert got == {(1, "b"), (2, "d")}
    # last by DESCENDING ts -> the min-ts row (directional spec honored)
    got_d = {(r.k, r.v) for r in
             rank.deduplicate(df, ["k"], [F.col("ts").desc()], "last").collect()}
    assert got_d == {(1, "a"), (2, "d")}
    with pytest.raises(ValueError, match="keep"):
        rank.deduplicate(df, ["k"], [F.col("ts")], "frist")


def test_overlaps_normalizes_reversed_bounds(spark):
    """Round-13 review: SQL OVERLAPS normalizes each (start, end) pair
    with least/greatest — reversed bounds are legal input."""
    r = spark.range(1).select(
        ffn.overlaps(
            F.lit("2024-01-01 10:00:00").cast("timestamp"),
            F.lit("2024-01-01 09:00:00").cast("timestamp"),  # reversed
            F.lit("2024-01-01 09:30:00").cast("timestamp"),
            F.lit("2024-01-01 09:45:00").cast("timestamp"),
        ).alias("o")
    ).first()
    assert r.o is True


def test_is_decimal_signed_and_unicode_classes(spark):
    r = spark.range(1).select(
        ffn.is_decimal(F.lit("-1.5")).alias("a"),
        ffn.is_decimal(F.lit("+3.")).alias("b"),
        ffn.is_decimal(F.lit("abc")).alias("c"),
        ffn.is_alpha(F.lit("café")).alias("d"),
        ffn.is_digit(F.lit("٣٤")).alias("e"),  # Arabic-Indic digits
    ).first()
    assert r.a and r.b and not r.c and r.d and r.e
