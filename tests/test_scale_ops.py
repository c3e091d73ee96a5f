"""Scale-path operators: salting rewrites, bucketed co-located joins,
fluent Pattern API."""

import pytest

from pyspark.sql import functions as F

from flink_1_11_1_spark import catalog
from flink_1_11_1_spark.operators import skew
from flink_1_11_1_spark.streaming import cep
from flink_1_11_1_spark.streaming.pattern import Pattern

from .conftest import SF_SMOKE


def test_salted_agg_equals_plain(spark):
    orders = catalog.load_table(spark, SF_SMOKE, "orders")
    got = {
        r.o_orderpriority: (r.n, round(r.s, 2), r.mx)
        for r in skew.salted_agg(
            orders,
            ["o_orderpriority"],
            {
                "n": ("count", "*"),
                "s": ("sum", "o_totalprice"),
                "mx": ("max", "o_totalprice"),
            },
            num_salts=8,
        ).collect()
    }
    want = {
        r.o_orderpriority: (r.n, round(r.s, 2), r.mx)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.max("o_totalprice").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_equals_plain(spark):
    cust = catalog.load_table(spark, SF_SMOKE, "customer")
    nation = catalog.load_table(spark, SF_SMOKE, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    got = skew.salted_join(cust, nation, ["c_nationkey"], num_salts=4)
    want = cust.join(nation, ["c_nationkey"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # left join keeps unmatched probe rows exactly once
    nation_partial = nation.where("c_nationkey < 5")
    got_l = skew.salted_join(cust, nation_partial, ["c_nationkey"], 4, "left")
    want_l = cust.join(nation_partial, ["c_nationkey"], "left")
    assert sorted(map(tuple, got_l.collect())) == sorted(map(tuple, want_l.collect()))


def test_bucketed_join_has_no_shuffle(spark):
    """Bucketing both sides on the join key co-locates the join: the
    SortMergeJoin runs without Exchange on either input (the engine's
    pre-partitioning answer for repeated big-big joins)."""
    orders = catalog.load_table(spark, SF_SMOKE, "orders")
    lineitem = catalog.load_table(spark, SF_SMOKE, "lineitem")
    spark.sql("DROP TABLE IF EXISTS t_bucket_orders")
    spark.sql("DROP TABLE IF EXISTS t_bucket_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").format("parquet").saveAsTable("t_bucket_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").format("parquet").saveAsTable("t_bucket_lineitem")
    )
    try:
        joined = (
            spark.table("t_bucket_orders").hint("merge")
            .join(
                spark.table("t_bucket_lineitem").hint("merge"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
        )
        assert joined.count() == lineitem.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located, no shuffle
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_orders")
        spark.sql("DROP TABLE IF EXISTS t_bucket_lineitem")


def test_pattern_api_compiles_to_cep(spark):
    ev = catalog.load_table(spark, SF_SMOKE, "events")
    fluent = (
        Pattern.begin("event_type = 'signup'")
        .followed_by("event_type = 'purchase'")
        .within("1 hour")
        .match_batch(ev)
    )
    direct = cep.match_batch(ev, horizon_s=3600)
    assert sorted(map(tuple, fluent.collect())) == sorted(map(tuple, direct.collect()))


def test_pattern_custom_conditions(spark):
    ev = catalog.load_table(spark, SF_SMOKE, "events")
    m = (
        Pattern.begin("event_type = 'click'")
        .followed_by("event_type = 'error'")
        .within("30 minutes")
        .match_batch(ev)
    )
    rows = m.collect()
    clicks = {r.event_id for r in ev.where("event_type = 'click'").collect()}
    errors = {r.event_id for r in ev.where("event_type = 'error'").collect()}
    assert all(r.a_id in clicks and r.b_id in errors for r in rows)
    assert all((r.b_ts - r.a_ts).total_seconds() <= 1800 for r in rows)
    assert len(rows) > 0


def test_pattern_api_validation():
    with pytest.raises(ValueError, match="followed_by"):
        Pattern.begin("x = 1").match_batch(None)
    with pytest.raises(ValueError, match="two states"):
        Pattern.begin("a").followed_by("b").followed_by("c")
    with pytest.raises(ValueError, match="unsupported interval"):
        Pattern.begin("a").followed_by("b").within("soon")
