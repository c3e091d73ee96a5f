"""S7: UDF / UDAF / UDTF surface (SURVEY.md §3.12).

Reference parity: ScalarFunction / AggregateFunction / TableFunction /
vectorized Pandas UDFs (PyFlink runs them over Beam in a separate
worker; PySpark runs them natively — home advantage).  Each variant is
asserted against the equivalent pure-JVM expression on fixture data.
"""

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from flink_1_11_1_spark import catalog

from .conftest import SF_SMOKE


def test_scalar_python_udf(spark):
    import math

    @F.udf(LongType())
    def total_cents(price, disc):
        # floor, not round: python round() is banker's, Spark's is half-up
        return math.floor(price * (1 - disc) * 100)

    li = catalog.load_table(spark, SF_SMOKE, "lineitem").limit(500)
    got = li.select(total_cents("l_extendedprice", "l_discount").alias("c")).collect()
    want = li.select(
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("c")
    ).collect()
    assert [r.c for r in got] == [r.c for r in want]


def test_vectorized_pandas_udf(spark):
    @F.pandas_udf(DoubleType())
    def disc_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = catalog.load_table(spark, SF_SMOKE, "lineitem")
    got = li.agg(F.round(F.sum(disc_price("l_extendedprice", "l_discount")), 2)).first()[0]
    want = li.agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    ).first()[0]
    assert got == want


def test_grouped_agg_pandas_udaf(spark):
    @F.pandas_udf(DoubleType())
    def mean_udaf(v: pd.Series) -> float:
        return float(v.mean())

    orders = catalog.load_table(spark, SF_SMOKE, "orders")
    got = {
        r.o_orderpriority: round(r.m, 4)
        for r in orders.groupBy("o_orderpriority")
        .agg(mean_udaf("o_totalprice").alias("m"))
        .collect()
    }
    want = {
        r.o_orderpriority: round(r.m, 4)
        for r in orders.groupBy("o_orderpriority")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    }
    assert got == want


def test_python_udtf(spark):
    """TableFunction / lateral join (Flink Correlate node)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")[:3]):
                yield w, i

    spark.udtf.register("tokenize3", Tokenize)
    catalog.register(spark, SF_SMOKE)
    got = spark.sql(
        "SELECT d.doc_id, t.word, t.pos FROM documents d, "
        "LATERAL tokenize3(d.text) t WHERE d.doc_id < 3 ORDER BY d.doc_id, t.pos"
    ).collect()
    want = spark.sql(
        "SELECT doc_id, word, pos FROM (SELECT doc_id, "
        "posexplode(slice(split(text, ' '), 1, 3)) AS (pos, word) "
        "FROM documents WHERE doc_id < 3) ORDER BY doc_id, pos"
    ).collect()
    assert [(r.doc_id, r.word, r.pos) for r in got] == [
        (r.doc_id, r.word, r.pos) for r in want
    ]


def test_grouped_map_applyinpandas(spark):
    """TableAggregateFunction analogue: multi-row output per group."""
    orders = catalog.load_table(spark, SF_SMOKE, "orders")

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(2, "o_totalprice")[["o_custkey", "o_orderkey", "o_totalprice"]]

    got = (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(top2, "o_custkey long, o_orderkey long, o_totalprice double")
    )
    from flink_1_11_1_spark.operators import rank

    want = rank.top_n(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        2,
        keep_rank_col=False,
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
