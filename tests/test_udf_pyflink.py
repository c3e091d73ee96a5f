"""PyFlink 1.11 UDF surface shim (flink_1_11_1_spark/udf.py): the
reference's registration shapes run unchanged, executing on Spark's
Python UDF stack."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from flink_1_11_1_spark.table_env import TableEnvironment
from flink_1_11_1_spark.udf import DataTypes, udf, udtf

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tenv(spark):
    env = TableEnvironment(spark)
    env.register_fixture_catalog(SF_SMOKE)
    return env


def test_datatypes_mapping():
    assert DataTypes.BIGINT() == T.LongType()
    assert DataTypes.STRING() == T.StringType()
    assert DataTypes.DECIMAL(10, 2) == T.DecimalType(10, 2)
    assert DataTypes.ARRAY(DataTypes.INT()) == T.ArrayType(T.IntegerType())
    row = DataTypes.ROW([DataTypes.FIELD("a", DataTypes.BIGINT())])
    assert row == T.StructType([T.StructField("a", T.LongType())])


def test_general_udf_pyflink_shape(tenv):
    add = udf(lambda a, b: a + b,
              [DataTypes.BIGINT(), DataTypes.BIGINT()], DataTypes.BIGINT())
    tenv.register_function("tadd", add)
    # SQL call
    assert tenv.execute_sql("SELECT tadd(1, 2) v").first().v == 3
    # Table API expression-string call (registered-name fallback)
    t = tenv.from_path("nation").select("tadd(n_nationkey, 100) as k") \
        .order_by("k.asc").fetch(1)
    assert next(t.execute().collect()).k == 100
    # direct DataFrame-style call on Columns
    from pyspark.sql import functions as F

    df = tenv.spark.range(3).select(add(F.col("id"), F.lit(10)).alias("v"))
    assert [r.v for r in df.collect()] == [10, 11, 12]


def test_decorator_and_pandas_udf(tenv):
    @udf(result_type=DataTypes.DOUBLE(), udf_type="pandas")
    def times2(s: pd.Series) -> pd.Series:
        return s * 2.0

    tenv.register_function("ptimes2", times2)
    got = tenv.execute_sql(
        "SELECT sum(ptimes2(o_totalprice)) s FROM orders").first().s
    want = tenv.execute_sql(
        "SELECT sum(o_totalprice) * 2 s FROM orders").first().s
    assert got == pytest.approx(want)
    with pytest.raises(ValueError, match="udf_type"):
        udf(lambda x: x, result_type=DataTypes.INT(), udf_type="arrow3")


def test_udtf_lateral(tenv):
    split = udtf(lambda line: [(w,) for w in line.split()],
                 [DataTypes.STRING()], [DataTypes.STRING()],
                 field_names=["word"])
    tenv.register_function("tsplit", split)
    rows = tenv.execute_sql(
        "SELECT word FROM tsplit('a b c') ORDER BY word").collect()
    assert [r.word for r in rows] == ["a", "b", "c"]
    # correlated lateral over a table (Flink: LATERAL TABLE(split(x)))
    tenv.from_elements([("x y",), ("z",)], schema="s string") \
        .df.createOrReplaceTempView("udtf_src")
    rows = tenv.execute_sql(
        "SELECT s, word FROM udtf_src, LATERAL tsplit(s) ORDER BY s, word"
    ).collect()
    assert [(r.s, r.word) for r in rows] == [
        ("x y", "x"), ("x y", "y"), ("z", "z")]
