"""No declared entry may expose a DECIMAL output column.

A Spark `1.0` literal is DECIMAL; DECIMAL(p,4) canonicalizes as
'4.6250' where DuckDB's DOUBLE gives '4.625' — a silent cross-engine
hash mismatch depending on the comparer's type handling.  Planning-only
(no collect), so this covers every entry cheaply.
"""

from flink_1_11_1_spark import catalog, declared
from flink_1_11_1_spark.extensions import registry

from .conftest import SF_SMOKE


def test_no_decimal_output_columns(spark):
    offenders = []
    catalog.register(spark, SF_SMOKE)
    for qid in declared.QUERIES:
        df = spark.sql(declared.spark_text(qid))
        offenders += [(qid, c, t) for c, t in df.dtypes if "decimal" in t]
    for name, fn in registry.queries().items():
        df = fn(spark, SF_SMOKE)
        offenders += [(name, c, t) for c, t in df.dtypes if "decimal" in t]
    assert not offenders, offenders
