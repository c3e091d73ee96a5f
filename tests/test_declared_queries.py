"""Cross-engine oracle suite (SURVEY.md §6.2 item 1): every declared
query runs on the Spark engine and on DuckDB; canonicalized results must
match row-for-row.  sf0.001 here for speed; the driver repeats at sf0.01.
"""

import pytest

from flink_1_11_1_spark import declared, testing

from .conftest import SF_SMOKE


@pytest.mark.parametrize("qid", sorted(declared.QUERIES))
def test_declared_query_matches_oracle(spark, duck, qid):
    sc, sr = testing.run_spark(spark, SF_SMOKE, declared.spark_text(qid))
    dc, dr = testing.run_duckdb(duck, declared.oracle_text(declared.QUERIES[qid]))
    ok, msg = testing.compare(sc, sr, dc, dr)
    assert ok, f"{qid}: {msg}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 42
