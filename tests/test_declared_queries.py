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


def test_driver_window_leads_with_unproven_entries():
    """The correctness driver checks only the FIRST 50 queries() entries
    per round; the rotation invariant (CLAUDE.md) is that every
    never-proven entry fits inside the window and leads it."""
    import __spark_entry__ as e

    names = list(e.queries())
    fresh = [k for k in names if k not in e._DRIVER_GREEN_HISTORY]
    assert len(fresh) <= 50, f"{len(fresh)} unproven entries exceed the driver window"
    assert names[: len(fresh)] == fresh  # unproven first, proven rotations after
