"""Standing oracle net for the EXTENSION entries (the x_* family).

The 42 declared SQL queries have per-query oracle tests; the extension
entries were only checked by the correctness driver and by manual dress
rehearsals.  This module makes every extension entry's Spark-vs-DuckDB
comparison a pytest case at sf0.001, so an operator regression fails in
`pytest tests/` instead of surfacing a round later in
CORRECTNESS_r{N}.json.

Comparison is POSITIONAL (testing.compare): since round 7 every
declared entry ends in a deterministic total ORDER BY, and this net is
the gate that keeps it true.
"""

from __future__ import annotations

import pytest

from flink_1_11_1_spark import testing
from flink_1_11_1_spark.extensions import registry

from .conftest import SF_SMOKE

pytestmark = [pytest.mark.slow, pytest.mark.oraclenet]  # THE per-entry net
# (round 11: test_extensions.py's duplicate parametrization was folded
# into this one — same comparison, half the seal cost)


_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


def _names() -> list[str]:
    return sorted(n for n in _QUERIES if n in _ORACLES)


def test_every_extension_entry_has_an_oracle():
    assert sorted(_QUERIES) == _names()  # no rows-only entries left


@pytest.mark.parametrize("name", _names())
def test_extension_entry_matches_oracle(spark, duck, name):
    # testing.compare is POSITIONAL (rows in order): every declared
    # entry must end in a deterministic total ORDER BY (the round-7
    # lesson — 12 reds once came from exactly this gate; the round-11
    # net fold briefly lost it to a sorted compare, review finding).
    df = _QUERIES[name](spark, SF_SMOKE)
    scols, srows = df.columns, [tuple(r) for r in df.collect()]
    dcols, drows = testing.run_duckdb(duck, _ORACLES[name])
    ok, msg = testing.compare(scols, srows, dcols, drows)
    assert ok, f"{name}: {msg}"
