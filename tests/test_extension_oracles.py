"""Standing oracle net for the EXTENSION entries (the x_* family).

The 42 declared SQL queries have per-query oracle tests; the extension
entries were only checked by the correctness driver and by manual dress
rehearsals.  This module makes every extension entry's Spark-vs-DuckDB
comparison a pytest case at sf0.001, so an operator regression fails in
`pytest tests/` instead of surfacing a round later in
CORRECTNESS_r{N}.json.

Comparison is order-insensitive (sorted canonical rows) — the driver's
hash convention — since not every extension entry ends in a total
ORDER BY.
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
    df = _QUERIES[name](spark, SF_SMOKE)
    scols, srows = df.columns, [tuple(r) for r in df.collect()]
    dcols, drows = testing.run_duckdb(duck, _ORACLES[name])
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    a = sorted(testing.canon_rows(scols, srows))
    b = sorted(testing.canon_rows(dcols, drows))
    assert a == b, (
        f"{name}: {len(srows)} spark vs {len(drows)} duckdb rows; "
        f"first spark-only {[r for r in a if r not in b][:2]}; "
        f"first duckdb-only {[r for r in b if r not in a][:2]}"
    )
