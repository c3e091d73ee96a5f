"""Golden plan tests (round 7) — the reference's checked-in optimizer
plans per query (flink-table-planner-blink
``src/test/resources/.../plan/**/*.xml``, harness
``planner/utils/TableTestBase.scala``), rendered for Catalyst: every
SQL-text entry's normalized optimized logical plan is asserted against
``tests/goldens/plans.json``.

A failure means the OPTIMIZER output changed — a Spark upgrade, a
conf drift, or an entry edit.  If the change is intended, regenerate:

    SPARK_GRAFT_REGEN_GOLDENS=1 python -m pytest tests/test_plan_goldens.py -q

and review the golden diff like any code change (that review step is
the entire point of Flink's plan tests).
"""

from __future__ import annotations

import json
import os

import pytest

from flink_1_11_1_spark import catalog, declared, testing
from flink_1_11_1_spark.extensions import tpcds_shapes, tpch_extra

from .conftest import SF_SMOKE

_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "plans.json")
_REGEN = os.environ.get("SPARK_GRAFT_REGEN_GOLDENS") == "1"

_ALL_SQL = {
    **{q: declared.spark_text(q) for q in declared.QUERIES},
    **tpch_extra._SHAPES,
    **tpcds_shapes._SHAPES,
}


def _goldens() -> dict[str, str]:
    with open(_GOLDEN_PATH) as f:
        return json.load(f)


def test_golden_set_covers_every_sql_entry():
    assert sorted(_goldens()) == sorted(_ALL_SQL)


@pytest.mark.parametrize("name", sorted(_ALL_SQL))
def test_optimized_plan_matches_golden(spark, name):
    catalog.register(spark, SF_SMOKE)
    got = testing.plan_fingerprint(spark.sql(_ALL_SQL[name]))
    if _REGEN:
        g = _goldens()
        g[name] = got
        with open(_GOLDEN_PATH, "w") as f:
            json.dump(g, f, indent=0, sort_keys=True)
        return
    want = _goldens()[name]
    assert got == want, (
        f"optimizer plan drifted for {name} — diff the fingerprints and, "
        f"if intended, regenerate with SPARK_GRAFT_REGEN_GOLDENS=1\n"
        f"got:  {got[:400]}\nwant: {want[:400]}"
    )
