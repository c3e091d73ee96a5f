import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_1_11_1_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flink-1.11.1-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    from flink_1_11_1_spark.testing import duckdb_connect

    return duckdb_connect(SF_SMOKE)
