"""Hive catalog (sources/hive.py): persistent metastore-backed tables.

``spark.sql.catalogImplementation`` is a static conf and only one
SparkContext can live per JVM, so the Hive session cannot share the
suite's session fixture — the end-to-end scenario runs in a subprocess
with its own JVM: create a database + partitioned table, STOP the
session, reopen a fresh one against the same metastore, and verify the
table (a) survived the restart and (b) prunes partitions on read.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from flink_1_11_1_spark.sources.hive import HiveCatalog

wh, ms = {wh!r}, {ms!r}

spark = HiveCatalog.session(wh, ms)
cat = HiveCatalog(spark)
cat.create_database("tpch")
cat.use_database("tpch")
df = spark.createDataFrame(
    [(1, "a", "2026-01-01"), (2, "b", "2026-01-01"), (3, "c", "2026-01-02")],
    "id long, v string, dt string",
)
cat.create_table("events_h", df, partition_by=["dt"])
assert "events_h" in cat.list_tables("tpch")
assert sorted(cat.table_partitions("events_h")) == ["dt=2026-01-01", "dt=2026-01-02"]
spark.stop()

# fresh session, same metastore: the catalog must still know the table
spark2 = HiveCatalog.session(wh, ms, app_name="hive-reopen")
cat2 = HiveCatalog(spark2)
assert "tpch" in cat2.list_databases()
q = spark2.table("tpch.events_h").where("dt = '2026-01-01'")
rows = q.collect()
assert sorted(r.id for r in rows) == [1, 2], rows
plan = q._jdf.queryExecution().executedPlan().toString()
# partition pruning: only the matching partition directory is read
assert "PartitionFilters: [isnotnull(dt" in plan, plan[:2000]
print("HIVE_E2E_OK")
"""


def test_hive_catalog_end_to_end(tmp_path):
    script = _SCRIPT.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        wh=str(tmp_path / "warehouse"),
        ms=str(tmp_path / "metastore"),
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "HIVE_E2E_OK" in r.stdout
