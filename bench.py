#!/usr/bin/env python
"""BENCH driver: runs the declared suite + extension ops in one warm
session at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Budget contract (BASELINE.md): each query within 2x of its matching
shape row; suite wall-clock (incl. startup) under 300 s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_1_11_1_spark import catalog, declared  # noqa: E402
from flink_1_11_1_spark.extensions import registry  # noqa: E402
from flink_1_11_1_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t_start = time.time()
    spark = get_spark("flink-1.11.1-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    catalog.register(spark, sf_dir)

    timings: dict[str, float] = {}
    for qid in declared.QUERIES:
        t0 = time.time()
        spark.sql(declared.spark_text(qid)).collect()
        timings[qid] = round(time.time() - t0, 3)

    for name, fn in registry.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_start, 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    conf = spark.sparkContext.getConf()
    config = {
        "master": conf.get("spark.master"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "driver_memory": conf.get("spark.driver.memory", "default"),
        "spark_version": spark.version,
    }
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "config": config,
            }
        )
    )


if __name__ == "__main__":
    main()
