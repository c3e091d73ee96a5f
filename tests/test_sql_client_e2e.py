"""sql-client surface capstone (round 7): one Flink SQL script through
``execute_script`` exercising the full front door together — DDL with
computed columns and NOT NULL, SET/RESET, CREATE VIEW, FLIP-113 hints,
SHOW TABLES / DESCRIBE introspection, multi-sink INSERT with subgraph
reuse, EXPLAIN PLAN FOR — the way a Flink user's ``-f script.sql``
actually mixes them."""

from __future__ import annotations

import os

from flink_1_11_1_spark.table_env import TableEnvironment

from .conftest import SF_SMOKE


def test_sql_client_script_end_to_end(spark, tmp_path):
    tenv = TableEnvironment(spark)
    s1, s2 = str(tmp_path / "sink_hi"), str(tmp_path / "sink_all")
    prior = spark.conf.get("spark.sql.shuffle.partitions")

    result = tenv.execute_script(
        f"""
        -- session properties (sql-client SET)
        SET 'table.exec.resource.default-parallelism' = '4';

        CREATE TABLE cust_src (
          c_custkey BIGINT NOT NULL,
          c_name STRING,
          c_acctbal DOUBLE,
          c_mktsegment STRING,
          bal_cents AS CAST(floor(c_acctbal * 100) AS BIGINT)
        ) WITH ('connector'='filesystem',
                'path'='{SF_SMOKE}/customer.parquet', 'format'='parquet');

        CREATE TABLE seg_hi (c_mktsegment STRING, n BIGINT, cents BIGINT)
        WITH ('connector'='filesystem', 'path'='{s1}', 'format'='parquet');
        CREATE TABLE seg_all (c_mktsegment STRING, n BIGINT, cents BIGINT)
        WITH ('connector'='filesystem', 'path'='{s2}', 'format'='parquet');

        CREATE VIEW seg_totals AS
          SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(bal_cents) AS BIGINT) AS cents
          FROM cust_src GROUP BY c_mktsegment;

        -- two sinks off one view: the reuse pass materializes it once
        INSERT INTO seg_hi SELECT c_mktsegment, n, cents
          FROM seg_totals WHERE cents > 0;
        INSERT INTO seg_all SELECT c_mktsegment, n, cents FROM seg_totals;

        -- final statement's result is returned
        SELECT CAST(count(*) AS BIGINT) AS n_segments FROM seg_all
        """
    )
    try:
        # SET applied, tracked for RESET
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"

        # both sinks written from the shared (checkpointed-once) view
        assert tenv.ddl.last_script_reuse["seg_totals"]["sinks"] == 2
        all_rows = {r.c_mktsegment: (r.n, r.cents)
                    for r in spark.read.parquet(s2).collect()}
        hi_rows = {r.c_mktsegment: (r.n, r.cents)
                   for r in spark.read.parquet(s1).collect()}
        direct = {
            r.c_mktsegment: (r.n, r.cents)
            for r in spark.sql(
                f"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) n,
                    CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) cents
                    FROM parquet.`{SF_SMOKE}/customer.parquet`
                    GROUP BY c_mktsegment"""
            ).collect()
        }
        assert all_rows == direct
        assert hi_rows == {k: v for k, v in direct.items() if v[1] > 0}

        # the script's last statement returned its result
        assert result.first().n_segments == len(direct)

        # introspection over the mixed catalog
        names = {r.tableName for r in tenv.execute_sql("SHOW TABLES").collect()}
        assert {"cust_src", "seg_hi", "seg_all"} <= names
        desc = {r.col_name: r.data_type
                for r in tenv.execute_sql("DESCRIBE cust_src").collect()}
        assert "NOT NULL" in desc["c_custkey"] and desc["bal_cents"] == "COMPUTED"

        # FLIP-113 hint on a declared table still rewrites post-script
        hinted = tenv.execute_sql(
            "SELECT count(*) AS n FROM cust_src /*+ OPTIONS('format'='parquet') */"
        ).first()
        assert hinted.n == sum(n for n, _ in direct.values())

        # EXPLAIN PLAN FOR over the declared view
        plan = tenv.execute_sql(
            "EXPLAIN PLAN FOR SELECT * FROM seg_totals"
        ).first().plan
        assert "Physical Plan" in plan

        # bare RESET undoes the SET
        tenv.execute_sql("RESET")
        assert spark.conf.get("spark.sql.shuffle.partitions") != "4"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        for t in ("seg_hi", "seg_all", "cust_src"):
            tenv.execute_sql(f"DROP TABLE {t}")
        tenv.execute_sql("DROP VIEW seg_totals")


def test_streaming_rank_over_example_runs(spark):
    """examples/streaming_rank_over.py is the runs-unchanged proof for
    the round 11-12 streaming SQL rank/over surface (running OVER,
    Top-N over an updating aggregate, append-only Top-N) — executed as
    a subprocess like a real user would."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "examples",
                                      "streaming_rank_over.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK streaming rank/over" in proc.stdout


def test_round9_example_runs(spark):
    """examples/flink_sql_client_script.py is the runs-unchanged proof
    for the round-9 surface (DDL + LIKE + hive multi-INSERT +
    composable MR) — executed as a subprocess like a real user would."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "examples",
                                      "flink_sql_client_script.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def test_llm_pipeline_example_runs(spark):
    """examples/llm_data_pipeline.py composes the extension operators
    (exact + LSH dedup, quality gate, decontamination, PII audit,
    token quota, batch packing) end-to-end — executed as a subprocess
    like a real user would."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "examples",
                                      "llm_data_pipeline.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
