"""Hive catalog (SURVEY.md §3.1 Hive source/sink/catalog).

Reference parity: flink-connectors/flink-connector-hive
``HiveCatalog.java`` — a persistent, metastore-backed catalog whose
tables survive session restarts, plus partitioned-table read/write.
Spark ships this natively (``enableHiveSupport``): table metadata goes
to a Hive metastore — an embedded Derby instance when no remote
``hive.metastore.uris`` is configured (this sandbox), the production
metastore service otherwise; the surface below is identical either way.

Scale: Hive tables here are parquet-backed with real partition columns,
so partition pruning works exactly as for path-partitioned datasets
(asserted in tests/test_hive_catalog.py: a partition-filtered scan
reads only the matching partition directories).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class HiveCatalog:
    """Thin Flink-``HiveCatalog``-shaped wrapper over a Hive-enabled
    SparkSession.  Build the session via :meth:`session` (static confs —
    catalogImplementation cannot be flipped on a live session)."""

    def __init__(self, spark: SparkSession):
        if spark.conf.get("spark.sql.catalogImplementation", "in-memory") != "hive":
            raise ValueError(
                "HiveCatalog needs a Hive-enabled session "
                "(HiveCatalog.session(...) or enableHiveSupport())"
            )
        self.spark = spark

    @staticmethod
    def session(
        warehouse_dir: str,
        metastore_dir: str | None = None,
        master: str = "local[2]",
        app_name: str = "flink-1.11.1-spark-hive",
    ) -> SparkSession:
        """Hive-enabled session.  ``metastore_dir`` pins the embedded
        Derby database location (defaults to the JVM working directory
        otherwise); point ``hive.metastore.uris`` at a real metastore
        in production instead."""
        b = (
            SparkSession.builder.master(master)
            .appName(app_name)
            .config("spark.sql.warehouse.dir", warehouse_dir)
            .config("spark.sql.shuffle.partitions", "4")
        )
        if metastore_dir:
            b = b.config(
                "spark.hadoop.javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={metastore_dir}/metastore_db;create=true",
            )
        return b.enableHiveSupport().getOrCreate()

    # -- databases ------------------------------------------------------

    def create_database(self, name: str, if_not_exists: bool = True) -> None:
        ine = "IF NOT EXISTS " if if_not_exists else ""
        self.spark.sql(f"CREATE DATABASE {ine}{name}")

    def list_databases(self) -> list[str]:
        return [d.name for d in self.spark.catalog.listDatabases()]

    def use_database(self, name: str) -> None:
        self.spark.catalog.setCurrentDatabase(name)

    def drop_database(self, name: str, cascade: bool = False) -> None:
        self.spark.sql(f"DROP DATABASE {name}{' CASCADE' if cascade else ''}")

    # -- tables ---------------------------------------------------------

    def create_table(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Persist a DataFrame as a metastore-registered parquet table
        (Flink ``catalog.createTable`` + INSERT in one step)."""
        w = df.write.mode(mode).format("parquet")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.saveAsTable(name)

    def list_tables(self, db: str | None = None) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables(db)]

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def table_partitions(self, name: str) -> list[str]:
        return [r[0] for r in self.spark.sql(f"SHOW PARTITIONS {name}").collect()]

    def drop_table(self, name: str, if_exists: bool = True) -> None:
        self.spark.sql(f"DROP TABLE {'IF EXISTS ' if if_exists else ''}{name}")
