"""Third batch: iterations with an oracle.

``x_connected_components``: label-propagation CC over a bipartite graph
derived from the fixtures (nation vertices linked to region hubs,
region ids offset by 1000 to keep vertex ids disjoint).  The oracle is
the closed form: every vertex's component is the minimum nation id in
its region (nation ids < 1000), computable relationally in DuckDB —
an analytic check of the iterative algorithm, not a reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..extensions import registry
from . import iterate


def connected_components_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = catalog.load_table(spark, sf_dir, "nation")
    edges = nation.select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.col("n_regionkey").cast("long") + 1000).alias("dst"),
    )
    out = iterate.connected_components(edges, max_iterations=10)
    return out.orderBy("vertex")


CC_ORACLE = """
WITH hubs AS (
  SELECT n_regionkey, min(n_nationkey) comp FROM nation GROUP BY n_regionkey
)
SELECT cast(n_nationkey as bigint) vertex, cast(comp as bigint) component
FROM nation JOIN hubs USING (n_regionkey)
UNION ALL
SELECT cast(n_regionkey + 1000 as bigint) vertex, cast(comp as bigint) component
FROM hubs
ORDER BY vertex
"""


def register_all() -> None:
    registry.register("x_connected_components", connected_components_nation, CC_ORACLE)
    registry.register("x_graph_triangles", graph_triangles, TRIANGLES_ORACLE)


# --------------------------------------------------- triangle counting

def _co_order_part_edges(spark: SparkSession, sf_dir: str):
    """Canonical part-part edges: both parts bought in one order (orders
    subsampled 1/4 by key to bound the declared entry's cost)."""
    li = (
        catalog.load_table(spark, sf_dir, "lineitem")
        .where("l_orderkey % 4 = 0")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle membership in the co-order graph
    (Gelly TriangleEnumerator parity; operators/iterate.py)."""
    tri = iterate.triangle_enumeration(_co_order_part_edges(spark, sf_dir))
    nodes = (
        tri.select(F.col("a").alias("v"))
        .unionAll(tri.select(F.col("b").alias("v")))
        .unionAll(tri.select(F.col("c").alias("v")))
    )
    return (
        nodes.groupBy("v")
        .agg(F.count("*").alias("n_triangles"))
        .select(F.col("v").cast("long").alias("node"), "n_triangles")
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(20)
    )


TRIANGLES_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0
), e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1
  JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
), nodes AS (
  SELECT a AS v FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT cast(v as bigint) AS node, cast(count(*) as bigint) AS n_triangles
FROM nodes GROUP BY v ORDER BY n_triangles DESC, node LIMIT 20
"""
