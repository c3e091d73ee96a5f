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
    registry.register("x_graph_pagerank", graph_pagerank, PAGERANK_ORACLE)
    registry.register("x_graph_sssp", graph_sssp, SSSP_ORACLE)


# --------------------------------------------------- triangle counting

def _co_order_part_edges(spark: SparkSession, sf_dir: str, modulus: int = 4):
    """Canonical part-part edges: both parts bought in one order (orders
    subsampled 1/``modulus`` by key to bound the declared entry's cost)."""
    # li feeds both sides of the co-order self-join: the lazy checkpoint
    # runs the scan + distinct once instead of per side (round 14)
    li = (
        catalog.load_table(spark, sf_dir, "lineitem")
        .where(f"l_orderkey % {modulus} = 0")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
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
    (Gelly TriangleEnumerator parity; operators/iterate.py).

    Declared fixture is the 1/8 order subsample (round-10 suite-budget
    rule, second continuation: triangle enumeration is superlinear in
    edge density — 8.0 → 1.9 s at sf0.1 for the same contract; 191
    triangle-bearing nodes remain at sf0.001, so the top-20 output is
    non-vacuous at every scale)."""
    tri = iterate.triangle_enumeration(
        _co_order_part_edges(spark, sf_dir, modulus=8))
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
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 8 = 0
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


# ------------------------------------------------- integer PageRank

def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by integer-exact PageRank over the symmetrized
    co-order graph (same bounded subgraph as x_graph_triangles —
    the 1/8 order subsample; each of the 3 rank rounds joins the full
    edge set, 5.1 → 2.5 s at sf0.1 for the same contract)."""
    e = _co_order_part_edges(spark, sf_dir, modulus=8)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = iterate.pagerank_integer(sym, iterations=3)
    return (
        out.select(F.col("node").cast("long").alias("node"), "rank")
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )


PAGERANK_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 8 = 0
), e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), e AS (
  SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
), nodes AS (
  SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e
), consts AS (
  SELECT 1000000000 // count(*) AS init,
         (15 * (1000000000 // count(*))) // 100 AS base
  FROM nodes
), deg AS (
  SELECT src, count(*) AS deg FROM e GROUP BY src
), r0 AS (
  SELECT node, (SELECT init FROM consts)::BIGINT AS rank FROM nodes
), i1 AS (
  SELECT e.dst AS node, sum(r0.rank // deg.deg) AS s
  FROM e JOIN deg ON e.src = deg.src JOIN r0 ON r0.node = e.src
  GROUP BY e.dst
), r1 AS (
  SELECT n.node,
         ((SELECT base FROM consts) + (85 * coalesce(i1.s, 0)) // 100)::BIGINT AS rank
  FROM nodes n LEFT JOIN i1 ON i1.node = n.node
), i2 AS (
  SELECT e.dst AS node, sum(r1.rank // deg.deg) AS s
  FROM e JOIN deg ON e.src = deg.src JOIN r1 ON r1.node = e.src
  GROUP BY e.dst
), r2 AS (
  SELECT n.node,
         ((SELECT base FROM consts) + (85 * coalesce(i2.s, 0)) // 100)::BIGINT AS rank
  FROM nodes n LEFT JOIN i2 ON i2.node = n.node
), i3 AS (
  SELECT e.dst AS node, sum(r2.rank // deg.deg) AS s
  FROM e JOIN deg ON e.src = deg.src JOIN r2 ON r2.node = e.src
  GROUP BY e.dst
), r3 AS (
  SELECT n.node,
         ((SELECT base FROM consts) + (85 * coalesce(i3.s, 0)) // 100)::BIGINT AS rank
  FROM nodes n LEFT JOIN i3 ON i3.node = n.node
)
SELECT cast(node as bigint) AS node, rank FROM r3
ORDER BY rank DESC, node LIMIT 20
"""


# ------------------------------------------ single-source shortest paths

def graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from the minimum part key over the symmetrized
    co-order graph (Gelly SingleSourceShortestPaths parity, delta
    iteration under the oracle contract).

    Declared fixture is the 1/8 order subsample (round-10 suite-budget
    rule: each of the up-to-8 frontier rounds joins the full edge set,
    so SSSP pays the subgraph cost 8x per round; triangles/pagerank
    moved to the same 1/8 slice in the second continuation — same
    algorithm and oracle contract throughout)."""
    e = _co_order_part_edges(spark, sf_dir, modulus=8)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    source = sym.agg(F.min("src")).collect()[0][0]
    # round i of the delta iteration labels exactly the dist-i frontier
    # (BFS min-merge: a label is final when first assigned), so 6
    # rounds are exact for the declared dist <= 6 output — rounds 7-8
    # only discover nodes the filter drops.
    out = iterate.shortest_paths(sym, int(source), max_iterations=6)
    return (
        out.where(F.col("dist") <= 6)
        .select(F.col("node").cast("long").alias("node"), F.col("dist").cast("long").alias("dist"))
        .orderBy("node")
    )


SSSP_ORACLE = """
WITH RECURSIVE op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 8 = 0
), e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), e AS (
  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
), walk AS (
  SELECT (SELECT min(src) FROM e) AS v, 0 AS d
  UNION
  SELECT e.dst AS v, walk.d + 1 AS d
  FROM walk JOIN e ON e.src = walk.v WHERE walk.d < 6
)
SELECT cast(v as bigint) AS node, cast(min(d) as bigint) AS dist
FROM walk GROUP BY v HAVING min(d) <= 6 ORDER BY node
"""
