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
