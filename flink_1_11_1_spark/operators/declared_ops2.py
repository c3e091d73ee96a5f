"""Second batch of oracle/rows-only declared entries: lookup join,
salted aggregation, multimodal decode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..extensions import multimodal as mm
from ..extensions import registry
from . import joins, skew


def lookup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join (StreamExecLookupJoin batch contract): enrich
    customers against the nation dimension, always broadcast."""
    cust = catalog.load_table(spark, sf_dir, "customer")
    nation = catalog.load_table(spark, sf_dir, "nation")
    out = joins.lookup_join(
        cust, nation, F.col("c_nationkey") == F.col("n_nationkey")
    )
    return out.select("c_custkey", "c_name", "n_name").orderBy("c_custkey").limit(500)


LOOKUP_ORACLE = """
SELECT c_custkey, c_name, n_name
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
ORDER BY c_custkey LIMIT 500
"""


def salted_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregate; result identical to the plain
    GROUP BY (count/min/max are order-independent — exactly comparable)."""
    orders = catalog.load_table(spark, sf_dir, "orders")
    out = skew.salted_agg(
        orders,
        ["o_orderpriority"],
        {
            "n": ("count", "*"),
            "mn": ("min", "o_totalprice"),
            "mx": ("max", "o_totalprice"),
        },
        num_salts=16,
    )
    return out.orderBy("o_orderpriority")


SALTED_ORACLE = """
SELECT o_orderpriority, count(*) n, min(o_totalprice) mn, max(o_totalprice) mx
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end (rows-only: fake codec + python
    stage): synthesize media, decode, emit per-item stats."""
    docs = catalog.load_table(spark, sf_dir, "documents").where("doc_id < 100")
    decoded = mm.decode_media(mm.attach_fake_media(docs))
    return decoded.select(
        "doc_id", "width", "height", F.round("mean_intensity", 4).alias("mi")
    ).orderBy("doc_id")


def register_all() -> None:
    registry.register("x_lookup_join", lookup_customers, LOOKUP_ORACLE)
    registry.register("x_salted_agg", salted_order_stats, SALTED_ORACLE)
    registry.register("x_multimodal_decode", multimodal_features)  # rows-only: fake codec
