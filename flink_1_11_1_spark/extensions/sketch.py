"""Deterministic distinct-count sketch (KMV — k minimum values).

The sketch tier of the extension family: estimate ``count(distinct
user_id)`` per group from the k smallest normalized hash values
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002: E[distinct] = (k-1)/h_(k)).  Spark's built-in
``approx_count_distinct`` (HyperLogLog++) has no cross-engine twin, so
it can't be oracle-checked value-for-value; KMV over a portable md5
hash is fully deterministic — both engines fold the same 13 md5
nibbles (52 bits — exactly representable in a double) to the same
uniform [0,1) value, so the estimates agree bit-for-bit.

Plan shape: one distinct shuffle on (group, hash) + one k-bounded
window pass.  At 100 TB the textbook refinement is partial per-split
k-min state merged associatively (KMV unions are just "merge and keep
the k smallest"); the relational rendering here trades that for
oracle-exactness at fixture scale and documents the swap point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from . import registry

K = 64

# 13 hex nibbles = 52 bits: the largest md5 prefix a double represents
# exactly, so the normalized hash is bit-identical across engines.
_TWO_52 = float(1 << 52)

_SPARK_H = (
    "cast(conv(substring(md5(cast(user_id as string)), 1, 13), 16, 10) as double)"
    f" / {_TWO_52!r}"
)

_DUCK_H = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 14), "
    "i -> (strpos('0123456789abcdef', "
    "substring(md5(user_id::VARCHAR), i, 1)) - 1)::BIGINT)), "
    f"(a, x) -> a * 16 + x) / {_TWO_52!r}"
)


def _kmv_sql(h_expr: str) -> str:
    return f"""
WITH h AS (
  SELECT DISTINCT event_type, {h_expr} AS h FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) rn
  FROM h
)
SELECT event_type,
       cast(max(rn) as bigint) AS n_exact,
       round(CASE WHEN max(rn) < {K} THEN cast(max(rn) as double)
                  ELSE ({K} - 1.0) / max(CASE WHEN rn = {K} THEN h END)
             END, 2) AS est_kmv
FROM r GROUP BY event_type ORDER BY event_type
"""


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.register(spark, sf_dir)
    return spark.sql(_kmv_sql(_SPARK_H))


KMV_ORACLE = _kmv_sql(_DUCK_H)

registry.register("x_sketch_kmv", kmv_distinct, KMV_ORACLE)
