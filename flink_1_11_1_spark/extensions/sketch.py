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


# ------------------------------------------------- theta set operations

# Theta-sketch set algebra (Dasgupta et al., "Theta sketch framework",
# 2016): each group keeps its k smallest hashes; for a pair of groups
# the intersection estimate is |{common samples below min(theta_a,
# theta_b)}| / min_theta, and union comes from inclusion-exclusion of
# the three single divisions.  Same md5 52-bit fold as KMV, so both
# engines produce identical doubles; the only float ops are the final
# divisions (and one least()), all identically ordered.


def _theta_sql(h_expr: str) -> str:
    return f"""
WITH h AS (
  SELECT DISTINCT event_type, user_id, {h_expr} AS h FROM events
),
r AS (
  SELECT event_type, user_id, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) rn
  FROM h
),
kept AS (SELECT * FROM r WHERE rn <= {K}),
th AS (
  SELECT event_type,
         max(rn) AS n_kept,
         CASE WHEN max(rn) < {K} THEN 1.0
              ELSE max(CASE WHEN rn = {K} THEN h END) END AS theta
  FROM kept GROUP BY event_type
),
cs AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b,
         sum(CASE WHEN a.h < least(ta.theta, tb.theta) THEN 1 ELSE 0 END) AS inter_cnt
  FROM kept a
  JOIN kept b ON a.user_id = b.user_id AND a.event_type < b.event_type
  JOIN th ta ON ta.event_type = a.event_type
  JOIN th tb ON tb.event_type = b.event_type
  GROUP BY a.event_type, b.event_type
),
common AS (
  -- EVERY sketch pair gets a row (round-13 review): a pair sharing no
  -- kept sample is an estimated-disjoint pair (inter_cnt 0), not a
  -- missing one — the old inner-join-on-samples shape dropped it
  SELECT ta.event_type AS et_a, tb.event_type AS et_b,
         ta.theta AS theta_a, tb.theta AS theta_b,
         ta.n_kept AS nk_a, tb.n_kept AS nk_b,
         coalesce(cs.inter_cnt, 0) AS inter_cnt
  FROM th ta
  JOIN th tb ON ta.event_type < tb.event_type
  LEFT JOIN cs ON cs.et_a = ta.event_type AND cs.et_b = tb.event_type
),
ex AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b,
         count(*) AS n_exact_intersect
  FROM (SELECT DISTINCT event_type, user_id FROM events) a
  JOIN (SELECT DISTINCT event_type, user_id FROM events) b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT c.et_a, c.et_b,
       cast(coalesce(e.n_exact_intersect, 0) as bigint) AS n_exact_intersect,
       cast(c.inter_cnt as bigint) AS theta_samples,
       round(c.inter_cnt / least(c.theta_a, c.theta_b), 2) AS est_intersect,
       round(CASE WHEN c.nk_a < {K} THEN cast(c.nk_a as double)
                  ELSE ({K} - 1.0) / c.theta_a END
           + CASE WHEN c.nk_b < {K} THEN cast(c.nk_b as double)
                  ELSE ({K} - 1.0) / c.theta_b END
           - c.inter_cnt / least(c.theta_a, c.theta_b), 2) AS est_union
FROM common c LEFT JOIN ex e ON e.et_a = c.et_a AND e.et_b = c.et_b
ORDER BY c.et_a, c.et_b
"""


def theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user intersection/union estimates between event
    types via theta-sketch algebra.

    100 TB shape: ``kept`` bounds every group's contribution to k rows,
    so the pair join touches k·groups rows no matter how many events
    exist; the exact-intersect CTE is the fixture-scale comparison
    column and would be dropped at scale (that full distinct join is
    exactly what the sketch replaces).
    """
    catalog.register(spark, sf_dir)
    return spark.sql(_theta_sql(_SPARK_H))


registry.register("x_sketch_theta", theta_set_ops, _theta_sql(_DUCK_H))
