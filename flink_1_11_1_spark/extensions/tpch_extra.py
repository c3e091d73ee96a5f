"""TPC-H-shaped declared queries beyond the §3.13 set.

The reference's e2e pattern is the full TPC-DS answer-set run
(flink-end-to-end-tests/flink-tpcds-test); the fixtures here are
TPC-H-ish, so these adapt the classic TPC-H multi-way-join queries to
the available schema (no partsupp table; reduced column sets; nation
names are ``NATION_<k>``; ``p_type`` values are single words).  Each is
portable SQL — one text for both engines — stressing 5–7-way join
ordering, mixed broadcast/shuffle selection, and conditional aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from . import registry

# ruff: noqa: E501

Q5_SHAPE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
     JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
     JOIN nation ON s_nationkey = n_nationkey
     JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= timestamp '1996-01-01' AND o_orderdate < timestamp '1998-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""

Q7_SHAPE = """
WITH shipping AS (
  SELECT n1.n_name supp_nation, n2.n_name cust_nation,
         extract(year from l_shipdate) l_year,
         l_extendedprice * (1 - l_discount) volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
       JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) revenue
FROM shipping GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

Q8_SHAPE = """
WITH all_nations AS (
  SELECT extract(year from o_orderdate) o_year,
         l_extendedprice * (1 - l_discount) volume,
         n2.n_name nation
  FROM part JOIN lineitem ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON c_nationkey = n1.n_nationkey
       JOIN region ON n1.n_regionkey = r_regionkey
       JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) mkt_share
FROM all_nations GROUP BY o_year ORDER BY o_year
"""

Q10_SHAPE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
     JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= timestamp '1996-01-01'
  AND o_orderdate < timestamp '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""

Q14_SHAPE = """
SELECT round(cast(100 as double)
       * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
       / sum(l_extendedprice * (1 - l_discount)), 4) promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= timestamp '1996-01-01' AND l_shipdate < timestamp '1996-07-01'
"""

_SHAPES = {
    "x_tpch_q5": Q5_SHAPE,
    "x_tpch_q7": Q7_SHAPE,
    "x_tpch_q8": Q8_SHAPE,
    "x_tpch_q10": Q10_SHAPE,
    "x_tpch_q14": Q14_SHAPE,
}


def _runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.register(spark, sf_dir)
        return spark.sql(sql)

    return run


for _name, _sql in _SHAPES.items():
    registry.register(_name, _runner(_sql), _sql)
