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
       round(round(sum(l_extendedprice * (1 - l_discount)), 4), 2) revenue
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

# The shapes below cover the TPC-H subquery battery — correlated scalar
# subqueries, [NOT] EXISTS, [NOT] IN, HAVING-filtered IN, and the
# decorrelation work Catalyst must do for each (RewriteCorrelatedScalarQuery,
# RewritePredicateSubquery → semi/anti join).  Adapted to this schema:
# no partsupp, no commit/receipt dates (shipdate-vs-orderdate stands in),
# no c_phone (the customer-number suffix stands in for Q22's cntrycode).

Q2_SHAPE = """
SELECT c_custkey, c_name, round(c_acctbal, 2) bal
FROM customer c
WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c_custkey
"""

Q4_SHAPE = """
SELECT o_orderpriority, cast(count(*) as bigint) order_count
FROM orders
WHERE o_orderdate >= timestamp '1996-01-01' AND o_orderdate < timestamp '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

Q12_SHAPE = """
SELECT l_returnflag,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) as bigint) high_line_count,
       cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) as bigint) low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= timestamp '1996-01-01' AND l_shipdate < timestamp '1997-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
"""

Q13_SHAPE = """
SELECT c_count, cast(count(*) as bigint) custdist
FROM (SELECT c_custkey, cast(count(o_orderkey) as bigint) c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""

Q15_SHAPE = """
WITH revenue AS (
  SELECT l_suppkey supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) total_revenue
  FROM lineitem
  WHERE l_shipdate >= timestamp '1996-01-01' AND l_shipdate < timestamp '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""

Q16_SHAPE = """
SELECT p_brand, p_type, p_size, cast(count(DISTINCT l_suppkey) as bigint) supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

Q17_SHAPE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#12' AND p_type = 'PROMO'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""

Q18_SHAPE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, round(o_totalprice, 2) total,
       round(sum(l_quantity), 2) qty
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY total DESC, o_orderkey LIMIT 100
"""

Q21_SHAPE = """
SELECT s_name, cast(count(*) as bigint) numwait
FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
     JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""

Q22_SHAPE = """
SELECT cntrycode, cast(count(*) as bigint) numcust, round(sum(c_acctbal), 2) totacctbal
FROM (SELECT substring(c_name, 18, 1) cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE substring(c_name, 18, 1) IN ('0', '1', '2', '3', '4')
        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT'))
GROUP BY cntrycode ORDER BY cntrycode
"""

# Round-4 additions: the seven shapes that complete the 22-query battery
# (Q1/Q3/Q6/Q9/Q11/Q19/Q20).  Same adaptation rules: partsupp-dependent
# queries (Q9/Q11/Q20) substitute p_retailprice-based cost/value terms and
# the lineitem-derived supplier↔part relation.

Q1_SHAPE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) sum_qty,
       round(sum(l_extendedprice), 2) sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) sum_charge,
       round(avg(l_quantity), 4) avg_qty,
       round(avg(l_extendedprice), 4) avg_price,
       round(avg(l_discount), 4) avg_disc,
       cast(count(*) as bigint) count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

Q3_SHAPE = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < timestamp '1996-06-15' AND l_shipdate > timestamp '1996-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
"""

Q6_SHAPE = """
SELECT round(sum(l_extendedprice * l_discount), 2) revenue
FROM lineitem
WHERE l_shipdate >= timestamp '1996-01-01' AND l_shipdate < timestamp '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
"""

Q9_SHAPE = """
SELECT nation, o_year, round(sum(amount), 2) sum_profit
FROM (SELECT n_name nation, extract(year from o_orderdate) o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%') profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

Q11_SHAPE = """
SELECT part_key, round(part_value, 2) val
FROM (SELECT l_partkey part_key, sum(l_quantity * p_retailprice) part_value
      FROM lineitem JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey IN (0, 1, 2)
      GROUP BY l_partkey) pv
WHERE part_value > (SELECT 0.002 * sum(l_quantity * p_retailprice)
                    FROM lineitem JOIN part ON p_partkey = l_partkey
                         JOIN supplier ON s_suppkey = l_suppkey
                    WHERE s_nationkey IN (0, 1, 2))
ORDER BY val DESC, part_key
"""

Q19_SHAPE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""

Q20_SHAPE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey
                    FROM lineitem JOIN part ON p_partkey = l_partkey
                    WHERE p_name LIKE '%widget%'
                      AND l_shipdate >= timestamp '1996-01-01'
                      AND l_shipdate < timestamp '1997-01-01'
                    GROUP BY l_suppkey, l_partkey
                    HAVING sum(l_quantity) > 40)
  AND s_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3'))
ORDER BY s_suppkey
"""

_SHAPES = {
    "x_tpch_q1": Q1_SHAPE,
    "x_tpch_q2": Q2_SHAPE,
    "x_tpch_q3": Q3_SHAPE,
    "x_tpch_q6": Q6_SHAPE,
    "x_tpch_q9": Q9_SHAPE,
    "x_tpch_q11": Q11_SHAPE,
    "x_tpch_q19": Q19_SHAPE,
    "x_tpch_q20": Q20_SHAPE,
    "x_tpch_q4": Q4_SHAPE,
    "x_tpch_q5": Q5_SHAPE,
    "x_tpch_q7": Q7_SHAPE,
    "x_tpch_q8": Q8_SHAPE,
    "x_tpch_q10": Q10_SHAPE,
    "x_tpch_q12": Q12_SHAPE,
    "x_tpch_q13": Q13_SHAPE,
    "x_tpch_q14": Q14_SHAPE,
    "x_tpch_q15": Q15_SHAPE,
    "x_tpch_q16": Q16_SHAPE,
    "x_tpch_q17": Q17_SHAPE,
    "x_tpch_q18": Q18_SHAPE,
    "x_tpch_q21": Q21_SHAPE,
    "x_tpch_q22": Q22_SHAPE,
}


def _runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.register(spark, sf_dir)
        return spark.sql(sql)

    return run


for _name, _sql in _SHAPES.items():
    registry.register(_name, _runner(_sql), _sql)
