"""The 42 declared correctness queries (SURVEY.md §3.13).

Each query text uses only the empirically-validated Spark∩DuckDB SQL
subset (SURVEY.md §0): deterministic ORDER BY, rounded float aggregates,
aliased computed columns.  The SAME text runs on the Spark engine (over
the canonical views of ``catalog.register``) and on the DuckDB oracle
(over the driver's raw-parquet views) — except that on the DuckDB side
queries touching ``events`` are wrapped by ``oracle_text`` so the oracle
sees the same ms-floored timestamps the Spark canonical view applies.

Reference parity: each query is tagged in SURVEY.md §3 with the Blink
physical operator(s) it exercises (BatchExecHashAggregate,
BatchExecHashJoin, StreamExecRank, StreamExecDeduplicate, ...).
"""

# ruff: noqa: E501

DESCRIPTIONS = {
    'q01': 'scan+project+filter (parquet scan, predicate, limit)',
    'q02': 'predicate battery: LIKE / IN / BETWEEN / IS NULL / boolean logic',
    'q03': 'TPC-H Q1 shape: hash agg, multi-aggregate, arithmetic (validated bit-exact)',
    'q04': 'equi inner join + agg (hash/SMJ path)',
    'q05': '3-way join chain + filter + topk (TPC-H Q3 shape)',
    'q06': 'broadcast-shaped join (small dims), 4-way',
    'q07': 'left outer join + null-producing side + agg over nulls',
    'q08': 'right + full outer join on partially-overlapping derived keys',
    'q09': 'right outer join explicit',
    'q10': 'semi join via IN-subquery',
    'q11': 'anti join via NOT EXISTS (correlated)',
    'q12': 'theta/range join (equi + range residual)',
    'q13': 'cross join (nested-loop)',
    'q14': 'scalar subquery + correlated scalar agg subquery',
    'q15': 'agg battery: distinct agg, FILTER clause, count_if, stddev/var',
    'q16': 'global agg (no GROUP BY) + DISTINCT projection',
    'q17': 'GROUPING SETS',
    'q18': 'ROLLUP + GROUPING()/GROUPING_ID disambiguation',
    'q19': 'CUBE',
    'q20': 'HAVING',
    'q21': 'multi-key sort asc/desc + LIMIT/OFFSET',
    'q22': 'top-k per group (rank/topN rewrite shape; = Flink StreamExecRank)',
    'q23': 'ranking battery',
    'q24': 'analytic battery: lag/lead/first_value + ROWS frame running sum',
    'q25': 'RANGE frame over time (interval-bounded window agg)',
    'q26': 'UNION ALL vs UNION distinct',
    'q27': 'INTERSECT ALL',
    'q28': 'EXCEPT ALL',
    'q29': 'string function battery',
    'q30': 'math battery',
    'q31': 'date/time battery',
    'q32': 'conditional battery',
    'q33': 'VALUES inline source + join to real table',
    'q34': 'tumbling window (batch-equivalent of GROUP BY TUMBLE(ts, 1h))',
    'q35': 'hopping window 1h size / 30m slide (= union of phase-shifted tumbles)',
    'q36': "session window, 30m gap (gaps-and-islands; = SESSION(ts, INTERVAL '30' MINUTE))",
    'q37': 'deduplicate keep-first per key (Flink StreamExecDeduplicate / dropDuplicates)',
    'q38': 'interval join batch-equivalent (purchase within 1h after signup, same user)',
    'q39': 'as-of (temporal) join batch-equivalent: latest event at-or-before each order date',
    'q40': 'uncorrelated + correlated mix (decorrelation stressor, TPC-H Q17 shape)',
    'q41': 'FIRST_VALUE/LAST_VALUE as aggregates (Flink agg library) via window equivalence',
    'q42': 'JSON-ish extraction from string column (portable via regexp_extract;',
}

QUERIES = {
    'q01': r'''
-- Q01 scan+project+filter (parquet scan, predicate, limit)
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity > 45 AND l_shipdate < timestamp '1996-01-01'
ORDER BY l_orderkey, l_linenumber LIMIT 100''',
    'q02': r'''
-- Q02 predicate battery: LIKE / IN / BETWEEN / IS NULL / boolean logic
SELECT p_partkey, p_name, p_brand FROM part
WHERE (p_name LIKE '%red%' OR p_type IN ('PROMO','ECONOMY'))
  AND p_size BETWEEN 10 AND 40 AND p_retailprice IS NOT NULL
ORDER BY p_partkey LIMIT 200''',
    'q03': r'''
-- Q03 TPC-H Q1 shape: hash agg, multi-aggregate, arithmetic (validated bit-exact)
SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) sum_qty,
       round(sum(l_extendedprice),2) sum_base,
       round(sum(l_extendedprice*(1-l_discount)),2) sum_disc,
       round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) sum_charge,
       round(avg(l_quantity),4) avg_qty, round(avg(l_discount),4) avg_disc,
       count(*) cnt
FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus''',
    'q04': r'''
-- Q04 equi inner join + agg (hash/SMJ path)
SELECT c_mktsegment, count(*) n, round(sum(o_totalprice),2) v
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment''',
    'q05': r'''
-- Q05 3-way join chain + filter + topk (TPC-H Q3 shape)
SELECT o_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) revenue,
       cast(o_orderdate as date) od
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < timestamp '1998-01-01'
GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10''',
    'q06': r'''
-- Q06 broadcast-shaped join (small dims), 4-way
SELECT r_name, n_name, count(*) n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name''',
    'q07': r'''
-- Q07 left outer join + null-producing side + agg over nulls
SELECT c_custkey, count(o_orderkey) n_orders, round(coalesce(sum(o_totalprice),0),2) v
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY n_orders DESC, c_custkey LIMIT 100''',
    'q08': r'''
-- Q08 right + full outer join on partially-overlapping derived keys
SELECT a.s_suppkey, b.n_nationkey
FROM supplier a FULL OUTER JOIN nation b ON a.s_nationkey = b.n_nationkey
ORDER BY a.s_suppkey NULLS FIRST, b.n_nationkey NULLS FIRST''',
    'q09': r'''
-- Q09 right outer join explicit
SELECT n_name, count(s_suppkey) n_supp
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name''',
    'q10': r'''
-- Q10 semi join via IN-subquery
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey LIMIT 100''',
    'q11': r'''
-- Q11 anti join via NOT EXISTS (correlated)
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey LIMIT 100''',
    'q12': r'''
-- Q12 theta/range join (equi + range residual)
SELECT o_orderkey, count(*) n_late
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 100 DAY
GROUP BY o_orderkey ORDER BY n_late DESC, o_orderkey LIMIT 50''',
    'q13': r'''
-- Q13 cross join (nested-loop)
SELECT r_name, n_name FROM region CROSS JOIN nation
ORDER BY r_name, n_name LIMIT 50''',
    'q14': r'''
-- Q14 scalar subquery + correlated scalar agg subquery
SELECT p_partkey, p_retailprice,
       round((SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand),2) brand_avg
FROM part p ORDER BY p_partkey LIMIT 100''',
    'q15': r'''
-- Q15 agg battery: distinct agg, FILTER clause, count_if, stddev/var
SELECT o_orderpriority, count(*) n, count(DISTINCT o_custkey) nd,
       count(*) FILTER (WHERE o_orderstatus = 'F') nf,
       cast(count_if(o_totalprice > 100000) as bigint) big,
       round(stddev_samp(o_totalprice),2) sd, round(var_pop(o_totalprice),2) vp,
       round(min(o_totalprice),2) mn, round(max(o_totalprice),2) mx
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority''',
    'q16': r'''
-- Q16 global agg (no GROUP BY) + DISTINCT projection
SELECT count(*) c, count(DISTINCT c_mktsegment) seg,
       round(sum(c_acctbal),2) bal FROM customer''',
    'q17': r'''
-- Q17 GROUPING SETS
SELECT c_mktsegment, c_nationkey, count(*) n
FROM customer GROUP BY GROUPING SETS ((c_mktsegment),(c_nationkey),())
ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST''',
    'q18': r'''
-- Q18 ROLLUP + GROUPING()/GROUPING_ID disambiguation
SELECT o_orderstatus, o_orderpriority, grouping(o_orderstatus) g1,
       grouping(o_orderpriority) g2, count(*) n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST''',
    'q19': r'''
-- Q19 CUBE
SELECT l_returnflag, l_linestatus, count(*) n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST''',
    'q20': r'''
-- Q20 HAVING
SELECT o_custkey, count(*) n FROM orders GROUP BY o_custkey
HAVING count(*) >= 15 ORDER BY n DESC, o_custkey LIMIT 50''',
    'q21': r'''
-- Q21 multi-key sort asc/desc + LIMIT/OFFSET
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20 OFFSET 10''',
    'q22': r'''
-- Q22 top-k per group (rank/topN rewrite shape; = Flink StreamExecRank)
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) rn
  FROM orders) t
WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 300''',
    'q23': r'''
-- Q23 ranking battery
SELECT o_orderkey, rank() OVER w rk, dense_rank() OVER w drk,
       ntile(4) OVER w nt, round(percent_rank() OVER w, 4) pr,
       round(cume_dist() OVER w, 4) cd
FROM orders WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey LIMIT 200''',
    'q24': r'''
-- Q24 analytic battery: lag/lead/first_value + ROWS frame running sum
SELECT o_orderkey, o_custkey,
       lag(o_totalprice) OVER w p_prev, lead(o_totalprice) OVER w p_next,
       round(first_value(o_totalprice) OVER w, 2) p_first,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) run3
FROM orders WHERE o_custkey < 30
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey LIMIT 200''',
    'q25': r'''
-- Q25 RANGE frame over time (interval-bounded window agg)
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) avg1h
FROM events ORDER BY event_id LIMIT 500''',
    'q26': r'''
-- Q26 UNION ALL vs UNION distinct
SELECT x FROM (SELECT c_nationkey x FROM customer UNION ALL SELECT n_nationkey FROM nation) t
GROUP BY x ORDER BY x''',
    'q27': r'''
-- Q27 INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey LIMIT 200''',
    'q28': r'''
-- Q28 EXCEPT ALL
SELECT c_custkey FROM customer
EXCEPT ALL
SELECT o_custkey FROM orders
ORDER BY c_custkey LIMIT 200''',
    'q29': r'''
-- Q29 string function battery
SELECT p_partkey, upper(p_name) u, lower(p_brand) l, length(p_name) ln,
       substring(p_name, 1, 4) sub, position('e' in p_name) pos,
       replace(p_name, ' ', '_') rep, trim(p_name) tr, reverse(p_brand) rev,
       lpad(p_type, 10, '.') lp, repeat(p_brand, 2) rp, ascii(p_name) asc_,
       p_name || '/' || p_brand cat,
       regexp_extract(p_name, '([a-z]+)', 1) rx
FROM part ORDER BY p_partkey LIMIT 200''',
    'q30': r'''
-- Q30 math battery
SELECT l_orderkey, l_linenumber, abs(-l_quantity) a, round(l_extendedprice, 1) r,
       cast(ceil(l_discount * 100) as bigint) ce, cast(floor(l_tax * 100) as bigint) fl,
       round(mod(l_quantity, 7),0) md,
       round(power(l_quantity, 2), 2) pw, round(sqrt(l_extendedprice), 4) sq,
       round(ln(l_extendedprice), 4) lg, round(exp(l_discount), 4) ex,
       cast(sign(l_quantity - 25) as double) sg
FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber''',
    'q31': r'''
-- Q31 date/time battery
SELECT o_orderkey, extract(year from o_orderdate) y, extract(month from o_orderdate) m,
       cast(o_orderdate as date) d,
       cast(date_trunc('month', o_orderdate) as date) mstart,
       -- (as date, not as string: DuckDB date_trunc('month') returns DATE,
       --  Spark returns TIMESTAMP — string renderings differ; DATE agrees)
       cast(o_orderdate + INTERVAL 90 DAY as date) plus90
FROM orders ORDER BY o_orderkey LIMIT 200''',
    'q32': r'''
-- Q32 conditional battery
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'hi' WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'lo' END band,
       coalesce(nullif(o_orderstatus, 'P'), 'pending') st,
       if(o_orderpriority = '1-URGENT', 1, 0) urgent
FROM orders ORDER BY o_orderkey LIMIT 300''',
    'q33': r'''
-- Q33 VALUES inline source + join to real table
SELECT v.seg, count(c_custkey) n
FROM (VALUES ('BUILDING'), ('AUTOMOBILE'), ('NOSUCH')) v(seg)
LEFT JOIN customer ON c_mktsegment = v.seg
GROUP BY v.seg ORDER BY v.seg''',
    'q34': r'''
-- Q34 tumbling window (batch-equivalent of GROUP BY TUMBLE(ts, 1h))
SELECT cast(date_trunc('hour', ts) as string) wstart, event_type,
       count(*) n, round(sum(value), 2) sv
FROM events GROUP BY date_trunc('hour', ts), event_type
ORDER BY wstart, event_type''',
    'q35': r'''
-- Q35 hopping window 1h size / 30m slide (= union of phase-shifted tumbles)
WITH half AS (
  SELECT CASE WHEN extract(minute from ts) >= 30
              THEN date_trunc('hour', ts) + INTERVAL 30 MINUTE
              ELSE date_trunc('hour', ts) END AS slot, value FROM events)
SELECT cast(wstart as string) ws, count(*) n, round(sum(value), 2) sv
FROM (SELECT slot AS wstart, value FROM half
      UNION ALL SELECT slot - INTERVAL 30 MINUTE, value FROM half) w
GROUP BY wstart ORDER BY ws''',
    'q36': r'''
-- Q36 session window, 30m gap (gaps-and-islands; = SESSION(ts, INTERVAL '30' MINUTE))
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END brk
  FROM events),
 sess AS (SELECT user_id, ts, value,
                 cast(sum(brk) OVER (PARTITION BY user_id ORDER BY ts) as bigint) sid
          FROM marked)
SELECT user_id, sid, count(*) n, round(sum(value), 2) sv,
       cast(date_trunc('second', min(ts)) as string) sstart
FROM sess GROUP BY user_id, sid
ORDER BY user_id, sid LIMIT 1000''',
    'q37': r'''
-- Q37 deduplicate keep-first per key (Flink StreamExecDeduplicate / dropDuplicates)
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
  FROM events) t WHERE rn = 1 ORDER BY user_id''',
    'q38': r'''
-- Q38 interval join batch-equivalent (purchase within 1h after signup, same user)
SELECT a.user_id, a.event_id s_id, b.event_id p_id
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_type = 'signup' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
ORDER BY a.user_id, s_id, p_id LIMIT 1000''',
    'q39': r'''
-- Q39 as-of (temporal) join batch-equivalent: latest event at-or-before each order date
SELECT o.o_orderkey,
       (SELECT max(e.event_id) FROM events e
         WHERE e.user_id = o.o_custkey % 150
           AND e.ts <= timestamp '2024-01-15 00:00:00' + (o.o_orderkey % 14) * INTERVAL 1 DAY) ev
FROM orders o WHERE o.o_orderkey < 500 ORDER BY o.o_orderkey''',
    'q40': r'''
-- Q40 uncorrelated + correlated mix (decorrelation stressor, TPC-H Q17 shape)
SELECT round(sum(l_extendedprice) / 7.0, 2) avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)''',
    'q41': r'''
-- Q41 FIRST_VALUE/LAST_VALUE as aggregates (Flink agg library) via window equivalence
SELECT o_custkey, round(min(first_p), 2) fp, round(max(last_p), 2) lp FROM (
  SELECT o_custkey,
         first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) first_p,
         last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) last_p
  FROM orders) t
GROUP BY o_custkey ORDER BY o_custkey LIMIT 300''',
    'q42': r'''
-- Q42 JSON-ish extraction from string column (portable via regexp_extract;
-- NOTE: pattern deliberately backslash-free — Spark treats backslash as an
-- escape inside SQL string literals, DuckDB does not, so one SQL text with
-- \d or \s is NOT portable)
SELECT event_id, cast(regexp_extract(props, '"k": ([0-9]+)', 1) as int) k
FROM events WHERE props IS NOT NULL ORDER BY event_id LIMIT 500''',
}

QUERIES = {k: v.strip() for k, v in QUERIES.items()}


# DuckDB-side normalization of events.ts (ns -> ms floor, cast to plain
# TIMESTAMP) so both engines compare identical values.  DuckDB forbids a
# CTE shadowing the view it reads from, so the CTE is named `events_ms`
# and table references are rewritten.
_EVENTS_CTE = (
    "events_ms AS (SELECT * REPLACE "
    "(cast(date_trunc('milliseconds', ts) as timestamp) AS ts) FROM events)"
)


def needs_events(sql: str) -> bool:
    import re as _re

    return bool(_re.search(r"\b(FROM|JOIN)\s+events\b", sql, _re.I))


def oracle_text(sql: str) -> str:
    """Rewrite a declared query for the DuckDB oracle."""
    import re as _re

    if not needs_events(sql):
        return sql
    sql = _re.sub(r"\b(FROM|JOIN)(\s+)events\b", r"\1\2events_ms", sql)
    lines = sql.split("\n")
    i = 0
    while i < len(lines) and lines[i].lstrip().startswith("--"):
        i += 1
    head, body = "\n".join(lines[:i]), "\n".join(lines[i:]).lstrip()
    prefix = head + "\n" if head else ""
    if body.upper().startswith("WITH "):
        return prefix + "WITH " + _EVENTS_CTE + ", " + body[5:]
    return prefix + "WITH " + _EVENTS_CTE + "\n" + body


# Spark-side formulation overrides: semantically identical to the
# declared text (the DuckDB oracle still runs the original), rewritten
# where Catalyst's decorrelation picks a non-scalable physical plan.
#
# q39: the correlated scalar subquery decorrelates into a
# BroadcastNestedLoopJoin carrying only the ts predicate — the
# user-equality lands AFTER the join, so the intermediate is
# |orders_sel| x |events| (50M rows at sf0.1, and growing at scale).
# The rewrite states the user equi-join explicitly: broadcast-hash join
# on user_id + in-join range filter, then max per order, then a left
# join to restore NULL rows — the plan a 100 TB run needs.
SPARK_OVERRIDES = {
    "q39": """
WITH o AS (SELECT o_orderkey, o_custkey % 150 u,
                  timestamp '2024-01-15 00:00:00' + (o_orderkey % 14) * INTERVAL 1 DAY t
           FROM orders WHERE o_orderkey < 500),
m AS (SELECT o.o_orderkey, max(e.event_id) ev
      FROM o JOIN events e ON e.user_id = o.u AND e.ts <= o.t
      GROUP BY o.o_orderkey)
SELECT o.o_orderkey, m.ev FROM o LEFT JOIN m ON m.o_orderkey = o.o_orderkey
ORDER BY o.o_orderkey
""",
}


def spark_text(qid: str) -> str:
    """Query text the Spark engine runs (declared text unless overridden)."""
    return SPARK_OVERRIDES.get(qid, QUERIES[qid])
