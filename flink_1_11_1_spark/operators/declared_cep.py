"""Oracle-backed declared entries for the general CEP NFA
(streaming/nfa.py): quantifier + optional patterns whose deterministic
greedy semantics are portably expressible as DuckDB SQL.

Each entry runs the real NFA engine (applyInPandas fold) — NOT a bespoke
SQL plan — and the oracle derives the same matches relationally:
- x_cep_times_df: click.times(2).consecutive() → purchase within 48h —
  adjacent-pair candidates via lag(), first purchase via a correlated
  min-(ts,id) subquery.
- x_cep_optional_df: signup → optional click → purchase within 72h —
  the optional middle state is the first click strictly between the
  signup and the completing purchase in (ts, event_id) order.

Reference parity: flink-cep pattern/Pattern.java times()/consecutive()/
optional(); nfa/NFA.java relaxed/strict contiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..extensions import registry
from ..streaming import nfa

_E = (
    "SELECT event_id, cast(date_trunc('milliseconds', ts) as timestamp) AS ts, "
    "user_id, event_type FROM events"
)


def cep_times_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two consecutive clicks then a purchase within 48h (NO_SKIP)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    pat = (
        nfa.PatternSeq.begin("a", "event_type = 'click'")
        .times(2)
        .consecutive()
        .followed_by("b", "event_type = 'purchase'")
        .within("48 hours")
    )
    m = pat.match_batch(ev)
    return m.select(
        "user_id",
        F.expr("get(ids, 0)").alias("a1_id"),
        F.expr("get(ids, 1)").alias("a2_id"),
        nfa.first_id("b").alias("b_id"),
    ).orderBy("user_id", "a1_id")


CEP_TIMES_ORACLE = f"""
WITH e AS ({_E}),
seq AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER w AS pt,
         lag(event_id) OVER w AS pid,
         lag(ts) OVER w AS pts
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
cand AS (
  SELECT user_id, pid AS a1_id, event_id AS a2_id, pts AS start_ts,
         ts AS a2_ts
  FROM seq WHERE event_type = 'click' AND pt = 'click'),
m AS (
  SELECT c.user_id, c.a1_id, c.a2_id,
         (SELECT p.event_id FROM e p
           WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
             AND (p.ts > c.a2_ts OR (p.ts = c.a2_ts AND p.event_id > c.a2_id))
             AND p.ts <= c.start_ts + INTERVAL 48 HOUR
           ORDER BY p.ts, p.event_id LIMIT 1) AS b_id
  FROM cand c)
SELECT user_id, a1_id, a2_id, b_id FROM m WHERE b_id IS NOT NULL
ORDER BY user_id, a1_id
"""


def cep_optional_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → optional click → purchase within 72h (NO_SKIP)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    pat = (
        nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m", "event_type = 'click'")
        .optional()
        .followed_by("b", "event_type = 'purchase'")
        .within("72 hours")
    )
    m = pat.match_batch(ev)
    return m.select(
        "user_id",
        nfa.first_id("a").alias("a_id"),
        nfa.first_id("m").alias("m_id"),
        nfa.first_id("b").alias("b_id"),
    ).orderBy("user_id", "a_id")


CEP_OPTIONAL_ORACLE = f"""
WITH e AS ({_E}),
a AS (SELECT user_id, event_id AS a_id, ts AS a_ts FROM e
      WHERE event_type = 'signup'),
m AS (
  SELECT a.user_id, a.a_id, a.a_ts,
         (SELECT p.event_id FROM e p
           WHERE p.user_id = a.user_id AND p.event_type = 'purchase'
             AND (p.ts > a.a_ts OR (p.ts = a.a_ts AND p.event_id > a.a_id))
             AND p.ts <= a.a_ts + INTERVAL 72 HOUR
           ORDER BY p.ts, p.event_id LIMIT 1) AS b_id
  FROM a),
mb AS (
  SELECT m.user_id, m.a_id, m.a_ts, m.b_id,
         (SELECT p.ts FROM e p WHERE p.event_id = m.b_id) AS b_ts
  FROM m WHERE m.b_id IS NOT NULL)
SELECT user_id, a_id,
       (SELECT c.event_id FROM e c
         WHERE c.user_id = mb.user_id AND c.event_type = 'click'
           AND (c.ts > mb.a_ts OR (c.ts = mb.a_ts AND c.event_id > mb.a_id))
           AND (c.ts < mb.b_ts OR (c.ts = mb.b_ts AND c.event_id < mb.b_id))
         ORDER BY c.ts, c.event_id LIMIT 1) AS m_id,
       b_id
FROM mb ORDER BY user_id, a_id
"""


def cep_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → click → purchase, relaxed contiguity, within 72h
    (NO_SKIP) — the classic 3-step funnel.  Round 5: lowers to the
    tier-D join-chain plan (next-occurrence structs + one equi-join
    per extra hop), no Python stage."""
    ev = catalog.load_table(spark, sf_dir, "events")
    pat = (
        nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("b", "event_type = 'click'")
        .followed_by("c", "event_type = 'purchase'")
        .within("72 hours")
    )
    m = pat.match_batch(ev)
    return m.select(
        "user_id",
        F.expr("get(ids, 0)").alias("a_id"),
        F.expr("get(ids, 1)").alias("b_id"),
        F.expr("get(ids, 2)").alias("c_id"),
    ).orderBy("user_id", "a_id")


# greedy chain = first click after the signup, then first purchase
# after that click; the WITHIN bound applies to the completing event
# (expiry would have killed the partial before any later completion).
CEP_FUNNEL3_ORACLE = f"""
WITH e AS ({_E}),
a AS (SELECT user_id, event_id a_id, ts a_ts FROM e WHERE event_type = 'signup'),
ab AS (
  SELECT a.user_id, a.a_id, a.a_ts,
         (SELECT struct_pack(i := b.event_id, t := b.ts) FROM e b
           WHERE b.user_id = a.user_id AND b.event_type = 'click'
             AND (b.ts > a.a_ts OR (b.ts = a.a_ts AND b.event_id > a.a_id))
           ORDER BY b.ts, b.event_id LIMIT 1) AS b
  FROM a),
abc AS (
  SELECT user_id, a_id, a_ts, b.i b_id,
         (SELECT struct_pack(i := c.event_id, t := c.ts) FROM e c
           WHERE c.user_id = ab.user_id AND c.event_type = 'purchase'
             AND (c.ts > ab.b.t OR (c.ts = ab.b.t AND c.event_id > ab.b.i))
           ORDER BY c.ts, c.event_id LIMIT 1) AS c
  FROM ab WHERE b IS NOT NULL)
SELECT user_id, a_id, b_id, c.i c_id
FROM abc
WHERE c IS NOT NULL AND c.t <= a_ts + INTERVAL 72 HOUR
ORDER BY user_id, a_id
"""


def cep_overlap_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → optional high-value event (value > 60) → view within
    48h (NO_SKIP) — the round-6 union-optional shape: the optional's
    literal does NOT contradict the required's (a view can carry
    value > 60), so greedy binds whichever flag the first qualifying
    event satisfies, optional first.  Lowers to the tier-D union
    next-occurrence plan (one extra keyed hop join), no Python stage."""
    ev = catalog.load_table(spark, sf_dir, "events")
    pat = (
        nfa.PatternSeq.begin("a", "event_type = 'signup'")
        .followed_by("m", "value > 60")
        .optional()
        .followed_by("b", "event_type = 'view'")
        .within("48 hours")
    )
    m = pat.match_batch(ev)
    return m.select(
        "user_id",
        nfa.first_id("a").alias("a_id"),
        nfa.first_id("m").alias("m_id"),
        nfa.first_id("b").alias("b_id"),
    ).orderBy("user_id", "a_id")


_EV = (
    "SELECT event_id, cast(date_trunc('milliseconds', ts) as timestamp) AS ts, "
    "user_id, event_type, value FROM events"
)

# Greedy with a NON-contradictory optional: the first event after the
# signup matching EITHER flag decides — if it satisfies the optional's
# literal (even when it is also a view) the optional binds and the
# required re-resolves strictly after it; the WITHIN bound applies to
# the completing view (partials expire before any later completion).
CEP_OVERLAP_ORACLE = f"""
WITH e AS ({_EV}),
a AS (SELECT user_id, event_id AS a_id, ts AS a_ts FROM e
      WHERE event_type = 'signup'),
q AS (
  SELECT a.user_id, a.a_id, a.a_ts,
         (SELECT struct_pack(i := x.event_id, t := x.ts,
                             om := coalesce(x.value > 60, false))
            FROM e x
           WHERE x.user_id = a.user_id
             AND (coalesce(x.value > 60, false) OR x.event_type = 'view')
             AND (x.ts > a.a_ts OR (x.ts = a.a_ts AND x.event_id > a.a_id))
           ORDER BY x.ts, x.event_id LIMIT 1) AS u
  FROM a),
r AS (
  SELECT user_id, a_id, a_ts,
         CASE WHEN u.om THEN u.i END AS m_id,
         CASE WHEN u.om THEN
           (SELECT struct_pack(i := v.event_id, t := v.ts) FROM e v
             WHERE v.user_id = q.user_id AND v.event_type = 'view'
               AND (v.ts > q.u.t OR (v.ts = q.u.t AND v.event_id > q.u.i))
             ORDER BY v.ts, v.event_id LIMIT 1)
         ELSE struct_pack(i := u.i, t := u.t) END AS b
  FROM q WHERE u IS NOT NULL)
SELECT user_id, a_id, m_id, b.i AS b_id
FROM r WHERE b IS NOT NULL AND b.t <= a_ts + INTERVAL 48 HOUR
ORDER BY user_id, a_id
"""


def cep_followed_by_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink ``followedByAny`` (SKIP_TILL_ANY, pattern/Pattern.java —
    round 8): click followedByAny purchase WITHIN 6 hours emits EVERY
    qualifying (click, later purchase) pair per user — not just the
    first occurrence — which is exactly a time-bounded self-join.
    Plans natively as that range join (tier E,
    nfa_lowering._lower_any_pair); longer any-chains run the branching
    fold's emit-all resolution.  The oracle is the same join in
    DuckDB."""
    ev = catalog.load_table(spark, sf_dir, "events")
    pat = (
        nfa.PatternSeq.begin("a", "event_type = 'click'")
        .followed_by_any("b", "event_type = 'purchase'")
        .within("6 hours")
        .with_backtracking(max_branches=4096)
    )
    m = pat.match_batch(ev)
    return m.select(
        "user_id",
        F.expr("get(ids, 0)").alias("a_id"),
        F.expr("get(ids, 1)").alias("b_id"),
    ).orderBy("user_id", "a_id", "b_id")


CEP_ANY_ORACLE = f"""
WITH e AS ({_E})
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
FROM e a JOIN e b
  ON b.user_id = a.user_id
 AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
 AND b.ts <= a.ts + INTERVAL 6 HOUR
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
ORDER BY a.user_id, a_id, b_id
"""


def register_all() -> None:
    registry.register("x_cep_any", cep_followed_by_any, CEP_ANY_ORACLE)
    registry.register("x_cep_times_df", cep_times_clicks, CEP_TIMES_ORACLE)
    registry.register("x_cep_optional_df", cep_optional_funnel, CEP_OPTIONAL_ORACLE)
    registry.register("x_cep_funnel3", cep_funnel3, CEP_FUNNEL3_ORACLE)
    registry.register("x_cep_overlap_opt", cep_overlap_optional, CEP_OVERLAP_ORACLE)
