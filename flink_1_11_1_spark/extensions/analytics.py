"""Event-analytics tier: retention cohorts (the standard product-
analytics query family over the events stream).

Cohort = a user's first active day; retention row = how many of that
cohort were active again exactly ``day_offset`` days later.  All
counts are integers (DISTINCT user-days), so the cross-engine hash is
exact; only the date-difference function differs between engines
(Spark ``datediff(end, start)`` vs DuckDB ``datediff('day', start,
end)``), parameterized like the md5 folds elsewhere.

Plan shape: one aggregation for first-days (map-side combinable), one
DISTINCT user-day projection, one join keyed on user_id — at 100 TB
both sides shuffle on user_id once and the cohort matrix output is
days × offsets, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from . import registry

_OFFSETS = (0, 1, 3, 7, 14)


def _retention_sql(off_expr: str) -> str:
    offs = ", ".join(str(o) for o in _OFFSETS)
    return f"""
WITH first_day AS (
  SELECT user_id, min(cast(date_trunc('day', ts) as date)) AS cohort
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, cast(date_trunc('day', ts) as date) AS d
  FROM events
),
ret AS (
  SELECT f.cohort, {off_expr} AS day_offset, a.user_id
  FROM activity a JOIN first_day f ON f.user_id = a.user_id
)
SELECT cohort, cast(day_offset as bigint) AS day_offset,
       cast(count(DISTINCT user_id) as bigint) AS n_users
FROM ret
WHERE day_offset IN ({offs})
GROUP BY cohort, day_offset
ORDER BY cohort, day_offset
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic D0/D1/D3/D7/D14 retention matrix per signup cohort."""
    catalog.register(spark, sf_dir)
    return spark.sql(_retention_sql("datediff(a.d, f.cohort)"))


registry.register(
    "x_retention",
    retention_cohorts,
    _retention_sql("datediff('day', f.cohort, a.d)"),
)


# ---------------------------------------------------- DAU/WAU stickiness

def _stickiness_sql(week_ago: str) -> str:
    # Distinct user-days once, DAU per active day, WAU over the trailing
    # 7 CALENDAR days (real date arithmetic — an inactive calendar day
    # must not stretch the window; only the date-shift function differs
    # per engine).  Stickiness = one division of two exact integers.
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, cast(date_trunc('day', ts) as date) AS d
  FROM events
),
cal AS (SELECT DISTINCT d FROM ud),
dau AS (
  SELECT d, count(*) AS dau FROM ud GROUP BY d
),
wau AS (
  SELECT c.d, count(DISTINCT u.user_id) AS wau
  FROM cal c JOIN ud u ON u.d BETWEEN {week_ago} AND c.d
  GROUP BY c.d
)
SELECT cal.d AS day,
       cast(dau.dau as bigint) AS dau,
       cast(wau.wau as bigint) AS wau,
       round(dau.dau / cast(wau.wau as double), 6) AS stickiness
FROM cal JOIN dau ON dau.d = cal.d JOIN wau ON wau.d = cal.d
ORDER BY day
"""


def stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-calendar-day WAU per active day (the engagement
    'stickiness' ratio).  Integer distinct counts + one IEEE division;
    the WAU self-join fans each user-day to at most 7 calendar rows, so
    the shuffle is 7x user-days regardless of event volume."""
    catalog.register(spark, sf_dir)
    return spark.sql(_stickiness_sql("date_sub(c.d, 6)"))


registry.register("x_stickiness", stickiness, _stickiness_sql("c.d - 6"))
