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
