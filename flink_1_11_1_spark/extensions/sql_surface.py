"""Dialect-pair declared entries for the SQL surface that has no single
portable text (SURVEY.md §3.13 "declared-capability gaps"): lateral/UDTF
explode (Correlate), array construction/access, ordered LISTAGG,
TIMESTAMPADD/DIFF-style temporal arithmetic, and TF-IDF.  The Spark and
DuckDB texts differ (explode vs UNNEST, 0- vs 1-based indexing,
WITHIN GROUP vs ORDER-BY-in-aggregate) but compute identical results —
that is exactly what the oracle contract verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from . import registry


def _sql_runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.register(spark, sf_dir)
        return spark.sql(sql)

    return run


# --------------------------------------------- Correlate / lateral explode

EXPLODE_SPARK = """
SELECT token, count(*) n
FROM (SELECT explode(split(trim(text), ' ')) token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""

EXPLODE_DUCK = """
SELECT token, count(*) n
FROM (SELECT unnest(string_split(trim(text), ' ')) token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


# ------------------------------------------------- array construct/access

ARRAY_SPARK = """
SELECT l_orderkey, arr[0] first_el, element_at(arr, -1) last_el, size(arr) sz
FROM (SELECT l_orderkey, array_sort(collect_list(l_linenumber)) arr
      FROM lineitem GROUP BY l_orderkey)
ORDER BY l_orderkey LIMIT 200
"""

ARRAY_DUCK = """
SELECT l_orderkey, arr[1] AS first_el, arr[-1] AS last_el, len(arr) AS sz
FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) arr
      FROM lineitem GROUP BY l_orderkey)
ORDER BY l_orderkey LIMIT 200
"""


# ------------------------------------------------------- ordered LISTAGG

LISTAGG_SPARK = """
SELECT c_nationkey, listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
FROM customer WHERE c_custkey < 300
GROUP BY c_nationkey ORDER BY c_nationkey
"""

LISTAGG_DUCK = """
SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names
FROM customer WHERE c_custkey < 300
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# ------------------------------------------- TIMESTAMPADD / DIFF battery

TEMPORAL_SPARK = """
SELECT o_orderkey,
       timestampadd(HOUR, 3, o_orderdate) plus3h,
       datediff(date '2000-01-01', cast(o_orderdate as date)) dd,
       date_format(o_orderdate, 'yyyy-MM') ym
FROM orders ORDER BY o_orderkey LIMIT 200
"""

TEMPORAL_DUCK = """
SELECT o_orderkey,
       o_orderdate + INTERVAL 3 HOUR AS plus3h,
       datediff('day', cast(o_orderdate as date), date '2000-01-01') AS dd,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders ORDER BY o_orderkey LIMIT 200
"""


# ------------------------------------------------------------- TF-IDF

TFIDF_SPARK = """
WITH toks AS (SELECT doc_id, explode(split(trim(text), ' ')) term FROM documents),
tf AS (SELECT doc_id, term, count(*) tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) dfreq FROM toks GROUP BY term),
n AS (SELECT count(*) nd FROM documents),
s AS (SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.nd / df.dfreq), 4) score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
SELECT doc_id, term, score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) rn FROM s)
WHERE rn <= 3 AND doc_id < 50 ORDER BY doc_id, rn
"""

TFIDF_DUCK = """
WITH toks AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) term FROM documents),
tf AS (SELECT doc_id, term, count(*) tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) dfreq FROM toks GROUP BY term),
n AS (SELECT count(*) nd FROM documents),
s AS (SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.nd / df.dfreq), 4) score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
SELECT doc_id, term, score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) rn FROM s)
WHERE rn <= 3 AND doc_id < 50 ORDER BY doc_id, rn
"""


# ------------------------------------------------ Flink DDL front door

def _ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Flink-user path: CREATE TABLE DDL (WITH-properties,
    computed column) via TableEnvironment.execute_sql, then a query
    over the declared table — exercising ddl.py's parser, the
    filesystem connector routing, and the computed-column projection
    under the driver's oracle contract."""
    from ..table_env import TableEnvironment

    tenv = TableEnvironment(spark)
    tenv.execute_sql("DROP TABLE IF EXISTS ddl_documents_x")
    tenv.execute_sql(
        f"""
        CREATE TABLE ddl_documents_x (
          doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT,
          n_tokens AS length(text) - length(replace(text, ' ', '')) + 1
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{sf_dir}/documents.parquet',
          'format' = 'parquet'
        )
        """
    )
    return tenv.execute_sql(
        "SELECT lang, count(*) AS n_docs, sum(n_tokens) AS n_tokens,"
        " sum(n_chars) AS n_chars"
        " FROM ddl_documents_x WHERE n_tokens >= 20 GROUP BY lang ORDER BY lang"
    )


DDL_ROUNDTRIP_DUCK = """
SELECT lang, count(*) AS n_docs,
       cast(sum(length(text) - length(replace(text, ' ', '')) + 1) as bigint) AS n_tokens,
       cast(sum(n_chars) as bigint) AS n_chars
FROM documents
WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 20
GROUP BY lang ORDER BY lang
"""


def _ddl_options_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLIP-113 dynamic table options through the driver contract: the
    declared table's WITH path is a placeholder that doesn't exist; the
    query's ``/*+ OPTIONS('path'='...') */`` hint redirects THIS
    statement to the real orders parquet.  The oracle is the same
    aggregate over the canonical orders view — matching hashes prove
    the hint actually swapped the scan (the base path alone would have
    failed the read)."""
    from ..table_env import TableEnvironment

    tenv = TableEnvironment(spark)
    tenv.execute_sql("DROP TABLE IF EXISTS ddl_orders_hint_x")
    tenv.execute_sql(
        f"""
        CREATE TABLE ddl_orders_hint_x (
          o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE, o_orderdate TIMESTAMP(3), o_orderpriority STRING
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{sf_dir}/nonexistent_base.parquet',
          'format' = 'parquet'
        )
        """
    )
    return tenv.execute_sql(
        f"SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS s "
        f"FROM ddl_orders_hint_x /*+ OPTIONS('path'='{sf_dir}/orders.parquet') */ "
        f"GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )


DDL_HINT_DUCK = """
SELECT o_orderstatus, count(*) AS n, cast(sum(o_custkey) as bigint) AS s
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def _catalog_qualified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-catalog routing (Flink CatalogManager +
    GenericInMemoryCatalog, [t-common]catalog/Catalog.java): CREATE
    CATALOG / CREATE DATABASE / a table declared under a 3-part name,
    read once fully qualified from the default context and once as a
    bare name after USE CATALOG + USE — both against the same parquet,
    so the oracle is the plain orders aggregate.  The union of the two
    reads doubles counts iff both context paths resolved to the same
    table."""
    from ..table_env import TableEnvironment

    tenv = TableEnvironment(spark)
    tenv.execute_sql("DROP TABLE IF EXISTS cat_mart.sales.orders_q")
    tenv.execute_sql("CREATE CATALOG cat_mart WITH ('type'='generic_in_memory')")
    tenv.execute_sql("CREATE DATABASE IF NOT EXISTS cat_mart.sales")
    tenv.execute_sql(
        f"""
        CREATE TABLE cat_mart.sales.orders_q (
          o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE, o_orderdate TIMESTAMP(3), o_orderpriority STRING
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{sf_dir}/orders.parquet',
          'format' = 'parquet'
        )
        """
    )
    q = ("SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS s "
         "FROM {t} GROUP BY o_orderstatus")
    qualified = tenv.execute_sql(q.format(t="cat_mart.sales.orders_q"))
    tenv.execute_sql("USE CATALOG cat_mart")
    tenv.execute_sql("USE sales")
    bare = tenv.execute_sql(q.format(t="orders_q"))
    tenv.execute_sql("USE CATALOG default_catalog")
    return (
        qualified.unionAll(bare)
        .groupBy("o_orderstatus")
        .agg(F.sum("n").alias("n2"), F.sum("s").alias("s2"))
        .orderBy("o_orderstatus")
    )


CATALOG_QUALIFIED_DUCK = """
SELECT o_orderstatus, 2 * count(*) AS n2,
       cast(2 * sum(o_custkey) as bigint) AS s2
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def _hive_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's ``SET 'table.sql-dialect' = 'hive'`` front door
    (flink-sql-parser-hive): the signature HiveQL shapes — LATERAL
    VIEW explode with a CLUSTER BY subquery — run under the switch
    (routed to Spark's Hive-descended parser; see ddl._SQL_DIALECTS).
    The oracle is the equivalent ANSI unnest aggregation."""
    from ..table_env import TableEnvironment

    catalog.register(spark, sf_dir)
    tenv = TableEnvironment(spark)
    tenv.execute_sql("SET 'table.sql-dialect' = 'hive'")
    try:
        return tenv.execute_sql("""
            SELECT lang, count(*) AS n_toks, count(DISTINCT tok) AS n_uniq
            FROM (SELECT lang, doc_id, text FROM documents
                  WHERE doc_id < 200 CLUSTER BY doc_id) d
            LATERAL VIEW explode(split(trim(text), ' ')) t AS tok
            GROUP BY lang ORDER BY lang
        """)
    finally:
        tenv.execute_sql("RESET 'table.sql-dialect'")


HIVE_DIALECT_DUCK = """
WITH toks AS (
  SELECT lang, unnest(string_split(trim(text), ' ')) AS tok
  FROM documents WHERE doc_id < 200)
SELECT lang, count(*) AS n_toks, count(DISTINCT tok) AS n_uniq
FROM toks GROUP BY lang ORDER BY lang
"""


def _ddl_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLIP-110 CREATE TABLE ... LIKE (a flagship Flink 1.11 feature):
    the documents declaration is derived with an EXTRA computed column
    and the default INCLUDING ALL OVERWRITING OPTIONS merge — the
    derived table carries the source's schema, path and computed
    column plus the new one.  The oracle recomputes both computed
    columns directly."""
    from ..table_env import TableEnvironment

    tenv = TableEnvironment(spark)
    tenv.execute_sql("DROP TABLE IF EXISTS like_docs_src_x")
    tenv.execute_sql("DROP TABLE IF EXISTS like_docs_der_x")
    tenv.execute_sql(f"""
        CREATE TABLE like_docs_src_x (
          doc_id BIGINT, text STRING, lang STRING, source STRING,
          n_chars BIGINT,
          n_tokens AS length(text) - length(replace(text, ' ', '')) + 1
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{sf_dir}/documents.parquet',
          'format' = 'parquet'
        )""")
    tenv.execute_sql("""
        CREATE TABLE like_docs_der_x (
          chars_per_token AS cast(n_chars * 100 AS bigint)
        ) LIKE like_docs_src_x""")
    return tenv.execute_sql("""
        SELECT lang, count(*) AS n_docs, sum(n_tokens) AS n_tokens,
               sum(chars_per_token) AS cents_chars
        FROM like_docs_der_x WHERE doc_id < 400
        GROUP BY lang ORDER BY lang""")


DDL_LIKE_DUCK = """
SELECT lang, count(*) AS n_docs,
       cast(sum(length(text) - length(replace(text, ' ', '')) + 1) AS bigint) AS n_tokens,
       cast(sum(n_chars * 100) AS bigint) AS cents_chars
FROM documents WHERE doc_id < 400
GROUP BY lang ORDER BY lang
"""


def _hive_multi_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-dialect multi-INSERT (flink-sql-parser-hive multi-insert
    DML; Flink's Hive dialect front door): ONE ``FROM orders``
    statement fans out to two declared filesystem sinks — a price-band
    split with per-branch aggregation — through ddl._multi_insert.
    ``orders`` is a plain scan, so each branch gets its own
    column-pruned, filter-pushed scan (the round-9 measured default;
    computed sources checkpoint once instead).  The declared output is
    the union of both sinks read back; the oracle recomputes the same
    band split directly, so matching hashes prove every branch wrote
    exactly its slice.  Cents are floor-quantized (IEEE-correct on
    both engines) to keep the sums integer-exact."""
    import tempfile

    from ..table_env import TableEnvironment

    catalog.register(spark, sf_dir)
    tenv = TableEnvironment(spark)
    d = tempfile.mkdtemp(prefix="mi_entry_")
    for name, sub in (("mi_band_hi_x", "hi"), ("mi_band_lo_x", "lo")):
        tenv.execute_sql(f"DROP TABLE IF EXISTS {name}")
        tenv.execute_sql(f"""
            CREATE TABLE {name} (
              o_orderstatus STRING, n BIGINT, cents BIGINT
            ) WITH ('connector'='filesystem',
                    'path'='{d}/{sub}', 'format'='parquet')""")
    tenv.execute_sql("SET 'table.sql-dialect' = 'hive'")
    try:
        tenv.execute_sql("""
            FROM orders
            INSERT OVERWRITE TABLE mi_band_hi_x
              SELECT o_orderstatus, count(*) AS n,
                     sum(cast(floor(o_totalprice * 100) AS bigint)) AS cents
              WHERE o_totalprice >= 150000 GROUP BY o_orderstatus
            INSERT INTO mi_band_lo_x
              SELECT o_orderstatus, count(*) AS n,
                     sum(cast(floor(o_totalprice * 100) AS bigint)) AS cents
              WHERE o_totalprice < 150000 GROUP BY o_orderstatus
        """)
        return tenv.execute_sql("""
            SELECT 'hi' AS band, o_orderstatus, n, cents FROM mi_band_hi_x
            UNION ALL
            SELECT 'lo' AS band, o_orderstatus, n, cents FROM mi_band_lo_x
            ORDER BY band, o_orderstatus
        """)
    finally:
        tenv.execute_sql("RESET 'table.sql-dialect'")


HIVE_MULTI_INSERT_DUCK = """
WITH b AS (
  SELECT CASE WHEN o_totalprice >= 150000 THEN 'hi' ELSE 'lo' END AS band,
         o_orderstatus, o_totalprice
  FROM orders)
SELECT band, o_orderstatus, count(*) AS n,
       cast(sum(cast(floor(o_totalprice * 100) AS bigint)) AS bigint) AS cents
FROM b GROUP BY band, o_orderstatus
ORDER BY band, o_orderstatus
"""


# ---------------------------- Flink 1.11 SQL group windows (round 10)
#
# The 1.11 SQL windowing surface is the group-window function family
# (GROUP BY TUMBLE/HOP/SESSION + *_START/_END auxiliaries — window TVFs
# only arrived in 1.13).  These entries run the FLINK TEXT through the
# DDL front door (group_windows.rewrite_group_windows → native
# window()/session_window(), one Catalyst aggregate); the oracles are
# the portable bucket/union/gaps-and-islands equivalents.


def _flink_sql_runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..table_env import TableEnvironment

        catalog.register(spark, sf_dir)
        return TableEnvironment(spark).execute_sql(sql)

    return run


SQL_TUMBLE_FLINK = """
SELECT cast(TUMBLE_START(ts, INTERVAL '1' HOUR) as string) ws,
       cast(TUMBLE_END(ts, INTERVAL '1' HOUR) as string) we,
       event_type, count(*) n,
       sum(cast(floor(value * 100) as bigint)) cents
FROM events
GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
ORDER BY ws, event_type
"""

SQL_TUMBLE_DUCK = """
SELECT cast(date_trunc('hour', ts) as string) ws,
       cast(date_trunc('hour', ts) + INTERVAL 1 HOUR as string) we,
       event_type, count(*) n,
       cast(sum(cast(floor(value * 100) as bigint)) as bigint) cents
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY ws, event_type
"""

SQL_HOP_FLINK = """
SELECT cast(HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) as string) ws,
       count(*) n, sum(cast(floor(value * 100) as bigint)) cents
FROM events
GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)
ORDER BY ws
"""

SQL_HOP_DUCK = """
WITH half AS (
  SELECT CASE WHEN extract(minute FROM ts) >= 30
              THEN date_trunc('hour', ts) + INTERVAL 30 MINUTE
              ELSE date_trunc('hour', ts) END AS slot,
         cast(floor(value * 100) as bigint) cents
  FROM events)
SELECT cast(ws as string) ws, count(*) n, cast(sum(cents) as bigint) cents
FROM (SELECT slot AS ws, cents FROM half
      UNION ALL SELECT slot - INTERVAL 30 MINUTE, cents FROM half) u
GROUP BY ws ORDER BY ws
"""

SQL_SESSION_FLINK = """
SELECT user_id,
       cast(date_trunc('second', SESSION_START(ts, INTERVAL '30' MINUTE)) as string) ss,
       count(*) n, sum(cast(floor(value * 100) as bigint)) cents
FROM events
GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)
ORDER BY user_id, ss
"""

SQL_SESSION_DUCK = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END brk
  FROM events),
 sess AS (SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts) sid
          FROM marked)
SELECT user_id, cast(date_trunc('second', min(ts)) as string) ss, count(*) n,
       cast(sum(cast(floor(value * 100) as bigint)) as bigint) cents
FROM sess GROUP BY user_id, sid
ORDER BY user_id, ss
"""


registry.register("x_ddl_roundtrip", _ddl_roundtrip, DDL_ROUNDTRIP_DUCK)
registry.register("x_hive_multi_insert", _hive_multi_insert, HIVE_MULTI_INSERT_DUCK)
registry.register("x_ddl_like", _ddl_like, DDL_LIKE_DUCK)
registry.register("x_hive_dialect", _hive_dialect, HIVE_DIALECT_DUCK)
registry.register("x_catalog_qualified", _catalog_qualified, CATALOG_QUALIFIED_DUCK)
registry.register("x_ddl_options_hint", _ddl_options_hint, DDL_HINT_DUCK)
registry.register("x_explode_correlate", _sql_runner(EXPLODE_SPARK), EXPLODE_DUCK)
registry.register("x_array_ops", _sql_runner(ARRAY_SPARK), ARRAY_DUCK)
registry.register("x_listagg_ordered", _sql_runner(LISTAGG_SPARK), LISTAGG_DUCK)
registry.register("x_temporal_arith", _sql_runner(TEMPORAL_SPARK), TEMPORAL_DUCK)
registry.register("x_text_tfidf", _sql_runner(TFIDF_SPARK), TFIDF_DUCK)
# ------------------------- Flink join-surface compat (round 10 cont.)
#
# LATERAL TABLE(f(x)) — Calcite's collection-table operator, THE Flink
# UDTF-correlate spelling — and FOR SYSTEM_TIME AS OF (the 1.11 lookup
# join clause).  Both run the FLINK TEXT through the front door
# (sql_compat.py rewrites); oracles are the plain unnest / plain-join
# equivalents.

SQL_LATERAL_FLINK = """
SELECT token, count(*) n
FROM documents, LATERAL TABLE(explode(split(trim(text), ' '))) AS T(token)
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""

SQL_LATERAL_DUCK = """
SELECT token, count(*) n
FROM (SELECT unnest(string_split(trim(text), ' ')) token FROM documents) t
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""

SQL_SYSTEM_TIME_FLINK = """
SELECT c.c_mktsegment seg, count(*) n,
       sum(cast(floor(o_totalprice * 100) as bigint)) cents
FROM orders JOIN customer FOR SYSTEM_TIME AS OF orders.o_orderdate AS c
  ON c.c_custkey = o_custkey
GROUP BY c.c_mktsegment ORDER BY seg
"""

SQL_SYSTEM_TIME_DUCK = """
SELECT c.c_mktsegment seg, count(*) n,
       cast(sum(cast(floor(o_totalprice * 100) as bigint)) as bigint) cents
FROM orders JOIN customer c ON c.c_custkey = o_custkey
GROUP BY c.c_mktsegment ORDER BY seg
"""


registry.register("x_sql_tumble", _flink_sql_runner(SQL_TUMBLE_FLINK), SQL_TUMBLE_DUCK)
registry.register("x_sql_hop", _flink_sql_runner(SQL_HOP_FLINK), SQL_HOP_DUCK)
registry.register("x_sql_session", _flink_sql_runner(SQL_SESSION_FLINK), SQL_SESSION_DUCK)
registry.register("x_sql_lateral", _flink_sql_runner(SQL_LATERAL_FLINK), SQL_LATERAL_DUCK)
registry.register(
    "x_sql_system_time", _flink_sql_runner(SQL_SYSTEM_TIME_FLINK), SQL_SYSTEM_TIME_DUCK)
