"""Regression tests for the round-4 advisor findings (ADVICE.md r4):

- events_spec's encoding probe must treat parquet INT64 TIMESTAMP(NANOS)
  (pyarrow ``timestamp[ns]``) as the ns-as-long case, like plain INT64.
- Same-variable FIRST/LAST navigation in DEFINE must route to the fold
  (the row-local path would strip it into an invalid flag aggregate).
- _py_cond_ok must only swallow TypeErrors caused by null operands;
  genuine type mismatches propagate.  Unresolved dotted references fail
  at parse time with the DEFINE name, not as an executor NameError.
- catalog.register(force=True) restores canonical views after a caller
  shadows one.
"""

from __future__ import annotations

import datetime as dt

import pytest

from flink_1_11_1_spark import catalog
from flink_1_11_1_spark.extensions.match_recognize import match_recognize
from flink_1_11_1_spark.streaming.nfa import _py_cond_ok

from .conftest import SF_SMOKE


def test_events_spec_handles_nanos_timestamp_encoding(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_1_11_1_spark.table_env import events_spec

    base = dt.datetime(2026, 1, 1)
    for typ, subdir in [
        (pa.timestamp("ns"), "ns"),
        (pa.timestamp("us"), "us"),
        (pa.int64(), "raw"),
    ]:
        d = tmp_path / subdir
        d.mkdir()
        if typ == pa.int64():
            arr = pa.array(
                [int(base.timestamp() * 1e9), int(base.timestamp() * 1e9) + 7_000_000],
                type=typ,
            )
        else:
            arr = pa.array([base, base + dt.timedelta(milliseconds=7)], type=typ)
        pq.write_table(pa.table({"ts": arr}), d / "events.parquet")

    ns_expr = events_spec(str(tmp_path / "ns")).computed["ts"]
    raw_expr = events_spec(str(tmp_path / "raw")).computed["ts"]
    us_expr = events_spec(str(tmp_path / "us")).computed["ts"]
    # ns-physical and raw-int64 must both take the ns-as-long branch;
    # reading nanos via cast(ts as timestamp) would be off by 1e9.
    assert ns_expr == raw_expr == "timestamp_millis(ts div 1000000)"
    assert "cast(ts as timestamp)" in us_expr


def test_same_variable_first_navigation_goes_to_fold(spark):
    # B AS B.value >= FIRST(B.value): a valid Flink IterativeCondition;
    # previously fell into the row-local path and failed Spark analysis.
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES FIRST(B.event_id) AS b1, LAST(B.event_id) AS b2
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (B{2})
      DEFINE B AS B.value >= FIRST(B.value)
    )
    """
    rows = match_recognize(spark, sql, SF_SMOKE).limit(5).collect()
    assert all(r.b1 != r.b2 for r in rows)


def test_unresolved_dotted_reference_fails_at_parse(spark):
    sql = """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES LAST(B.event_id) AS b_id
      ONE ROW PER MATCH
      PATTERN (A B)
      DEFINE A AS A.event_type = 'click', B AS B.value > X.value
    )
    """
    with pytest.raises(ValueError, match="X"):
        match_recognize(spark, sql, SF_SMOKE)


def test_py_cond_null_vs_genuine_type_error():
    code = compile('EV["v"] > LAST("A","v")', "<py_cond:B>", "eval")
    bound = {"labels": ["A"], "vals": [{"v": 1.0}]}
    # null event value → no match, not an error
    assert _py_cond_ok(code, bound, {"v": None}) is False
    # unbound variable → no match
    assert _py_cond_ok(code, {"labels": [], "vals": []}, {"v": 2.0}) is False
    assert _py_cond_ok(code, bound, {"v": 2.0}) is True
    # genuine mismatch (string vs float, nothing null) → propagate
    with pytest.raises(TypeError):
        _py_cond_ok(code, bound, {"v": "not-a-number"})


def test_register_force_restores_shadowed_view(spark):
    catalog.register(spark, SF_SMOKE)
    n = spark.table("region").count()
    spark.range(1).selectExpr("id AS r_regionkey").createOrReplaceTempView("region")
    catalog.register(spark, SF_SMOKE)  # cached → still shadowed
    assert spark.table("region").count() == 1
    catalog.register(spark, SF_SMOKE, force=True)
    assert spark.table("region").count() == n


# ------------------------------------------------- round-6 advisor items


def test_hint_alias_evicted_on_recreate(spark, tmp_path):
    """DROP + re-CREATE of a hinted table with different props must not
    serve the stale merged alias: the repeated hinted query re-merges
    against the new declaration (ADVICE r5: _hint_aliases never
    invalidated)."""
    from flink_1_11_1_spark.table_env import TableEnvironment

    tenv = TableEnvironment(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(3).write.parquet(a)
    spark.range(7).write.parquet(b)
    other = str(tmp_path / "c")
    spark.range(5).write.parquet(other)
    ddl = """CREATE TABLE ev_hint (id BIGINT) WITH (
        'connector'='filesystem', 'path'='{p}', 'format'='parquet')"""
    hinted = f"SELECT count(*) AS n FROM ev_hint /*+ OPTIONS('path'='{other}') */"
    tenv.execute_sql(ddl.format(p=a))
    assert tenv.execute_sql(hinted).collect()[0].n == 5
    tenv.execute_sql("DROP TABLE ev_hint")
    # re-create with a different declared path AND different schema case
    tenv.execute_sql(ddl.format(p=b))
    assert tenv.execute_sql("SELECT count(*) AS n FROM ev_hint").collect()[0].n == 7
    # the repeated hinted query must re-merge (same override → same cache
    # key as before the drop); a stale alias would still read path a/c
    # merged over the OLD declaration
    assert tenv.execute_sql(hinted).collect()[0].n == 5
    # and the override composes with the NEW base declaration: overriding
    # nothing yields the new path
    assert (
        tenv.execute_sql(
            "SELECT count(*) AS n FROM ev_hint /*+ OPTIONS('format'='parquet') */"
        ).collect()[0].n
        == 7
    )
    tenv.execute_sql("DROP TABLE ev_hint")


def test_hint_shaped_text_inside_literal_untouched(spark):
    """Hint-shaped text inside a string literal must survive the FLIP-113
    rewrite verbatim (ADVICE r5: _HINT_RE was not quote-aware)."""
    from flink_1_11_1_spark.table_env import TableEnvironment

    tenv = TableEnvironment(spark)
    lit = "see t /*+ OPTIONS('k'='v') */ in docs"
    row = tenv.execute_sql(
        "SELECT 'see t /*+ OPTIONS(''k''=''v'') */ in docs' AS s"
    ).collect()[0]
    assert row.s == lit


def test_exact_quantiles_drops_its_temp_view(spark):
    """Repeated exact_quantiles calls must not leak __exact_quantiles_N
    temp views (ADVICE r5)."""
    from flink_1_11_1_spark.extensions.stats import exact_quantiles

    df = spark.range(100).selectExpr("id AS v", "id AS tb")
    for _ in range(2):
        rows = exact_quantiles(df, "v", "tb", probs=(0.5,)).collect()
        # lower discrete quantile: smallest v with cum_count >= ceil(.5*100)
        assert rows and rows[0].value == 49
    leaked = [t.name for t in spark.catalog.listTables()
              if t.name.startswith("__exact_quantiles_")]
    assert leaked == []


def test_execute_script_backslash_follows_parser_dialect(spark):
    """The script splitter brackets literals exactly as Spark's LEXER
    does — backslash-escaped quotes stay inside the literal in BOTH
    escapedStringLiterals modes (the conf only changes post-lex
    unescaping), and the documented dialect delta holds: a Flink-style
    literal ending in a lone backslash is not representable, but the
    doubled-backslash spelling splits and runs (ADVICE r5)."""
    from flink_1_11_1_spark.table_env import TableEnvironment

    tenv = TableEnvironment(spark)
    prior = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    try:
        for conf in ("false", "true"):
            spark.conf.set("spark.sql.parser.escapedStringLiterals", conf)
            # escaped quote stays inside the literal; the following
            # statement still runs (a naive splitter would cut at \')
            out = tenv.execute_script(r"SELECT 'a\'b' AS s; SELECT 2 AS y")
            assert out.collect()[0].y == 2
            # trailing-backslash content, spelled the Spark way
            out = tenv.execute_script("SELECT 'tail\\\\' AS s; SELECT 3 AS y")
            assert out.collect()[0].y == 3
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", prior)
