"""Seeded differential fuzzer for the Table API façade: random fluent
pipelines built from Flink expression strings vs their hand-mapped
Spark SQL twins (same engine, so this tests the PARSER and the
delegation, not cross-engine arithmetic).  Follows test_query_fuzz
conventions: fixed seed, deterministic total ordering per case."""

from __future__ import annotations

import random

import pytest

from flink_1_11_1_spark.table_env import TableEnvironment

from .conftest import SF_SMOKE

N_CASES = 60
SEED = 77


@pytest.fixture(scope="module")
def tenv(spark):
    env = TableEnvironment(spark)
    env.register_fixture_catalog(SF_SMOKE)
    return env


# (flink_expr, sql_expr) generators over lineitem -----------------------

def _scalar(rng: random.Random) -> tuple[str, str]:
    """An integer-or-string-valued scalar expression pair."""
    leaf = rng.choice([
        ("l_orderkey", "l_orderkey"),
        ("l_linenumber", "l_linenumber"),
        ("l_quantity.floor.cast(LONG)", "cast(floor(l_quantity) as bigint)"),
        ("l_returnflag", "l_returnflag"),
    ])
    kind = rng.randrange(6)
    f, s = leaf
    if "flag" in f:  # string leaf: string ops only
        return rng.choice([
            (f"{f}.lowerCase", f"lower({f.split('.')[0]})"),
            (f"{f} + '_x'", f"concat({f}, '_x')"),
            (f"{f}.charLength", f"length({f})"),
            (f, s),
        ])
    if kind == 0:
        n = rng.randrange(2, 9)
        return (f"{f} + {n}", f"{s} + {n}")
    if kind == 1:
        n = rng.randrange(2, 9)
        return (f"{f} * {n}", f"{s} * {n}")
    if kind == 2:
        n = rng.randrange(2, 9)
        return (f"{f} % {n}", f"{s} % {n}")
    if kind == 3:
        n = rng.randrange(1, 50)
        return (f"if({f} > {n}, {f}, -{f})",
                f"IF({s} > {n}, {s}, -({s}))")
    if kind == 4:
        return (f"({f}).abs", f"abs({s})")
    return leaf


def _pred(rng: random.Random) -> tuple[str, str]:
    kind = rng.randrange(5)
    if kind == 0:
        n = rng.randrange(1, 2000)
        return (f"l_orderkey % 7 < 3 && l_orderkey > {n}",
                f"l_orderkey % 7 < 3 AND l_orderkey > {n}")
    if kind == 1:
        return ("l_returnflag = 'R' || l_returnflag = 'A'",
                "l_returnflag = 'R' OR l_returnflag = 'A'")
    if kind == 2:
        return ("!(l_linenumber = 1)", "NOT (l_linenumber = 1)")
    if kind == 3:
        n = rng.randrange(5, 45)
        return (f"l_quantity >= {n}.0", f"l_quantity >= {n}.0")
    return ("l_returnflag.in('N', 'R')", "l_returnflag IN ('N', 'R')")


def _agg(rng: random.Random) -> tuple[str, str]:
    f, s = _scalar(rng)
    if "flag" in f:
        return (f"({f}).count", f"count({s})")
    fn = rng.choice(["sum", "min", "max", "count"])
    return (f"({f}).{fn}", f"{fn}({s})")


def _case(rng: random.Random, tenv):
    shape = rng.randrange(4)
    t = tenv.from_path("lineitem")
    if shape == 0:  # filter + select + order + fetch
        pf, ps = _pred(rng)
        e1f, e1s = _scalar(rng)
        e2f, e2s = _scalar(rng)
        got = (t.filter(pf)
               .select(f"{e1f} as a, {e2f} as b, l_orderkey as k, "
                       "l_linenumber as ln")
               .order_by("k.asc, ln.asc").fetch(500))
        sql = (f"SELECT {e1s} a, {e2s} b, l_orderkey k, l_linenumber ln "
               f"FROM lineitem WHERE {ps} ORDER BY k, ln LIMIT 500")
        return got, sql
    if shape == 1:  # group_by + aggs
        af, as_ = _agg(rng)
        bf, bs = _agg(rng)
        got = (t.group_by("l_returnflag, l_linestatus")
               .select(f"l_returnflag, l_linestatus, {af} as x, {bf} as y")
               .order_by("l_returnflag.asc, l_linestatus.asc"))
        sql = (f"SELECT l_returnflag, l_linestatus, {as_} x, {bs} y "
               "FROM lineitem GROUP BY l_returnflag, l_linestatus "
               "ORDER BY l_returnflag, l_linestatus")
        return got, sql
    if shape == 2:  # filtered global agg
        pf, ps = _pred(rng)
        af, as_ = _agg(rng)
        got = t.filter(pf).select(f"{af} as x, *.count as n")
        sql = f"SELECT {as_} x, count(*) n FROM lineitem WHERE {ps}"
        return got, sql
    # shape 3: over window running agg
    af, as_ = _agg(rng)
    from flink_1_11_1_spark.table_api import Over

    got = (t.filter("l_orderkey < 500")
           .over_window(
               Over.partition_by("l_orderkey").order_by("l_linenumber")
                   .preceding("unbounded_row").alias("w"))
           .select(f"l_orderkey as k, l_linenumber as ln, {af} over w as r")
           .order_by("k.asc, ln.asc"))
    sql = (f"SELECT l_orderkey k, l_linenumber ln, "
           f"{as_} OVER (PARTITION BY l_orderkey ORDER BY l_linenumber "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) r "
           "FROM lineitem WHERE l_orderkey < 500 ORDER BY k, ln")
    return got, sql


@pytest.mark.parametrize("i", range(N_CASES))
def test_table_api_fuzz_case(tenv, i):
    rng = random.Random(SEED + i)
    got, sql = _case(rng, tenv)
    a = [tuple(r) for r in got.df.collect()]
    b = [tuple(r) for r in tenv.spark.sql(sql).collect()]
    if "ORDER BY" not in sql:
        a, b = sorted(map(str, a)), sorted(map(str, b))
    assert a == b, f"case {i}: {sql}"
