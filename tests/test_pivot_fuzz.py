"""Differential fuzz for the native pivot operator (PivotFirst).

The declared entries x_tpcds_pivot / x_tpcds_pivot_multi pin one
single-measure and one multi-measure pivot each; this battery fuzzes
the surface: a seeded generator draws (group key, pivot dimension,
explicit value list, 1-2 measures) specs, runs them through Spark's
native ``RelationalGroupedDataset.pivot`` (the DataFrame API — there
is no one-text SQL spelling), and compares against the equivalent
DuckDB conditional aggregation built from the SAME spec.

Portability rules (the round-5/7 contract discipline):
- money measures use the floor-cents idiom (``floor(x*100)`` then
  bigint — a bare double→bigint cast truncates on Spark but rounds on
  DuckDB);
- counts are rendered ``sum(CASE WHEN dim=v THEN 1 END)`` on the
  DuckDB side so an entirely-absent (group, value) cell is NULL on
  both engines (Spark's pivot leaves missing cells NULL; a bare
  COUNT-CASE would yield 0);
- group keys are integers or low-cardinality strings, never floats.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flink_1_11_1_spark import catalog, testing

from .conftest import SF_SMOKE

pytestmark = pytest.mark.slow

# (table, pivot dim, explicit values) — dims are closed enums in the
# fixture so the value lists are complete and deterministic.
_DIMS = [
    ("lineitem", "l_returnflag", ["N", "R", "A"]),
    ("lineitem", "l_linestatus", ["F", "O"]),
    ("orders", "o_orderpriority",
     ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
    ("orders", "o_orderstatus", ["F", "O", "P"]),
]

# (table, group-key SQL expr, spark Column factory)
_KEYS = {
    "lineitem": [
        ("l_suppkey % 7", lambda: (F.col("l_suppkey") % 7)),
        ("cast(l_quantity as bigint) % 5",
         lambda: F.col("l_quantity").cast("bigint") % 5),
    ],
    "orders": [
        ("o_custkey % 9", lambda: (F.col("o_custkey") % 9)),
        ("cast(extract(year from o_orderdate) as bigint)",
         lambda: F.year("o_orderdate").cast("long")),
    ],
}

# measure name -> (spark agg over prepared cols, duck agg SQL template
# with {p} the CASE predicate)
_MEASURES = {
    "cents": (
        lambda: F.sum("cents"),
        "cast(sum(CASE WHEN {p} THEN cents END) as bigint)",
    ),
    "n": (
        lambda: F.count(F.lit(1)),
        "cast(sum(CASE WHEN {p} THEN 1 END) as bigint)",
    ),
    "qmax": (
        lambda: F.max("qint"),
        "cast(max(CASE WHEN {p} THEN qint END) as bigint)",
    ),
}

_PRICE = {"lineitem": "l_extendedprice", "orders": "o_totalprice"}
_QINT = {"lineitem": "cast(l_quantity as bigint)",
         "orders": "cast(o_orderkey as bigint) % 97"}


def _slug(value: str) -> str:
    # leading "v_" keeps aliases parseable (values like "1-URGENT"
    # would otherwise produce digit-leading identifiers DuckDB rejects)
    return "v_" + "".join(ch if ch.isalnum() else "_" for ch in value.lower())


def gen_spec(rng: random.Random) -> dict:
    table, dim, values = rng.choice(_DIMS)
    key_sql, key_col = rng.choice(_KEYS[table])
    n_measures = rng.randint(1, 2)
    measures = rng.sample(sorted(_MEASURES), n_measures)
    return {
        "table": table, "dim": dim, "values": values,
        "key_sql": key_sql, "key_col": key_col, "measures": measures,
    }


def run_spark_pivot(spark, spec):
    catalog.register(spark, SF_SMOKE)
    t = spec["table"]
    base = spark.table(t).select(
        spec["key_col"]().cast("long").alias("g"),
        F.col(spec["dim"]).alias("d"),
        F.floor(F.col(_PRICE[t]) * 100).cast("long").alias("cents"),
        F.expr(_QINT[t]).alias("qint"),
    )
    aggs = [_MEASURES[m][0]().alias(m) for m in spec["measures"]]
    out = base.groupBy("g").pivot("d", spec["values"]).agg(*aggs)
    # normalize spark's pivot column naming to <slug(value)>_<measure>
    for v in spec["values"]:
        for m in spec["measures"]:
            src = f"{v}_{m}" if len(spec["measures"]) > 1 else v
            out = out.withColumnRenamed(src, f"{_slug(v)}_{m}")
    return out.orderBy("g")


def duck_sql(spec) -> str:
    t = spec["table"]
    cols = []
    for v in spec["values"]:
        esc = v.replace("'", "''")
        for m in spec["measures"]:
            tmpl = _MEASURES[m][1]
            cols.append(
                tmpl.format(p=f"d = '{esc}'") + f" AS {_slug(v)}_{m}")
    return (
        f"SELECT g, {', '.join(cols)} FROM "
        f"(SELECT {spec['key_sql']} AS g, {spec['dim']} AS d, "
        f"cast(floor({_PRICE[t]} * 100) AS bigint) AS cents, "
        f"{_QINT[t]} AS qint FROM {t}) src "
        f"GROUP BY g ORDER BY g"
    )


N_SPECS = 14
_RNG = random.Random(661103)
SPECS = [gen_spec(_RNG) for _ in range(N_SPECS)]


@pytest.mark.parametrize("idx", range(N_SPECS))
def test_fuzzed_pivot_matches_duckdb(spark, duck, idx):
    spec = SPECS[idx]
    df = run_spark_pivot(spark, spec)
    scols, srows = df.columns, [tuple(r) for r in df.collect()]
    dcols, drows = testing.run_duckdb(duck, duck_sql(spec))
    assert sorted(scols) == sorted(dcols), (spec, scols, dcols)
    a = sorted(testing.canon_rows(scols, srows))
    b = sorted(testing.canon_rows(dcols, drows))
    assert a == b, f"pivot spec #{idx} diverged: {spec}\n{a[:2]}\nvs\n{b[:2]}"
