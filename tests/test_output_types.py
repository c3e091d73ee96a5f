"""No declared entry may expose a DECIMAL output column.

A Spark `1.0` literal is DECIMAL; DECIMAL(p,4) canonicalizes as
'4.6250' where DuckDB's DOUBLE gives '4.625' — a silent cross-engine
hash mismatch depending on the comparer's type handling.  Planning-only
(no collect), so this covers every entry cheaply.
"""

import pytest

from flink_1_11_1_spark import catalog

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def entry_dtypes(spark):
    """name -> Spark dtypes for every contract entry, analyzed ONCE —
    both type gates consume the same 263 plan analyses (round 13: the
    two tests each re-analyzed the full contract, ~20 s apiece)."""
    import __spark_entry__ as e

    catalog.register(spark, SF_SMOKE)
    return {name: fn(spark, SF_SMOKE).dtypes for name, fn in e.queries().items()}


def test_no_decimal_output_columns(entry_dtypes):
    offenders = [
        (name, c, t)
        for name, dts in entry_dtypes.items()
        for c, t in dts
        if "decimal" in t
    ]
    assert not offenders, offenders


def test_no_cross_engine_type_class_mismatch(entry_dtypes, duck):
    """Every oracle-backed entry must agree with DuckDB on the type
    CLASS (int/float/str/ts/date/bool) of each output column — an
    int-vs-float column (e.g. Spark ceil()->BIGINT vs DuckDB ->DOUBLE)
    canonicalizes as '4' vs '4.0' under plausible comparers.  Integer
    WIDTH differences (int vs bigint) are fine.  Planning-only."""
    import __spark_entry__ as e

    def duck_class(t):
        t = t.upper()
        if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT"):
            return "int"
        if t in ("DOUBLE", "FLOAT", "REAL"):
            return "float"
        if t == "VARCHAR":
            return "str"
        if t.startswith("TIMESTAMP"):
            return "ts"
        return {"DATE": "date", "BOOLEAN": "bool"}.get(t, t)

    def spark_class(t):
        if t in ("bigint", "int", "smallint", "tinyint"):
            return "int"
        if t in ("double", "float"):
            return "float"
        if t == "string":
            return "str"
        if t.startswith("timestamp"):
            return "ts"
        return {"date": "date", "boolean": "bool"}.get(t, t)

    osql = e.oracle_sql()
    bad = []
    for name, dts in entry_dtypes.items():
        if name not in osql:
            continue
        sd = dict(dts)
        dd = {
            r[0]: r[1]
            for r in duck.execute(f"DESCRIBE SELECT * FROM ({osql[name]})").fetchall()
        }
        for c, st in sd.items():
            if c in dd and spark_class(st) != duck_class(dd[c]):
                bad.append((name, c, st, dd[c]))
    assert not bad, bad


def test_no_hugeint_oracle_columns(duck):
    """No oracle may emit HUGEINT (int128): DuckDB widens sum(BIGINT) /
    count_if to HUGEINT, which Spark has no counterpart for and which the
    driver's hasher renders differently from BIGINT — the q15/q36/
    x_pipeline_clean hash failures of rounds 1-2.  Every integer aggregate
    in a shared query text must be wrapped in cast(... as bigint).
    Planning-only (DESCRIBE)."""
    import __spark_entry__ as e

    bad = []
    for name, sql in e.oracle_sql().items():
        for col, typ, *_ in duck.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall():
            if "HUGEINT" in typ.upper():
                bad.append((name, col, typ))
    assert not bad, bad
