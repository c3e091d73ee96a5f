"""Execute the full SURVEY.md §3.10 scalar-function inventory on Spark —
every Flink 1.11 builtin the engine claims as native, one expression
each.  Backs the COVERAGE.md claim; a Spark upgrade that drops or
renames any of these fails here, not in production.
"""

from flink_1_11_1_spark.session import get_spark  # noqa: F401 (fixture session)

_STRING = """
char_length('ab') , concat('a','b'), concat_ws('-','a','b'), upper('a'),
lower('A'), initcap('ab cd'), trim(' a '), ltrim(' a'), rtrim('a '),
lpad('a',3,'.'), rpad('a',3,'.'), left('abc',2), right('abc',2),
repeat('ab',2), reverse('abc'), replace('aba','a','x'),
regexp_extract('a1b','([0-9])',1), regexp_replace('a1b','[0-9]','#'),
substring('abcd',2,2), position('b' IN 'abc'), locate('b','abc'),
instr('abc','b'), ascii('a'), char(98), str_to_map('a:1,b:2',',',':'),
parse_url('http://h/p?q=1','HOST'), overlay('abcd' PLACING 'xx' FROM 2),
unbase64(base64('ab')), md5('a'), sha1('a'), sha2('a',256), bin(5),
hex(255), uuid(), 'a' || 'b'
"""

_MATH = """
abs(-1), ceil(1.2), ceiling(1.2), floor(1.8), round(1.25,1), sign(-2),
mod(7,3), power(2,3), sqrt(4), exp(1), ln(2.718), log(2,8), log2(8),
log10(100), pi(), e(), sin(0), cos(0), tan(0), cot(1), asin(0), acos(1),
atan(0), atan2(1,1), sinh(0), cosh(0), tanh(0), degrees(pi()),
radians(180), rand(), 5 & 3, 5 | 3, 5 ^ 3
"""

_TEMPORAL = """
extract(year from timestamp '2024-01-02 03:04:05'),
year(date '2024-01-02'), quarter(date '2024-01-02'),
month(date '2024-01-02'), weekofyear(date '2024-01-02'),
dayofyear(date '2024-01-02'), dayofmonth(date '2024-01-02'),
dayofweek(date '2024-01-02'), hour(timestamp '2024-01-02 03:04:05'),
minute(timestamp '2024-01-02 03:04:05'),
second(timestamp '2024-01-02 03:04:05'),
date_trunc('hour', timestamp '2024-01-02 03:04:05'),
date_format(timestamp '2024-01-02 03:04:05', 'yyyy-MM-dd'),
to_date('2024-01-02'), to_timestamp('2024-01-02 03:04:05'),
from_unixtime(0), unix_timestamp(timestamp '2024-01-02 03:04:05'),
now(), current_date(), current_timestamp(),
timestampadd(HOUR, 1, timestamp '2024-01-02 03:04:05'),
timestampdiff(DAY, timestamp '2024-01-01 00:00:00', timestamp '2024-01-03 00:00:00'),
timestamp '2024-01-02 03:04:05' + INTERVAL 1 DAY
"""
# NOTE: SQL-standard `(a, b) OVERLAPS (c, d)` syntax is NOT in Spark —
# the engine ships functions.overlaps() instead (tested below).

_CONDITIONAL = """
CASE WHEN 1=1 THEN 'a' ELSE 'b' END, coalesce(NULL,'x'), nullif('a','a'),
if(1=1,'y','n'), ifnull(NULL,'z'), greatest(1,2,3), least(1,2,3)
"""

_COLLECTION = """
array(1,2,3), map('a',1), named_struct('f',1), cardinality(array(1,2)),
size(array(1,2)), element_at(array(1,2),1), element_at(map('a',1),'a'),
array(1,2)[0], sort_array(array(2,1)), array_contains(array(1,2),1),
explode_outer(array(1))
"""


def _run(spark, exprs: str):
    row = spark.sql(f"SELECT {exprs.strip()}").first()
    assert row is not None and len(row) > 0


def test_string_functions(spark):
    _run(spark, _STRING)


def test_math_functions(spark):
    _run(spark, _MATH)


def test_temporal_functions(spark):
    _run(spark, _TEMPORAL)


def test_conditional_functions(spark):
    _run(spark, _CONDITIONAL)


def test_collection_functions(spark):
    _run(spark, _COLLECTION)


def test_grouping_functions(spark):
    rows = spark.sql(
        "SELECT grouping(g) gg, grouping_id(g) gid, count(*) FROM "
        "(SELECT 'a' g UNION ALL SELECT 'b') GROUP BY ROLLUP(g)"
    ).collect()
    assert len(rows) == 3


def test_overlaps_shim(spark):
    from pyspark.sql import functions as F

    from flink_1_11_1_spark import functions as ffn

    r = spark.range(1).select(
        ffn.overlaps(
            F.lit("2024-01-01").cast("date"), F.lit("2024-01-05").cast("date"),
            F.lit("2024-01-03").cast("date"), F.lit("2024-01-07").cast("date"),
        ).alias("o1"),
        ffn.overlaps(
            F.lit("2024-01-01").cast("date"), F.lit("2024-01-02").cast("date"),
            F.lit("2024-01-03").cast("date"), F.lit("2024-01-07").cast("date"),
        ).alias("o2"),
    ).first()
    assert r.o1 and not r.o2
