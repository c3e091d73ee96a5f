"""Avro format layer (sources/avro_format.py): spec-level golden bytes,
OCF roundtrips, logical types, and the DataFrame read/write surface —
the flink-formats/flink-avro parity that was sandbox-blocked through
round 5."""

from __future__ import annotations

import datetime as dt

import pytest

from flink_1_11_1_spark.sources import avro_format as av
from flink_1_11_1_spark.sources.files import read_table, write_table

from .conftest import SF_SMOKE


# ----------------------------------------------------- spec conformance


def test_zigzag_varint_golden():
    """Hand-computed values from the Avro specification's own examples:
    0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01."""
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
             2: b"\x04", -64: b"\x7f", 64: b"\x80\x01", 8192: b"\x80\x80\x01"}
    for n, want in cases.items():
        assert av._zigzag_encode(n) == want, n
        r = av._Reader(want)
        assert r.long() == n


def test_record_encoding_golden():
    """The spec's worked example: {"a": 27, "b": "foo"} over a
    (long a, string b) record encodes to 36 06 66 6f 6f (27 zigzags to
    0x36, the 3-byte string length to 0x06)."""
    schema = {"type": "record", "name": "test", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    out = bytearray()
    av._encode(out, schema, {"a": 27, "b": "foo"})
    assert bytes(out) == b"\x36\x06\x66\x6f\x6f"
    assert av._decode(av._Reader(bytes(out)), schema) == {"a": 27, "b": "foo"}


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_all_types(codec):
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "y", "type": "bytes"},
        {"name": "n", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "symbols": ["RED", "GREEN"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
    ]}
    rows = [
        {"b": True, "i": -5, "l": 2**40, "f": 1.5, "d": -2.25,
         "s": "héllo", "y": b"\x00\xff", "n": None, "arr": [1, 2, 3],
         "m": {"k": "v"}, "e": "GREEN", "fx": b"abcd"},
        {"b": False, "i": 0, "l": -1, "f": 0.0, "d": 1e300,
         "s": "", "y": b"", "n": 7, "arr": [], "m": {}, "e": "RED",
         "fx": b"wxyz"},
    ]
    blob = av.write_ocf_bytes(schema, rows, codec=codec)
    got_schema, got = av.read_ocf_bytes(blob)
    assert got_schema == schema and got == rows


def test_ocf_corrupt_sync_detected():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "long"}]}
    blob = bytearray(av.write_ocf_bytes(schema, [{"a": 1}], codec="null"))
    blob[-1] ^= 0xFF  # flip the trailing sync byte
    with pytest.raises(ValueError, match="sync"):
        av.read_ocf_bytes(bytes(blob))


# ------------------------------------------------- schema bridge


def test_spark_avro_schema_bridge_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.5, True, dt.datetime(2026, 1, 2, 3, 4, 5), [1, 2])],
        "id bigint, name string, score double, ok boolean, "
        "ts timestamp, tags array<int>",
    )
    avro_schema = av.spark_schema_to_avro(df.schema)
    back = av.avro_schema_to_spark(avro_schema)
    assert [f.dataType.simpleString() for f in back.fields] == [
        f.dataType.simpleString() for f in df.schema.fields
    ]


# ------------------------------------------------- DataFrame surface


def test_avro_dataframe_roundtrip(spark, tmp_path):
    """write_table/read_table with fmt='avro': value-exact roundtrip of
    a nullable, multi-type frame including timestamps — encoded per
    partition executor-side, decoded through binaryFile + mapInPandas."""
    rows = [
        (i, f"doc {i}", float(i) / 3, i % 2 == 0,
         dt.datetime(2026, 1, 1) + dt.timedelta(minutes=i),
         None if i % 5 == 0 else i * 10)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        "id bigint, name string, score double, ok boolean, "
        "ts timestamp, opt bigint",
    ).repartition(3)
    path = str(tmp_path / "avro_rt")
    write_table(df, path, fmt="avro")
    import os

    assert len([p for p in os.listdir(path) if p.endswith(".avro")]) >= 1
    back = read_table(spark, path, fmt="avro")
    assert sorted(back.columns) == sorted(df.columns)
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_avro_fixture_documents_roundtrip(spark, tmp_path):
    from flink_1_11_1_spark import catalog

    docs = catalog.load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_avro")
    write_table(docs, path, fmt="avro")
    back = read_table(spark, path, fmt="avro")
    assert back.count() == docs.count()
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    # content parity on a text digest (value-exact strings)
    from pyspark.sql import functions as F

    a = back.agg(F.sum(F.crc32("text")).alias("s")).first().s
    b = docs.agg(F.sum(F.crc32("text")).alias("s")).first().s
    assert a == b


def test_avro_through_ddl_front_door(spark, tmp_path):
    """CREATE TABLE ... WITH ('format'='avro') scans the python-codec
    OCF files like any other filesystem format (flink-avro DDL parity)."""
    from flink_1_11_1_spark.table_env import TableEnvironment

    src = spark.range(50).selectExpr("id", "concat('n', id) AS name")
    path = str(tmp_path / "ddl_avro")
    write_table(src, path, fmt="avro")
    tenv = TableEnvironment(spark)
    tenv.execute_sql(
        f"""CREATE TABLE av_t (id BIGINT, name STRING) WITH (
            'connector'='filesystem', 'path'='{path}', 'format'='avro')"""
    )
    got = tenv.execute_sql(
        "SELECT count(*) AS n, sum(id) AS s FROM av_t"
    ).collect()[0]
    assert (got.n, got.s) == (50, 49 * 50 // 2)
    tenv.execute_sql("DROP TABLE av_t")
