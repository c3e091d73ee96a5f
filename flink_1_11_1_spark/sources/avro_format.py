"""Avro format layer (SURVEY.md §3.1 — the flink-formats/flink-avro
row): pure-Python Object Container File codec + DataFrame read/write.

The sandbox ships neither spark-avro nor fastavro, so this implements
the public Avro 1.x specification directly (container file magic
``Obj\\x01``, metadata map carrying ``avro.schema``/``avro.codec``,
deflate/null codecs, zigzag-varint primitives, 16-byte sync markers) —
the same wire format ``AvroRowDeserializationSchema`` /
``AvroFileFormatFactory`` in the public Flink 1.11 tree consumes.

Type surface (the flat-row slice Flink's Table API uses, plus arrays):
null, boolean, int, long, float, double, bytes, string, fixed, enum,
record, array, map, union-of-[null, T] (nullable), and the
timestamp-millis / timestamp-micros logical types.

Scale notes: reading goes through Spark's native ``binaryFile`` source
(a DataFrame scan) into an Arrow ``mapInPandas`` decode stage — one
task per file, the standard parallelism floor for run-length container
formats (OCF blocks are splittable on sync markers; per-file tasks are
what spark-avro itself falls back to for deflate).  Writing encodes
per partition in the executors (``foreachPartition``) — one OCF file
per partition, no driver materialization.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic marker (spec: any 16 bytes)

# ------------------------------------------------------------ binary codec


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def long(self) -> int:
        z, shift = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)

    def raw(self, n: int) -> bytes:
        p = self.pos
        self.pos += n
        return self.buf[p : self.pos]

    def bytes_(self) -> bytes:
        return self.raw(self.long())


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: index then value
        return _decode(r, schema[r.long()])
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.raw(1) == b"\x01"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if t == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if t == "bytes":
        return r.bytes_()
    if t == "string":
        return r.bytes_().decode("utf-8")
    if t == "fixed":
        return r.raw(schema["size"])
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.bytes_().decode("utf-8")
                out[k] = _decode(r, schema["values"])
    raise ValueError(f"unsupported Avro type {t!r}")


def _encode(out: bytearray, schema: Any, v: Any) -> None:
    if isinstance(schema, list):  # union: [null, T] convention
        if v is None:
            out += _zigzag_encode(schema.index("null"))
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        out += _zigzag_encode(idx)
        _encode(out, schema[idx], v)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out += b"\x01" if v else b"\x00"
    elif t in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "bytes":
        b = bytes(v)
        out += _zigzag_encode(len(b)) + b
    elif t == "string":
        b = str(v).encode("utf-8")
        out += _zigzag_encode(len(b)) + b
    elif t == "fixed":
        out += bytes(v)
    elif t == "enum":
        out += _zigzag_encode(schema["symbols"].index(v))
    elif t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], v[f["name"]] if isinstance(v, dict) else getattr(v, f["name"]))
    elif t == "array":
        items = list(v)
        if items:
            out += _zigzag_encode(len(items))
            for item in items:
                _encode(out, schema["items"], item)
        out += _zigzag_encode(0)
    elif t == "map":
        entries = dict(v)
        if entries:
            out += _zigzag_encode(len(entries))
            for k, item in entries.items():
                kb = str(k).encode("utf-8")
                out += _zigzag_encode(len(kb)) + kb
                _encode(out, schema["values"], item)
        out += _zigzag_encode(0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


# ------------------------------------------------------- container files


def read_ocf_bytes(blob: bytes) -> tuple[dict, list[dict]]:
    """(schema, records) from one OCF blob."""
    r = _Reader(blob)
    if r.raw(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.bytes_().decode("utf-8")
            meta[k] = r.bytes_()
    codec = meta.get("avro.codec", b"null").decode()
    schema = json.loads(meta["avro.schema"])
    sync = r.raw(16)
    records: list[dict] = []
    while r.pos < len(r.buf):
        count = r.long()
        payload = r.bytes_()
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(br, schema))
        if r.raw(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records


def write_ocf_bytes(schema: dict, records: list, codec: str = "deflate") -> bytes:
    """One OCF blob for ``records`` (list of dicts / Row-likes)."""
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += SYNC
    body = bytearray()
    for rec in records:
        _encode(body, schema, rec)
    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        payload = co.compress(payload) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")
    out += _zigzag_encode(len(records))
    out += _zigzag_encode(len(payload)) + payload
    out += SYNC
    return bytes(out)


# ------------------------------------------------- Spark schema bridging

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "binary": "bytes",
    "string": "string",
}


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """Spark StructType -> Avro record schema (nullable via unions)."""
    from pyspark.sql import types as T

    def field_type(dt, fname: str):
        # Nested record names derive from the FIELD name path: two
        # sibling struct columns must not share a record name (Avro
        # spec forbids redefinition; external readers reject it).
        if isinstance(dt, T.StructType):
            return spark_schema_to_avro(dt, name=f"{name}_{fname}")
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": field_type(dt.elementType, f"{fname}_item")}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": field_type(dt.valueType, f"{fname}_value")}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        key = dt.simpleString()
        if key in ("int",):
            key = "integer"
        mapped = _SPARK_TO_AVRO.get(
            {"int": "integer", "bigint": "long", "smallint": "integer",
             "tinyint": "integer"}.get(key, key)
        )
        if mapped is None:
            raise ValueError(f"no Avro mapping for Spark type {dt}")
        return mapped

    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": ["null", field_type(f.dataType, f.name)] if f.nullable
                else field_type(f.dataType, f.name),
            }
            for f in schema.fields
        ],
    }


def avro_schema_to_spark(schema: dict):
    """Avro record schema -> Spark StructType (logical types honoured)."""
    from pyspark.sql import types as T

    prim = {
        "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "bytes": T.BinaryType(),
        "string": T.StringType(), "null": T.NullType(),
    }

    def conv(s) -> T.DataType:
        if isinstance(s, list):
            non_null = [x for x in s if x != "null"]
            if len(non_null) != 1:
                raise ValueError(f"unsupported union {s!r}")
            return conv(non_null[0])
        if isinstance(s, str):
            return prim[s]
        lt = s.get("logicalType")
        if lt in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType()
        if lt == "date":
            return T.DateType()
        t = s["type"]
        if t == "record":
            return T.StructType(
                [T.StructField(f["name"], conv(f["type"]), _nullable(f["type"]))
                 for f in s["fields"]]
            )
        if t == "array":
            return T.ArrayType(conv(s["items"]))
        if t == "map":
            return T.MapType(T.StringType(), conv(s["values"]))
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        return prim[t]

    def _nullable(s) -> bool:
        return isinstance(s, list) and "null" in s

    return conv(schema)


def _logical_fixup_in(schema: dict, rec: dict) -> dict:
    """Decoded primitive -> python value for logical types."""
    import datetime as dt

    out = dict(rec)
    for f in schema["fields"]:
        ft = f["type"]
        inner = next((x for x in ft if x != "null"), None) if isinstance(ft, list) else ft
        if isinstance(inner, dict) and inner.get("logicalType") and out[f["name"]] is not None:
            lt = inner["logicalType"]
            v = out[f["name"]]
            if lt == "timestamp-micros":
                out[f["name"]] = dt.datetime.fromtimestamp(v / 1e6, dt.timezone.utc).replace(tzinfo=None)
            elif lt == "timestamp-millis":
                out[f["name"]] = dt.datetime.fromtimestamp(v / 1e3, dt.timezone.utc).replace(tzinfo=None)
            elif lt == "date":
                out[f["name"]] = dt.date(1970, 1, 1) + dt.timedelta(days=v)
    return out


def _logical_fixup_out(schema: dict, rec: dict) -> dict:
    """Python value -> Avro primitive for logical types."""
    import datetime as dt

    out = dict(rec)
    for f in schema["fields"]:
        ft = f["type"]
        inner = next((x for x in ft if x != "null"), None) if isinstance(ft, list) else ft
        if isinstance(inner, dict) and inner.get("logicalType") and out.get(f["name"]) is not None:
            lt = inner["logicalType"]
            v = out[f["name"]]
            if lt == "timestamp-micros" and isinstance(v, dt.datetime):
                out[f["name"]] = int(v.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
            elif lt == "timestamp-millis" and isinstance(v, dt.datetime):
                out[f["name"]] = int(v.replace(tzinfo=dt.timezone.utc).timestamp() * 1e3)
            elif lt == "date" and isinstance(v, dt.date):
                out[f["name"]] = (v - dt.date(1970, 1, 1)).days
    return out


# --------------------------------------------------- DataFrame surface


def read_avro(spark, path: str):
    """Avro directory/file -> DataFrame: native binaryFile scan + Arrow
    decode stage (one task per file)."""
    import pandas as pd

    first = None
    paths = []
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, p) for p in os.listdir(path)
            if p.endswith(".avro")
        )
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(paths[0], "rb") as fh:
        first, _ = read_ocf_bytes(fh.read())
    spark_schema = avro_schema_to_spark(first)
    field_names = [f["name"] for f in first["fields"]]

    binary = (
        spark.read.format("binaryFile")
        .load(path if os.path.isdir(path) else path)
        .select("content")
    )
    if os.path.isdir(path):
        binary = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.avro")
            .load(path)
            .select("content")
        )

    def decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                schema, recs = read_ocf_bytes(bytes(blob))
                rows = [_logical_fixup_in(schema, r) for r in recs]
                yield pd.DataFrame(
                    {c: [r[c] for r in rows] for c in field_names},
                    columns=field_names,
                ) if rows else pd.DataFrame(columns=field_names)

    return binary.mapInPandas(decode, spark_schema)


def write_avro(df, path: str, codec: str = "deflate") -> None:
    """DataFrame -> one OCF file per partition, encoded executor-side."""
    os.makedirs(path, exist_ok=True)
    schema = spark_schema_to_avro(df.schema)
    cols = df.columns

    def write_part(it):
        import uuid

        rows = [
            _logical_fixup_out(schema, {c: r[i] for i, c in enumerate(cols)})
            for r in it
        ]
        if not rows:
            return
        blob = write_ocf_bytes(schema, rows, codec=codec)
        part = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        with open(part, "wb") as fh:
            fh.write(blob)

    df.foreachPartition(write_part)


def write_stream_avro(df, path: str, checkpoint: str, codec: str = "deflate"):
    """Streaming Avro file sink (the flink-avro StreamingFileSink row):
    foreachBatch encodes each micro-batch per partition executor-side
    into a per-batch subdirectory — the deterministic path makes a
    batch-id retry overwrite its own output (idempotent, the same
    at-least-once→exactly-once upgrade the parquet sink gets from its
    manifest).  ``read_avro(spark, f"{path}/b*")`` sees committed
    batches only."""
    import shutil

    def sink(batch_df, batch_id: int) -> None:
        out = os.path.join(path, f"b{batch_id:09d}")
        shutil.rmtree(out, ignore_errors=True)  # retry-idempotent
        write_avro(batch_df, out, codec=codec)

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def read_avro_tree(spark, path: str):
    """Read every .avro file under a directory tree (the streaming
    sink's b*/part-* layout) as one DataFrame."""
    paths = []
    for root, _dirs, names in os.walk(path):
        paths.extend(os.path.join(root, n) for n in names if n.endswith(".avro"))
    if not paths:
        raise FileNotFoundError(f"no .avro files under {path}")
    import functools

    return functools.reduce(
        lambda a, b: a.unionByName(b), (read_avro(spark, p) for p in sorted(paths))
    )
