"""Minimal pure-Python Avro Object Container File reader.

Implements the subset of the public Apache Avro 1.11 specification
(container header/blocks, zigzag varints, primitives, records, unions,
enums, arrays, maps, fixed; null/deflate codecs) needed to decode
Debezium CDC topic dumps. This container ships neither spark-avro nor
fastavro, but the reference's only ground-truth CDC captures are Avro
files (reference ``testing/streaming.public.order.avro`` /
``...customers.avro``, read there with fastavro at
``testing/read_avro.py:1-6``) — this reader exists so the engine's CDC
operators are tested against the REAL captures, not just synthesized
envelopes.

Scope note: this is a test/fixture utility, not the 100 TB ingest path —
at scale Avro decode runs JVM-side via spark-avro (``read_avro`` in
``sources/registry.py``); this module's job is correctness ground truth.
"""

from __future__ import annotations

import decimal
import json
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class _Reader:
    """Byte cursor with Avro primitive decoders."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        end = self.pos + n
        if end > len(self.buf):
            raise EOFError(f"avro: truncated read at {self.pos}+{n}")
        out = self.buf[self.pos : end]
        self.pos = end
        return out

    def long(self) -> int:
        """Zigzag-encoded variable-length integer (spec: binary encoding)."""
        acc, shift = 0, 0
        while True:
            if self.pos >= len(self.buf):  # mid-varint truncation: keep
                # the module's EOFError-with-offset contract (read())
                raise EOFError(f"avro: truncated varint at {self.pos}")
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def blocks(self) -> int:
        """Array/map block count; negative count is followed by a byte
        size (skipped — we always decode item-wise)."""
        n = self.long()
        if n < 0:
            self.long()
            n = -n
        return n


def _register_names(schema, names: dict, ns: str | None = None) -> None:
    """Pre-register named types (record/enum/fixed) so forward
    references by name resolve — e.g. Debezium's ``after`` field refers
    to the ``Value`` record defined under ``before``."""
    if isinstance(schema, list):
        for s in schema:
            _register_names(s, names, ns)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    name = schema.get("name")
    ns = schema.get("namespace", ns)
    if t in ("record", "enum", "fixed") and name:
        names[name] = schema
        if ns and "." not in name:
            names[f"{ns}.{name}"] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _register_names(f["type"], names, ns)
    elif t == "array":
        _register_names(schema.get("items"), names, ns)
    elif t == "map":
        _register_names(schema.get("values"), names, ns)


def _decode(schema, r: _Reader, names: dict):
    if isinstance(schema, list):  # union: long index, then value
        return _decode(schema[r.long()], r, names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(f["type"], r, names) for f in schema["fields"]}
        if t == "enum":
            return schema["symbols"][r.long()]
        if t == "fixed":
            return r.read(schema["size"])
        if t == "array":
            out = []
            while (n := r.blocks()) != 0:
                out.extend(_decode(schema["items"], r, names) for _ in range(n))
            return out
        if t == "map":
            out = {}
            while (n := r.blocks()) != 0:
                for _ in range(n):
                    k = r.read(r.long()).decode("utf-8")
                    out[k] = _decode(schema["values"], r, names)
            return out
        # annotated primitive / named reference, e.g. {"type": "bytes",
        # "logicalType": "decimal", ...}
        return _decode(t, r, names)
    if schema in _PRIMITIVES:
        if schema == "null":
            return None
        if schema == "boolean":
            return r.read(1) == b"\x01"
        if schema in ("int", "long"):
            return r.long()
        if schema == "float":
            return struct.unpack("<f", r.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.read(8))[0]
        if schema == "bytes":
            return bytes(r.read(r.long()))
        return r.read(r.long()).decode("utf-8")  # string
    if schema in names:  # reference to a previously defined named type
        return _decode(names[schema], r, names)
    raise ValueError(f"avro: unsupported type {schema!r}")


def read_avro(path: str) -> tuple[dict, list]:
    """Read an Avro Object Container File → (writer schema, records)."""
    with open(path, "rb") as f:
        return read_avro_bytes(f.read(), name=path)


def read_avro_schema(path: str, header_bytes: int = 1 << 20) -> dict:
    """Writer schema from the container HEADER only — no record decode
    (the driver-side peek of the distributed scan reads just this).
    Avro headers are magic + metadata map + sync; 1 MiB covers any sane
    schema."""
    with open(path, "rb") as f:
        r = _Reader(f.read(header_bytes))
    if r.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while (n := r.blocks()) != 0:
        for _ in range(n):
            k = r.read(r.long()).decode("utf-8")
            meta[k] = bytes(r.read(r.long()))
    return json.loads(meta["avro.schema"])


def read_avro_bytes(buf: bytes, name: str = "<bytes>") -> tuple[dict, list]:
    """Decode an in-memory Avro container → (writer schema, records).
    The executor-side entry point of the distributed fallback scan
    (``registry.read_avro_distributed`` ships whole files via the
    binaryFile source and decodes them here)."""
    r = _Reader(buf)
    path = name
    if r.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while (n := r.blocks()) != 0:
        for _ in range(n):
            k = r.read(r.long()).decode("utf-8")
            meta[k] = bytes(r.read(r.long()))
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    names: dict = {}
    _register_names(schema, names)
    sync = r.read(16)
    records = []
    while r.pos < len(r.buf):
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        records.extend(_decode(schema, br, names) for _ in range(count))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    return schema, records


def decode_decimal(raw: bytes, scale: int) -> decimal.Decimal:
    """Avro logical decimal: two's-complement big-endian unscaled int
    (what spark-avro/Connect produce for Debezium money columns)."""
    unscaled = int.from_bytes(raw, "big", signed=True)
    return decimal.Decimal(unscaled).scaleb(-scale)


def walk_decimals(record, schema, names: dict | None = None, ns: str | None = None):
    """Convert every bytes-typed logical decimal in a decoded record to
    ``decimal.Decimal`` in place, guided by the writer schema."""
    if names is None:
        names = {}
        _register_names(schema, names)
    if isinstance(schema, list):
        for s in schema:
            if s != "null":
                walk_decimals(record, s, names, ns)
        return record
    if isinstance(schema, str):
        if schema in names:
            return walk_decimals(record, names[schema], names, ns)
        return record
    if not isinstance(schema, dict) or record is None:
        return record
    if schema["type"] == "record":
        for f in schema["fields"]:
            ft = f["type"]
            base = ft
            if isinstance(base, list):
                base = next((s for s in base if s != "null"), "null")
            if (
                isinstance(base, dict)
                and base.get("type") == "bytes"
                and (base.get("logicalType") == "decimal" or "scale" in base)
                and isinstance(record.get(f["name"]), bytes)
            ):
                record[f["name"]] = decode_decimal(
                    record[f["name"]], int(base.get("scale", 0))
                )
            else:
                walk_decimals(record.get(f["name"]), ft, names, ns)
    return record


def avro_to_spark_type(schema, names: dict | None = None):
    """Writer-schema JSON → Spark DataType (the subset Debezium uses).

    Mirrors spark-avro's mapping: nullable unions → nullable field,
    bytes logical decimal → DecimalType, enum → string, int/long/
    float/double/boolean/string/bytes → primitives, record → struct,
    array/map/fixed → their Spark counterparts."""
    from pyspark.sql import types as T

    if names is None:
        names = {}
        _register_names(schema, names)
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"avro: unsupported union {schema!r}")
        return avro_to_spark_type(non_null[0], names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        avro_to_spark_type(f["type"], names),
                        nullable=isinstance(f["type"], list) and "null" in f["type"],
                    )
                    for f in schema["fields"]
                ]
            )
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        if t == "array":
            return T.ArrayType(avro_to_spark_type(schema["items"], names))
        if t == "map":
            return T.MapType(T.StringType(), avro_to_spark_type(schema["values"], names))
        if t == "bytes" and (schema.get("logicalType") == "decimal" or "scale" in schema):
            return T.DecimalType(
                int(schema.get("precision", 38)), int(schema.get("scale", 0))
            )
        return avro_to_spark_type(t, names)
    prim = {
        "null": None,
        "boolean": "BooleanType",
        "int": "IntegerType",
        "long": "LongType",
        "float": "FloatType",
        "double": "DoubleType",
        "bytes": "BinaryType",
        "string": "StringType",
    }
    if schema in prim:
        if schema == "null":
            return T.NullType()
        return getattr(T, prim[schema])()
    if schema in names:
        return avro_to_spark_type(names[schema], names)
    raise ValueError(f"avro: unsupported type {schema!r}")


def read_avro_as_dataframe(spark, path: str):
    """Decode an Avro container file into a Spark DataFrame without
    spark-avro: driver-side decode (this is the FIXTURE-SCALE path — a
    100 TB Avro topic dump goes through the JVM spark-avro reader in
    ``sources/registry.py:read_avro``; this fallback exists so CDC
    envelopes remain readable in jar-less environments)."""
    schema, records = read_avro(path)
    for rec in records:
        walk_decimals(rec, schema)
    spark_schema = avro_to_spark_type(schema)
    return spark.createDataFrame(records, spark_schema)
