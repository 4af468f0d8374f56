"""Minimal pure-Python Avro Object Container File reader AND writer.

Implements the subset of the public Apache Avro 1.11 specification
(container header/blocks, zigzag varints, primitives, records, unions,
enums, arrays, maps, fixed; null/deflate codecs; decimal / date /
timestamp logical types) needed to decode — and, since round 3, to
re-encode — Debezium CDC topic dumps. This container ships neither
spark-avro nor fastavro, but the reference's only ground-truth CDC
captures are Avro files (reference ``testing/streaming.public.order.avro``
/ ``...customers.avro``, read there with fastavro at
``testing/read_avro.py:1-6``) — this reader exists so the engine's CDC
operators are tested against the REAL captures, not just synthesized
envelopes, and the writer closes the Avro ROUND TRIP (encode → decode is
the identity, property-tested against those captures) so jar-less
environments can also produce Avro for downstream consumers.

Scope note: this is a test/fixture utility, not the 100 TB ingest path —
at scale Avro encode/decode runs JVM-side via spark-avro (``read_avro``
in ``sources/registry.py``); this module's job is correctness ground
truth plus the distributed fallback paths in ``registry``/``sinks``.
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


class _Writer:
    """Byte accumulator with Avro primitive encoders (mirror of
    ``_Reader``; spec: binary encoding)."""

    def __init__(self) -> None:
        self.parts: list[bytes] = []

    def write(self, b: bytes) -> None:
        self.parts.append(b)

    def long(self, n: int) -> None:
        z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        out = bytearray()
        while True:
            byte = z & 0x7F
            z >>= 7
            if z:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                break
        self.parts.append(bytes(out))

    def bytes_(self, b: bytes) -> None:
        self.long(len(b))
        self.parts.append(bytes(b))

    def string(self, s: str) -> None:
        self.bytes_(s.encode("utf-8"))

    def getvalue(self) -> bytes:
        return b"".join(self.parts)


def encode_decimal(value, scale: int) -> bytes:
    """Inverse of :func:`decode_decimal`: minimal two's-complement
    big-endian unscaled int (what spark-avro/Connect produce)."""
    unscaled = int(decimal.Decimal(value).scaleb(scale).to_integral_value())
    length = max(1, (unscaled.bit_length() + 8) // 8)  # +8: sign bit room
    return unscaled.to_bytes(length, "big", signed=True)


def _union_index(schema: list, value) -> int:
    """Pick the union branch for a Python value. The subset we emit is
    Debezium/Spark-shaped: ``["null", T]`` (or the reverse) — a null
    value takes the "null" branch, anything else the sole other one."""
    if value is None:
        for i, s in enumerate(schema):
            if s == "null":
                return i
        raise ValueError(f"avro: null value for non-nullable union {schema!r}")
    non_null = [(i, s) for i, s in enumerate(schema) if s != "null"]
    if len(non_null) != 1:
        raise ValueError(f"avro: ambiguous multi-type union {schema!r}")
    return non_null[0][0]


def _encode(schema, value, w: _Writer, names: dict) -> None:
    """Mirror of ``_decode``: write ``value`` under the writer schema."""
    import datetime as _dt

    if isinstance(schema, list):  # union: long index, then value
        idx = _union_index(schema, value)
        w.long(idx)
        _encode(schema[idx], value, w, names)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], None if value is None else value.get(f["name"]), w, names)
            return
        if t == "enum":
            w.long(schema["symbols"].index(value))
            return
        if t == "fixed":
            if len(value) != schema["size"]:
                raise ValueError(
                    f"avro: fixed size mismatch {len(value)} != {schema['size']}"
                )
            w.write(bytes(value))
            return
        if t == "array":
            if value:
                w.long(len(value))
                for item in value:
                    _encode(schema["items"], item, w, names)
            w.long(0)
            return
        if t == "map":
            if value:
                w.long(len(value))
                for k, v in value.items():
                    w.string(k)
                    _encode(schema["values"], v, w, names)
            w.long(0)
            return
        logical = schema.get("logicalType")
        if t == "bytes" and (logical == "decimal" or "scale" in schema):
            if isinstance(value, (decimal.Decimal, int, float)):
                value = encode_decimal(value, int(schema.get("scale", 0)))
            w.bytes_(value)
            return
        if t == "int" and logical == "date" and isinstance(value, _dt.date):
            w.long((value - _dt.date(1970, 1, 1)).days)
            return
        if t == "long" and logical in ("timestamp-micros", "timestamp-millis"):
            if isinstance(value, _dt.datetime):
                epoch = _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
                unit = 1_000_000 if logical == "timestamp-micros" else 1_000
                value = round((value - epoch).total_seconds() * unit)
            w.long(value)
            return
        _encode(t, value, w, names)  # annotated primitive / named ref
        return
    if schema in _PRIMITIVES:
        if schema == "null":
            return
        if schema == "boolean":
            w.write(b"\x01" if value else b"\x00")
        elif schema in ("int", "long"):
            w.long(int(value))
        elif schema == "float":
            w.write(struct.pack("<f", value))
        elif schema == "double":
            w.write(struct.pack("<d", value))
        elif schema == "bytes":
            w.bytes_(bytes(value))
        else:  # string
            w.string(value)
        return
    if schema in names:
        _encode(names[schema], value, w, names)
        return
    raise ValueError(f"avro: unsupported type {schema!r}")


def write_avro_bytes(
    schema,
    records,
    codec: str = "null",
    sync: bytes | None = None,
    block_records: int = 4096,
) -> bytes:
    """Encode records into an in-memory Avro Object Container.

    ``sync`` defaults to a DIGEST of the schema rather than the spec's
    random marker so output is byte-deterministic (same schema + records
    → same file; the spec only requires the 16 bytes be consistent
    within a file). ``block_records`` bounds block size so decoders
    never inflate more than one block at a time."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    if sync is None:
        sync = hashlib.md5(schema_json.encode()).digest()
    if len(sync) != 16:
        raise ValueError("avro: sync marker must be 16 bytes")
    names: dict = {}
    _register_names(schema, names)
    w = _Writer()
    w.write(_MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    w.long(len(meta))
    for k, v in sorted(meta.items()):
        w.string(k)
        w.bytes_(v)
    w.long(0)
    w.write(sync)
    records = list(records)
    for start in range(0, len(records), block_records):
        chunk = records[start : start + block_records]
        bw = _Writer()
        for rec in chunk:
            _encode(schema, rec, bw, names)
        block = bw.getvalue()
        if codec == "deflate":
            block = zlib.compress(block)[2:-4]  # raw stream, matching -15 inflate
        w.long(len(chunk))
        w.long(len(block))
        w.write(block)
        w.write(sync)
    return w.getvalue()


def write_avro(
    path: str,
    schema,
    records,
    codec: str = "null",
    sync: bytes | None = None,
    block_records: int = 4096,
) -> None:
    """Write an Avro Object Container File (inverse of :func:`read_avro`)."""
    buf = write_avro_bytes(schema, records, codec=codec, sync=sync,
                           block_records=block_records)
    with open(path, "wb") as f:
        f.write(buf)


def spark_schema_to_avro(schema, name: str = "topLevelRecord") -> dict:
    """Spark StructType → Avro writer-schema JSON (inverse of
    :func:`avro_to_spark_type`, same subset spark-avro maps): nullable
    field → ``["null", T]`` union, DecimalType → bytes logical decimal,
    DateType → int logical date, TimestampType → long timestamp-micros."""
    from pyspark.sql import types as T

    def field_type(dt, fname: str):
        if isinstance(dt, T.StructType):
            return spark_schema_to_avro(dt, name=f"{name}_{fname}")
        if isinstance(dt, T.ArrayType):
            inner = field_type(dt.elementType, fname)
            if dt.containsNull:
                inner = ["null", inner]
            return {"type": "array", "items": inner}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("avro: map keys must be strings")
            inner = field_type(dt.valueType, fname)
            if dt.valueContainsNull:
                inner = ["null", inner]
            return {"type": "map", "values": inner}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        prim = {
            T.BooleanType: "boolean",
            T.IntegerType: "int",
            T.ShortType: "int",
            T.ByteType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.BinaryType: "bytes",
            T.StringType: "string",
        }
        for cls, avro_t in prim.items():
            if isinstance(dt, cls):
                return avro_t
        raise ValueError(f"avro: unsupported Spark type {dt!r}")

    fields = []
    for f in schema.fields:
        ft = field_type(f.dataType, f.name)
        if f.nullable:
            ft = ["null", ft]
        fields.append({"name": f.name, "type": ft, "default": None}
                      if f.nullable else {"name": f.name, "type": ft})
    return {"type": "record", "name": name, "fields": fields}


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


def walk_logicals(record, schema, names: dict | None = None):
    """Superset of :func:`walk_decimals`: convert every logical-typed
    primitive in a decoded record to its Python-native form in place —
    bytes decimal → ``Decimal``, int date → ``datetime.date``, long
    timestamp-micros/millis → ``datetime.datetime`` (naive UTC, matching
    spark-avro under the session's UTC timezone policy)."""
    import datetime as _dt

    if names is None:
        names = {}
        _register_names(schema, names)

    def convert(value, s):
        if value is None:
            return None
        if isinstance(s, list):
            non_null = [x for x in s if x != "null"]
            return convert(value, non_null[0]) if len(non_null) == 1 else value
        if isinstance(s, str):
            if s in names:
                return convert(value, names[s])
            return value
        if not isinstance(s, dict):
            return value
        t = s["type"]
        logical = s.get("logicalType")
        if t == "bytes" and (logical == "decimal" or "scale" in s):
            if isinstance(value, bytes):
                return decode_decimal(value, int(s.get("scale", 0)))
            return value
        if t == "int" and logical == "date" and isinstance(value, int):
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=value)
        if t == "long" and logical in ("timestamp-micros", "timestamp-millis"):
            if isinstance(value, int):
                unit = 1_000_000 if logical == "timestamp-micros" else 1_000
                return _dt.datetime(1970, 1, 1) + _dt.timedelta(
                    seconds=value / unit
                )
            return value
        if t == "record" and isinstance(value, dict):
            for f in s["fields"]:
                value[f["name"]] = convert(value.get(f["name"]), f["type"])
            return value
        if t == "array" and isinstance(value, list):
            return [convert(v, s["items"]) for v in value]
        if t == "map" and isinstance(value, dict):
            return {k: convert(v, s["values"]) for k, v in value.items()}
        if isinstance(t, (dict, str)) and t not in _PRIMITIVES:
            return convert(value, t)
        return value

    return convert(record, schema)


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
            items = schema["items"]
            nullable = isinstance(items, list) and "null" in items
            return T.ArrayType(avro_to_spark_type(items, names), nullable)
        if t == "map":
            values = schema["values"]
            nullable = isinstance(values, list) and "null" in values
            return T.MapType(
                T.StringType(), avro_to_spark_type(values, names), nullable
            )
        if t == "bytes" and (schema.get("logicalType") == "decimal" or "scale" in schema):
            return T.DecimalType(
                int(schema.get("precision", 38)), int(schema.get("scale", 0))
            )
        if t == "int" and schema.get("logicalType") == "date":
            return T.DateType()
        if t == "long" and schema.get("logicalType") in (
            "timestamp-micros", "timestamp-millis",
        ):
            return T.TimestampType()
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
        walk_logicals(rec, schema)
    spark_schema = avro_to_spark_type(schema)
    return spark.createDataFrame(records, spark_schema)
