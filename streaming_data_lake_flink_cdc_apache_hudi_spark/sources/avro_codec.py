"""Generic Apache Avro object-container codec — stdlib only.

Exists for one reason: Apache Iceberg's metadata tree (manifest lists
and manifests) is stored as Avro container files, and this runtime
ships no avro library. The format is fully public
(https://avro.apache.org/docs/current/specification/), small, and
self-describing — every container file embeds the writer's schema as
JSON — so a generic reader/writer is ~200 lines of varint arithmetic:

- container layout: magic ``Obj\\x01``, a file-metadata map holding
  ``avro.schema`` (JSON) and ``avro.codec``, a 16-byte sync marker,
  then blocks of ``(row count, byte size, payload, sync)``;
- binary encoding: zigzag varints for int/long, little-endian IEEE
  float/double, length-prefixed bytes/strings, records as their
  fields in schema order, arrays/maps as counted blocks terminated by
  0, unions as a branch index + value, fixed as raw bytes;
- codecs: ``null`` and ``deflate`` (raw zlib) — what Iceberg writes.

Decoding is schema-driven off the EMBEDDED schema, so this reads any
writer's file without pre-knowledge; writing takes an explicit schema
dict. Everything happens driver-side on METADATA files (KBs) — data
files are parquet and go through Spark's reader as usual.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


# -- primitive binary encoding ---------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise AvroError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise AvroError("truncated bytes")
    return data


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out.extend(b)


# -- schema-driven decode ---------------------------------------------------


def _decode(schema, buf: io.BytesIO, named: dict):
    if isinstance(schema, str):
        schema = named.get(schema, schema)
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise AvroError(f"union branch {idx} out of range")
        return _decode(schema[idx], buf, named)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            named[schema["name"]] = schema
            return {
                f["name"]: _decode(f["type"], buf, named)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:  # block with byte size
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    out.append(_decode(schema["items"], buf, named))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf, named)
            return out
        if t == "enum":
            named[schema["name"]] = schema
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            named[schema["name"]] = schema
            return buf.read(schema["size"])
        return _decode(t, buf, named)  # {"type": "long"} etc.
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise AvroError(f"unsupported schema {schema!r}")


def _encode(schema, value, out: bytearray, named: dict) -> None:
    if isinstance(schema, str):
        schema = named.get(schema, schema)
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value, named):
                _write_long(out, i)
                _encode(branch, value, out, named)
                return
        raise AvroError(f"no union branch for {value!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            named[schema["name"]] = schema
            for f in schema["fields"]:
                _encode(f["type"], value[f["name"]], out, named)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for v in value:
                    _encode(schema["items"], v, out, named)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    _write_bytes(out, k.encode("utf-8"))
                    _encode(schema["values"], v, out, named)
            _write_long(out, 0)
            return
        if t == "enum":
            named[schema["name"]] = schema
            _write_long(out, schema["symbols"].index(value))
            return
        if t == "fixed":
            named[schema["name"]] = schema
            out.extend(value)
            return
        _encode(t, value, out, named)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, value)
        return
    if schema == "float":
        out.extend(struct.pack("<f", float(value)))
        return
    if schema == "double":
        out.extend(struct.pack("<d", float(value)))
        return
    if schema == "bytes":
        _write_bytes(out, bytes(value))
        return
    if schema == "string":
        _write_bytes(out, value.encode("utf-8"))
        return
    raise AvroError(f"unsupported schema {schema!r}")


def _matches(schema, value, named) -> bool:
    if isinstance(schema, str):
        schema = named.get(schema, schema)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return isinstance(value, dict)
        if t == "array":
            return isinstance(value, list)
        if t == "map":
            return isinstance(value, dict)
        if t in ("enum",):
            return isinstance(value, str)
        if t == "fixed":
            return isinstance(value, (bytes, bytearray))
        return _matches(t, value, named)
    return {
        "null": value is None,
        "boolean": isinstance(value, bool),
        "int": isinstance(value, int) and not isinstance(value, bool),
        "long": isinstance(value, int) and not isinstance(value, bool),
        # Avro permits int values against float/double branches (spec
        # §schema-resolution promotion) — coerce, don't reject
        "float": isinstance(value, (float, int)) and not isinstance(value, bool),
        "double": isinstance(value, (float, int)) and not isinstance(value, bool),
        "bytes": isinstance(value, (bytes, bytearray)),
        "string": isinstance(value, str),
    }.get(schema, False)


# -- container files --------------------------------------------------------


def read_avro(path: str) -> tuple[dict, list]:
    """Read an Avro container file -> (embedded schema, list of
    records as Python values)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise AvroError(f"{path}: not an Avro container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported avro codec {codec!r}")
    sync = buf.read(16)
    records = []
    while buf.tell() < len(raw):
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate
        bbuf = io.BytesIO(block)
        named: dict = {}
        for _ in range(n):
            records.append(_decode(schema, bbuf, named))
        if buf.read(16) != sync:
            raise AvroError("sync marker mismatch")
    return schema, records


def write_avro(
    path: str,
    schema: dict,
    records: list,
    codec: str = "deflate",
    metadata: dict[str, bytes] | None = None,
) -> None:
    """Write records as one Avro container file (one block)."""
    body = bytearray()
    named: dict = {}
    for r in records:
        _encode(schema, r, body, named)
    payload = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise AvroError(f"unsupported avro codec {codec!r}")
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
        **(metadata or {}),
    }
    sync = bytes(
        (i * 37 + 11) & 0xFF for i in range(16)
    )  # deterministic marker
    out = bytearray()
    out.extend(MAGIC)
    _encode({"type": "map", "values": "bytes"}, meta, out, {})
    out.extend(sync)
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def _register_named(schema, named: dict) -> None:
    """Pre-register every named type in a schema tree. The walkers
    register names LAZILY as they encode/decode, which misses a named
    REFERENCE whose definition sits in a union branch that never got
    taken (e.g. Debezium's ``before: ["null", Value]`` when before is
    null but ``after: ["null", "Value"]`` is set) — datum-level entry
    points register upfront instead."""
    if isinstance(schema, list):
        for b in schema:
            _register_named(b, named)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            named[schema["name"]] = schema
            for f in schema["fields"]:
                _register_named(f["type"], named)
        elif t in ("enum", "fixed"):
            named[schema["name"]] = schema
        elif t == "array":
            _register_named(schema["items"], named)
        elif t == "map":
            _register_named(schema["values"], named)
        elif isinstance(t, (dict, list)):
            _register_named(t, named)


def decode_datum(schema: dict, data: bytes):
    """One RAW Avro datum (no container framing) — e.g. the body of a
    Confluent-wire-format Kafka record (new r12, the decode side of
    the `debezium-avro-confluent` CDC format)."""
    named: dict = {}
    _register_named(schema, named)
    buf = io.BytesIO(data)
    return _decode(schema, buf, named)


def encode_datum(schema: dict, value) -> bytes:
    """One RAW Avro datum (no container framing) — the encode twin of
    :func:`decode_datum`, used by tests/fixtures to build Confluent-
    framed change events."""
    named: dict = {}
    _register_named(schema, named)
    out = bytearray()
    _encode(schema, value, out, named)
    return bytes(out)
