"""From-scratch Apache Avro object-container-file codec — no jars, no
third-party avro package.

Why this exists: the Iceberg table spec stores its manifest lists and
manifest files as Avro (per the Apache Iceberg Table Spec), and this
container has neither the Iceberg runtime jars nor spark-avro nor a Python
avro package. The Avro 1.x binary encoding and container format are a
public, small spec (the Apache Avro 1.x specification),
so this module implements the subset Iceberg metadata needs:

- primitives: null, boolean, int, long (zigzag varint), float, double,
  bytes, string;
- complex: record, enum-free unions of the ``["null", T]`` shape (any
  union actually — encoded as branch index + value), array, map, fixed;
- object container files: magic ``Obj\\x01``, file metadata map
  (``avro.schema``/``avro.codec``), 16-byte sync marker, data blocks of
  (count, byte-length, payload, sync) with the ``null`` codec, and
  ``deflate`` on read.

Scale posture: Avro here carries TABLE METADATA (kilobytes per commit),
never data — data stays parquet and is scanned distributed. Encoding and
decoding happen driver-side exactly as in the Iceberg library itself.

Encoding rules implemented (spec §"Binary encoding"):
- int/long: zigzag then base-128 varint, little-endian groups;
- float/double: IEEE little-endian 4/8 bytes;
- bytes/string: long(length) + raw bytes (UTF-8 for string);
- record: field values in schema order, no tags;
- union: long(branch index) + encoded value;
- array/map: blocks — long(count) items, terminated by count 0; negative
  counts (block-size form) are handled on read;
- fixed: raw bytes, no length.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ----------------------------------------------------------------- encode


def _write_long(buf: io.BytesIO, n: int) -> None:
    # zigzag: non-negative for any 64-bit signed input
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _encode(buf: io.BytesIO, schema, value) -> None:
    """Encode ``value`` per ``schema`` (parsed JSON avro schema)."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            buf.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            _write_long(buf, int(value))
        elif t == "float":
            buf.write(struct.pack("<f", float(value)))
        elif t == "double":
            buf.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            _write_bytes(buf, bytes(value))
        elif t == "string":
            _write_bytes(buf, value.encode("utf-8"))
        else:
            raise ValueError(f"unsupported primitive {t!r}")
        return
    if isinstance(schema, list):  # union: index + value
        idx = _union_branch(schema, value)
        _write_long(buf, idx)
        _encode(buf, schema[idx], value)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            try:
                _encode(buf, f["type"], value[f["name"]])
            except Exception as exc:
                raise ValueError(
                    f"field {f['name']!r} of record {schema.get('name')}: {exc}"
                ) from exc
    elif t == "array":
        items = list(value)
        if items:
            _write_long(buf, len(items))
            for it in items:
                _encode(buf, schema["items"], it)
        _write_long(buf, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, k.encode("utf-8"))
                _encode(buf, schema["values"], v)
        _write_long(buf, 0)
    elif t == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(data)} != {schema['size']}")
        buf.write(data)
    elif t in ("int", "long", "string", "bytes", "boolean", "float", "double", "null"):
        _encode(buf, t, value)  # {"type": "long", "logicalType": ...}
    else:
        raise ValueError(f"unsupported schema type {t!r}")


def _union_branch(union: list, value) -> int:
    """Pick the union branch for a Python value (null vs the other)."""
    for i, s in enumerate(union):
        if (s == "null" or (isinstance(s, dict) and s.get("type") == "null")):
            if value is None:
                return i
        elif value is not None:
            return i
    raise ValueError(f"no union branch for {value!r} in {union}")


# ----------------------------------------------------------------- decode


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decode(r: _Reader, schema):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.read_long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read_bytes()
        if t == "string":
            return r.read_bytes().decode("utf-8")
        raise ValueError(f"unsupported primitive {t!r}")
    if isinstance(schema, list):
        return _decode(r, schema[r.read_long()])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block-size form: length prefix follows
                r.read_long()
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(r, schema["values"])
    if t == "fixed":
        return r.read(schema["size"])
    if t in ("int", "long", "string", "bytes", "boolean", "float", "double", "null"):
        return _decode(r, t)
    raise ValueError(f"unsupported schema type {t!r}")


# -------------------------------------------------- object container file

_SYNC = bytes(range(16))  # fixed sync marker: deterministic outputs


def write_container(path: str, schema: dict, records: list[dict]) -> None:
    """Write an Avro object container file (``null`` codec, single data
    block) — metadata map carries the full writer schema, as every Avro
    reader requires."""
    payload = io.BytesIO()
    for rec in records:
        _encode(payload, schema, rec)
    body = payload.getvalue()

    buf = io.BytesIO()
    buf.write(_MAGIC)
    meta_schema = {"type": "map", "values": "bytes"}
    _encode(
        buf,
        meta_schema,
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"null",
        },
    )
    buf.write(_SYNC)
    if records:
        _write_long(buf, len(records))
        _write_bytes(buf, body)
        buf.write(_SYNC)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def read_container(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object container file → (writer schema, records).
    Supports the ``null`` and ``deflate`` codecs."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise ValueError(f"not an avro container file: {path}")
    r = _Reader(data)
    r.pos = 4
    meta = _decode(r, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(data):
        n = r.read_long()
        block = r.read_bytes()
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _Reader(block)
        for _ in range(n):
            records.append(_decode(br, schema))
        if r.read(16) != sync:
            raise ValueError("avro block sync marker mismatch")
    return schema, records
