"""Minimal Avro Object Container File reader + writer, from the PUBLIC
Avro 1.11 specification — just enough surface for Apache Iceberg's
metadata files (manifest lists and manifests are Avro OCF). No avro
library ships in this environment, and Iceberg interop without Avro is
impossible, so the subset is hand-rolled from the spec:

- OCF framing: ``Obj\\x01`` magic, metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker, then blocks of
  (count, byte-size, data, sync). Codecs: ``null`` and ``deflate``
  (raw zlib, spec-mandated) — anything else refuses loudly.
- Binary encoding: zigzag-varint int/long, IEEE float/double,
  length-prefixed bytes/string, records in field order, arrays/maps in
  blocks (negative block count = byte-size-prefixed form), unions as
  (branch index, value), enum as index, fixed as raw bytes.
- Decoding is WRITER-SCHEMA-ONLY (no reader-schema resolution): the
  schema embedded in the file is the one decoded against, which is
  exactly how Iceberg consumers read their own metadata.

The writer half exists for TESTS (generating Iceberg fixtures without
an Iceberg writer) and mirrors the same subset. Logical types are
surfaced raw (the caller interprets field ids / timestamps), matching
Iceberg's use where field-ids ride schema metadata.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# --- decoding -------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.i = 0

    def read(self, n: int) -> bytes:
        out = self.b[self.i:self.i + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.i += n
        return out

    def zigzag(self) -> int:
        shift = acc = 0
        while True:
            byte = self.b[self.i]
            self.i += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _decode(r: _Reader, schema):
    if isinstance(schema, list):  # union: branch index then value
        return _decode(r, schema[r.zigzag()])
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.zigzag()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.zigzag())
    if t == "string":
        return r.read(r.zigzag()).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(r, f["type"])
                for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.zigzag()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.zigzag()
            if n == 0:
                return out
            if n < 0:
                r.zigzag()  # block byte size: sequential decode skips
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.zigzag()
            if n == 0:
                return out
            if n < 0:
                r.zigzag()
                n = -n
            for _ in range(n):
                k = r.read(r.zigzag()).decode("utf-8")
                out[k] = _decode(r, schema["values"])
    raise NotImplementedError(f"avro type {t!r} not in the subset")


def read_ocf(path: str) -> tuple[dict, list]:
    """(schema, records) of an Avro Object Container File."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != _MAGIC:
        raise ValueError(f"{path} is not an Avro OCF (bad magic)")
    r = _Reader(raw)
    r.i = 4
    meta = _decode(r, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro codec {codec!r} unsupported (null/deflate only)")
    sync = r.read(16)
    records: list = []
    while r.i < len(raw):
        count = r.zigzag()
        size = r.zigzag()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema))
    return schema, records


# --- encoding (test-fixture writer) ----------------------------------------


def _zz(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1 | 1
    # python ints: encode zigzag directly
    u = v
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _encode(out: bytearray, schema, val) -> None:
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, br in enumerate(schema):
            if _matches(br, val):
                _zz(out, i)
                return _encode(out, br, val)
        raise ValueError(f"no union branch for {val!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if val else 0)
    elif t in ("int", "long"):
        _zz(out, int(val))
    elif t == "float":
        out += struct.pack("<f", val)
    elif t == "double":
        out += struct.pack("<d", val)
    elif t == "bytes":
        _zz(out, len(val))
        out += val
    elif t == "string":
        b = val.encode("utf-8")
        _zz(out, len(b))
        out += b
    elif t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], val[f["name"]])
    elif t == "fixed":
        assert len(val) == schema["size"]
        out += val
    elif t == "array":
        if val:
            _zz(out, len(val))
            for v in val:
                _encode(out, schema["items"], v)
        _zz(out, 0)
    elif t == "map":
        if val:
            _zz(out, len(val))
            for k, v in val.items():
                kb = k.encode("utf-8")
                _zz(out, len(kb))
                out += kb
                _encode(out, schema["values"], v)
        _zz(out, 0)
    else:
        raise NotImplementedError(f"avro encode type {t!r}")


def _matches(branch, val) -> bool:
    t = branch if isinstance(branch, str) else branch["type"]
    if t == "null":
        return val is None
    if val is None:
        return False
    if t in ("int", "long"):
        return isinstance(val, int) and not isinstance(val, bool)
    if t in ("float", "double"):
        return isinstance(val, float)
    if t == "boolean":
        return isinstance(val, bool)
    if t == "string":
        return isinstance(val, str)
    if t in ("bytes", "fixed"):
        return isinstance(val, (bytes, bytearray))
    if t == "record":
        return isinstance(val, dict)
    if t == "array":
        return isinstance(val, list)
    if t == "map":
        return isinstance(val, dict)
    return False


def write_ocf(path: str, schema: dict, records: list,
              codec: str = "deflate") -> None:
    """Write an Avro OCF (test-fixture half; one block)."""
    body = bytearray()
    for rec in records:
        _encode(body, schema, rec)
    data = bytes(body)
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = c.compress(data) + c.flush()
    elif codec != "null":
        raise NotImplementedError(codec)
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = bytearray()
    entries = {"avro.schema": json.dumps(schema).encode("utf-8"),
               "avro.codec": codec.encode("utf-8")}
    _zz(meta, len(entries))
    for k, v in entries.items():
        kb = k.encode("utf-8")
        _zz(meta, len(kb))
        meta += kb
        _zz(meta, len(v))
        meta += v
    _zz(meta, 0)
    out.write(bytes(meta))
    out.write(sync)
    blk = bytearray()
    _zz(blk, len(records))
    _zz(blk, len(data))
    out.write(bytes(blk))
    out.write(data)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
