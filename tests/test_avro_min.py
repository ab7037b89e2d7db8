"""Hand-rolled Avro OCF subset (sources/avro_min.py, r13): roundtrip
across the type surface Iceberg metadata uses, container framing, and
the loud refusals. No Spark session needed."""

from __future__ import annotations

import os

import pytest

from silvia_spark.sources.avro_min import read_ocf, write_ocf

SCHEMA = {"type": "record", "name": "r", "fields": [
    {"name": "a", "type": "long"},
    {"name": "b", "type": ["null", "string"]},
    {"name": "c", "type": {"type": "array", "items": "int"}},
    {"name": "d", "type": {"type": "map", "values": "double"}},
    {"name": "e", "type": ["null", {
        "type": "record", "name": "sub", "fields": [
            {"name": "x", "type": "boolean"},
            {"name": "y", "type": "bytes"}]}]},
    {"name": "f", "type": "double"},
    {"name": "g", "type": "float"},
]}

RECS = [
    {"a": -12345678901234, "b": None, "c": [1, -2, 3],
     "d": {"k": 1.5}, "e": {"x": True, "y": b"\x00\x01"}, "f": -0.25,
     "g": 2.0},
    {"a": 0, "b": "héllo", "c": [], "d": {}, "e": None,
     "f": 1e300, "g": -0.5},
    {"a": 2 ** 62, "b": "", "c": [0], "d": {"": 0.0}, "e": None,
     "f": 0.0, "g": 0.0},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(tmp_path, codec):
    p = os.path.join(str(tmp_path), "t.avro")
    write_ocf(p, SCHEMA, RECS, codec=codec)
    schema, got = read_ocf(p)
    assert schema == SCHEMA and got == RECS


def test_zigzag_edges(tmp_path):
    s = {"type": "record", "name": "z", "fields": [
        {"name": "v", "type": "long"}]}
    vals = [0, -1, 1, -2, 63, 64, -64, -65, 2 ** 31, -(2 ** 31),
            2 ** 62 - 1, -(2 ** 62)]
    p = os.path.join(str(tmp_path), "z.avro")
    write_ocf(p, s, [{"v": v} for v in vals])
    _, got = read_ocf(p)
    assert [r["v"] for r in got] == vals


def test_refusals(tmp_path):
    p = os.path.join(str(tmp_path), "bad.avro")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        read_ocf(p)
    with pytest.raises(NotImplementedError):
        write_ocf(os.path.join(str(tmp_path), "c.avro"), SCHEMA,
                  RECS, codec="snappy")
    with pytest.raises(ValueError, match="union"):
        write_ocf(os.path.join(str(tmp_path), "u.avro"),
                  {"type": "record", "name": "r", "fields": [
                      {"name": "b", "type": ["null", "string"]}]},
                  [{"b": 3.14}])


def test_sync_marker_guard(tmp_path):
    p = os.path.join(str(tmp_path), "t.avro")
    write_ocf(p, SCHEMA, RECS, codec="null")
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # corrupt the trailing sync
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync"):
        read_ocf(p)
