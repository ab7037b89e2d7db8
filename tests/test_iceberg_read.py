"""Read-only Iceberg interop (r13 stretch — r12 verdict #9): metadata
JSON → manifest-list Avro → manifest Avro → parquet snapshot reads,
v1 and v2, snapshot time travel, and the loud refusals — against a
locally generated fixture following the public Iceberg table spec
(no iceberg/avro library here: Avro OCF framing is the hand-rolled
subset in sources/avro_min.py, spec-pinned by its own roundtrip and
container tests)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from silvia_spark.sources.avro_min import write_ocf
from silvia_spark.sources.iceberg_read import read_iceberg

ICE_SCHEMA = {
    "type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"},
        {"id": 3, "name": "p", "required": False, "type": "string"},
    ]}

_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"}]}}]}

_MLIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"}]}


def _data_file(root, rel, ks, p):
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({
        "k": pa.array(ks, pa.int64()),
        "v": pa.array([float(x) for x in ks], pa.float64()),
        "p": pa.array([p] * len(ks))}), path)
    return path


def _entry(path, status=1, content=0, fmt="PARQUET", rows=1):
    return {"status": status, "snapshot_id": 1,
            "data_file": {"content": content, "file_path": path,
                          "file_format": fmt, "record_count": rows,
                          "file_size_in_bytes": 1}}


def _manifest(root, name, entries):
    p = os.path.join(root, "metadata", name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    write_ocf(p, _ENTRY_SCHEMA, entries)
    return p


def _mlist(root, name, manifest_paths, content=0):
    p = os.path.join(root, "metadata", name)
    write_ocf(p, _MLIST_SCHEMA, [
        {"manifest_path": mp, "manifest_length": 1,
         "partition_spec_id": 0,
         "content": c if isinstance(c, int) else 0,
         "added_snapshot_id": 1}
        for mp, c in manifest_paths])
    return p


def _metadata(root, snapshots, current, fv=2, vn=1, schema=None):
    schema = ICE_SCHEMA if schema is None else schema
    meta = {"format-version": fv, "table-uuid": "t", "location": root,
            "schemas": [schema], "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "current-snapshot-id": current, "snapshots": snapshots}
    if fv == 1:
        meta = {**meta, "schema": schema}
        del meta["schemas"], meta["current-schema-id"]
    mp = os.path.join(root, "metadata", f"v{vn}.metadata.json")
    with open(mp, "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"),
              "w") as f:
        f.write(str(vn))


def _rows(df):
    return sorted((r["k"], r["v"], r["p"]) for r in df.collect())


def test_v2_snapshots_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "ice")
    fa = _data_file(root, "data/a.parquet", [1, 2], "a")
    fb = _data_file(root, "data/b.parquet", [5], "b")
    fc = _data_file(root, "data/c.parquet", [9], "c")
    m1 = _manifest(root, "m1.avro",
                   [_entry(fa), _entry(fb)])
    ml1 = _mlist(root, "snap-1.avro", [(m1, 0)])
    # snapshot 2: A carried (existing), B deleted, C added
    m2 = _manifest(root, "m2.avro",
                   [_entry(fa, status=0), _entry(fb, status=2),
                    _entry(fc, status=1)])
    ml2 = _mlist(root, "snap-2.avro", [(m2, 0)])
    _metadata(root, [
        {"snapshot-id": 1, "manifest-list": ml1},
        {"snapshot-id": 2, "manifest-list": ml2}], current=2)
    got = read_iceberg(spark, root)
    assert _rows(got) == [(1, 1.0, "a"), (2, 2.0, "a"), (9, 9.0, "c")]
    old = read_iceberg(spark, root, snapshot_id=1)
    assert _rows(old) == [(1, 1.0, "a"), (2, 2.0, "a"), (5, 5.0, "b")]
    with pytest.raises(ValueError, match="snapshot 99"):
        read_iceberg(spark, root, snapshot_id=99)


def test_v1_inline_manifests(spark, tmp_path):
    root = str(tmp_path / "ice1")
    fa = _data_file(root, "data/a.parquet", [1], "a")
    m1 = _manifest(root, "m1.avro", [_entry(fa)])
    _metadata(root, [{"snapshot-id": 1, "manifests": [m1]}],
              current=1, fv=1)
    assert _rows(read_iceberg(spark, root)) == [(1, 1.0, "a")]


def _pos_delete_file(root, rel, targets):
    """Spec-shaped position-delete parquet: (file_path, pos) rows."""
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({
        "file_path": pa.array([t[0] for t in targets], pa.string()),
        "pos": pa.array([t[1] for t in targets], pa.int64())}), path)
    return path


def test_position_deletes_mask_rows(spark, tmp_path):
    """r14 (r13 verdict #3): a v2 snapshot carrying POSITION deletes
    reads with exactly the tombstoned (file, pos) rows removed —
    including tombstones for files not in the snapshot (inert) —
    while EQUALITY deletes still refuse loudly."""
    root = str(tmp_path / "icepd")
    fa = _data_file(root, "data/a.parquet", [1, 2, 3], "a")
    fb = _data_file(root, "data/b.parquet", [5, 6], "b")
    m1 = _manifest(root, "m1.avro", [_entry(fa, rows=3),
                                     _entry(fb, rows=2)])
    # drop a.parquet positions 0 and 2 (k=1, k=3), b position 1 (k=6),
    # plus an inert tombstone for a file that left the snapshot
    dl = _pos_delete_file(root, "data/del-1.parquet",
                          [(fa, 0), (fa, 2), (fb, 1),
                           (os.path.join(root, "data/gone.parquet"),
                            0)])
    md = _manifest(root, "md.avro", [_entry(dl, content=1)])
    ml = _mlist(root, "snap-1.avro", [(m1, 0), (md, 1)])
    _metadata(root, [{"snapshot-id": 1, "manifest-list": ml}],
              current=1)
    assert _rows(read_iceberg(spark, root)) == [(2, 2.0, "a"),
                                                (5, 5.0, "b")]
    # an expired (status=2) delete entry is inert metadata
    md2 = _manifest(root, "md2.avro",
                    [_entry(dl, content=1, status=2)])
    ml2 = _mlist(root, "snap-2.avro", [(m1, 0), (md2, 1)])
    _metadata(root, [{"snapshot-id": 1, "manifest-list": ml},
                     {"snapshot-id": 2, "manifest-list": ml2}],
              current=2, vn=2)
    assert len(_rows(read_iceberg(spark, root))) == 5


def test_equality_deletes_refuse_loudly(spark, tmp_path):
    root = str(tmp_path / "iced")
    fa = _data_file(root, "data/a.parquet", [1], "a")
    dele = _data_file(root, "data/del.parquet", [1], "a")
    m1 = _manifest(root, "m1.avro", [_entry(fa)])
    md = _manifest(root, "md.avro", [_entry(dele, content=2)])
    ml = _mlist(root, "snap-1.avro", [(m1, 0), (md, 1)])
    _metadata(root, [{"snapshot-id": 1, "manifest-list": ml}],
              current=1)
    with pytest.raises(NotImplementedError, match="EQUALITY"):
        read_iceberg(spark, root)


def test_list_column_schema_and_read(spark, tmp_path):
    """r13 ADVICE (medium): list types collapsed to the bare string
    "array" in _spark_schema → CANNOT_PARSE_DATATYPE. List columns —
    top-level, struct-nested, and list-of-list — must convert and an
    end-to-end read with a list column must round-trip values."""
    from silvia_spark.sources.iceberg_read import _spark_schema

    sch = _spark_schema({"type": "struct", "fields": [
        {"id": 1, "name": "k", "required": True, "type": "long"},
        {"id": 2, "name": "tags", "required": False, "type": {
            "type": "list", "element-id": 3, "element": "string",
            "element-required": False}},
        {"id": 4, "name": "s", "required": False, "type": {
            "type": "struct", "fields": [
                {"id": 5, "name": "xs", "required": False, "type": {
                    "type": "list", "element-id": 6,
                    "element": "long",
                    "element-required": True}}]}},
        {"id": 7, "name": "ll", "required": False, "type": {
            "type": "list", "element-id": 8,
            "element": {"type": "list", "element-id": 9,
                        "element": "double",
                        "element-required": False},
            "element-required": False}},
    ]})
    assert sch["tags"].dataType.simpleString() == "array<string>"
    assert (sch["s"].dataType["xs"].dataType.simpleString()
            == "array<bigint>")
    assert sch["ll"].dataType.simpleString() == "array<array<double>>"

    root = str(tmp_path / "icel")
    path = os.path.join(root, "data", "a.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "tags": pa.array([["x", "y"], []],
                         pa.list_(pa.string()))}), path)
    m1 = _manifest(root, "m1.avro", [_entry(path, rows=2)])
    ml = _mlist(root, "snap-1.avro", [(m1, 0)])
    _metadata(root, [{"snapshot-id": 1, "manifest-list": ml}],
              current=1, schema={
                  "type": "struct", "schema-id": 0, "fields": [
                      {"id": 1, "name": "k", "required": False,
                       "type": "long"},
                      {"id": 2, "name": "tags", "required": False,
                       "type": {"type": "list", "element-id": 3,
                                "element": "string",
                                "element-required": False}}]})
    got = sorted((r["k"], r["tags"])
                 for r in read_iceberg(spark, root).collect())
    assert got == [(1, ["x", "y"]), (2, [])]


def test_format_refusals(spark, tmp_path):
    root = str(tmp_path / "icef")
    fa = _data_file(root, "data/a.parquet", [1], "a")
    m1 = _manifest(root, "m1.avro", [_entry(fa, fmt="ORC")])
    ml = _mlist(root, "snap-1.avro", [(m1, 0)])
    _metadata(root, [{"snapshot-id": 1, "manifest-list": ml}],
              current=1)
    with pytest.raises(NotImplementedError, match="ORC"):
        read_iceberg(spark, root)
    _metadata(root, [{"snapshot-id": 1, "manifest-list": ml}],
              current=1, fv=3, vn=2)
    with pytest.raises(NotImplementedError, match="format-version=3"):
        read_iceberg(spark, root)
