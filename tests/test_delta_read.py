"""Read-only Delta-log interop (r12 stretch): log replay, time
travel, checkpoint fast-path, partition-value restoration, and the
loud protocol refusal — against a locally GENERATED fixture that
follows the public Delta protocol action format (no delta-spark in
this environment; the fixture writer below mirrors the published
spec, disclosed in sources/delta_read.py's docstring)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from silvia_spark.sources.delta_read import read_delta

SCHEMA_STR = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {}},
        {"name": "p", "type": "string", "nullable": True,
         "metadata": {}},
    ],
})


def _data_file(root, rel, ks):
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"k": pa.array(ks, type=pa.int64()),
                             "v": pa.array([float(k) for k in ks])}),
                   path)
    return rel


def _commit(root, v, actions):
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _add(rel, pv):
    return {"add": {"path": rel, "partitionValues": pv, "size": 1,
                    "modificationTime": 0, "dataChange": True}}


def _fixture(tmp_path):
    root = os.path.join(str(tmp_path), "dtbl")
    a0 = _data_file(root, "p=a/part-0.parquet", [1, 2, 3])
    b0 = _data_file(root, "p=b/part-0.parquet", [6, 7])
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "fixture", "schemaString": SCHEMA_STR,
                      "partitionColumns": ["p"],
                      "format": {"provider": "parquet"},
                      "configuration": {}}},
        _add(a0, {"p": "a"}), _add(b0, {"p": "b"}),
    ])
    a1 = _data_file(root, "p=a/part-1.parquet", [1, 2, 3, 4])
    n0 = _data_file(root, "nullpart/part-0.parquet", [99])
    _commit(root, 1, [
        {"remove": {"path": a0, "deletionTimestamp": 1,
                    "dataChange": True}},
        _add(a1, {"p": "a"}), _add(n0, {"p": None}),
    ])
    return root, (a0, b0, a1, n0)


def _rows(df):
    return sorted((r["k"], r["v"], r["p"]) for r in df.collect())


def test_replay_time_travel_and_partition_restoration(spark, tmp_path):
    root, _ = _fixture(tmp_path)
    v0 = read_delta(spark, root, version=0)
    assert v0.columns == ["k", "v", "p"]
    assert _rows(v0) == [(1, 1.0, "a"), (2, 2.0, "a"), (3, 3.0, "a"),
                         (6, 6.0, "b"), (7, 7.0, "b")]
    head = read_delta(spark, root)
    assert _rows(head) == [(1, 1.0, "a"), (2, 2.0, "a"), (3, 3.0, "a"),
                           (4, 4.0, "a"), (6, 6.0, "b"), (7, 7.0, "b"),
                           (99, 99.0, None)]


def test_checkpoint_fast_path(spark, tmp_path):
    root, (a0, b0, a1, n0) = _fixture(tmp_path)
    log = os.path.join(root, "_delta_log")
    # roll a single-file checkpoint at version 1 (accumulated state)
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None, "remove": None},
        {"protocol": None, "add": None, "remove": None,
         "metaData": {"id": "fixture", "schemaString": SCHEMA_STR,
                      "partitionColumns": ["p"],
                      "format": {"provider": "parquet"},
                      # pyarrow cannot write an EMPTY struct column:
                      # real checkpoints carry table configuration here
                      "configuration": {"appendOnly": "false"}}},
        {"protocol": None, "metaData": None, "remove": None,
         "add": {"path": b0, "partitionValues": {"p": "b"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"protocol": None, "metaData": None, "remove": None,
         "add": {"path": a1, "partitionValues": {"p": "a"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"protocol": None, "metaData": None, "remove": None,
         "add": {"path": n0, "partitionValues": {"p": None},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    c0 = _data_file(root, "p=c/part-0.parquet", [50])
    _commit(root, 2, [_add(c0, {"p": "c"})])
    # retention expired the pre-checkpoint commits: replay must ride
    # the checkpoint + the delta commit only
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    got = read_delta(spark, root)
    assert _rows(got) == [(1, 1.0, "a"), (2, 2.0, "a"), (3, 3.0, "a"),
                          (4, 4.0, "a"), (6, 6.0, "b"), (7, 7.0, "b"),
                          (50, 50.0, "c"), (99, 99.0, None)]


def test_unsupported_reader_features_refuse(spark, tmp_path):
    root, _ = _fixture(tmp_path)
    _commit(root, 2, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
    ])
    with pytest.raises(NotImplementedError, match="deletionVectors"):
        read_delta(spark, root)
    # older versions stay readable
    assert read_delta(spark, root, version=1).count() == 7


def test_missing_log_and_bad_version(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_delta(spark, os.path.join(str(tmp_path), "nope"))
    root, _ = _fixture(tmp_path)
    with pytest.raises(ValueError, match="exceeds head"):
        read_delta(spark, root, version=9)


def test_legacy_column_mapping_refuses_not_nulls(spark, tmp_path):
    """r13 (ADVICE 1): column mapping at minReaderVersion=2 ships with
    NO readerFeatures list — the protocol gate alone passes it, and a
    plain schema read of physical col-<uuid> parquet names would
    return all-NULL columns. The metaData configuration gate must
    refuse loudly instead."""
    root, _ = _fixture(tmp_path)
    _commit(root, 2, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "fixture", "schemaString": SCHEMA_STR,
                      "partitionColumns": ["p"],
                      "format": {"provider": "parquet"},
                      "configuration": {
                          "delta.columnMapping.mode": "name"}}},
    ])
    with pytest.raises(NotImplementedError, match="column mapping"):
        read_delta(spark, root)
    assert read_delta(spark, root, version=1).count() == 7


def test_legacy_dv_enablement_refuses(spark, tmp_path):
    root, _ = _fixture(tmp_path)
    _commit(root, 2, [
        {"metaData": {"id": "fixture", "schemaString": SCHEMA_STR,
                      "partitionColumns": ["p"],
                      "format": {"provider": "parquet"},
                      "configuration": {
                          "delta.enableDeletionVectors": "true"}}},
    ])
    with pytest.raises(NotImplementedError, match="eletion vector"):
        read_delta(spark, root)
