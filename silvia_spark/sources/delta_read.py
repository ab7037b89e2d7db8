"""Read-only interop with the PUBLIC Delta Lake transaction-log format
(r12 stretch, verdict item 9): reconstruct a Delta table's file list
from its ``_delta_log`` and read it as a plain DataFrame — the first
thing a real adopter asks of a new engine ("can it read the tables I
already have?").

Implemented strictly from the published protocol (the Delta PROTOCOL.md
action format is an open spec; no delta-spark dependency, no code from
any Delta implementation):

- commits are ``_delta_log/%020d.json`` files of newline-delimited
  actions; ``add``/``remove`` actions accumulate the file list,
  the latest ``metaData`` wins (schemaString = Spark StructType JSON,
  partitionColumns), ``protocol`` gates readability;
- ``_last_checkpoint`` (+ ``%020d.checkpoint.parquet``) snapshots the
  accumulated state so reconstruction is checkpoint + O(delta commits),
  exactly the shape this repo's own manifest layer uses;
- partition values ride the ``add`` action's ``partitionValues`` map
  (authoritative — the directory layout is NOT), serialized as strings
  per the protocol's partition-value rules; they are restored by
  grouping adds on their partition tuple and casting the literals
  through the table schema (one JVM-native parquet scan per partition
  group, union by name — no Python row path).

Scope (loud refusals, never silent wrong reads): protocol
``minReaderVersion`` ≤ 2; reader table features such as deletion
vectors or column mapping raise NotImplementedError. Time travel via
``version=`` replays the log to that version.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from silvia_spark.io import local_path

_LOG = "_delta_log"


def _log_versions(log_dir: str) -> tuple[list[int], list[int]]:
    """(json commit versions, single-file checkpoint versions)."""
    commits, ckpts = [], []
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[:20].isdigit():
            commits.append(int(f[:20]))
        elif f.endswith(".checkpoint.parquet") and f[:20].isdigit():
            ckpts.append(int(f[:20]))
    return sorted(commits), sorted(ckpts)


def _check_protocol(proto: dict | None) -> None:
    if proto is None:
        return
    mrv = int(proto.get("minReaderVersion", 1))
    feats = set(proto.get("readerFeatures") or ())
    unsupported = feats - {"timestampNtz", "v2Checkpoint"}
    if mrv > 2 and unsupported:
        raise NotImplementedError(
            f"Delta reader features {sorted(unsupported)} are not "
            "supported by this read-only interop (deletion vectors / "
            "column mapping need a native Delta reader)")
    if mrv > 3:
        raise NotImplementedError(
            f"Delta minReaderVersion={mrv} is newer than this "
            "interop understands")


def _check_table_config(meta: dict) -> None:
    """Refuse LEGACY-protocol feature enablement that readerFeatures
    never names: column mapping ships at minReaderVersion=2 with no
    feature list, so a protocol-only gate passes a table whose parquet
    columns are physical ``col-<uuid>`` names — read with the logical
    schema that is an all-NULL silent wrong read, the exact failure
    this module's contract forbids. Checked AFTER replay on the
    winning metaData's configuration (the authoritative source per
    the protocol), belt-and-braces for DVs too."""
    conf = meta.get("configuration") or {}
    cmm = conf.get("delta.columnMapping.mode")
    if cmm not in (None, "", "none"):
        raise NotImplementedError(
            f"Delta column mapping mode {cmm!r} is not supported by "
            "this read-only interop (parquet columns carry physical "
            "names; a plain schema read would return NULLs)")
    if str(conf.get("delta.enableDeletionVectors",
                    "false")).lower() == "true":
        raise NotImplementedError(
            "Delta deletion vectors are enabled on this table — "
            "unsupported by this read-only interop (rows deleted via "
            "DVs would silently reappear)")


def _apply_action(state: dict, action: dict) -> None:
    if "add" in action:
        a = action["add"]
        state["adds"][a["path"]] = a
    elif "remove" in action:
        state["adds"].pop(action["remove"]["path"], None)
    elif "metaData" in action:
        state["meta"] = action["metaData"]
    elif "protocol" in action:
        state["protocol"] = action["protocol"]


def _replay(root: str, target: int) -> dict:
    log_dir = os.path.join(root, _LOG)
    commits, ckpts = _log_versions(log_dir)
    if not commits and not ckpts:
        raise FileNotFoundError(f"no Delta log under {log_dir}")
    head = max(commits + ckpts)
    if target > head:
        raise ValueError(f"version {target} exceeds head {head}")
    state: dict = {"adds": {}, "meta": None, "protocol": None}
    start = 0
    usable = [v for v in ckpts if v <= target]
    if usable:
        ckv = max(usable)
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(
            log_dir, f"{ckv:020d}.checkpoint.parquet"))
        for row in t.to_pylist():
            # one action per checkpoint row; null columns are absent
            _apply_action(state, {k: v for k, v in row.items()
                                  if v is not None})
        start = ckv + 1
    for v in range(start, target + 1):
        p = os.path.join(log_dir, f"{v:020d}.json")
        try:
            text = open(p, encoding="utf-8").read()
        except FileNotFoundError as e:
            if v in ckpts:
                continue  # checkpoint-only version
            raise FileNotFoundError(
                f"Delta commit {v} missing from {log_dir} (expired "
                "by retention?)") from e
        for line in text.splitlines():
            if line.strip():
                _apply_action(state, json.loads(line))
    _check_protocol(state["protocol"])
    if state["meta"] is None:
        raise ValueError(
            f"no metaData action found up to version {target} — "
            "not a readable Delta table")
    _check_table_config(state["meta"])
    return state


def read_delta(spark: SparkSession, path: str,
               version: int | None = None) -> DataFrame:
    """Batch DataFrame over an existing Delta table's current (or
    time-traveled) snapshot — log replay per the public protocol, then
    JVM-native parquet scans. Partition columns come from the add
    actions' ``partitionValues`` maps, grouped so each distinct
    partition tuple is one scan + literal columns (a 100 TB Delta
    table with k partitions is k plain scans unioned by name —
    Catalyst folds the literals; no Python crossing anywhere)."""
    root = local_path(path)
    if version is None:
        commits, ckpts = _log_versions(os.path.join(root, _LOG))
        if not commits and not ckpts:
            raise FileNotFoundError(
                f"no Delta log under {os.path.join(root, _LOG)}")
        version = max(commits + ckpts)
    state = _replay(root, version)
    meta = state["meta"]
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or ())
    fields = {f.name: f for f in schema.fields}
    data_schema = StructType([f for f in schema.fields
                              if f.name not in part_cols])
    if not state["adds"]:
        return spark.createDataFrame([], schema)
    groups: dict[tuple, list[str]] = {}
    for a in state["adds"].values():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(
            os.path.join(root, unquote(a["path"])))
    out: DataFrame | None = None
    for key, files in sorted(groups.items(),
                             key=lambda kv: tuple(
                                 (v is None, v) for v in kv[0])):
        df = spark.read.schema(data_schema).parquet(*sorted(files))
        for c, v in zip(part_cols, key):
            lit = (F.lit(None) if v is None else F.lit(v))
            df = df.withColumn(c, lit.cast(fields[c].dataType))
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out
