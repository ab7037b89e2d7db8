"""Manifest tables as a STREAMING SOURCE (Spark 4 Python DataSource
streaming API) — the read half of L12's exactly-once streaming write,
i.e. Delta's ``spark.readStream.format("delta")`` shape on this repo's
snapshot-manifest layer (operators/manifest_table.py).

Offsets are table VERSIONS: each micro-batch covers the file-granular
diff between two committed snapshots (the same set read_changes
resolves), so a batch is deterministic under replay — Spark checkpoints
the version range, and re-running it re-reads the identical file list.
One InputPartition per changed file keeps the read executor-parallel
with no driver data movement; partition-column values come from the
manifest entries (never re-parsed from paths).

Retention contract (same as read_changes / Delta): a checkpointed
stream that falls further behind than ``vacuum``'s ``keep_versions``
loses the manifests its next batch needs — size retention over the
longest consumer lag (SCALE.md §r09).

Registered as ``silvia_manifest``:

    spark.dataSource.register(ManifestTableDataSource)
    spark.readStream.format("silvia_manifest").option("path", root).load()

or via the ``read_stream_table`` helper (also on the api facade).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.types import StructType

from silvia_spark.io import local_path


def _table_schema(root: str) -> StructType:
    """The snapshot read schema in read order (data fields, partition
    column last — matching read_snapshot's column order)."""
    from silvia_spark.operators.manifest_table import _load_doc

    doc = _load_doc(root)
    sj = doc.get("schema")
    if not sj:
        raise ValueError(
            f"{root} records no schema (pre-r09 v1-format table): "
            "commit once to migrate, or read via read_snapshot")
    sch = StructType.fromJson(json.loads(sj))
    part_col = doc.get("part_col")
    return StructType([f for f in sch.fields if f.name != part_col]
                      + [f for f in sch.fields if f.name == part_col])


class _FileSlice(InputPartition):
    def __init__(self, path: str, part_value: str):
        self.path, self.part_value = path, part_value


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.root = local_path(options["path"])
        self.schema = schema
        self.start_version = int(options.get("startingversion", "0"))

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from silvia_spark.operators.manifest_table import current_version

        cur = current_version(self.root)
        if cur is None:
            raise FileNotFoundError(
                f"no committed snapshot under {self.root}")
        return {"version": max(cur, self.start_version)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from silvia_spark.operators.manifest_table import load_manifest

        sv, ev = int(start["version"]), int(end["version"])
        if ev <= sv:
            return []
        old = (set() if sv == 0 else
               {e["path"] for e in load_manifest(self.root, sv)["files"]})
        return [
            _FileSlice(os.path.join(self.root, e["path"]), e["partition"])
            for e in load_manifest(self.root, ev)["files"]
            if e["path"] not in old
        ]

    def read(self, partition: _FileSlice):
        # Executor-side: pyarrow reads the one parquet file; columns are
        # aligned to the stream schema by NAME (a file written before a
        # schema evolution NULL-fills the newer columns), and the
        # partition column is materialized from the manifest entry's
        # recorded value, cast per the schema type.
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        cols = {name: tbl.column(name).to_pylist()
                for name in tbl.column_names}
        n = tbl.num_rows
        part_field = self.schema.fields[-1]
        pv = _cast_partition(partition.part_value, part_field)
        out_cols = []
        for f in self.schema.fields[:-1]:
            out_cols.append(cols.get(f.name, [None] * n))
        out_cols.append([pv] * n)
        yield from zip(*out_cols)


def _cast_partition(value: str, field):
    """Manifest entries store the (unescaped) Hive dir-name string; cast
    it to the schema's partition type the way Spark's partition
    discovery would."""
    if value == "__HIVE_DEFAULT_PARTITION__":
        return None
    t = field.dataType.simpleString()
    if t in ("string", "varchar", "char"):
        return value
    if t in ("int", "bigint", "smallint", "tinyint"):
        return int(value)
    if t in ("double", "float"):
        return float(value)
    if t == "date":
        import datetime

        return datetime.date.fromisoformat(value)
    raise ValueError(f"unsupported partition column type {t!r} for the "
                     "streaming source (string/integer/float/date work)")


class ManifestTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "silvia_manifest"

    def schema(self) -> StructType:
        return _table_schema(local_path(self.options["path"]))

    def streamReader(self, schema: StructType) -> ManifestStreamReader:
        return ManifestStreamReader(schema, self.options)


def read_stream_table(spark, path: str, starting_version: int = 0):
    """Streaming DataFrame over a manifest table: every committed
    version AFTER ``starting_version`` arrives as (at least) one
    micro-batch of its file-granular changes; a rewritten partition
    re-delivers wholesale (upsert-by-key downstream, like read_changes).
    """
    try:
        spark.dataSource.register(ManifestTableDataSource)
    except Exception:
        pass  # already registered in this session
    return (spark.readStream.format("silvia_manifest")
            .option("path", path)
            .option("startingVersion", str(starting_version))
            .load())
