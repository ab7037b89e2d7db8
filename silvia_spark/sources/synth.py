"""Custom Python Data Source (Spark 4 DataSource API) — a deterministic
synthetic event generator.

This is the engine's "bring your own source" surface: the same API a user
implements to read a proprietary format or service. The generator is
partition-parallel (each InputPartition produces an id range — on a
cluster, N partitions = N parallel tasks with no driver involvement) and
fully deterministic, so the contract is hash-checkable against a DuckDB
``generate_series`` oracle — the source machinery itself is what's under
test.

Registered as ``silvia_synth``:

    spark.dataSource.register(SynthEventsDataSource)
    spark.read.format("silvia_synth").option("rows", 1000).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_SCHEMA_DDL = "event_id BIGINT, bucket INT, value DOUBLE"

_N_PARTITIONS = 4
_MULT = 2654435761  # Knuth multiplicative hash constant
_MOD = 100003       # prime


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))

    def partitions(self):
        per = (self.rows + _N_PARTITIONS - 1) // _N_PARTITIONS
        return [
            _RangePartition(i * per, min((i + 1) * per, self.rows))
            for i in range(_N_PARTITIONS)
            if i * per < self.rows
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            h = (i * _MULT) % _MOD
            yield (i, h % 32, (h % 10000) / 100.0)


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "silvia_synth"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SynthEventsReader(self.options)
