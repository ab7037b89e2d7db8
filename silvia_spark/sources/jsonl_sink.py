"""Custom Python Data Source SINK (Spark 4 DataSource writer API) — the
"bring your own sink" counterpart to sources/synth.py's reader: the same
API a user implements to push rows to a proprietary store or service.

Transport here is JSON-lines files plus a driver-side commit MANIFEST —
deliberately chosen to make the writer protocol itself the thing under
test:

- each write task streams its partition to a UNIQUELY-NAMED data file
  (task retries and speculative duplicates write new names, never clash)
  and reports the file in its WriterCommitMessage;
- ``commit`` (driver, runs once, only after every task succeeded) writes
  ``_MANIFEST`` listing exactly the committed files;
- readers trust the manifest ONLY, so uncommitted/aborted/duplicate task
  output is invisible — the same files+manifest exactly-once design every
  lake table format builds on;
- ``abort`` leaves data files as orphans (manifest-invisible) rather than
  risking a half-delete.

Registered as ``silvia_jsonl``:

    spark.dataSource.register(JsonLinesSinkDataSource)
    df.write.format("silvia_jsonl").option("path", out).mode("append").save()
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (DataSource, DataSourceWriter,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType


class _FileCommit(WriterCommitMessage):
    def __init__(self, filename: str, rows: int):
        self.filename, self.rows = filename, rows


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType):
        path = options.get("path")
        if not path:
            raise ValueError("silvia_jsonl sink requires option path=")
        self.path = path
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator) -> _FileCommit:
        # Executor-side: unique name per task ATTEMPT — a retry writes a
        # fresh file and only the attempt whose message reaches commit()
        # lands in the manifest.
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w",
                  encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(
                    {k: row[i] for i, k in enumerate(self.fields)}) + "\n")
                n += 1
        return _FileCommit(name, n)

    def commit(self, messages) -> None:
        # append semantics for real: a prior commit's manifest is merged,
        # not replaced — otherwise a second append would silently orphan
        # every previously committed file. Single concurrent writer per
        # path (like any manifest protocol without a transaction log).
        files = sorted(m.filename for m in messages)
        rows = sum(m.rows for m in messages)
        prev_path = os.path.join(self.path, "_MANIFEST")
        if os.path.exists(prev_path):
            with open(prev_path, encoding="utf-8") as f:
                prev = json.load(f)
            files = sorted(set(prev["files"]) | set(files))
            rows += prev["rows"]
        tmp = os.path.join(self.path, f"._manifest-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"files": files, "rows": rows}, f)
        os.rename(tmp, prev_path)  # atomic

    def abort(self, messages) -> None:
        # data files without a manifest entry are invisible to readers;
        # leaving them beats a half-delete racing still-running tasks
        pass


class JsonLinesSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "silvia_jsonl"

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "silvia_jsonl supports append only (manifest replace is "
                "the commit; pre-cleaning files is the caller's choice)")
        return JsonLinesWriter(self.options, schema)


def committed_files(path: str) -> list[str]:
    """The reader half of the protocol: resolve ONLY manifest-listed data
    files (absolute paths); orphans from failed/duplicate attempts are
    never returned."""
    with open(os.path.join(path, "_MANIFEST"), encoding="utf-8") as f:
        manifest = json.load(f)
    return [os.path.join(path, name) for name in manifest["files"]]
