"""PostgreSQL upsert transport for the silvia load stage (I9).

Production shape: every micro-batch stages its rows and merges them with
``INSERT ... ON CONFLICT (keys) DO UPDATE`` so a replayed batch (Spark
retries a foreachBatch on failure; checkpoint replays it on restart)
REPLACES its own prior write instead of duplicating it — the exactly-once
contract of the load stage.

Transport here is libpq via the ``psql`` CLI over a unix socket: this
container ships full PostgreSQL server binaries but no JDBC driver jar and
no Python driver, so ``psql`` is the only executable client. The merge SQL
is transport-independent — with a JDBC jar present the same staging+merge
statements run through per-partition connections (see sink_jdbc_postgres,
operators/scans.py). foreachBatch executes on the driver, so a driver-side
subprocess is the honest analogue of the driver-side JDBC batch commit at
this table size (an aggregated micro-batch summary, not raw events).

Everything is keyed off $SILVIA_PG_HOST — a unix-socket directory (or
hostname) of a reachable server with a ``silvia`` database. Absent, callers
degrade to the idempotent parquet path. tests/test_pg_sink.py boots a real
embedded server (initdb + pg_ctl, trust auth on a private socket dir) and
proves both the merge semantics and contract-path equality.
"""

from __future__ import annotations

import os
import subprocess

PG_DB = "silvia"
PG_USER = "postgres"


def pg_host() -> str | None:
    """Socket dir / host of the ambient PostgreSQL, or None (degrade)."""
    return os.environ.get("SILVIA_PG_HOST")


def run_psql(host: str, script: str, *, db: str = PG_DB) -> str:
    """Run a psql script (one implicit session; ``ON_ERROR_STOP`` makes any
    SQL error a non-zero exit). COPY ... FROM STDIN data can be embedded
    inline after its statement, terminated by ``\\.`` — exactly how psql
    consumes it."""
    proc = subprocess.run(
        ["psql", "-h", host, "-U", PG_USER, "-d", db,
         "-v", "ON_ERROR_STOP=1", "-qAt", "-f", "-"],
        input=script, capture_output=True, text=True, cwd="/tmp", check=False)
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed: {proc.stderr[-2000:]}")
    return proc.stdout


def ensure_upsert_table(host: str, table: str) -> None:
    run_psql(host, f"""
CREATE TABLE IF NOT EXISTS {table} (
  batch_id   bigint NOT NULL,
  event_type text   NOT NULL,
  cnt        bigint NOT NULL,
  PRIMARY KEY (batch_id, event_type)
);
""")


def copy_upsert(host: str, table: str,
                rows: list[tuple[int, str, int]]) -> None:
    """Stage + merge one micro-batch: COPY into a temp table (bulk path, the
    same wire shape a JDBC batch insert takes), then a single merge statement
    keyed on (batch_id, event_type). Replay-idempotent by construction."""
    if not rows:
        return
    data = "\n".join(f"{b}\t{t}\t{c}" for b, t, c in rows)
    run_psql(host, f"""
BEGIN;
CREATE TEMP TABLE _stage (LIKE {table} INCLUDING ALL) ON COMMIT DROP;
COPY _stage (batch_id, event_type, cnt) FROM STDIN;
{data}
\\.
INSERT INTO {table} AS t (batch_id, event_type, cnt)
SELECT batch_id, event_type, cnt FROM _stage
ON CONFLICT (batch_id, event_type) DO UPDATE SET cnt = EXCLUDED.cnt;
COMMIT;
""")


def read_upsert_table(host: str, table: str) -> list[tuple[int, str, int]]:
    out = run_psql(host, f"SELECT batch_id, event_type, cnt FROM {table} "
                         f"ORDER BY batch_id, event_type;")
    rows = []
    for line in out.strip().splitlines():
        b, t, c = line.split("|")
        rows.append((int(b), t, int(c)))
    return rows
