"""Local replica of the driver's DuckDB-oracle correctness check.

Runs each contract query on Spark and its oracle SQL on DuckDB over the same
parquet files, then compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted by their full stringified
tuple). Mirrors __spark_entry__.py's documented t2 semantics so mismatches
are caught before the driver sees them.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

from silvia_spark.schemas import TABLE_NAMES


def _duck_path(sf_dir: str, table: str) -> str:
    """DuckDB source path for a table: a single file, or a glob when the
    table is a multi-file directory (the layout every real ingest
    produces; ``spark.read.parquet`` handles both natively)."""
    p = f"{sf_dir}/{table}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def _norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full double precision; both engines hand back Python floats
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted(cols), h


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{_duck_path(sf_dir, t)}')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def run_spark(fn, spark, sf_dir: str):
    df = fn(spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def check(name: str, spark, sf_dir: str = "/root/testdata/sf0.01",
          verbose: bool = True) -> bool:
    from silvia_spark import registry
    registry.load_all_modules()
    fn = registry.QUERIES[name]
    s_cols, s_rows = run_spark(fn, spark, sf_dir)
    s_n, s_c, s_h = frame_fingerprint(s_cols, s_rows)
    if name not in registry.ORACLE:
        ok = s_n >= 0
        if verbose:
            print(f"{name}: rows-only, {s_n} rows -> {'OK' if ok else 'FAIL'}")
        return ok
    o_cols, o_rows = run_duckdb(registry.ORACLE[name], sf_dir)
    o_n, o_c, o_h = frame_fingerprint(o_cols, o_rows)
    ok = (s_n, s_c, s_h) == (o_n, o_c, o_h)
    if verbose:
        status = "OK" if ok else "MISMATCH"
        print(f"{name}: {status} spark=({s_n},{s_h}) oracle=({o_n},{o_h})")
        if not ok:
            if s_c != o_c:
                print(f"  cols spark={s_c} oracle={o_c}")
            elif s_n == o_n:
                # show first differing row pair for debugging
                ss = sorted(map(str, s_rows))
                oo = sorted(map(str, o_rows))
                for a, b in zip(ss, oo):
                    if a != b:
                        print(f"  spark : {a}\n  oracle: {b}")
                        break
    return ok


def driver_canon_issues(name: str, spark, sf_dir: str = "/root/testdata/sf0.01"
                        ) -> list[str]:
    """Issues that would break the DRIVER's pandas-based canonicalization
    even when raw values match (the r01 failure class): array/map cells
    (unhashable in pandas factorize) and dtype-kind drift between Spark's
    ``toPandas`` and DuckDB's ``.df()`` (e.g. DuckDB HUGEINT → float64 vs
    Spark BIGINT → int64, which formats 1.0 vs 1)."""
    import numpy as np

    from silvia_spark import registry
    registry.load_all_modules()
    issues: list[str] = []
    sdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    for c in sdf.columns:
        nn = sdf[c].dropna()
        if len(nn) and isinstance(nn.iloc[0], (np.ndarray, list, dict, tuple)):
            issues.append(
                f"{c}: {type(nn.iloc[0]).__name__} cells crash the "
                f"driver canonicalizer")
    if name in registry.ORACLE:
        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{_duck_path(sf_dir, t)}')")
        odf = con.sql(registry.ORACLE[name]).df()
        con.close()
        import datetime

        for c in sdf.columns:
            if c not in odf.columns:
                continue
            sk, ok_ = sdf[c].dtype.kind, odf[c].dtype.kind
            if sk == ok_:
                continue
            # Spark DateType → object cells of datetime.date while DuckDB
            # DATE → datetime64: empirically driver-safe (scalar_date was
            # hash-green in r01 with exactly this shape) — allow it.
            nn = sdf[c].dropna()
            if {sk, ok_} == {"O", "M"} and len(nn) and isinstance(
                    nn.iloc[0], (datetime.date, datetime.datetime)):
                continue
            issues.append(f"{c}: dtype kind spark={sk} oracle={ok_}")
    return issues


def main(names: list[str]) -> int:
    from silvia_spark.session import get_session
    from silvia_spark import registry
    registry.load_all_modules()
    spark = get_session("parity")
    if not names or names == ["all"]:
        names = list(registry.QUERIES)
    failures = [n for n in names if not check(n, spark)]
    print(f"\n{len(names) - len(failures)}/{len(names)} OK")
    if failures:
        print("FAILED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
