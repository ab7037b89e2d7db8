#!/usr/bin/env python
"""sf1 appendix — retire the floor-bound raw-gate asterisk with data.

The two perennial raw 2x-gate breaches (`sim_topk_cosine`,
`dedup_docs_exact`) are millisecond-scale queries at sf0.1: DuckDB
finishes them near its ~0.1 ms floor while Spark pays a constant ~17 ms
local-mode scheduling floor. The floor argument says the breach vanishes
once marginal work dominates; THIS script measures that instead of
arguing it: it builds a deterministic 10x corpus (sf1-scale) for the two
tables involved, re-verifies both contracts against their own DuckDB
oracles on that corpus (hash parity, not just timing), and times both
engines with BASELINE.md's method (warm, min over runs, materialization
counted).

Corpus construction (seeded, no RNG at query time):
- embeddings: 20 000 x 64-dim float32, numpy PCG64(42), label = id % 10 —
  brute-force top-k cost is distribution-insensitive, so fresh vectors
  are a fair 10x of the 2 000-vector sf0.1 table.
- documents: the sf0.1 corpus tiled 10x; copy 0 verbatim, copy k gets a
  " ck" suffix token — each copy keeps the ORIGINAL's internal
  exact-duplicate structure (so dup_docs scales exactly 10x) without
  fabricating cross-copy duplicates.
- every other table symlinks to sf0.1 (unused by these two queries, but
  present so the parity harness can register all views).

Run: python tools/bench_sf1.py   (writes BENCH_sf1.json at the repo root)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, ".bench_sf1")
SRC_SF = "/root/testdata/sf0.1"
QUERIES = ["sim_topk_cosine", "dedup_docs_exact"]
N_VECS, DIM, COPIES = 20_000, 64, 10


def build_corpus() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DATA_DIR, exist_ok=True)
    emb_path = os.path.join(DATA_DIR, "embeddings.parquet")
    if not os.path.exists(emb_path):
        rng = np.random.default_rng(42)
        mat = rng.standard_normal((N_VECS, DIM), dtype=np.float32)
        pq.write_table(pa.table({
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), DIM).cast(
                    pa.list_(pa.float32())),
            "label": pa.array([i % 10 for i in range(N_VECS)], pa.int32()),
        }), emb_path)

    doc_path = os.path.join(DATA_DIR, "documents.parquet")
    if not os.path.exists(doc_path):
        src = pq.read_table(os.path.join(SRC_SF, "documents.parquet"))
        d = src.to_pydict()
        n = len(d["doc_id"])
        base = max(d["doc_id"]) + 1
        out = {k: [] for k in d}
        for c in range(COPIES):
            suffix = "" if c == 0 else f" c{c}"
            out["doc_id"].extend(i + c * base for i in d["doc_id"])
            out["text"].extend(t + suffix for t in d["text"])
            out["lang"].extend(d["lang"])
            out["source"].extend(d["source"])
            out["n_chars"].extend(
                v + len(suffix) for v in d["n_chars"])
        pq.write_table(pa.table(
            {k: pa.array(out[k], src.schema.field(k).type) for k in out}),
            doc_path)
        del out
        assert n * COPIES == pq.read_metadata(doc_path).num_rows

    for t in os.listdir(SRC_SF):
        link = os.path.join(DATA_DIR, t)
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC_SF, t), link)


def main() -> None:
    build_corpus()
    import duckdb

    from silvia_spark import registry
    from silvia_spark.session import get_session
    from tests import parity

    registry.load_all_modules()
    spark = get_session("silvia_bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")

    # Correctness first: the timing below only counts if both engines agree
    # on THIS corpus too.
    for name in QUERIES:
        assert parity.check(name, spark, sf_dir=DATA_DIR), name

    sweeps = int(os.environ.get("SPARK_GRAFT_SWEEPS", "3"))
    result: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        df = registry.QUERIES[name](spark, DATA_DIR)
        df.toArrow()  # warm-up: codegen + IO cache
        spark_sec = float("inf")
        for _ in range(sweeps * 3):
            t0 = time.perf_counter()
            df.toArrow()
            spark_sec = min(spark_sec, time.perf_counter() - t0)

        con = duckdb.connect()
        for t in ("embeddings", "documents"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{DATA_DIR}/{t}.parquet')")
        sql = registry.ORACLE[name]
        con.execute(sql).fetchall()  # warm-up
        duck_sec = float("inf")
        for _ in range(sweeps * 3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            duck_sec = min(duck_sec, time.perf_counter() - t0)
        con.close()

        result[name] = {
            "spark_sec": round(spark_sec, 4),
            "duckdb_sec": round(duck_sec, 4),
            "ratio_raw": round(spark_sec / duck_sec, 2),
        }

    artifact = {
        "metric": "sf1_floor_appendix",
        "sf": 1.0,
        "note": ("10x deterministic corpus (tools/bench_sf1.py); both "
                 "contracts hash-verified against their DuckDB oracles on "
                 "this corpus before timing; method = BASELINE.md (warm, "
                 "min of sweeps*3, driver materialization counted). "
                 "Purpose: the sf0.1 raw-gate breaches for these two "
                 "queries are Spark's constant local scheduling floor; at "
                 "sf1 the marginal work dominates and the raw ratio "
                 "speaks for itself."),
        "queries": result,
        "loadavg": round(os.getloadavg()[0], 2),
    }
    out = os.path.join(REPO, "BENCH_sf1.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
