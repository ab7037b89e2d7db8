"""sf1 heavy-operator appendix — the curation/ANN sweep at 10× corpus.

BENCH_sf1.json retired the floor asterisk for the two micro-queries;
this script extends the at-scale evidence to the heavy J/M operators,
each VERIFIED on the 10× corpus before timing. Verification strategy
per query (the all-pairs DuckDB oracles are quadratic — 50k docs would
be ~10⁹ list-intersections, so sf0.1's direct-oracle pattern cannot
scale; each query instead gets an exact independent truth):

- `dedup_docs_minhash`, `dedup_cluster_cc`, `curation_pipeline`:
  DISJOINT-VOCABULARY tiling — every token of copy k (k>0) is suffixed
  (`wordxk`), a bijection on each copy's vocabulary. Within-copy
  shingle/digest structure is exactly the original's (shingle equality
  is preserved under per-token bijection) and cross-copy intersections
  are EMPTY, so the sf1 truth is the DuckDB-verified sf0.1 oracle
  result replicated per copy with doc_ids offset (pairs/components) or
  counts ×10 (per-lang accounting). That is a hash-exact check: DuckDB
  runs where it is feasible, the tiling theorem transports it. (MinHash
  banding is probabilistic but 32×2 bands detect j ≥ 0.8 with
  1 − 5e-15 per pair — no slack needed at 10⁴ pairs.)
- `text_unigram_logprob`: the oracle is LINEAR (LM build + scoring
  join) — run it directly on the sf1 corpus, same as sf0.1.
- `sim_ann_lsh`, `sim_ann_lsh_multiprobe2`: exact numpy GEMM truth over
  the 20k-vector corpus. Asserted here as precision == 1 (every emitted
  pair is a true pair, cosine matching numpy to 2e-6) and
  recall ≥ 1 − 5e-5 with the observed misses RECORDED next to the
  closed-form expectation. For probed configs the closed form is a
  LOWER bound on recall, not an estimate — the model charges each probe
  a fixed-bit disagreement probability while the kernel probes the
  smallest-|margin| bit, the one most likely to disagree — so observing
  fewer misses than 'expected' (e.g. 0 vs 21 for multiprobe2) is the
  documented behavior, measured systematically in ANN_RECALL.json
  (probe-0 rows match the model to ~1σ; probed rows beat it).

Timing = BASELINE.md method (warm, min over reps, driver
materialization counted). The corpus is written as 32-file directories
(`_write_sharded`): a single generated file is ONE Spark input split
regardless of maxPartitionBytes, which serializes the map-heavy
shingle/signature work onto one core — the 100 TB design point this
sweep stands in for is thousands of splits, and DuckDB gets the same
multi-file parallelism over the glob. DuckDB is timed only where it runs at sf1
(the linear oracle); quadratic-oracle rows record Spark only — there is
no honest same-scale DuckDB number for them, and timing the oracle's
all-pairs form would just benchmark the shape this engine exists to
avoid.

Run: python tools/bench_sf1_heavy.py   (writes BENCH_sf1_heavy.json)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, ".bench_sf1_dv")
EMB_DIR = os.path.join(REPO, ".bench_sf1")  # 20k vectors, built there
SRC_SF = "/root/testdata/sf0.1"
COPIES = 10
REPS = 5


SHARDS = 32  # files per generated table — see _write_sharded


def _write_sharded(table, path: str) -> None:
    """Write ``table`` as a DIRECTORY of SHARDS parquet files.

    A single small file is ONE Spark input split (a 5.9 MB file stays
    one partition at any maxPartitionBytes), which serializes the
    map-heavy work (shingling, LSH signatures) onto one core — the
    first cut of this sweep measured sim_ann_lsh at 332 s for exactly
    that reason. Real ingestion at any scale produces many files; 32
    shards make the generated corpus look like that reality for BOTH
    engines (DuckDB parallelizes across the glob just as Spark does
    across splits)."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        os.remove(path)  # stale single-file layout from the first cut
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = (n + SHARDS - 1) // SHARDS
    for s in range(SHARDS):
        pq.write_table(table.slice(s * step, step),
                       os.path.join(path, f"part-{s:05d}.parquet"))


def build_corpus() -> None:
    """Disjoint-vocabulary 10× documents, sharded copies of the 20k
    embeddings (built by tools/bench_sf1.py), symlinks for the rest."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DATA_DIR, exist_ok=True)
    doc_path = os.path.join(DATA_DIR, "documents.parquet")
    if not os.path.isdir(doc_path):
        src = pq.read_table(os.path.join(SRC_SF, "documents.parquet"))
        d = src.to_pydict()
        base = max(d["doc_id"]) + 1
        out: dict[str, list] = {k: [] for k in d}
        for c in range(COPIES):
            out["doc_id"].extend(i + c * base for i in d["doc_id"])
            if c == 0:
                out["text"].extend(d["text"])
            else:
                out["text"].extend(
                    " ".join(f"{w}x{c}" for w in t.split(" "))
                    for t in d["text"])
            out["lang"].extend(d["lang"])
            out["source"].extend(d["source"])
            # metadata column kept verbatim: the contracts filter on the
            # COLUMN, and identical values keep every copy's filter
            # outcome identical to the original's
            out["n_chars"].extend(d["n_chars"])
        _write_sharded(pa.table(
            {k: pa.array(out[k], src.schema.field(k).type) for k in out}),
            doc_path)

    from tools.bench_sf1 import build_corpus as build_emb
    build_emb()  # ensures EMB_DIR embeddings exist
    emb_path = os.path.join(DATA_DIR, "embeddings.parquet")
    if os.path.islink(emb_path):
        os.remove(emb_path)  # first cut symlinked the single file
    # Digest marker invalidates the sharded copy (and, via the same
    # digest in the truth-cache filename, the cached GEMM truth) if the
    # EMB_DIR source is ever regenerated with different content.
    marker = os.path.join(emb_path, ".source_digest")
    dig = _emb_digest()
    stale = (not os.path.isdir(emb_path)
             or not os.path.exists(marker)
             or open(marker).read().strip() != dig)
    if stale:
        if os.path.isdir(emb_path):
            import shutil

            shutil.rmtree(emb_path)
        _write_sharded(
            pq.read_table(os.path.join(EMB_DIR, "embeddings.parquet")),
            emb_path)
        with open(marker, "w") as f:
            f.write(dig)
    for t in os.listdir(SRC_SF):
        link = os.path.join(DATA_DIR, t)
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC_SF, t), link)


def _emb_digest() -> str:
    """Content digest of the EMB_DIR source corpus — keys the sharded
    copy and the cached exact-GEMM truth to the data they were computed
    from."""
    import hashlib

    h = hashlib.sha256()
    with open(os.path.join(EMB_DIR, "embeddings.parquet"), "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:16]


def _duck_rows(sql: str, sf_dir: str):
    # The quadratic sf0.1 oracles (CC's recursive components ≈ 48 min of
    # single-core DuckDB) are deterministic over a fixed corpus — cache
    # their rows on disk so a rerun doesn't recompute them. Only the
    # SRC_SF truth side is cached; sf1 _duck_rows calls sit inside the
    # timing loop and must run live.
    cache = None
    if sf_dir == SRC_SF:
        import hashlib

        key = hashlib.sha256(f"{sf_dir}\n{sql}".encode()).hexdigest()[:24]
        cdir = os.path.join(DATA_DIR, "_oracle_cache")
        os.makedirs(cdir, exist_ok=True)
        cache = os.path.join(cdir, f"{key}.json")
        if os.path.exists(cache):
            with open(cache) as f:
                return [tuple(r) for r in json.load(f)]
    import duckdb

    con = duckdb.connect()
    from tests.parity import _duck_path

    for t in ("documents", "embeddings", "events"):
        if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{_duck_path(sf_dir, t)}')")
    rows = con.execute(sql).fetchall()
    con.close()
    if cache is not None:
        with open(cache, "w") as f:
            json.dump([list(r) for r in rows], f)
    return rows


def _doc_base() -> int:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SRC_SF, "documents.parquet"),
                      columns=["doc_id"])
    return max(t.column("doc_id").to_pylist()) + 1


def _spark_rows(spark, name: str, sf_dir: str):
    from silvia_spark import registry
    from silvia_spark.io import clear_caches

    clear_caches()
    return [tuple(r) for r in
            registry.QUERIES[name](spark, sf_dir).collect()]


def _verify_replicated_pairs(spark, name: str, base: int) -> int:
    """Truth = sf0.1 DuckDB oracle result, replicated per copy with id
    offsets (all id columns shift by c·base; payload columns unchanged).
    Returns the sf1 row count."""
    from silvia_spark import registry

    small = _duck_rows(registry.ORACLE[name], SRC_SF)
    id_cols = 2 if name == "dedup_docs_minhash" else None
    expected = set()
    for c in range(COPIES):
        off = c * base
        for row in small:
            if name == "dedup_docs_minhash":
                a, b, j = row
                expected.add((a + off, b + off, j))
            else:  # dedup_cluster_cc: (doc_id, cluster_id, cluster_size)
                i, comp, size = row
                expected.add((i + off, comp + off, size))
    got = set(_spark_rows(spark, name, DATA_DIR))
    assert got == expected, (
        f"{name}: sf1 result != replicated sf0.1 truth "
        f"(got {len(got)}, want {len(expected)}, "
        f"extra {list(got - expected)[:3]}, "
        f"missing {list(expected - got)[:3]})")
    del id_cols
    return len(got)


def _verify_scaled_counts(spark, name: str) -> int:
    """curation_pipeline: per-lang additive accounting — sf1 truth is
    the sf0.1 oracle row set with every count column ×10."""
    from silvia_spark import registry

    small = _duck_rows(registry.ORACLE[name], SRC_SF)
    expected = {tuple(v * COPIES if isinstance(v, int) else v
                      for v in row) for row in small}
    got = set(_spark_rows(spark, name, DATA_DIR))
    assert got == expected, (
        f"{name}: got {sorted(got)[:2]} want {sorted(expected)[:2]}")
    return len(got)


def _verify_direct(spark, name: str) -> int:
    """Linear oracle: run it on the sf1 corpus itself (parity.check's
    comparison, at scale)."""
    from tests import parity

    assert parity.check(name, spark, sf_dir=DATA_DIR), name
    from silvia_spark import registry

    return registry.QUERIES[name](spark, DATA_DIR).count()


def _verify_lsh_vs_numpy(spark, name: str) -> dict:
    """Exact numpy GEMM truth; precision must be 1 (cosines matched to
    2e-6), recall ≥ 1 − 5e-5 with observed misses recorded."""
    import numpy as np
    import pyarrow.parquet as pq

    # The exact truth is a property of the 20k vectors alone (layout- and
    # query-independent) and costs ~8 min of single-core Python — cache it
    # beside the DuckDB oracle rows.
    cdir = os.path.join(DATA_DIR, "_oracle_cache")
    os.makedirs(cdir, exist_ok=True)
    cache = os.path.join(cdir, f"gemm_truth_04_{_emb_digest()}.json")
    if os.path.exists(cache):
        with open(cache) as f:
            truth = {(a, b): c for a, b, c in json.load(f)}
    else:
        t = pq.read_table(os.path.join(EMB_DIR, "embeddings.parquet"))
        ids = np.asarray(t.column("vec_id").to_pylist())
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        truth = {}
        block = 2048
        n = mat.shape[0]
        for i0 in range(0, n, block):
            g = mat[i0:i0 + block] @ mat.T
            for r in range(g.shape[0]):
                i = i0 + r
                for j in np.nonzero(g[r] >= 0.4)[0]:
                    if j > i:
                        truth[(int(ids[i]), int(ids[j]))] = float(g[r][j])
        with open(cache, "w") as f:
            json.dump([[a, b, c] for (a, b), c in truth.items()], f)
    got = {(a, b): c for a, b, c in _spark_rows(spark, name, DATA_DIR)}
    extra = [p for p in got if p not in truth]
    assert not extra, f"{name}: false positives {extra[:5]}"
    worst = max(abs(got[p] - truth[p]) for p in got)
    assert worst <= 2e-6, f"{name}: cosine mismatch {worst}"
    missed = [p for p in truth if p not in got]
    recall = 1 - len(missed) / len(truth)
    assert recall >= 1 - 5e-5, (
        f"{name}: recall {recall} ({len(missed)} of {len(truth)})")
    # closed-form expectation for the observed misses (per-pair miss at
    # its own cosine), for the record
    if name == "sim_ann_lsh":
        tables, probes = 64, 0
    else:
        tables, probes = 16, 3
    exp_miss = 0.0
    for c in truth.values():
        p = 1 - math.acos(min(c, 1.0)) / math.pi
        q = p ** 4
        if probes:
            q += 2 * p ** 3 * (1 - p) + (p * (1 - p)) ** 2
        exp_miss += (1 - q) ** tables
    return {"pairs": len(truth), "missed": len(missed),
            "recall": round(recall, 6),
            "expected_misses_closed_form": round(exp_miss, 2)}


def _log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


# --- per-row attribution control (r13, r12 verdict item 4) --------------------
# The heavy sweep saturates its own 32-core box BY DESIGN, so end-of-
# sweep loadavg cannot attribute a slow row to box state vs kernel —
# exactly how the r11 false ANN regression was manufactured. Remedy:
# a fixed Spark control query interleaved between heavy reps; a row
# whose adjacent control drifts past the gate is marked degraded in
# the artifact itself, so cross-round deltas on `deg` rows are
# inadmissible without a rerun.

_CTRL_GATE = 1.5


def _control_sec(spark) -> float:
    """Fixed-work JVM-only control: a codegen range-sum, no IO, no
    Python workers — its runtime moves with scheduler/CPU contention
    only, which is the confound being measured."""
    t0 = time.perf_counter()
    spark.range(20_000_000).selectExpr("sum(id * 2) AS s").collect()
    return time.perf_counter() - t0


def _ctrl_verdict(base: float, reading: float,
                  gate: float = _CTRL_GATE) -> dict:
    """Pure verdict: control drift ratio vs the pre-sweep baseline.
    deg=True marks the adjacent heavy reading as environment-bound."""
    x = reading / base if base > 0 else float("inf")
    return {"x": round(x, 2), "deg": x > gate}


def main() -> None:
    # Idle-box gate (r09 verdict: the r08 sf1-heavy artifact recorded
    # loadavg 46.78 — self-polluted numbers). Same gate as bench.py's
    # headline sweep: wait for the box, stamp degraded otherwise.
    from bench import _load_gate

    load_gate = _load_gate()
    load_start = round(os.getloadavg()[0], 2)
    _log(f"load gate: {load_gate} start loadavg: {load_start}")
    _log("building corpus")
    build_corpus()
    from silvia_spark import registry
    from silvia_spark.session import get_session

    registry.load_all_modules()
    spark = get_session("silvia_bench_sf1_heavy")
    spark.sparkContext.setLogLevel("ERROR")
    base = _doc_base()

    verified: dict[str, object] = {}
    _log("verify minhash")
    verified["dedup_docs_minhash"] = {
        "rows": _verify_replicated_pairs(spark, "dedup_docs_minhash", base),
        "method": "replicated-sf0.1-oracle (disjoint vocab)"}
    _log("verify cc")
    verified["dedup_cluster_cc"] = {
        "rows": _verify_replicated_pairs(spark, "dedup_cluster_cc", base),
        "method": "replicated-sf0.1-oracle (disjoint vocab)"}
    _log("verify curation")
    verified["curation_pipeline"] = {
        "rows": _verify_scaled_counts(spark, "curation_pipeline"),
        "method": "sf0.1-oracle counts x10 (disjoint vocab)"}
    _log("verify unigram")
    verified["text_unigram_logprob"] = {
        "rows": _verify_direct(spark, "text_unigram_logprob"),
        "method": "direct DuckDB oracle at sf1 (linear)"}
    for q in ("sim_ann_lsh", "sim_ann_lsh_multiprobe2"):
        _log(f"verify {q}")
        verified[q] = {**_verify_lsh_vs_numpy(spark, q),
                       "method": "exact numpy GEMM truth"}

    from silvia_spark.io import clear_caches

    # control baseline BEFORE any heavy work (idle-gated box)
    _control_sec(spark)  # JIT warm
    ctrl_base = min(_control_sec(spark) for _ in range(3))
    _log(f"control baseline {ctrl_base:.3f}s")

    timings: dict[str, float] = {}
    controls: dict[str, dict] = {}
    for q in verified:
        _log(f"time {q}")
        clear_caches()
        df = registry.QUERIES[q](spark, DATA_DIR)
        df.toArrow()  # warm
        best = float("inf")
        best_ctrl = None
        for _ in range(REPS):
            clear_caches()
            t0 = time.perf_counter()
            registry.QUERIES[q](spark, DATA_DIR).toArrow()
            sec = time.perf_counter() - t0
            # control ADJACENT to this rep: the reading that vouches
            # (or doesn't) for the rep the min might select
            ctrl = _ctrl_verdict(ctrl_base, _control_sec(spark))
            if sec < best:
                best, best_ctrl = sec, ctrl
        timings[q] = round(best, 3)
        controls[q] = {**(best_ctrl or {}),
                       "loadavg": round(os.getloadavg()[0], 2)}
        if best_ctrl and best_ctrl["deg"]:
            _log(f"  DEGRADED: control x{best_ctrl['x']} "
                 f"beside the best rep — row not attributable")

    # the one feasible same-scale DuckDB comparison (linear oracle)
    import duckdb  # noqa: F401 — presence check for the note below

    sql = registry.ORACLE["text_unigram_logprob"]
    _duck_rows(sql, DATA_DIR)  # warm
    duck = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _duck_rows(sql, DATA_DIR)
        duck = min(duck, time.perf_counter() - t0)

    artifact = {
        "metric": "sf1_heavy_sweep",
        "sf": 1.0,
        "copies": COPIES,
        "layout": f"{SHARDS}-file directories (multi-split, both engines)",
        "verified": verified,
        "spark_sec": timings,
        # r13: per-row attribution controls — a fixed codegen control
        # query timed beside each row's best rep; deg rows are
        # environment-bound and inadmissible for cross-round deltas
        "controls": controls,
        "control_baseline_sec": round(ctrl_base, 3),
        "control_gate": _CTRL_GATE,
        "duckdb_sec": {"text_unigram_logprob": round(duck, 3)},
        "note": ("each query verified on the 10x corpus before timing "
                 "(see tools/bench_sf1_heavy.py docstring for the "
                 "per-query truth construction); quadratic-oracle rows "
                 "record Spark only — no honest same-scale DuckDB "
                 "number exists for the all-pairs form"),
        # end-of-sweep loadavg is dominated by the sweep's own 32-core
        # work (LSH saturates the box by design) — the idle-box claim
        # rides on load_gate + loadavg_start, measured BEFORE anything
        # ran; the end reading is kept for continuity only
        "loadavg": round(os.getloadavg()[0], 2),
        "loadavg_start": load_start,
        "load_gate": load_gate,
    }
    out = os.path.join(REPO, "BENCH_sf1_heavy.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
