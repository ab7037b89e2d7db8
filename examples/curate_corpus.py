#!/usr/bin/env python
"""Worked end-to-end example: near-duplicate curation on YOUR documents
with the composable facade (``silvia_spark.api``) — the repo's front door
for users who bring their own tables rather than the benchmark corpus.

Pipeline (each stage one facade kernel or plain DataFrame code):

1. ``api.jaccard_pairs(docs, tau)`` — exact 3-word-shingle Jaccard >= tau
   candidate pairs via an inverted-index equi-join (sub-quadratic: only
   docs sharing a shingle ever meet; stop-shingles df-capped).
2. ``api.two_phase_components(pairs)`` — near-dup CLUSTERS via two-phase
   connected components (partition-local union-find contraction, then a
   size-guarded exact finish / distributed min-label loop).
3. keep-best — ordinary window code over the cluster table: keep the
   longest doc per cluster (tie -> smallest doc_id), everything else
   lands on the removal list with its cluster audit columns.
4. apply — the caller's anti-join.

Every shuffle in the pipeline is keyed on ids/shingles (never raw text),
and no stage is quadratic in the corpus — the same composition is the
shape that runs at 100 TB. Run it on the sf0.001 sample corpus:

    python examples/curate_corpus.py            # or: <sf_dir>

Executed by tests/test_example_curate.py, so the example cannot rot.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from silvia_spark import api


def curate(docs: DataFrame, tau: float = 0.8):
    """(doc_id, text) + quality column ``n_chars`` -> (kept, removal,
    clusters). Returns DataFrames; nothing is materialized here."""
    pairs = api.jaccard_pairs(docs.select("doc_id", "text"), tau)
    clusters = api.two_phase_components(pairs)

    # keep-best survivor selection: rank cluster members by quality
    # (longest text wins, tie -> earliest doc_id); rank 1 survives.
    ranked = (clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
              .withColumn("rk", F.row_number().over(
                  Window.partitionBy("cluster_id")
                  .orderBy(F.col("n_chars").desc(), F.col("doc_id")))))
    removal = (ranked.where(F.col("rk") > 1)
               .select("doc_id", "cluster_id", "cluster_size", "n_chars"))
    kept = docs.join(removal.select("doc_id"), "doc_id", "left_anti")
    return kept, removal, clusters


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = api.get_session("curate-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = api.load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "n_chars")

    kept, removal, clusters = curate(docs, tau=0.8)
    n_docs = docs.count()
    n_removed = removal.count()
    print(f"docs: {n_docs}  near-dup clusters: "
          f"{clusters.select('cluster_id').distinct().count()}  "
          f"removed: {n_removed}  kept: {kept.count()}")
    print("sample removals (doc_id, cluster_id, cluster_size, n_chars):")
    for r in removal.orderBy("cluster_id", "doc_id").limit(5).collect():
        print(" ", tuple(r))


if __name__ == "__main__":
    main()
