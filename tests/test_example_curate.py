"""The README's front-door example (examples/curate_corpus.py) must
actually run — and its keep-best selection must satisfy the invariants
the prose claims: exactly one survivor per near-dup cluster, survivors
are the longest member (tie -> smallest id), kept + removed == corpus."""

from __future__ import annotations

import pytest

from examples.curate_corpus import curate
from silvia_spark.io import load_table
from tests.conftest import SF_SMALL

# CI-mode only (suite-time budget): the front-door example is also
# executable directly (python examples/curate_corpus.py) and its kernels
# are covered in the default run by test_api_facade + test_properties.
pytestmark = pytest.mark.full


def test_example_pipeline_invariants(spark):
    docs = load_table(spark, SF_SMALL, "documents") \
        .select("doc_id", "text", "n_chars")
    kept, removal, clusters = curate(docs, tau=0.8)

    n_docs = docs.count()
    removed = {r.doc_id for r in removal.collect()}
    assert kept.count() == n_docs - len(removed)
    assert removed, "sf0.001 corpus plants near-dups; none found"

    members: dict[int, list] = {}
    quality = {r.doc_id: r.n_chars for r in
               docs.select("doc_id", "n_chars").collect()}
    for r in clusters.collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, ids in members.items():
        survivors = [d for d in ids if d not in removed]
        assert len(survivors) == 1, (cid, ids, survivors)
        best = sorted(ids, key=lambda d: (-quality[d], d))[0]
        assert survivors[0] == best
