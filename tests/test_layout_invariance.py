"""Physical-layout invariance — the 100 TB posture made testable.

At cluster scale every table is a DIRECTORY of part files, not the single
file the test corpus ships. Results must not depend on that physical
choice: this suite stages sf0.001 as multi-part directories (2–3 parts
per table, split by repartition) and asserts contracts produce
fingerprint-identical results on both layouts. Catches anything that
silently assumes one file — footer sniffing, first()-based plan
constants, partition-count-sensitive accumulations.
"""

from __future__ import annotations

import pytest

from silvia_spark import registry
from tests import parity
from tests.conftest import SF_SMALL

registry.load_all_modules()

# One contract per major family, chosen to cross every table the staging
# writes and every accumulation style (grid sums, windows, topk, explode,
# GEMM-by-join, inverted index).
_CONTRACTS = [
    "agg_pricing_summary",       # lineitem grid sums
    "q3_shipping_priority",      # 3-table join + topk
    "window_gaps_islands",       # events windows
    "stream_tumbling_1h",        # events time bucketing (batch twin)
    "text_entropy_quality",      # documents explode + grid sum
    "dedup_docs_minhash",        # documents banded MinHash
    "sim_topk_cosine",           # embeddings GEMM (query vec via first())
    "etl_events_enriched",       # events + nation composite
]

_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def sf_dir_multipart(spark, tmp_path_factory):
    """sf0.001 restaged with every table as a 2-3 part parquet DIRECTORY."""
    from silvia_spark.io import load_table

    root = str(tmp_path_factory.mktemp("sf_multipart"))
    for i, t in enumerate(_TABLES):
        parts = 2 + (i % 2)
        (load_table(spark, SF_SMALL, t).repartition(parts)
         .write.parquet(f"{root}/{t}.parquet"))
    return root


@pytest.mark.parametrize("name", _CONTRACTS)
def test_layout_invariant(name, spark, sf_dir_multipart):
    single = parity.frame_fingerprint(
        *parity.run_spark(registry.QUERIES[name], spark, SF_SMALL))
    multi = parity.frame_fingerprint(
        *parity.run_spark(registry.QUERIES[name], spark, sf_dir_multipart))
    assert single == multi, (
        f"{name}: result depends on physical file layout "
        f"(single-file {single} vs multi-part-dir {multi})")
