"""Shuffle-order determinism guard — SURVEY.md §5.2.5.

Every contract whose output contains floating-point aggregates is run
under two shuffle-partition settings (4 vs 17). Identical fingerprints ⇒
the result is independent of partition merge order — the property the
order-independent long-grid sums (functions/numeric.py) exist to provide,
and the reason a driver hash-check at a different parallelism can't flake.
"""

from __future__ import annotations

import pytest

from silvia_spark import registry
from tests import parity
from tests.conftest import SF_SMALL

registry.load_all_modules()

# Double/decimal-aggregating or otherwise order-sensitive surfaces.
_NUMERIC = [
    "agg_pricing_summary", "agg_stats", "agg_rollup", "agg_cube",
    "filter_null_semantics", "scalar_json", "scalar_math",
    "stream_tumbling_1h", "stream_static_join", "stream_session_30m",
    "sim_centroids", "multimodal_join", "text_tokenize_stats",
    "sim_topk_cosine", "sim_join_threshold", "sim_ann_lsh",
    "window_moving_frame", "q3_shipping_priority",
    "agg_percentiles", "agg_rollup_multires", "window_percent_rank",
    # r03 additions with double outputs or divisions:
    "etl_events_enriched", "q10_returned_items", "text_tfidf",
    "text_ngram_jaccard", "text_pack_sequences", "source_orc",
    "dedup_docs_embedding", "subquery_scalar",
]


def _fingerprint(name, spark, partitions: int):
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        cols, rows = parity.run_spark(
            registry.QUERIES[name], spark, SF_SMALL)
        return parity.frame_fingerprint(cols, rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")


@pytest.mark.parametrize("name", _NUMERIC)
def test_partitioning_invariance(name, spark):
    assert _fingerprint(name, spark, 4) == _fingerprint(name, spark, 17), \
        f"{name}: result depends on shuffle partitioning"
