"""Contract registry — maps SURVEY.md §2 contract names to implementations.

Each operator module registers its queries with the ``@contract`` decorator;
``__spark_entry__.py`` exposes the aggregate dicts to the driver.

A contract entry is:
- a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first implementation)
- optionally an ANSI-SQL oracle string DuckDB runs on the same parquet views
  (omitted → the driver records a weaker rows-only check).

Alias discipline: every computed column is aliased identically in both the
DataFrame code and the oracle SQL — the driver's value-hash sorts columns by
name before hashing (SURVEY.md §5.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def contract(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn
    return deco


# Driver-facing verification order. The driver walks ``queries()`` in dict
# order under a bounded budget (50 of 105+ per round), so ordering is part of
# the contract surface. Rotation policy (r03): contracts with ZERO driver
# evidence across all rounds go first, then contracts whose only oracle-grade
# evidence predates the current code (oldest-evidence-first), then contracts
# hash-green in the immediately preceding round go dead last. Contracts
# registered but absent from this list (i.e. newly added mid-round) slot in at
# the ``_NEW_CONTRACTS_HERE`` sentinel — never after the tail.
_NEW_CONTRACTS_HERE = "__new_contracts_here__"

_PRIORITY: tuple[str, ...] = (
    # -- tier 0: never sampled by any driver round (I10 + six *_live) --------
    # Each *_live is a real availableNow streaming job (seconds, not ms) but
    # seven slots of a 50-query budget buys their first-ever driver rows.
    "stream_transform_with_state",
    "stream_tumbling_live", "stream_session_live", "stream_dedup_live",
    "stream_funnel_live", "stream_static_join_live", "stream_stream_join_live",
    # -- tier 1: oracles written after their last rows-only driver run --------
    "source_csv_tsv", "sink_jdbc_postgres",
    "source_rate_stream", "stream_watermark_late",
    # -- tier 2: contracts added in r03 (+ sentinel for later additions) -----
    # Window math: tiers 0-2 fill ~32 of the driver's 50 slots, leaving ~18
    # r1-era refreshes this round. Deliberate: a first-ever driver row for a
    # new contract is strictly more evidence than re-confirming a green one,
    # and every contract is re-proven at sf0.001 by the in-repo parity suite
    # each round (recorded in PROGRESS.jsonl). r04 should demote this tier
    # to the tail and spend its window on the remaining refreshes.
    "sim_ann_ivf_kmeans",
    "dedup_docs_embedding", "text_ngram_jaccard", "text_pack_sequences",
    "sample_stratified", "source_orc",
    "etl_events_enriched", "q10_returned_items", "agg_time_gapfill",
    "text_tfidf", "multimodal_frame_sample",
    "subquery_scalar", "pivot_unpivot", "scan_dpp_join", "join_null_safe",
    "curation_pipeline", "join_range_banded",
    "window_ignore_nulls", "sink_partition_overwrite",
    _NEW_CONTRACTS_HERE,
    # -- tier 3: r01-era evidence, stale against r02 refactors; cheap first --
    "scan_parquet", "scan_schema_enforce", "source_json_lines",
    "sink_parquet_partitioned", "proj_select_alias", "filter_compound",
    "proj_distinct", "filter_like_regexp", "scalar_string", "scalar_regexp",
    "scalar_date", "scalar_math", "scalar_conditional",
    "sort_multikey_nulls", "topk_limit", "limit_offset",
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "join_inner_equi", "join_broadcast", "join_left_outer", "join_full_outer",
    "join_left_semi", "join_left_anti", "join_cross", "join_theta_range",
    "join_asof", "join_self", "join_5way_star",
    "agg_pricing_summary", "q3_shipping_priority", "agg_count_distinct",
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_having", "agg_stats",
    "window_rank_topn", "window_row_dense_ntile", "window_lag_lead",
    "window_moving_frame", "window_range_frame", "window_first_last",
    "agg_approx_distinct",
    # -- tier 4: hash-green in r02 — freshest evidence, dead last ------------
    "scalar_array", "scalar_map", "scalar_json", "scalar_cast", "scalar_hash",
    "filter_null_semantics", "agg_collect_sorted",
    "agg_percentiles", "agg_rollup_multires", "window_percent_rank",
    "join_bucketed_colocated", "join_skew_salted", "scan_partition_pruned",
    "source_python_datasource",
    "q6_forecast_revenue", "q18_large_orders",
    "stream_tumbling_1h", "stream_sliding", "stream_session_30m",
    "stream_dedup_exact", "stream_stateful_funnel", "stream_static_join",
    "stream_stream_join",
    "udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped",
    "udtf_apply_in_pandas", "udtf_python", "udf_arrow_map",
    "dedup_docs_exact", "dedup_docs_minhash", "dedup_docs_simhash",
    "sim_topk_cosine", "sim_join_threshold", "sim_ann_lsh", "sim_ann_ivf",
    "sim_centroids", "text_tokenize_stats", "text_term_freq",
    "text_lang_profile", "text_lang_detect", "text_fingerprint",
    "text_token_bpe", "text_fuzzy_pairs", "multimodal_join",
    "multimodal_decode", "text_quality_filter", "stream_foreachbatch_upsert",
)


def _reorder() -> None:
    """Rebuild QUERIES/ORACLE in _PRIORITY order. Registered names absent from
    _PRIORITY slot in at the _NEW_CONTRACTS_HERE sentinel (registration order
    preserved within the slot) so new contracts are always driver-reachable."""
    sentinel_idx = _PRIORITY.index(_NEW_CONTRACTS_HERE)
    head = [n for n in _PRIORITY[:sentinel_idx] if n in QUERIES]
    tail = [n for n in _PRIORITY[sentinel_idx + 1:] if n in QUERIES]
    listed = set(head) | set(tail)
    new = [n for n in QUERIES if n not in listed]
    for name in head + new + tail:
        QUERIES[name] = QUERIES.pop(name)
        if name in ORACLE:
            ORACLE[name] = ORACLE.pop(name)


def load_all_modules() -> None:
    """Import every operator module so registrations run. Idempotent."""
    from silvia_spark.operators import (  # noqa: F401
        scans,
        projections,
        joins,
        aggregations,
        windows,
        sorts,
        setops,
        scalars,
        scale_patterns,
        composites,
    )
    from silvia_spark.streaming import batch_twins, streams  # noqa: F401
    from silvia_spark.functions import (  # noqa: F401
        llm_extras,
        llm_ops,
        pipeline_extras,
        training_ops,
        udfs,
    )

    _reorder()
