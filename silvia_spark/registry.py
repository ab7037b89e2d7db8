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
# order under a bounded budget (50 per round of the registered surface —
# whose count is len(_PRIORITY) - 1 for the sentinel, NOT a literal here
# because it grows with each round's contracts; tools/evidence_ledger.py
# checks the two stay in sync) — see SURVEY.md §5.1: a CORRECTNESS_rNN file holds
# AT MOST 50 entries, never the full surface. Ordering is therefore part
# of the contract surface.
# Rotation policy: contracts whose IMPLEMENTATION (plan OR oracle SQL)
# changed after their newest driver evidence go first (a green that predates
# the code it vouches for is not evidence), then contracts the driver has
# NEVER checked, then new contracts (sentinel), then evidence strictly
# oldest-first until the window is full; everything fresher rolls past the
# cut. Evidence ledger (latest driver round per contract) is derivable from
# the full CORRECTNESS_r0{1..N}.json series via tools/evidence_ledger.py.
_NEW_CONTRACTS_HERE = "__new_contracts_here__"

_PRIORITY: tuple[str, ...] = (
    # ============ r09 packing (evidence ledger after r08: r04=16, r05=48,
    # r06=46, r07=48, r08=50; all 208 checked at least once, 0 failures).
    # Window arithmetic: tier 0 (5 contracts whose implementation changed
    # in r09) + new r09 contracts (sentinel) + the entire r04 tail (16,
    # the r08 verdict's item 6) + the oldest r05 keys fill the remaining
    # slots. Each NEW contract registered this round displaces one r05
    # key (r05 keys beyond the cut roll to the r10 head — all hold green
    # r05 evidence and pass local parity every round). After this round
    # no contract's newest driver evidence is older than r05. ============
    # -- tier 0: implementation changed in r09 after newest (r08)
    #    evidence — the manifest layer was rewritten onto segmented
    #    manifests (O(batch) appends, commit_id claim identity, recorded
    #    read schemas) and vacuum's locking/grace semantics changed
    #    (r08 ADVICE); merge_keyed consumes the rewritten local_path URI
    #    normalizer (file:/ spellings). ------------------------------------
    "sink_table_manifest_commit", "stream_manifest_sink",
    "scan_manifest_changes", "scan_manifest_pruned", "sink_merge_keyed",
    # -- tier 0b: NEW in r09 — L15, additive schema evolution through the
    #    manifest layer (per-version read schemas; verdict item 2), and
    #    L16, the manifest table as a streaming SOURCE (version offsets,
    #    file-granular micro-batches; sources/manifest_stream.py). --------
    #    L17 z-order clustering feeding a multi-column manifest index. --
    "scan_manifest_schema_evolution", "stream_manifest_source",
    "scan_manifest_zorder",
    # -- tier 0c: NEW in r10 — L18 stats-pruned file-granular MERGE,
    #    L19 admission-controlled streaming source (maxFilesPerTrigger),
    #    L20 type-widening schema evolution (int→bigint upcast reads). --
    "sink_merge_pruned", "stream_manifest_admission",
    "scan_manifest_widened",
    # -- new contracts registered mid-round slot in here, inside the window --
    _NEW_CONTRACTS_HERE,
    # -- tier 1: the sixteen r04-era keys (oldest evidence anywhere) ------
    "sample_reservoir_group", "text_repetition_filter", "data_mix_sample",
    "shard_assign_balanced", "doc_chunk_windows", "embed_quantize_int8",
    "join_bloom_pruned", "agg_approx_percentile", "window_anomaly_zscore",
    "q12_shipmode_priority", "set_except_all", "set_intersect_all",
    "generator_outer_pos", "stream_running_moments", "udtf_lateral",
    "udf_arrow_scalar",
    # -- tier 2: r05-era evidence (48) — the window tail; the last ~21
    #    roll past the cut, one fewer for each new r09 contract ----------
    "join_inner_equi", "join_broadcast", "join_left_outer",
    "join_full_outer", "join_left_semi", "join_left_anti", "join_cross",
    "join_theta_range", "join_asof", "join_self", "join_5way_star",
    "agg_pricing_summary", "q3_shipping_priority", "agg_count_distinct",
    "agg_approx_distinct", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_having", "agg_stats", "window_rank_topn", "window_row_dense_ntile",
    "window_lag_lead", "text_contamination", "agg_histogram_width",
    "agg_bitwise", "agg_corr_exact", "agg_bool_quantifiers",
    "agg_filtered_counts", "agg_string_listagg", "scalar_try_arith",
    "scalar_url_parse", "scalar_radix", "scalar_bit_ops",
    "scalar_datetime_iso", "join_or_keys_union", "sink_sorted_zonemap",
    "source_json_corrupt", "stream_moments_live", "events_funnel_conversion",
    "events_attribution_touch", "dedup_near_keep_best", "embed_norm_stats",
    "text_entropy_quality", "sample_weighted_priority",
    "sim_ann_lsh_multiprobe", "window_trailing_interval", "source_xml",
    # -- tier 3: r06-era evidence -----------------------------------------
    "scalar_variant", "sim_ann_lsh_multiprobe2", "join_interval_overlap",
    "dedup_url_canonical", "join_asof_nearest", "etl_ua_referer_enrich",
    "etl_ip_geo_range", "etl_currency_convert", "scalar_collation",
    "window_moving_frame", "window_range_frame", "window_first_last",
    "stream_tumbling_1h", "stream_sliding", "stream_session_30m",
    "stream_dedup_exact", "stream_stateful_funnel", "stream_static_join",
    "stream_stream_join", "dedup_docs_exact", "dedup_docs_minhash",
    "dedup_docs_simhash", "sim_ann_lsh", "text_fuzzy_pairs",
    "udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped",
    "udtf_apply_in_pandas", "udtf_python", "udf_arrow_map",
    "text_tokenize_stats", "text_term_freq", "text_lang_profile",
    "text_fingerprint", "text_token_bpe", "multimodal_decode",
    "text_quality_filter", "filter_null_semantics", "agg_collect_sorted",
    "agg_percentiles", "agg_rollup_multires", "window_percent_rank",
    "join_bucketed_colocated", "join_skew_salted", "scan_partition_pruned",
    "source_python_datasource",
    # -- tier 4: r07-era evidence -----------------------------------------
    "sink_merge_scd2", "dedup_cluster_cc", "q17_small_quantity",
    "events_retention_cohort", "agg_heavy_hitters", "curation_pipeline",
    "q2_min_cost_supplier", "q9_product_profit", "q11_important_parts",
    "q16_supplier_part_counts", "q20_dominant_suppliers",
    "stream_kafka_shim_live", "scan_schema_evolution",
    "sink_compaction_small_files", "text_unigram_logprob",
    "sink_python_datasource", "q6_forecast_revenue", "q18_large_orders",
    "scalar_array", "scalar_map", "scalar_json", "scalar_cast",
    "scalar_hash", "scan_parquet", "source_csv_tsv", "source_json_lines",
    "sink_jdbc_postgres", "sink_parquet_partitioned", "proj_select_alias",
    "filter_compound", "proj_distinct", "filter_like_regexp",
    "subquery_scalar", "sort_multikey_nulls", "topk_limit", "limit_offset",
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "scalar_string", "scalar_regexp", "scalar_date", "scalar_math",
    "scalar_conditional", "pivot_unpivot", "join_null_safe",
    "join_range_banded",
    # -- tier 5: r08-fresh evidence — dead last ---------------------------
    "stream_foreachbatch_upsert", "multimodal_frame_sample", "text_tfidf",
    "q10_returned_items", "sample_stratified", "text_pack_sequences",
    "source_rate_stream", "sink_partition_overwrite", "source_orc",
    "window_ignore_nulls", "scan_dpp_join", "stream_transform_with_state",
    "stream_funnel_live", "stream_tumbling_live", "stream_session_live",
    "stream_dedup_live", "stream_static_join_live",
    "stream_stream_join_live", "scan_schema_enforce", "agg_time_gapfill",
    "sim_topk_cosine", "sim_join_threshold", "sim_centroids",
    "multimodal_join", "sim_ann_ivf", "text_lang_detect",
    "sim_ann_ivf_kmeans", "dedup_docs_embedding", "text_ngram_jaccard",
    "etl_events_enriched", "stream_watermark_late", "q5_local_supplier",
    "q4_order_priority", "q14_promo_revenue", "q19_disjunctive",
    "q22_dormant_customers", "agg_mode_frequent", "text_unicode_normalize",
    "text_pii_scrub", "q7_volume_shipping", "q8_market_share",
    "q13_order_distribution", "q15_top_supplier", "q21_waiting_orders",
    "window_gaps_islands",
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
    desired = head + new + tail
    if list(QUERIES) == desired:
        # Already ordered — skip the pop/reinsert cycle. Not just an
        # optimization: load_all_modules() runs inside parity.check, so a
        # caller iterating QUERIES while checking would otherwise have the
        # dict mutated under its iterator (pop+reinsert keeps len stable,
        # which CPython's iterator guard does not catch — iteration
        # silently skips or repeats entries instead of raising).
        return
    for name in desired:
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
        olap_extras,
        olap_extras3,
        olap_extras4,
        events_analytics,
        manifest_table,
    )
    from silvia_spark.streaming import batch_twins, streams  # noqa: F401
    from silvia_spark.functions import (  # noqa: F401
        curation_extras,
        training_extras,
        llm_extras,
        llm_ops,
        pipeline_extras,
        training_ops,
        udfs,
    )

    _reorder()
