"""Query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here:

* a Spark callable ``(spark, sf_dir) -> DataFrame``
* optionally the equivalent ANSI SQL for the DuckDB oracle (omitted
  only for genuinely non-SQL-expressible ops -> driver runs the weaker
  rows-only check).

Column names must match between the two sides — the driver sorts
columns by name before hashing values.  Float aggregates are rounded
identically on both sides to keep the value hash stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Driver-visibility window: the correctness driver oracle-checks exactly the
# FIRST 50 entries of ``queries()`` in registration order (r5 confirmed all
# 50 window names landed in CORRECTNESS_r05.json).  The window rotates each
# round onto never-driver-checked names; everything else keeps registration
# order after it, with the still-never-checked names ahead of the
# already-green ones so future rounds can rotate coverage simply by editing
# this list.  Round-6 rotation: the 12 HUGEINT-cast-fixed oracles (incl. the
# r5 red row mixture_weights), the 5 contract-changed queries (pagerank /
# entropy / snapshot_diff / both semdedup entries), the r5-new text/quality
# diagnostics, multimodal audio+video, the dedup extras, the 8 never-checked
# TPC-H shapes, and the sources/sinks block.
DRIVER_WINDOW: list[str] = [
    # continuity rows (driver-green r1-r5, anchor the comparison)
    "q1_pricing_summary",
    "scope_project",
    # r6: oracles rewritten with CAST(... AS BIGINT) (HUGEINT fix; the
    # r5 red row mixture_weights must re-green under the new oracle)
    "mixture_weights",
    "dedup_span_coverage",
    "vocab_coverage",
    "embedding_quantize_int8",
    "q12_late_priority",
    "split_train_test",
    "mixture_resample",
    "token_budget_select",
    "window_running_distinct",
    "interval_concurrency",
    "jsonl_sink",
    "json_parse_quarantine",
    # r6: contract-changed queries (need fresh driver rows)
    "graph_pagerank",
    "column_entropy",
    "semdedup_cells",
    "semdedup_planted_k32",
    "snapshot_diff",
    # r5-new text/quality diagnostics (never driver-checked)
    "quality_unigram_logprob",
    "quality_bigram_logprob",
    "quality_bucket_shares",
    "text_script_profile",
    "stream_anomaly_zscore",
    "neardup_threshold_curve",
    "source_contamination_matrix",
    "minhash_estimate_calibration",
    "embedding_dim_stats",
    # multimodal audio / video header decode
    "multimodal_audio_real",
    "multimodal_video_real",
    # dedup extras
    "dedup_incremental",
    "dedup_containment",
    "corpus_dedup_survivors",
    "dedup_exact_normalized",
    # never-checked TPC-H shapes
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q14_promo_share",
    "q17_small_quantity",
    "q20_excess_stock",
    "q22_dormant_customers",
    # sources / sinks / config round-trips
    "jsonl_scan",
    "csv_scan",
    "csv_sink",
    "config_scan",
    "prompt_template_sub",
    "stdout_sink",
    "textfile_scan",
    "binaryfile_scan",
]

# Names hash-green in some CORRECTNESS_r0{1..5}.json — kept at the back of
# the registration order so never-checked queries fill the sampled prefix.
_DRIVER_GREEN_PAST = frozenset({
    "agg_approx_distinct", "agg_collect", "agg_cube", "agg_distinct",
    "agg_hash", "agg_rollup", "agg_stats", "any_to_str", "bm25_topk",
    "boilerplate_ngrams", "chatml_init", "chatml_mistral_rewrite",
    "cluster_rep_best", "collocation_pmi", "column_entropy",
    "contamination_check", "contamination_minhash", "dataset_manifest",
    "dedup_cluster_cc", "dedup_cluster_cc_star", "dedup_edit_distance",
    "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_minhash_lsh_salted", "dedup_minhash_signature",
    "dedup_ngram_jaccard", "dedup_paragraph", "dedup_simhash",
    "distinct_rows", "dsir_importance_weights", "filter_pred",
    "graph_pagerank", "join_anti", "join_asof", "join_asof_forward",
    "join_asof_nearest", "join_broadcast", "join_bucketed", "join_full",
    "join_inner_eq", "join_left", "join_semi", "join_theta_range",
    "json_clean", "json_extract", "json_serialize", "knn_join_batch",
    "lang_id", "llm_echo_map", "llm_echo_map_arrow", "llm_echo_mapreduce",
    "llm_echo_mapreduce_fused", "md_sink", "multimodal_decode_real",
    "outlier_iqr", "pack_greedy", "pack_greedy_sharded", "pack_quantized",
    "project_expr", "q1_pricing_summary", "quality_repetition",
    "quality_score", "runtime_bloom_join", "scalar_array_map",
    "scalar_conditional", "scalar_datetime", "scalar_math", "scalar_regexp",
    "scalar_string", "scope_project", "set_except", "set_intersect",
    "set_union_all", "sim_search_ivf", "sim_search_ivf_kmeans",
    "sim_search_pq", "sim_search_topk", "sketch_hll_merge",
    "sketch_theta_union", "stream_dedup_keys", "stream_funnel_sessions",
    "stream_running_max", "stream_session", "stream_tumble", "stringify_kv",
    "sv_pipeline_echo", "text_stats", "tf_idf_top_terms",
    "token_percentiles", "topk_global", "topk_per_group",
    "window_first_last", "window_lag_lead", "window_moving_avg",
    "window_moving_median", "window_ntile_cume", "window_rank",
    "window_ratio_to_report", "window_running_sum", "xml_tag_wrap",
    "zscore_by_group",
})


def _reorder_for_driver() -> None:
    """Reorder QUERIES/ORACLES: DRIVER_WINDOW first, then never-driver-
    checked names in registration order, then the already-green rest."""
    window = [n for n in DRIVER_WINDOW if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(window)]
    never_checked = [n for n in rest if n not in _DRIVER_GREEN_PAST]
    green = [n for n in rest if n in _DRIVER_GREEN_PAST]
    order = window + never_checked + green
    for registry_dict in (QUERIES, ORACLES):
        items = {n: registry_dict[n] for n in order if n in registry_dict}
        registry_dict.clear()
        registry_dict.update(items)


def load_all() -> None:
    """Import every query module (side effect: registration)."""
    import instructions_mr_spark.queries.reference_core  # noqa: F401
    import instructions_mr_spark.queries.relational  # noqa: F401
    import instructions_mr_spark.queries.joins  # noqa: F401
    import instructions_mr_spark.queries.windows  # noqa: F401
    import instructions_mr_spark.queries.scalars  # noqa: F401
    import instructions_mr_spark.queries.llm_pipeline  # noqa: F401
    import instructions_mr_spark.queries.text  # noqa: F401
    import instructions_mr_spark.queries.streaming_batch  # noqa: F401
    import instructions_mr_spark.queries.advanced  # noqa: F401
    import instructions_mr_spark.queries.extras  # noqa: F401
    import instructions_mr_spark.queries.tpch_rest  # noqa: F401
    import instructions_mr_spark.queries.graph  # noqa: F401
    import instructions_mr_spark.queries.sampling  # noqa: F401
    import instructions_mr_spark.queries.analytics  # noqa: F401
    import instructions_mr_spark.queries.stats  # noqa: F401
    import instructions_mr_spark.queries.packing  # noqa: F401
    import instructions_mr_spark.queries.io_roundtrip  # noqa: F401
    import instructions_mr_spark.queries.lake_ops  # noqa: F401
    import instructions_mr_spark.queries.web  # noqa: F401

    _reorder_for_driver()
