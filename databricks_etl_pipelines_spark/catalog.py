"""Query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named query
(callable ``(spark, sf_dir) -> DataFrame``) plus, where SQL-expressible, a
DuckDB oracle SQL string over the same parquet tables. The driver harness
runs both sides and hash-compares results, so:

  * every computed column is aliased identically on both sides;
  * nondeterministic functions never reach compared columns;
  * double aggregates are rounded on both sides with matching op order;
  * integer sums in oracle SQL are CAST(... AS BIGINT) (DuckDB sums ints to
    HUGEINT, Spark to LongType).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver harness evaluates queries in registration order and caps the
# per-round run (round 1 stopped at 50 of 88, leaving every window/set-op/
# streaming/late-scalar query without a hard CORRECTNESS row). PRIORITY pins
# the front of the catalog: families with no driver evidence yet come first,
# then queries changed this round, then a few high-value sentinels. Rotate
# per round so every query eventually gets a hard-signal row.
PRIORITY: list[str] = [
    # --- round-6 rotation. r5's 50 slots all landed green, so this cap
    # refreshes the staleness tail the r5 verdict named:
    # (a) the NEW hard-oracle query closing the last rows-only LLM gap
    # (streaming near-dup admission, full per-batch SQL replay)
    "streaming_curation_neardup_crossengine",
    # (b) queries whose CODE changed in round 5 but whose latest driver
    # row predates the change (textfns/vectors ANSI audit, windows, scd,
    # sft, similarity, multimodal, sql — the verdict's named list)
    "text_quality_score",
    "window_anomaly_zscore",
    "text_zipf_diagnostics",
    "similarity_cosine_topk",
    "dedup_embedding_cosine_pairs",
    "dedup_embedding_cosine_blocked",
    "curation_prepare_corpus",
    "sft_rendered_conversations",
    "multimodal_patch_retrieval",
    "sql_waiting_suppliers",
    # (c) round-6 code changes: preference_pairs default-margin plumbing;
    # the NEW benchmark-decontamination operator; the approx-distinct
    # sketch upgraded from rows-only to an error-bound hard oracle; the
    # NEW ANN recall@k report (both rankings + the recall values replayed)
    "sft_dpo_pairs",
    "curation_decontaminate_benchmark",
    "agg_approx_count_distinct",
    "similarity_ann_recall",
    # (c2) late-round-6 code changes: the NEW streaming bottom-k
    # reservoir sample + KMV distinct sketch (exact-replay oracles);
    # the connected-components single-scan edge fix (every query that
    # folds pairs through duplicate_clusters); the vocabulary-cap
    # TakeOrderedAndProject fix (every word_frequencies / vocab-rank
    # caller)
    "streaming_reservoir_sample",
    "streaming_kmv_distinct",
    "agg_kmv_distinct",
    "agg_approx_percentile_bounds",
    "dedup_cluster_representatives",
    "curation_leakage_safe_split",
    "curation_leakage_split_minhash",
    "text_bpe_train_merges",
    "text_bpe_encode_stats",
    # text_zipf_diagnostics also flows through word_frequencies but is
    # already pinned above in the (b) r5-rotation group
    "text_vocab_encode",
    # (d) stalest oracle-backed evidence: driver row is r1
    "text_language_id",
    "multimodal_binary_stats",
    "scalar_string_functions",
    "pii_mask_and_tokenize",
    # (e) stalest oracle-backed evidence: driver row is r2 — full window
    # family, co-location/skew joins, curation sampling, streaming
    # drains, then the scalar family to the 50-slot boundary
    "window_topn_per_user",
    "window_rank_dense_rank",
    "window_lag_lead",
    "window_rolling_avg",
    "window_cumulative_sum",
    "window_first_last",
    "window_ntile_percent_rank",
    "join_salted_skew",
    "join_bucketed_colocated",
    "join_anti_customers_without_orders",
    "curation_quota_per_language",
    "curation_stratified_sample",
    "streaming_stateful_totals",
    "streaming_session_window",
    "streaming_dedup_keys",
    "text_bpe_token_stats",
    "text_fingerprint_rolling",
    "multimodal_byte_histogram",
    "ml_feature_matrix",
    "scalar_datetime_functions",
    "scalar_math_functions",
    "scalar_conditional_bucketing",
    # ---------------- 50-slot cap boundary ----------------
    # (e-tail) demoted unchanged-since-r2 scalar re-checks to make room
    # for the (c2) round-6 code changes — their code has no round-6 diff,
    # so a fresh row adds the least signal of anything above
    "scalar_conditional_risk_score",
    "scalar_boolean_or_labeling",
    "scalar_array_element_at",
    "scalar_map_literal_lookup",
    "filter_predicates",
    "json_extract_events",
    "scalar_regexp_functions",
    "scalar_explode_word_counts",
    "scalar_unpivot_stack",
    "scalar_collection_functions",
    "scalar_from_json_struct",
    "topk_orders_by_price",
    # overflow: remaining r1/r2-latest (rows-only first — they only get
    # weaker rows anyway), then r2 set-ops for overflow runs
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "similarity_ivf_topk",
    "curation_funnel_report",
    "ml_fraud_predictions",
    "ml_model_metrics",
    "sort_multikey",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except_subtract",
    "setop_except_all",
    "distinct_projection",
    "setop_intersect_all",
    "sql_text_pricing_summary",
]


def load_all() -> None:
    """Import every module that registers queries (idempotent), then apply
    the PRIORITY ordering to both registries in place."""
    from databricks_etl_pipelines_spark.plans import (  # noqa: F401
        queries_aggregates,
        queries_joins,
        queries_llm,
        queries_mixture,
        queries_ml,
        queries_pipeline,
        queries_scalar,
        queries_scd,
        queries_sortset,
        queries_sql,
        queries_streaming,
        queries_windows,
    )

    ordered = [n for n in PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for registry in (QUERIES, ORACLES):
        reordered = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(reordered)
