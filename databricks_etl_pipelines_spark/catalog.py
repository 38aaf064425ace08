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
    # round-1 driver-unchecked families (SURVEY §2.5-2.9)
    "window_topn_per_user",
    "window_rank_dense_rank",
    "window_lag_lead",
    "window_rolling_avg",
    "window_cumulative_sum",
    "window_first_last",
    "window_ntile_percent_rank",
    "window_sessionize_events",
    "topk_orders_by_price",
    "sort_multikey",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except_subtract",
    "setop_except_all",
    "distinct_projection",
    "setop_intersect_all",
    "streaming_tumbling_hourly",
    "streaming_sliding_window",
    "streaming_session_window",
    "streaming_dedup_keys",
    "streaming_foreachbatch_merge",
    "streaming_stateful_totals",
    "streaming_stream_stream_join",
    "scalar_datetime_functions",
    "scalar_math_functions",
    "scalar_conditional_bucketing",
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
    # round-1 hard error / vacuous evidence — need fresh rows most
    "multimodal_byte_histogram",
    "join_anti_customers_without_orders",
    # new round-2 queries — no driver rows yet
    "sql_text_pricing_summary",
    "text_bpe_token_stats",
    "text_fingerprint_rolling",
    "join_salted_skew",
    "join_bucketed_colocated",
    "curation_stratified_sample",
    "curation_quota_per_language",
    # changed this round but green (or rows-only) in round 1
    "ml_feature_matrix",
    "dedup_embedding_cosine_blocked",
    # change_feed_orders' two-sided diff vs the merge oracle verifies the
    # merged snapshot completely, so it takes the cap slot; the snapshot
    # query itself sits just past the cap
    "change_feed_orders",
    "merge_upsert_orders",
    # slow rows-only entries (pytest-pinned) — fine past the cap
    "similarity_ivf_persisted",
    "dedup_incremental_corpus",
    "ml_run_history",
    "dedup_embedding_cosine_pairs",
    "curation_funnel_report",
    # high-value round-1-green sentinels to fill the remaining cap slots
    "flagship_pricing_risk_summary",
    "pipeline_silver_enrichment",
    "agg_entity_features",
    "join_asof_last_click",
    "pii_mask_and_tokenize",
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
