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
    # --- round-5 rotation. The driver checks the FIRST 50 registry
    # entries per round. r4 landed 49 ok + 1 rows-only / 0 FAIL, so this
    # round's cap goes to the evidence-staleness tail the r4 verdict
    # named, in its order, then everything whose CODE changed in round 5,
    # then the stalest r1-latest sentinels.
    # (a) oracle upgraded after the latest driver row (pack_sequences'
    # layout also changed in 4d) — first-ever HARD rows for these
    "curation_pack_sequences",
    "similarity_lsh_ann_topk",
    "similarity_pandas_udf_topk",
    "multimodal_chunk_energy",
    # (b) never driver-checked (judge-run oracle green in r4's session)
    "dim_scd2_point_in_time",
    "dim_scd2_with_deletes",
    "similarity_incremental_ivf",
    "streaming_cdc_dimension",
    "sql_exists_late_orders",
    "sql_in_having_big_orders",
    "sql_scalar_anti_customers",
    "sql_volume_shipping",
    "sql_market_share",
    # (c) round-5 code changes: new one-scan winsorize; BPE trainer now
    # defaults to the driver-local merge loop; leakage split grew a
    # pluggable pair_fn; weighted sample gained the in-scan weight guard;
    # preference_pairs default margin; and every query whose write path
    # crosses the new append/merge type-drift check
    "agg_winsorize_zscore_onescan",
    "text_bpe_train_merges",
    "text_bpe_encode_stats",
    "curation_leakage_safe_split",
    "curation_leakage_split_minhash",
    "curation_pack_split_oversized",
    "curation_weighted_sample",
    "sft_dpo_pairs",
    "cdc_apply_orders",
    "scd2_incremental_orders",
    "streaming_scd2_dimension",
    "merge_upsert_orders",
    "change_feed_orders",
    "streaming_foreachbatch_merge",
    "streaming_curation_ingest",
    # (d) stalest sentinels (latest driver row is r1)
    "flagship_pricing_risk_summary",
    "agg_entity_features",
    "agg_dq_summary",
    "agg_hourly_volume_stats",
    "agg_ungrouped_global",
    "agg_rollup",
    "agg_cube",
    "agg_percentiles",
    "agg_collect_set",
    "agg_grouping_sets",
    "agg_pivot_status_counts",
    "agg_null_handling",
    "pipeline_silver_enrichment",
    "pipeline_quarantine_summary",
    "join_inner_customer_orders",
    "join_broadcast_dims",
    "join_left_outer",
    "join_full_outer",
    "join_semi_urgent_customers",
    "join_three_way_topk_revenue",
    "join_asof_last_click",
    "join_range_clicks_before_error",
    # ---------------- 50-slot cap boundary ----------------
    # remaining r1-latest sentinels, then r2-latest, for overflow runs
    "text_quality_score",
    "text_language_id",
    "dedup_embedding_cosine_pairs",
    "dedup_embedding_cosine_blocked",
    "multimodal_binary_stats",
    "scalar_string_functions",
    "pii_mask_and_tokenize",
    "privacy_gdpr_erase_users",
    "curation_prepare_corpus",
    "curation_token_budget_select",
    "curation_quota_per_language",
    "streaming_stateful_totals",
    "source_python_stream_datasource",
    "ml_quality_classifier",
    "ml_run_history",
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
