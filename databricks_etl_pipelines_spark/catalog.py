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
    # --- round-3 rotation: CORRECTNESS_r01 ∪ r02 covers 96 of 129 queries.
    # Front of the cap: (a) the 4 queries that FAILED r2 on the TIMESTAMP_NTZ
    # testdata drift (fixed this round — need green rows), (b) the 33 queries
    # with no driver row in any round, (c) regression re-checks of queries
    # whose code changed since their last green row. Everything r2 verified
    # moves behind the cap.
    # (a) r2 FAIL — NTZ normalization fixed, verify under the driver
    "streaming_tumbling_hourly",
    "streaming_sliding_window",
    "streaming_stream_stream_join",
    "window_sessionize_events",
    # (b) never driver-checked (33)
    "similarity_ivf_persisted",
    "dedup_incremental_corpus",
    "ml_run_history",
    "agg_value_histogram",
    "diag_join_key_skew",
    "join_local_supplier_volume",
    "join_small_lot_revenue",
    "dedup_cluster_representatives",
    "similarity_pq_ivf_topk",
    "multimodal_downsample_stats",
    "text_repetition_signals",
    "dedup_passages",
    "curation_contamination_ngram",
    "text_lm_surprisal",
    "curation_shard_assignment",
    "curation_pack_sequences",
    "text_tfidf_top_terms",
    "embedding_centroid_per_label",
    "curation_corpus_composition",
    "embedding_int8_quantization",
    "text_sliding_chunks",
    "privacy_k_anonymity_audit",
    "curation_token_budget_select",
    "curation_mixture_weights",
    "curation_source_overlap",
    "dedup_semantic_clusters",
    "scalar_variant_json",
    "source_python_datasource",
    "source_python_stream_datasource",
    "streaming_stream_static_join",
    "window_funnel_ordered",
    "window_cohort_retention",
    "window_event_transitions",
    # (c) regression re-checks: green in r1 but code changed since
    "dedup_exact_documents",
    "text_token_stats",
    # (text_quality_score's rubric value is an output column of the
    # r3-checked curation_token_budget_select AND streaming_curation_ingest
    # oracles, so its re-check slot goes to a new query instead)
    "similarity_cosine_topk",
    "pipeline_gold_merchant_summary",
    "pipeline_gold_cardholder_features",
    "pipeline_gold_hourly_volume",
    "dedup_ngram_jaccard_pairs",
    # new round-3 queries — claim cap slots immediately (ADVICE r2).
    # Displaced to make room: agg_entity_features / merge_upsert_orders
    # (transitively re-verified by r2-green ml_feature_matrix /
    # change_feed_orders), flagship_pricing_risk_summary (the driver's
    # entry() smoke runs it every round, bench times it), and the rows-only
    # curation_funnel_report / dedup_minhash_lsh_pairs re-checks (weakest
    # signal class; pytest-pinned).
    "streaming_curation_ingest",
    "ml_quality_classifier",
    "window_resample_forward_fill",
    "curation_corpus_drift",
    "join_shipping_priority_topk",
    "text_vocab_encode",
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
