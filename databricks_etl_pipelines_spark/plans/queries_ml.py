"""ML-lifecycle queries (SURVEY §2.11 / §7 M9): feature export, model
train/compare, distributed batch scoring over the TPC-H entity features.

Non-SQL-expressible (iterative tree ensembles), so these are rows-only
checks per the driver contract — no ``oracle_sql`` entries. The label and
feature matrix themselves ARE oracle-checked upstream via
``agg_entity_features`` (queries_aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.ml.fraud import (
    batch_score,
    ensure_two_classes,
    feature_matrix,
    stratified_split,
    train_compare,
)
from databricks_etl_pipelines_spark.ml.runlog import RunLog
from databricks_etl_pipelines_spark.plans.queries_aggregates import (
    _FEATURES_ORACLE,
    agg_entity_features,
)
from databricks_etl_pipelines_spark.sources.scratch import scratch_dir

FEATURE_COLS = [
    "order_count", "total_spend", "avg_order_value", "stddev_order_value",
    "min_order_value", "max_order_value", "status_diversity",
    "priority_diversity", "active_days", "fulfilled_count", "urgent_count",
    "jumbo_count", "fulfilled_spend", "urgent_ratio", "coeff_variation",
]


def _matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = agg_entity_features(spark, sf_dir)
    mat = feature_matrix(
        feats, FEATURE_COLS, label_col="is_suspicious", id_col="o_custkey"
    )
    return ensure_two_classes(mat, fallback_col="avg_order_value")


# Training is deterministic (seeded classifiers, hash-based split), so the
# fitted models for a given sf_dir are a pure function of the data: memoize
# per-process so the predictions query and the metrics query don't each
# refit both classifiers.
_TRAIN_CACHE: dict[str, tuple] = {}


def _trained(spark: SparkSession, sf_dir: str):
    if sf_dir not in _TRAIN_CACHE:
        import os

        # These queries verify the LIFECYCLE (train→log→champion→score),
        # not the fitted metric values — rows-only in the driver by design —
        # so default to the small ensembles and keep a driver slot cheap.
        # SPARK_GRAFT_FULL_ML=1 restores the reference-parity fit sizes
        # (maxIter=20 / numTrees=100); the parity pytest calls
        # train_compare directly and always fits full-size.
        fast = os.environ.get("SPARK_GRAFT_FULL_ML") != "1"
        mat = _matrix(spark, sf_dir)
        if fast:
            # The per-entity matrix is tiny relative to the cluster (one row
            # per customer); tree fits launch a job per iteration, so 32
            # near-empty partitions are pure scheduling overhead. Shape the
            # fit input to a few partitions in the fast path only.
            mat = mat.coalesce(1)
        mat = mat.cache()
        train, test = stratified_split(mat, id_col="o_custkey")
        run_log = RunLog(scratch_dir("ml_runs_"))
        best, models, metrics = train_compare(
            train, test, FEATURE_COLS, run_log=run_log, fast=fast
        )
        mat.unpersist()
        _TRAIN_CACHE[sf_dir] = (best, models, metrics, run_log)
    return _TRAIN_CACHE[sf_dir]


# M1 is relational (casts + null-drop over the oracled feature table), so
# unlike the learned-model queries it gets a FULL oracle: wrap the entity-
# features SQL with the same double casts and the dropna predicate.
# (ensure_two_classes is a no-op whenever both label classes exist, which
# holds on this data at every sf; the oracle asserts exactly that shape.)
_MATRIX_CASTS = ",\n  ".join(
    f"CAST({c} AS DOUBLE) AS {c}" for c in FEATURE_COLS
)
_MATRIX_NOT_NULL = " AND ".join(f"{c} IS NOT NULL" for c in FEATURE_COLS)
_MATRIX_ORACLE = f"""
WITH base AS ({_FEATURES_ORACLE})
SELECT o_custkey,
  {_MATRIX_CASTS},
  CAST(is_suspicious AS DOUBLE) AS label
FROM base
WHERE {_MATRIX_NOT_NULL}
"""


@query("ml_feature_matrix", _MATRIX_ORACLE)
def ml_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: the model-ready matrix (id + 15 double features + label)."""
    return _matrix(spark, sf_dir)


@query("ml_fraud_predictions")
def ml_fraud_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3-M7 end to end: split, train GBT + RF, pick champion by F1, score
    the FULL entity population distributed (04:302-325 equivalent)."""
    best, models, _, _ = _trained(spark, sf_dir)
    return batch_score(models[best], _matrix(spark, sf_dir), id_col="o_custkey")


@query("ml_run_history")
def ml_run_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLflow tracking/registry analog (04:131-193, 253-289): one row per
    logged training run with params/metrics JSON and a champion flag from
    the registry pointer (rows-only: learned metric values)."""
    _, _, _, run_log = _trained(spark, sf_dir)
    champ = run_log.champion()
    champ_id = champ["run_id"] if champ else None
    return run_log.runs(spark).select(
        "run_id", "model", "params", "metrics",
        (F.col("run_id") == F.lit(champ_id)).alias("is_champion"),
    )


@query("ml_model_metrics")
def ml_model_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5+M6: per-model held-out metrics with the F1 champion flagged."""
    best, _, metrics, _ = _trained(spark, sf_dir)
    rows = [
        (name, m["accuracy"], m["precision"], m["recall"], m["f1"], m["auc"],
         name == best)
        for name, m in sorted(metrics.items())
    ]
    return spark.createDataFrame(
        rows, "model string, accuracy double, precision double, "
        "recall double, f1 double, auc double, is_best boolean",
    ).orderBy(F.desc("f1"))


@query("ml_quality_classifier")
def ml_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus quality filtering (ml/quality.py): hashed-BoW +
    LogisticRegression trained on the rubric's weak labels, then the
    whole documents table scored distributed. Rows-only (learned
    probabilities); the training-free pieces are oracle-checked elsewhere
    (the rubric via curation/text queries, the corpus itself everywhere)."""
    from databricks_etl_pipelines_spark.ml.quality import (
        score_quality,
        train_quality_classifier,
    )
    from databricks_etl_pipelines_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    model = train_quality_classifier(docs)
    return score_quality(model, docs)
