"""Fraud-detection model lifecycle, re-expressed distributed-first.

Parity map to the reference's `04_MLflow_Fraud_Detection.py`:

  * M1 feature selection + dropna       — 04:61-75  → ``feature_matrix``
  * M2 single-class median fallback     — 04:82-87  → ``ensure_two_classes``
  * M3 stratified train/test split      — 04:93-95  → ``stratified_split``
  * M4 StandardScaler fit/transform     — 04:99-101 → ``make_pipeline``
  * M5 GBT/RF train + 5 metrics         — 04:131-244 → ``train_and_evaluate``
  * M6 compare by F1, pick best         — 04:253-289 → ``train_compare``
  * M7 batch inference → table          — 04:302-325 → ``batch_score``

Design departure (deliberate, documented in SURVEY §3 EP5): the reference
collects the whole feature table to the driver with ``toPandas()`` and
trains scikit-learn locally — fine at 10 rows, fatal at 100 TB. Here every
stage is ``pyspark.ml`` (JVM, distributed): VectorAssembler → StandardScaler
→ GBTClassifier / RandomForestClassifier, and scoring is a distributed
``model.transform``, so the identical code runs on a 1000-executor cluster.
A driver-local pandas export (``feature_matrix_pandas``, Arrow-accelerated)
is kept for parity with the reference's sklearn interchange (S9) and for
users who want to plug in scikit-learn at small scale; scikit-learn itself
is optional and gated behind an import-try.

Determinism: both classifiers are seeded, and the train/test split is
hash-based (``xxhash64(id, seed)``) rather than Bernoulli-sampled, so the
partition layout cannot change which rows land in train vs test.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier, RandomForestClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
)
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional; not present in the test container
    import sklearn  # noqa: F401

    HAS_SKLEARN = True
except ImportError:  # pragma: no cover
    HAS_SKLEARN = False

LABEL_COL = "label"
DEFAULT_SEED = 42


def feature_matrix(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    id_col: str,
) -> DataFrame:
    """M1: select id + features + label, cast features to double, drop rows
    with any null feature (04:61-75's ``dropna``). Stays one narrow
    projection — column pruning reaches the scan."""
    cols = [F.col(id_col)] + [F.col(c).cast("double").alias(c) for c in feature_cols]
    cols.append(F.col(label_col).cast("double").alias(LABEL_COL))
    return df.select(*cols).na.drop(subset=feature_cols)


def ensure_two_classes(df: DataFrame, fallback_col: str) -> DataFrame:
    """M2: if the label collapsed to a single class, relabel by median split
    on ``fallback_col`` (04:82-87). Median via ``percentile_approx`` — a
    single-pass distributed sketch, not a driver-side sort."""
    classes = df.select(LABEL_COL).distinct().count()
    if classes >= 2:
        return df
    median = df.select(
        F.percentile_approx(fallback_col, 0.5).alias("m")
    ).first()["m"]
    return df.withColumn(
        LABEL_COL, (F.col(fallback_col) > F.lit(median)).cast("double")
    )


def stratified_split(
    df: DataFrame,
    id_col: str,
    test_frac: float = 0.2,
    seed: int = DEFAULT_SEED,
) -> tuple[DataFrame, DataFrame]:
    """M3: deterministic stratified-in-expectation split. Bucketing each id
    by ``xxhash64(id, seed) % 100`` is reproducible across runs and
    partitionings (unlike ``randomSplit``, whose assignment depends on
    partition layout), needs no per-class driver round-trip, and for any
    class with enough members lands ~test_frac of it in test — the property
    sklearn's ``stratify=y`` gives (04:93-95)."""
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(100))
    cutoff = int(test_frac * 100)
    return df.filter(bucket >= cutoff), df.filter(bucket < cutoff)


def make_pipeline(classifier, feature_cols: list[str]) -> Pipeline:
    """M4: assemble → scale → classify, one pyspark.ml Pipeline so the
    scaler fitted on train is the exact object reused at inference (the
    reference couples them implicitly through notebook session state,
    04:99-101 vs 04:313)."""
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="features_raw", handleInvalid="skip"
    )
    scaler = StandardScaler(
        inputCol="features_raw", outputCol="features", withMean=True, withStd=True
    )
    return Pipeline(stages=[assembler, scaler, classifier])


def default_classifiers(
    seed: int = DEFAULT_SEED, fast: bool = False
) -> dict[str, object]:
    """M5: the reference's two contenders (04:131, 04:206).

    ``fast=True`` shrinks the ensembles (maxIter 20→3, numTrees 100→10)
    for harness/driver runs where the lifecycle shape — not the fitted
    metric values — is under test; parity fits keep the defaults.
    """
    return {
        "gradient_boosting": GBTClassifier(
            labelCol=LABEL_COL, featuresCol="features",
            maxIter=3 if fast else 20, seed=seed,
        ),
        "random_forest": RandomForestClassifier(
            labelCol=LABEL_COL, featuresCol="features",
            numTrees=10 if fast else 100, seed=seed,
        ),
    }


def evaluate(predictions: DataFrame) -> dict[str, float]:
    """M5: accuracy / precision / recall / F1 (positive class, matching
    sklearn's binary default at 04:158-165) + ROC AUC.

    The four threshold metrics come from ONE confusion-matrix aggregation
    (a single pass with map-side partial agg) instead of four evaluator
    passes; they equal MulticlassClassificationEvaluator's
    accuracy/precisionByLabel/recallByLabel/fMeasureByLabel at
    metricLabel=1.0, including its 0.0 convention for empty denominators.
    AUC needs the score ranking, so it stays a BinaryClassificationEvaluator
    pass.
    """
    predictions = predictions.persist()
    try:
        pos_pred = F.col("prediction") == 1.0
        pos_label = F.col(LABEL_COL) == 1.0
        cm = predictions.agg(
            F.count("*").alias("n"),
            F.sum((pos_pred & pos_label).cast("long")).alias("tp"),
            F.sum((pos_pred & ~pos_label).cast("long")).alias("fp"),
            F.sum((~pos_pred & pos_label).cast("long")).alias("fn"),
            F.sum((~pos_pred & ~pos_label).cast("long")).alias("tn"),
        ).first()
        precision = cm.tp / (cm.tp + cm.fp) if (cm.tp + cm.fp) else 0.0
        recall = cm.tp / (cm.tp + cm.fn) if (cm.tp + cm.fn) else 0.0
        out = {
            "accuracy": round((cm.tp + cm.tn) / cm.n, 6) if cm.n else 0.0,
            "precision": round(precision, 6),
            "recall": round(recall, 6),
            "f1": round(
                2 * precision * recall / (precision + recall), 6
            ) if (precision + recall) else 0.0,
        }
        auc = BinaryClassificationEvaluator(
            labelCol=LABEL_COL, rawPredictionCol="rawPrediction",
            metricName="areaUnderROC",
        )
        out["auc"] = round(auc.evaluate(predictions), 6)
        return out
    finally:
        predictions.unpersist()


def classifier_params(clf) -> dict:
    """The run-loggable hyperparameters of a contender (MLflow log_params
    analog, 04:141-147): every explicitly-set param plus the seeds."""
    return {
        p.name: v
        for p, v in clf.extractParamMap().items()
        if p.name in {"maxIter", "maxDepth", "numTrees", "seed", "stepSize"}
    }


def train_compare(
    train: DataFrame,
    test: DataFrame,
    feature_cols: list[str],
    seed: int = DEFAULT_SEED,
    run_log=None,
    fast: bool = False,
) -> tuple[str, dict[str, PipelineModel], dict[str, dict[str, float]]]:
    """M5+M6: train every contender, evaluate on held-out test, select the
    champion by F1 (04:253-260). Returns (best_name, models, metrics).

    With ``run_log`` (an ``ml.runlog.RunLog``), each contender's params +
    metrics + fitted model are recorded and the F1 champion is registered —
    the MLflow tracking/registry lifecycle of 04:131-193 / 04:253-289."""
    models: dict[str, PipelineModel] = {}
    metrics: dict[str, dict[str, float]] = {}
    run_ids: dict[str, str] = {}
    train = train.cache()  # reused by every contender's fit
    for name, clf in default_classifiers(seed, fast=fast).items():
        model = make_pipeline(clf, feature_cols).fit(train)
        models[name] = model
        metrics[name] = evaluate(model.transform(test))
        if run_log is not None:
            run_ids[name] = run_log.log_run(
                name, classifier_params(clf), metrics[name], model
            )
    train.unpersist()
    best = max(metrics, key=lambda n: metrics[n]["f1"])
    if run_log is not None:
        run_log.set_champion(run_ids[best])
    return best, models, metrics


def batch_score(
    model: PipelineModel, df: DataFrame, id_col: str
) -> DataFrame:
    """M7: distributed batch inference (vs the reference's driver-local
    predict at 04:302-325). ``model.transform`` runs JVM-side on executors;
    ``fraud_probability`` is P(class=1) from the probability vector."""
    scored = model.transform(df)
    return scored.select(
        F.col(id_col),
        F.col(LABEL_COL).cast("int").alias("is_suspicious"),
        F.col("prediction").cast("int").alias("fraud_prediction"),
        F.round(vector_to_array("probability")[1], 6).alias("fraud_probability"),
    )


def feature_matrix_pandas(df: DataFrame):
    """S9 parity: Arrow-accelerated driver export for sklearn-style local
    training (04:43). Scale hazard by design — the whole matrix lands on
    one machine; beyond toy scale use the pyspark.ml path above."""
    return df.toPandas()
