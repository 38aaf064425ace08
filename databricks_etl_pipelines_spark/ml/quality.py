"""Model-based document quality classification — the "quality classifier"
stage of a web-scale training-data pipeline (the GPT-3 / CCNet / FineWeb-Edu
recipe: hand-write a cheap heuristic, use it as weak supervision for a
linear text classifier, then score the whole corpus with the model and
filter/bucket on its probability).

Parity note: the reference (slysik/databricks-etl-pipelines) has no text
pipeline; this extends its ML lifecycle shape (04_MLflow_Fraud_Detection.py
train→evaluate→batch-score, re-expressed distributed in ml/fraud.py) to the
documents table.

Architecture, 100 TB-first:

  * Features are hashed bag-of-words (``HashingTF`` over a regex
    tokenizer): NO vocabulary fit, so the featurizer is stateless and the
    training data never needs a second pass — the exact property that made
    fastText-style classifiers the standard for corpus filtering.
  * The model is ``LogisticRegression`` on those sparse vectors;
    fitting is a few distributed gradient passes, scoring is one
    broadcast-model ``transform`` (JVM, no Python in the loop).
  * Weak labels come from the rubric in ``operators/curation.quality_score``
    — a pure Column expression — so label generation is also one scan.

Determinism: tokenizer/hashing are stateless and LBFGS on a fixed
dataset is deterministic (LogisticRegression exposes no seed — none is
needed; there is no random state in the pipeline), so for a fixed corpus
the scores are a pure function of the data (rows-only driver check,
refit-determinism pytest).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.operators.curation import quality_score

def weak_quality_labels(
    df: DataFrame, text_col: str = "text", threshold: int = 90
) -> DataFrame:
    """Attach rubric-derived weak supervision: label 1 where the heuristic
    quality score clears ``threshold``. One scan, pure Column math."""
    return df.withColumn(
        "label",
        (quality_score(text_col).cast("bigint") >= threshold).cast("double"),
    )


def quality_pipeline(
    text_col: str = "text",
    num_features: int = 1 << 15,
) -> Pipeline:
    """Tokenize -> hashed BoW -> LR. Stateless featurizer: the only
    fitted state is the LR coefficient vector (num_features floats), which
    broadcasts to every executor for scoring."""
    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol="__tokens",
                pattern=r"\s+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="__tokens",
                outputCol="features",
                numFeatures=num_features,
            ),
            LogisticRegression(
                featuresCol="features",
                labelCol="label",
                maxIter=30,
                regParam=1e-3,
                standardization=False,
            ),
        ]
    )


def train_quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    threshold: int = 90,
    num_features: int = 1 << 15,
) -> PipelineModel:
    """Fit the classifier on rubric weak labels over ``docs``."""
    labeled = weak_quality_labels(docs, text_col, threshold)
    return quality_pipeline(text_col, num_features).fit(labeled)


def score_quality(
    model: PipelineModel,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: int = 90,
) -> DataFrame:
    """Distributed corpus scoring: id, weak label, model prediction, and
    P(high quality) — the column downstream selection/bucketing keys on."""
    labeled = weak_quality_labels(docs, text_col, threshold)
    scored = model.transform(labeled)
    return scored.select(
        F.col(id_col),
        F.col("label").cast("int").alias("weak_label"),
        F.col("prediction").cast("int").alias("predicted_high_quality"),
        F.round(vector_to_array("probability")[1], 6).alias("p_high_quality"),
    )
