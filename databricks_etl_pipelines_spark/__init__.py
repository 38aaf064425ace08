"""databricks_etl_pipelines_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-PySpark re-expression of the capability surface of
the reference medallion ETL pipeline (slysik/databricks-etl-pipelines), plus
the large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Design stance (SURVEY.md §7):
  * DataFrame/SQL only — zero row-level Python UDFs in hot paths; every
    operator is a Column-expression builder or DataFrame combinator so the
    whole plan stays inside Catalyst/Tungsten codegen.
  * Declarative scale: broadcast hints for dims, AQE on, partition-count
    discipline, salting helpers for skew, approx variants for 100 TB.
  * Optional deps (delta-spark, scikit-learn, mlflow) are gated behind
    import-tries with pure-Spark/numpy fallbacks.
"""

__version__ = "0.1.0"
