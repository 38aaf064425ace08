"""ML-lifecycle tail (SURVEY §2.11): feature export, train/compare, batch
scoring — Spark-first via ``pyspark.ml`` instead of the reference's
driver-local toPandas→sklearn hop (04_MLflow_Fraud_Detection.py:43), so the
same code distributes at 100 TB."""
