from databricks_etl_pipelines_spark.sources.tables import table, tables

__all__ = ["table", "tables"]
