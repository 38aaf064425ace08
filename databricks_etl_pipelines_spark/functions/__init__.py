from databricks_etl_pipelines_spark.functions.privacy import (
    mask_card_number,
    tokenize_pii,
)

__all__ = ["mask_card_number", "tokenize_pii"]
