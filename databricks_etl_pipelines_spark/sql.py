"""SQL-string entry point (EP4 parity).

The reference exposes a SQL surface alongside the DataFrame API (`%sql`
cells: DESCRIBE HISTORY at `01_Bronze_FinServ_Streaming.py:252`, OPTIMIZE /
ZORDER at `03_Gold_Aggregates_Features.py:207-216`). This engine is
API-first, but users coming from SQL get the same capability here:

  * ``register_tables`` — expose the testdata star schema as temp views so
    ``spark.sql("SELECT ... FROM lineitem ...")`` just works (Catalyst
    treats a view scan identically to the DataFrame read: pushdown,
    pruning, codegen all apply).
  * ``run_sql`` — one-call convenience: register + execute.
  * ``describe_history`` / ``optimize_table`` — the Delta-ism commands as
    functions over ``ManagedTable`` (DESCRIBE HISTORY / OPTIMIZE ZORDER
    analogs), returning DataFrames like their SQL forms would.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from databricks_etl_pipelines_spark.sources.managed_table import ManagedTable
from databricks_etl_pipelines_spark.sources.tables import TPCH_TABLES, table


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    names: Sequence[str] = TPCH_TABLES,
) -> None:
    """Create/replace one temp view per testdata table."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the star schema and run a SQL string against it."""
    register_tables(spark, sf_dir)
    return spark.sql(sql)


def describe_history(spark: SparkSession, mt: ManagedTable) -> DataFrame:
    """DESCRIBE HISTORY <table> (reference 01:252)."""
    return mt.history(spark)


def optimize_table(
    spark: SparkSession,
    mt: ManagedTable,
    zorder_by: Sequence[str] | None = None,
) -> int:
    """OPTIMIZE <table> [ZORDER BY (cols)] (reference 03:207-216)."""
    return mt.optimize(spark, cluster_by=zorder_by)
