"""SQL-string entry-point queries (EP4 parity, SURVEY §3).

The query text below is dialect-shared: the exact same string runs on
Spark SQL (via ``run_sql``) and on DuckDB (as its own oracle), so this is
a true differential test of the SQL surface — parser → Catalyst → result
on one side, DuckDB on the other. Rounding is written as
``floor(x * 10^n + 0.5) / 10^n`` because that form is half-up and
bit-identical in both engines (plain ``round`` differs: Spark HALF_UP vs
DuckDB banker's rounding on doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.sql import run_sql

_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(count(*) AS BIGINT) AS line_count,
  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
  floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base,
  floor(avg(l_discount) * 1000000 + 0.5) / 1000000 AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("sql_text_pricing_summary", _PRICING_SQL)
def sql_text_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped summary submitted as a SQL STRING over registered
    views — the identical text is the DuckDB oracle."""
    return run_sql(spark, sf_dir, _PRICING_SQL)
