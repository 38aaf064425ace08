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


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from databricks_etl_pipelines_spark.plans import (  # noqa: F401
        queries_aggregates,
        queries_joins,
        queries_llm,
        queries_ml,
        queries_pipeline,
        queries_scalar,
        queries_sortset,
        queries_streaming,
        queries_windows,
    )
