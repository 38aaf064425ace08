"""Parquet scans over the driver testdata star schema.

The reference reads managed Delta tables (`spark.read.table`, SURVEY §2.1
S3); our harness feeds parquet paths, so the scan layer is
``spark.read.parquet`` — which still gives Catalyst full predicate pushdown,
column pruning, and (for partitioned layouts) partition pruning. At 100 TB
these scans are the #1 lever: keep filters/projections declarative so they
reach the parquet reader (check ``PushedFilters``/``ReadSchema`` in
``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Lazy — no I/O until an action runs.

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: TIMESTAMP(NANOS), which Spark's parquet reader rejects
    (Spark timestamps are µs) and we read as raw longs (legacy conf) then
    rebuild with integer division; and naive TIMESTAMP(MICROS), which Spark
    4 infers as TIMESTAMP_NTZ — incompatible with watermarks and double
    casts. The session timezone is pinned to UTC (session.py), so casting
    NTZ → TIMESTAMP preserves every instant and keeps DuckDB oracle parity.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)
