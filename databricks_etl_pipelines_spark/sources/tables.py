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

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's parquet
    reader rejects (Spark timestamps are µs). We read nanos as raw longs
    (legacy conf) and rebuild a µs TimestampType column with integer
    division — no double round-trip, so no precision loss; the testdata has
    no sub-µs components.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)
