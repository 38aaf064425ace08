"""Packing scale experiment: the concat-then-chunk prefix scan should be
LINEAR in rows with a flat per-row cost — one range exchange, a
partition-count-bounded driver collect, and a partition-local Arrow
cumsum. This measures layout + manifest wall-clock as synthetic corpora
multiply (1x = 2M docs by default), forcing full materialization via the
noop sink.

Usage: python tools/scale_packing.py [n_docs ...]   (default: 2M 10M 50M)
"""

from __future__ import annotations

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.packing import (  # noqa: E402
    chunk_manifest,
    pack_concat_chunks,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [
        2_000_000, 10_000_000, 50_000_000
    ]
    spark = get_spark("scale-packing")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            # deterministic ragged sizes 0..499 incl. zero-token docs
            (((F.xxhash64("id") % 500) + 500) % 500)
            .cast("bigint")
            .alias("n_tokens"),
        )
        t0 = time.time()
        layout = pack_concat_chunks(
            docs, "doc_id", "n_tokens", chunk_tokens=2048, n_partitions=32
        )
        force(layout)
        t1 = time.time()
        force(chunk_manifest(layout))
        t2 = time.time()
        print(
            f"n={n:>11,}  layout={t1 - t0:7.2f}s  manifest={t2 - t1:7.2f}s  "
            f"rows/s={n / (t1 - t0):12,.0f}"
        )


if __name__ == "__main__":
    main()
