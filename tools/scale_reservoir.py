"""Reservoir-sample-stream scale experiment: per-batch cost must track
BATCH size + k, never accumulated stream size — the property that makes
the operator a fixed-cost steady-state corpus sampler.

Method: replicate the sf0.1 documents table REP times with unique ids,
write the rows as N_BATCHES equal parquet files with strictly increasing
mtimes, and drain them with ``maxFilesPerTrigger=1`` so each file is one
micro-batch. ``recentProgress`` then gives the per-batch trigger
durations: if the fold cost grew with the accumulated stream, durations
would climb batch over batch; a flat profile (and a final sample of
exactly k rows equal to the batch bottom-k) is the scale evidence.

Usage: python tools/scale_reservoir.py [reps [n_batches [k]]]
       (defaults: 25 8 1000)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.curation import (  # noqa: E402
    reservoir_key,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402
from databricks_etl_pipelines_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)
from databricks_etl_pipelines_spark.streaming.structured import (  # noqa: E402
    reservoir_sample_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="scale_rsv_")

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id")
        .crossJoin(spark.range(reps).withColumnRenamed("id", "r"))
        .select((F.col("doc_id") * reps + F.col("r")).alias("doc_id"))
    )
    n_rows = docs.count()

    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    base = time.time()
    for b in range(n_batches):
        tmp = os.path.join(root, f"slice{b}")
        (
            docs.filter(F.col("doc_id") % n_batches == b)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(feed, f"batch-{b}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (base + b, base + b))

    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    sample = ManagedTable(os.path.join(root, "sample"))
    t0 = time.time()
    q = reservoir_sample_stream(
        stream, sample, os.path.join(root, "ckpt"), k=k
    )
    assert q.awaitTermination(600), "drain timed out"
    wall = time.time() - t0

    per_batch = [
        {
            "batchId": p["batchId"],
            "rows": p["numInputRows"],
            "ms": p["durationMs"]["triggerExecution"],
        }
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]

    got = sample.read(spark)
    n_sample = got.count()
    want = (
        docs.withColumn("sample_key", reservoir_key("doc_id"))
        .orderBy("sample_key", "doc_id")
        .limit(k)
    )
    mismatch = (
        got.select("doc_id").exceptAll(want.select("doc_id")).count()
        + want.select("doc_id").exceptAll(got.select("doc_id")).count()
    )
    print(
        json.dumps(
            {
                "rows": n_rows,
                "n_batches": n_batches,
                "k": k,
                "drain_s": round(wall, 2),
                "per_batch_ms": per_batch,
                "sample_rows": n_sample,
                "mismatch_vs_batch_bottomk": mismatch,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
