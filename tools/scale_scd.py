"""SCD2 scale experiment: batch history cost vs corpus size, and the
incremental-apply claim — folding a small batch into a large dimension
must cost O(touched buckets), not O(table).

Method: replicate the sf0.1 events feed REP times under fresh user ids
(rows and keys both grow REP x), then

  * time the one-shot ``scd2_history`` at each size (expects ~linear:
    one exchange + sorts over the feed);
  * build the observation log + dim from the full replicated feed, then
    time ``scd2_apply`` of a batch touching 1% of keys — recording wall,
    buckets_rewritten, and the wall of a full-history rebuild at the
    same size for contrast.

Usage: python tools/scale_scd.py [reps ...]   (default: 1 5 25)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.operators.scd import (  # noqa: E402
    scd2_apply,
    scd2_history,
)
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402
from databricks_etl_pipelines_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
    _read_log,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYS, ATTRS, TS, TIE = ["user_id"], ["event_type"], "ts", ["event_id"]


def build_feed(spark, rep: int, root: str) -> str:
    path = os.path.join(root, f"events_x{rep}.parquet")
    if not os.path.exists(path):
        from databricks_etl_pipelines_spark.sources import table

        ev = table(spark, SF_DIR, "events")
        copies = ev.select(
            "event_id", "ts", "user_id", "event_type",
            F.explode(F.array(*[F.lit(c) for c in range(rep)])).alias("c"),
        )
        out = copies.select(
            (F.col("event_id") * 1000 + F.col("c")).alias("event_id"),
            "ts",
            (F.col("user_id") * 1000 + F.col("c")).alias("user_id"),
            "event_type",
        )
        out.repartition(32).write.parquet(path)
    return path


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    spark = get_spark("scale-scd")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="scale_scd_")
    results = []
    try:
        for rep in reps:
            feed = spark.read.parquet(build_feed(spark, rep, root))
            n_rows = feed.count()

            t0 = time.time()
            scd2_history(feed, KEYS, ATTRS, TS, TIE).write.mode(
                "overwrite"
            ).parquet(os.path.join(root, f"hist_x{rep}.parquet"))
            t_batch = time.time() - t0

            # incremental: bulk-load all but the last day, then fold in a
            # batch touching ~1% of keys
            log = ManagedTable(os.path.join(root, f"log_x{rep}"))
            dim = ManagedTable(os.path.join(root, f"dim_x{rep}"))
            # 5-key update batch (the GDPR-erasure / dim-correction shape):
            # apply cost must track the 5 keys' history, not table size.
            # (A pmod-of-xxhash key filter would CORRELATE with the bucket
            # hash and understate buckets_rewritten — pick literal keys.)
            five = [
                r[0]
                for r in feed.select("user_id").distinct()
                .orderBy("user_id").limit(5).collect()
            ]
            bulk = feed.filter(~F.col("user_id").isin(five))
            small = feed.filter(F.col("user_id").isin(five))
            t0 = time.time()
            scd2_apply(spark, log, dim, bulk, KEYS, ATTRS, TS, TIE)
            t_bulk = time.time() - t0
            t0 = time.time()
            scd2_apply(spark, log, dim, small, KEYS, ATTRS, TS, TIE)
            t_small = time.time() - t0
            last = _read_log(dim.root)[-1]
            results.append(
                {
                    "rep": rep,
                    "rows": n_rows,
                    "batch_history_s": round(t_batch, 2),
                    "bulk_load_s": round(t_bulk, 2),
                    "small_batch_s": round(t_small, 2),
                    "small_batch_rows": small.count(),
                    "buckets_rewritten": last.get("buckets_rewritten"),
                }
            )
            print(json.dumps(results[-1]))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
