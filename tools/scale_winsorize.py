"""Winsorize scale experiment: 3-scan exact variant vs 1-scan-per-stage
histogram variant as the fact table multiplies.

The exact variant reads the fact table three times (percentile bounds,
clipped stats, apply); the histogram variant reads it twice total — one
group×unit-bucket aggregate scan carrying (count, sum, sum²) from which
bucket-edge bounds AND exact clipped moments derive, then one apply scan.
At 100 TB the scan count is the cost, so the histogram form should pull
ahead as rows grow; this measures both on replicated events.

Usage: python tools/scale_winsorize.py [reps ...]   (default: 1 5 25)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark import catalog  # noqa: E402
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, rep: int, root: str) -> str:
    """events × rep with re-keyed event ids, written as a sibling sf dir
    (every table symlinked; events replaced) so the registered queries run
    unchanged against the scaled data."""
    d = os.path.join(root, f"sf_x{rep}")
    if not os.path.exists(d):
        os.makedirs(d)
        for t in ("region nation customer supplier part orders lineitem "
                  "documents embeddings").split():
            os.symlink(f"{SF_DIR}/{t}.parquet", f"{d}/{t}.parquet")
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        copies = ev.crossJoin(
            spark.range(rep).select(F.col("id").alias("__c"))
        ).withColumn(
            "event_id", F.col("event_id") * 100 + F.col("__c")
        ).drop("__c")
        copies.repartition(32).write.parquet(f"{d}/events.parquet")
    return d


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    spark = get_spark()
    catalog.load_all()
    exact = catalog.QUERIES["agg_winsorize_zscore"]
    onescan = catalog.QUERIES["agg_winsorize_zscore_onescan"]
    with tempfile.TemporaryDirectory(prefix="scale_wins_") as root:
        for rep in reps:
            d = build(spark, rep, root)
            n = spark.read.parquet(f"{d}/events.parquet").count()
            t0 = time.time()
            exact(spark, d).write.mode("overwrite").format("noop").save()
            t_exact = round(time.time() - t0, 2)
            t0 = time.time()
            onescan(spark, d).write.mode("overwrite").format("noop").save()
            t_one = round(time.time() - t0, 2)
            print(json.dumps({
                "rep": rep, "rows": n,
                "exact_3scan_s": t_exact, "histogram_s": t_one,
            }))


if __name__ == "__main__":
    main()
