"""Micro-bench: run named queries K times each in one warm session and
print per-run wall times + min (the bench statistic). Usage:

  python tools/r15_micro.py [-k N] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_etl_pipelines_spark import catalog  # noqa: E402
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    args = sys.argv[1:]
    k = 3
    if args and args[0] == "-k":
        k = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-micro")
    spark.sparkContext.setLogLevel("ERROR")
    catalog.load_all()
    # same warmup as bench.py
    catalog.QUERIES["agg_ungrouped_global"](spark, sf_dir).collect()
    for name in args:
        fn = catalog.QUERIES[name]
        runs = []
        for _ in range(k):
            t0 = time.time()
            force(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
