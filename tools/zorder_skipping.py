"""Measure the file-skipping benefit of OPTIMIZE ... ZORDER (ManagedTable
analog) — the reference claims "10-100x" for Delta Z-ORDER without a
number; this produces one for the same mechanism (parquet min/max file
stats vs clustered layout).

Method: write events-like data (uniformly random in both dimensions) as a
32-file table, run small box predicates on (user_id, value), and count
how many files' (min, max) ranges intersect each box — the files a
stats-driven scan must read — before and after Z-ORDER clustering on
those two columns. Selectivity of the box is ~0.01% of the key space.

Usage: python tools/zorder_skipping.py [rows]   (default 2_000_000)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402
from databricks_etl_pipelines_spark.sources.managed_table import (  # noqa: E402
    ManagedTable,
)


def files_touched(spark, version_dir: str, boxes) -> list[int]:
    """Files whose parquet footer (min,max) ranges intersect each box."""
    stats = []
    for f in glob.glob(os.path.join(version_dir, "**", "*.parquet"),
                       recursive=True):
        row = (
            spark.read.parquet(f)
            .agg(F.min("user_id"), F.max("user_id"),
                 F.min("value"), F.max("value"))
            .first()
        )
        stats.append(row)
    touched = []
    for (u_lo, u_hi, v_lo, v_hi) in boxes:
        touched.append(sum(
            1 for (umin, umax, vmin, vmax) in stats
            if umax >= u_lo and umin <= u_hi and vmax >= v_lo and vmin <= v_hi
        ))
    return touched


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("zorder-skip")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="zorder_skip_")

    df = spark.range(rows).select(
        (F.xxhash64("id") % 100_000).alias("user_id"),
        ((F.xxhash64("id", F.lit(1)) % 1_000_000) / 100.0).alias("value"),
    )
    mt = ManagedTable(os.path.join(root, "events"))
    mt.create_or_overwrite(df.repartition(32))           # v0: random layout

    boxes = [
        (u, u + 1_000, v, v + 100.0)
        for (u, v) in [(0, 0.0), (40_000, 2_000.0), (-90_000, -4_000.0)]
    ]
    before = files_touched(spark, mt._version_dir(0), boxes)

    v = mt.optimize(spark, cluster_by=["user_id", "value"],
                    target_partitions=32)
    after = files_touched(spark, mt._version_dir(v), boxes)

    n_files = len(glob.glob(os.path.join(mt._version_dir(v), "**",
                                         "*.parquet"), recursive=True))
    print(json.dumps({
        "rows": rows,
        "files": n_files,
        "files_touched_before": before,
        "files_touched_after": after,
        "skip_ratio": [round(b / max(a, 1), 1)
                       for b, a in zip(before, after)],
    }))


if __name__ == "__main__":
    main()
