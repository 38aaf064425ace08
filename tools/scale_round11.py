"""Round-11 operator scale experiment: the three additions (weighted
trimmed mean, Holt-Winters seasonal, ratio bootstrap CI) run as their
REAL registered queries over a synthetic sf-dir whose fact tables
multiply.

Claims under test:

  * weighted trimmed mean — same bounded-histogram two-phase as the
    unit version, with l_quantity riding every aggregate: the
    (group, bucket) weight histogram is bounded by value range /
    bucket width and must stay CONSTANT under fact replication; wall
    ~linear in fact rows.
  * Holt-Winters — one user_id shuffle + per-key 26-double state
    folds; replication adds DISTINCT users (new-entities axis), so
    per-key state is constant and wall ~linear; output rows grow
    exactly ×rep.
  * ratio bootstrap CI — the ×B=40 integer-weight explode combines
    map-side, so only |groups|·B partial rows shuffle regardless of
    fact size; the CI window stays ≤ 40 shares/group; wall ~linear in
    fact rows × B.

Usage: python tools/scale_round11.py [reps ...]   (default: 1 4)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databricks_etl_pipelines_spark.catalog import QUERIES, load_all  # noqa: E402
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402
from tools.scale_round9 import timed  # noqa: E402
from tools.scale_round10b import build_sf_dir  # noqa: E402


def run_scale(spark, rep: int, root: str) -> dict:
    load_all()
    sf = build_sf_dir(spark, rep, root)
    r: dict = {"rep": rep}
    r["lineitem"] = spark.read.parquet(f"{sf}/lineitem.parquet").count()

    for q in (
        "agg_weighted_trimmed_mean",
        "window_holt_winters",
        "diag_bootstrap_ci_ratio",
    ):
        r[f"{q}_s"], r[f"{q}_rows"] = timed(
            lambda q=q: QUERIES[q](spark, sf).count()
        )

    # bounded-state assertion: the (group, bucket) WEIGHT histogram the
    # weighted rank machinery hash-aggregates to (constant under
    # replication — same value range, same bucket width)
    def whist() -> int:
        return (
            spark.read.parquet(f"{sf}/lineitem.parquet")
            .select(
                F.col("l_returnflag").alias("g"),
                F.floor(
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                    / F.lit(100000)
                ).cast("long").alias("b"),
            )
            .distinct()
            .count()
        )

    r["weight_hist_s"], r["weight_hist_rows"] = timed(whist)

    # bounded-state assertion: replicate-share relation is |groups|·B
    def shares() -> int:
        return (
            QUERIES["diag_bootstrap_ci_ratio"](spark, sf)
            .select("l_returnflag", "ci_replicates")
            .count()
        )

    r["ratio_groups_s"], r["ratio_groups_rows"] = timed(shares)
    return r


def main() -> None:
    spark = get_spark("scale_round11")
    spark.sparkContext.setLogLevel("ERROR")
    reps = [int(a) for a in sys.argv[1:]] or [1, 4]
    root = tempfile.mkdtemp(prefix="scale_r11_")
    out = [run_scale(spark, rep, root) for rep in reps]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
